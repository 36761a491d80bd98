"""Particle state: structure-of-arrays pytree.

TPU-native replacement for the reference's AoS `Particle` struct and raw
`Particle[50000]` array (/root/reference/SPH_SM_monodomain/Particle.h:7-41,
SPH_SM_monodomain.cpp:51). Every field is a flat JAX array over a padded,
static particle capacity; an `active` mask marks live lanes so all shapes stay
static under jit.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import SimConfig

PAD_MULTIPLE = 128  # lane width: keep the particle axis a multiple of the VPU lane count


def _round_up(n: int, m: int = PAD_MULTIPLE) -> int:
    return ((n + m - 1) // m) * m


@partial(jax.tree_util.register_dataclass,
         data_fields=[
             "pos", "vel", "predicted_vel", "corrected_vel", "inter_vel", "acc",
             "orig_pos", "goal_pos", "mass", "dens", "pres",
             "vm", "inter_vm", "iion", "stim", "w",
             "fixed", "active", "is_stim_on",
         ],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class ParticleState:
    """SoA particle state (Particle.h:10-29 fields, padded + masked).

    Shapes: (N, 3) for vectors, (N,) for scalars, with N the padded capacity.
    `is_stim_on` mirrors the engine-level bool at SPH_SM_monodomain.h:68.
    """

    pos: jax.Array            # Particle.h:10
    vel: jax.Array            # Particle.h:11
    predicted_vel: jax.Array  # Particle.h:12
    corrected_vel: jax.Array  # Particle.h:14
    inter_vel: jax.Array      # Particle.h:13
    acc: jax.Array            # Particle.h:15
    orig_pos: jax.Array       # Particle.h:18 (mOriginalPos)
    goal_pos: jax.Array       # Particle.h:19 (mGoalPos)
    mass: jax.Array           # Particle.h:16
    dens: jax.Array           # Particle.h:22
    pres: jax.Array           # Particle.h:23
    vm: jax.Array             # Particle.h:25 (Vm)
    inter_vm: jax.Array       # Particle.h:26
    iion: jax.Array           # Particle.h:27
    stim: jax.Array           # Particle.h:28
    w: jax.Array              # Particle.h:29
    fixed: jax.Array          # Particle.h:20 (mFixed), bool
    active: jax.Array         # live-lane mask (replaces Number_Particles), bool
    is_stim_on: jax.Array     # scalar bool (h:68)

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    @property
    def num_active(self) -> jax.Array:
        return jnp.sum(self.active.astype(jnp.int32))

    def displacement(self) -> jax.Array:
        """|orig_pos - pos| per particle (Particle.h:31-34 getDisplacement)."""
        return jnp.linalg.norm(self.orig_pos - self.pos, axis=-1)

    def replace(self, **kw) -> "ParticleState":
        return dataclasses.replace(self, **kw)


def init_fluid(positions, cfg: SimConfig, velocities=None,
               pad_to: int | None = None) -> ParticleState:
    """Seed a fluid from a point cloud (Init_Fluid / Init_Particle,
    SPH_SM_monodomain.cpp:93-125).

    Reference semantics preserved: capacity clamp (cpp:103-104) drops particles
    beyond `cfg.max_particles`; vel=0, acc=0, dens=rho0, mass=0.2, all EP fields
    zero, goal = orig = pos, fixed = False.

    Padded lanes get positions far outside the world so they never hash into a
    grid cell, and `active=False` keeps them inert in every phase.
    """
    positions = np.asarray(positions, dtype=np.float32)
    if positions.ndim != 2 or positions.shape[1] != 3:
        raise ValueError(f"positions must be (N, 3), got {positions.shape}")
    n = min(positions.shape[0], cfg.max_particles)  # capacity clamp cpp:103
    positions = positions[:n]
    if velocities is None:
        velocities = np.zeros_like(positions)
    else:
        velocities = np.asarray(velocities, dtype=np.float32)[:n]

    cap = pad_to if pad_to is not None else _round_up(max(n, 1))
    if cap < n:
        raise ValueError(f"pad_to={cap} smaller than particle count {n}")

    far = 4.0 * max(cfg.world_size)  # outside the grid -> invalid hash (cpp:138-140)
    pos = np.full((cap, 3), far, dtype=np.float32)
    pos[:n] = positions
    vel = np.zeros((cap, 3), dtype=np.float32)
    vel[:n] = velocities

    zeros3 = jnp.zeros((cap, 3), jnp.float32)
    zeros1 = jnp.zeros((cap,), jnp.float32)
    active = np.zeros((cap,), dtype=bool)
    active[:n] = True

    return ParticleState(
        pos=jnp.asarray(pos),
        vel=jnp.asarray(vel),
        predicted_vel=zeros3,
        corrected_vel=zeros3,
        inter_vel=zeros3,
        acc=zeros3,
        orig_pos=jnp.asarray(pos),
        goal_pos=jnp.asarray(pos),
        mass=jnp.full((cap,), cfg.particle_mass, jnp.float32),
        dens=jnp.full((cap,), cfg.stand_density, jnp.float32),
        pres=zeros1,
        vm=zeros1,
        inter_vm=zeros1,
        iion=zeros1,
        stim=zeros1,
        w=zeros1,
        fixed=jnp.zeros((cap,), bool),
        active=jnp.asarray(active),
        is_stim_on=jnp.asarray(False),
    )


# ---------------------------------------------------------------------------
# Checkpoint / resume (SURVEY.md §5: the reference has none; pytree state makes
# this trivial and enables golden-trajectory tests).
# ---------------------------------------------------------------------------

_CKPT_VERSION = 2


def save_checkpoint(path: str, state: ParticleState, step: int = 0,
                    cfg: SimConfig | None = None) -> None:
    """Write a SELF-DESCRIBING checkpoint: every state field is stored
    under its dataclass field NAME (not a positional leaf index, so a
    field reorder between versions fails loudly instead of silently
    permuting state), plus the global step and — when given — a JSON
    snapshot of the SimConfig so a resume can reconstruct the exact
    physics without re-passing flags."""
    import dataclasses as dc
    import json
    arrays = {f"field_{f.name}": np.asarray(getattr(state, f.name))
              for f in dc.fields(state)}
    arrays["__step__"] = np.asarray(step, dtype=np.int64)
    arrays["__version__"] = np.asarray(_CKPT_VERSION, dtype=np.int64)
    if cfg is not None:
        arrays["__config__"] = np.frombuffer(
            json.dumps(dc.asdict(cfg)).encode(), dtype=np.uint8)
    # write through a file handle: np.savez_compressed(str) appends '.npz'
    # to suffix-less paths, which would break a same-string save/resume
    # round trip (the loader opens the literal path)
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def load_checkpoint(path: str, with_config: bool = False):
    """Load a checkpoint -> (state, step) or (state, step, cfg|None).

    Fields are matched BY NAME and validated against the current
    ParticleState schema: missing or unknown fields raise (an incompatible
    writer must fail loudly, never permute state silently). Legacy v1
    positional checkpoints (leaf_<i>) are still read, with the historical
    flatten order."""
    import dataclasses as dc
    import json
    data = np.load(path)
    if "__step__" not in data:
        raise ValueError(f"{path}: not a sph_sm_monodomain_tpu checkpoint "
                         "(missing __step__ field)")
    step = int(data["__step__"])
    names = [f.name for f in dc.fields(ParticleState)]
    if any(k.startswith("field_") for k in data.files):
        have = {k[6:] for k in data.files if k.startswith("field_")}
        missing = [n for n in names if n not in have]
        unknown = sorted(have - set(names))
        if missing or unknown:
            raise ValueError(
                f"{path}: checkpoint field mismatch — missing {missing}, "
                f"unknown {unknown} (written by an incompatible version)")
        state = ParticleState(**{n: jnp.asarray(data[f"field_{n}"])
                                 for n in names})
    else:
        # legacy v1 layout: positional leaf_<i> in tree_flatten order
        template = jax.tree_util.tree_structure(
            ParticleState(*([jnp.zeros(())] * len(names))))
        n = template.num_leaves
        have = sum(k.startswith("leaf_") for k in data.files)
        if have != n:
            raise ValueError(
                f"{path}: checkpoint schema mismatch — expected {n} state "
                f"leaves, file has {have} (incompatible version)")
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
        state = jax.tree_util.tree_unflatten(template, leaves)
    # shape sanity: every per-particle leaf shares the capacity axis.
    # Capacity lane alignment is NOT enforced — init_fluid accepts any
    # pad_to >= n, so a checkpoint of such a state must stay loadable
    # (the by-name field validation above is the real schema gate).
    cap = state.pos.shape[0]
    bad = [f.name for f in dc.fields(state)
           if getattr(state, f.name).ndim >= 1
           and getattr(state, f.name).shape[0] != cap]
    if state.pos.ndim != 2 or state.pos.shape[1] != 3 or bad:
        raise ValueError(
            f"{path}: inconsistent leaf shapes (capacity axis {cap}, "
            f"pos {state.pos.shape}, mismatched fields {bad})")
    if not with_config:
        return state, step
    cfg = None
    if "__config__" in data:
        raw = json.loads(bytes(data["__config__"]).decode())
        cfg_fields = {f.name: f for f in dc.fields(SimConfig)}
        kw = {}
        for k, v in raw.items():
            if k not in cfg_fields:
                raise ValueError(f"{path}: config snapshot has unknown "
                                 f"field {k!r} (incompatible version)")
            kw[k] = tuple(v) if isinstance(v, list) else v
        cfg = SimConfig(**kw)
    return state, step, cfg
