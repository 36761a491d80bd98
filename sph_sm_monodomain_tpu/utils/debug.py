"""Numerical-health and determinism checks.

The TPU-world replacement for race detectors / sanitizers (SURVEY.md §5:
the reference has none; the failure modes here are NaN/Inf blowups,
neighbor-table overflow, and nondeterministic reductions, not data races).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..state import ParticleState

_FIELDS = ("pos", "vel", "predicted_vel", "corrected_vel", "inter_vel",
           "acc", "dens", "pres", "vm", "inter_vm", "iion", "w")


def validate_state(state: ParticleState, cfg=None,
                   where: str = "") -> list[str]:
    """Host-side health report: returns a list of problem strings (empty ==
    healthy). Checks NaN/Inf on active lanes, world-bounds containment, and
    physical sanity (positive density)."""
    problems = []
    act = np.asarray(state.active)
    for name in _FIELDS:
        arr = np.asarray(getattr(state, name))
        bad = ~np.isfinite(arr[act])
        if bad.any():
            problems.append(f"{where}{name}: {int(bad.sum())} non-finite "
                            f"values on active lanes")
    if cfg is not None:
        pos = np.asarray(state.pos)[act]
        world = np.asarray(cfg.world_size)
        if pos.size and ((pos < 0).any() or (pos > world).any()):
            problems.append(f"{where}pos: particles outside [0, world]")
        dens = np.asarray(state.dens)[act]
        if dens.size and (dens <= 0).any():
            problems.append(f"{where}dens: non-positive densities")
    return problems


def assert_state_healthy(state: ParticleState, cfg=None,
                         where: str = "") -> None:
    problems = validate_state(state, cfg, where)
    if problems:
        raise AssertionError("unhealthy state: " + "; ".join(problems))


def check_step_determinism(step_fn, state: ParticleState, reps: int = 3,
                           fields=("pos", "vel", "vm")) -> bool:
    """Run the same jitted step `reps` times from the same state and verify
    bit-identical outputs (XLA reductions on a fixed topology are
    deterministic; this guards against accidentally data-dependent code)."""
    outs = [step_fn(state) for _ in range(reps)]
    outs = [o[0] if isinstance(o, tuple) else o for o in outs]
    ref = outs[0]
    for o in outs[1:]:
        for f in fields:
            if not np.array_equal(np.asarray(getattr(ref, f)),
                                  np.asarray(getattr(o, f))):
                return False
    return True


def nan_guard(fn):
    """Wrap a step function to raise FloatingPointError on non-finite
    positions/voltages. The check is one compiled reduction; the verdict is
    FETCHED host-side so the raise happens synchronously at the call site
    (an async jax.debug.callback raise would surface — if at all — as an
    unrelated XlaRuntimeError at a later sync point, uncatchable by the
    caller). Debug tool: the per-call device->host sync is the point."""
    def wrapped(state, *args, **kw):
        out = fn(state, *args, **kw)
        st = out[0] if isinstance(out, tuple) else out
        ok = jnp.all(jnp.isfinite(jnp.where(st.active[:, None], st.pos, 0.0)))
        ok &= jnp.all(jnp.isfinite(jnp.where(st.active, st.vm, 0.0)))
        if not bool(ok):
            raise FloatingPointError("non-finite state after step")
        return out
    return wrapped
