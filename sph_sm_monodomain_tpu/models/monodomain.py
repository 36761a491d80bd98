"""The coupled SPH + shape-matching + monodomain model.

TPU-native re-architecture of the reference hot path
(compute_SPH_SM_monodomain, /root/reference/SPH_SM_monodomain/
SPH_SM_monodomain.cpp:794-829): one pure function `step` composed of the
phase transforms in exactly the reference order —

  1. neighbor table        (Find_neighbors, cpp:199-213)
  2. corrected velocity    (calculate_corrected_velocity, cpp:653-667)
  3. XSPH intermediate     (calculate_intermediate_velocity, cpp:669-701)
  4. density + pressure    (Compute_Density_SingPressure, cpp:448-513)
  5. FHN cell model        (calculate_cell_model, cpp:575-593)
  6. force + Vm diffusion  (Compute_Force, cpp:515-573)
  7. integrate + walls     (Update_Properties, cpp:596-651)

The whole step compiles to a single XLA program; `simulate` runs N steps
under `lax.scan` with the stim-off protocol of the reference app
(main.cpp:329-334) expressed as `lax.cond` — zero host sync per step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SimConfig, resolve_params
from ..state import ParticleState
from ..ops.grid import build_neighbor_table
from ..ops.shape_matching import corrected_velocity, sm_invariants
from ..ops.sph import (density_pressure, force_and_diffusion,
                       xsph_intermediate_velocity)
from ..ops.electrophysiology import fhn_cell_model, turn_off_stim
from ..ops.integrate import update_properties


class StepAux(NamedTuple):
    """Per-step diagnostics (no host sync; consume at the end of a run)."""
    overflow: jax.Array  # particles dropped from full hash-grid cells


@partial(jax.jit, static_argnames=("cfg", "q_block", "w_window", "sub_q",
                                   "impl", "pack_cap"))
def step_fused(state: ParticleState, cfg: SimConfig, q_block: int,
               w_window: int, sub_q: int | None = None,
               impl: str = "v3",
               sm_inv=None, pack_cap: int = 0, params=None
               ) -> tuple[ParticleState, StepAux]:
    """One coupled step with the fused Pallas sweeps (ops/pallas_sweeps.py).

    Physics-equivalent to `step` (same phase order as
    compute_SPH_SM_monodomain, cpp:794-824); the three neighbor phases run
    as two VMEM-resident kernels over cell-sorted data instead of XLA
    gathers. fp summation order differs from the bucketed path (sorted
    candidates, lane-wise accumulators) — trajectories agree to fp32
    tolerance.

    impl="v5": packed per-sub-block candidate slabs (fewest tested pair
    slots; needs `pack_cap`, overflow triggers a host-side regrow);
    impl="v4": fully-fused sweeps over 3 merged z-plane windows with the
    per-axis cell mask; impl="v3" (default): the same
    fully-fused sweeps over 9 (dy,dz) run windows with the linear-hash
    mask; impl="v2": v3's sweeps with XLA pointwise glue; impl="v1":
    per-query bound arrays + MXU-contraction kernels.

    `params` (v4 only): traced physics-constant overrides
    (config.PARAM_FIELDS) — the constants ride into the kernels as one
    (1, 16) SMEM operand (ops.fused_step.build_dynp), so one compiled
    program serves every configuration at full fused speed.
    """
    if params and impl != "v4":
        raise ValueError("dynamic params on the fused path require "
                         "impl='v4' (the production sweeps); "
                         f"impl={impl!r} bakes constants in-kernel")
    if impl in ("v5", "v5s"):
        # v5s: v5 with statically-unrolled chunk loops over the padded slab
        return _step_fused_v5(state, cfg, q_block, w_window, sub_q or 32,
                              pack_cap, sm_inv,
                              static_trips=(impl == "v5s"))
    if impl == "v4":
        return _step_fused_v4(state, cfg, q_block, w_window, sub_q or 128,
                              sm_inv, params=params)
    if impl == "v3":
        return _step_fused_v3(state, cfg, q_block, w_window, sub_q or 64,
                              sm_inv)
    if impl == "v2":
        from ..ablation.legacy_steps import _step_fused_v2
        return _step_fused_v2(state, cfg, q_block, w_window, sub_q or 32,
                              sm_inv)
    if impl != "v1":
        raise ValueError(f"unknown fused impl {impl!r} "
                         "(expected v1/v2/v3/v4/v5/v5s)")
    from ..ablation.legacy_steps import _step_fused_v1
    return _step_fused_v1(state, cfg, q_block, w_window, sub_q, sm_inv)


def _step_fused_v5(state: ParticleState, cfg: SimConfig, q_block: int,
                   w_window: int, sub_q: int, pack_cap: int,
                   sm_inv=None,
                   static_trips: bool = False
                   ) -> tuple[ParticleState, StepAux]:
    """v5 fused step: per-sub-block PACKED candidate slabs — bookkeeping
    left-packs the nine tight dilated hash runs of each sub-block, an XLA
    row-gather materializes them as dense (B, 12, kb) feature slabs, and
    the sweep kernels enumerate only the dilated union (~2.6x fewer tested
    pair slots than v4 on the flagship cloud at sub_q=32). Slab overflow
    (a block's union exceeding pack_cap) is counted in StepAux.overflow;
    run_protocol regrows pack_cap and redoes the chunk."""
    from ..ops.pallas_sweeps import sweep_bookkeeping5
    from ..ops.fused_step import (apply_out_fused, build_qm_feats5,
                                  pack_feats_a5, pack_feats_b5, sweep_a5,
                                  sweep_b5)
    if pack_cap <= 0:
        raise ValueError("impl='v5' needs pack_cap > 0 (auto_sweep5_params)")

    order, inv, src, trips, overflow, cf, cm, cs = sweep_bookkeeping5(
        state.pos, state.active, cfg, sub_q, pack_cap, w_chunk=w_window)

    # phase 2: shape matching (original order; MXU reductions)
    state = corrected_velocity(state, cfg, sm_inv=sm_inv)

    fs = build_qm_feats5(state, cf, cm, cs, order)
    packed_a = pack_feats_a5(fs, src, pack_cap)
    out_a = sweep_a5(fs, packed_a, trips, q_block, w_window, cfg,
                     sub_q=sub_q, static_trips=static_trips)

    vol_now = jnp.where(out_a[:, 8] > 0.0, out_a[:, 10] / out_a[:, 8], 0.0)
    packed_b = pack_feats_b5(out_a, vol_now, src, pack_cap)
    out_b = sweep_b5(out_a, packed_b, trips, q_block, w_window, cfg,
                     sub_q=sub_q, static_trips=static_trips)

    state = apply_out_fused(state, out_a, out_b, inv)
    return state, StepAux(overflow=overflow)


def _step_fused_v4(state: ParticleState, cfg: SimConfig, q_block: int,
                   w_window: int, sub_q: int,
                   sm_inv=None, params=None) -> tuple[ParticleState,
                                                      StepAux]:
    """v4 fused step: v3's fully-fused sweeps driven by THREE merged
    z-plane candidate windows per sub-block instead of nine (dy,dz) runs,
    with the exact per-axis (cx, cyz) cell mask — 3x fewer window setups
    and ~20% fewer enumerated candidate lanes on the biceps clouds (see
    ops/fused_step._gather_loop4)."""
    from ..ops.pallas_sweeps import sweep_bookkeeping3
    from ..ops.fused_step import (apply_out_fused, build_dynp,
                                  build_qm_feats, feats_from_out_a,
                                  sweep_a3, sweep_b3)

    cfg_eff = resolve_params(cfg, params)
    dynp = build_dynp(cfg_eff) if params else None

    order, inv, blk_lo, blk_hi, cx, cyz = sweep_bookkeeping3(
        state.pos, state.active, cfg, sub_q)

    # phase 2: shape matching (original order; MXU reductions) — XLA side,
    # reads sm_alpha/sm_beta from the (possibly traced) effective config
    state = corrected_velocity(state, cfg_eff, sm_inv=sm_inv)

    fs, feats_a = build_qm_feats(state, cx, cyz, order)
    out_a = sweep_a3(fs, feats_a, blk_lo, blk_hi, q_block, w_window, cfg,
                     sub_q=sub_q, stencil="xyz3", dynp=dynp)

    vol_now = jnp.where(out_a[:, 8] > 0.0, out_a[:, 10] / out_a[:, 8], 0.0)
    feats_b = feats_from_out_a(out_a, vol_now)
    out_b = sweep_b3(out_a, feats_b, blk_lo, blk_hi, q_block, w_window,
                     cfg, sub_q=sub_q, stencil="xyz3", dynp=dynp)

    state = apply_out_fused(state, out_a, out_b, inv)
    return state, StepAux(overflow=jnp.zeros((), jnp.int32))


def _step_fused_v3(state: ParticleState, cfg: SimConfig, q_block: int,
                   w_window: int, sub_q: int,
                   sm_inv=None) -> tuple[ParticleState, StepAux]:
    """v3 fused step: both sweeps carry the pointwise phases in their
    epilogues; the only XLA work per step is bookkeeping, shape matching,
    one sorted gather, one candidate-feature stack per sweep and one
    unsorting gather (see ops/fused_step.py)."""
    from ..ops.pallas_sweeps import sweep_bookkeeping2
    from ..ops.fused_step import (apply_out_fused, build_qm_feats,
                                  feats_from_out_a, sweep_a3, sweep_b3)

    order, inv, blk_lo, blk_hi, chash = sweep_bookkeeping2(
        state.pos, state.active, cfg, sub_q)

    # phase 2: shape matching (original order; MXU reductions)
    state = corrected_velocity(state, cfg, sm_inv=sm_inv)

    fs, feats_a = build_qm_feats(state, chash,
                                 jnp.zeros_like(chash), order)
    out_a = sweep_a3(fs, feats_a, blk_lo, blk_hi, q_block, w_window, cfg,
                     sub_q=sub_q)

    vol_now = jnp.where(out_a[:, 8] > 0.0, out_a[:, 10] / out_a[:, 8], 0.0)
    feats_b = feats_from_out_a(out_a, vol_now)
    out_b = sweep_b3(out_a, feats_b, blk_lo, blk_hi, q_block, w_window,
                     cfg, sub_q=sub_q)

    state = apply_out_fused(state, out_a, out_b, inv)
    return state, StepAux(overflow=jnp.zeros((), jnp.int32))


@partial(jax.jit, static_argnames=("cfg", "cell_capacity",
                                   "neighbor_capacity"))
def step(state: ParticleState, cfg: SimConfig, cell_capacity: int,
         neighbor_capacity: int,
         sm_inv=None, params=None) -> tuple[ParticleState, StepAux]:
    """One coupled simulation step (Animation -> compute_SPH_SM_monodomain).

    `params` (optional) is a dict of TRACED physics-constant overrides
    (config.PARAM_FIELDS): the same compiled program serves every value,
    and jax.grad/vmap over it differentiate/batch the whole coupled step
    (see config.resolve_params). Neighbor-table geometry always comes from
    the static `cfg`.
    """
    nbr = build_neighbor_table(state.pos, state.pos, state.active, cfg,
                               cell_capacity, neighbor_capacity)
    cfg = resolve_params(cfg, params)
    state = corrected_velocity(state, cfg, sm_inv=sm_inv)
    state = xsph_intermediate_velocity(state, nbr, cfg)
    state = density_pressure(state, nbr, cfg)
    state = fhn_cell_model(state, cfg)
    state = force_and_diffusion(state, nbr, cfg)
    state = update_properties(state, cfg)
    return state, StepAux(overflow=nbr.overflow)


def _step_with_protocol(state: ParticleState, i: jax.Array, cfg: SimConfig,
                        cell_capacity: int, neighbor_capacity: int,
                        stim_off_step: int, fused: bool = False,
                        q_block: int = 128, w_window: int = 512,
                        sub_q: int | None = None, sm_inv=None,
                        impl: str = "v3", pack_cap: int = 0, params=None):
    if stim_off_step >= 0:
        state = jax.lax.cond(i == stim_off_step,
                             lambda s: turn_off_stim(s, cfg),
                             lambda s: s, state)
    if fused:
        # dynamic params ride into the v4 kernels as an SMEM operand;
        # other fused impls bake constants and reject params (step_fused)
        return step_fused(state, cfg, q_block, w_window, sub_q, impl=impl,
                          sm_inv=sm_inv, pack_cap=pack_cap, params=params)
    return step(state, cfg, cell_capacity, neighbor_capacity, sm_inv=sm_inv,
                params=params)


_SIM_STATIC = ("cfg", "cell_capacity", "neighbor_capacity", "num_steps",
               "stim_off_step", "record_every", "impl", "fused", "q_block",
               "w_window", "sub_q", "pack_cap", "unroll")


def _simulate(state: ParticleState, cfg: SimConfig, cell_capacity: int,
              neighbor_capacity: int, num_steps: int, stim_off_step: int = -1,
              record_every: int = 0, fused: bool = False, q_block: int = 128,
              w_window: int = 512, sub_q: int | None = None,
              impl: str = "v3", pack_cap: int = 0, params=None,
              unroll: int = 1):
    """Run `num_steps` coupled steps under lax.scan.

    `stim_off_step` mirrors the reference app protocol: turnOffStim fires
    BEFORE executing that step index (main.cpp:329-334 fires when half the
    step budget remains). -1 disables.

    `params`: dict of traced physics-constant overrides — the whole
    rollout re-runs with new values WITHOUT recompiling, batches over
    them (jax.vmap), and (on the XLA path) differentiates w.r.t. them
    (jax.grad). Supported on the XLA path and the v4 fused path (where
    the constants ride into the kernels as an SMEM operand); other fused
    impls bake constants and reject params. See config.PARAM_FIELDS.

    If `record_every` > 0, returns (state, aux, traj) where traj is a dict
    of downsampled (T, ...) trajectories of positions and voltages — the
    readback the reference exposes via Get_Paticles for rendering. Frames
    are recorded INSIDE the scan (one frame after each block of
    `record_every` steps), so trajectory memory scales with
    num_steps / record_every, not num_steps; leftover steps past the last
    full block run unrecorded.

    `unroll`: lax.scan unroll factor for the step loop. XLA's while-loop
    buffer assignment cannot share the fused step's big temps across the
    backedge as well as straight-line code (measured: the scan-wrapped
    chunk claims ~2.9x the single step's HBM per particle; unrolling
    recovers most of it), so large-scene drivers pass unroll=4 to push the
    single-chip particle ceiling up at the cost of a longer compile.
    """

    # rest-shape SM moments are run constants: hoisted out of the scan
    sm_inv = sm_invariants(state, cfg)

    def one_step(carry, i):
        st, acc_overflow = carry
        st, aux = _step_with_protocol(st, i, cfg, cell_capacity,
                                      neighbor_capacity, stim_off_step,
                                      fused, q_block, w_window, sub_q,
                                      sm_inv=sm_inv, impl=impl,
                                      pack_cap=pack_cap, params=params)
        return (st, jnp.maximum(acc_overflow, aux.overflow)), ()

    carry = (state, jnp.asarray(0, jnp.int32))
    if record_every:
        blocks = num_steps // record_every
        rest = num_steps - blocks * record_every
        idx = jnp.arange(blocks * record_every).reshape(blocks,
                                                        record_every)

        def block_body(c, ii):
            c, _ = jax.lax.scan(one_step, c, ii, unroll=unroll)
            return c, (c[0].pos, c[0].vm)

        carry, (pos_t, vm_t) = jax.lax.scan(block_body, carry, idx)
        if rest:
            carry, _ = jax.lax.scan(
                one_step, carry,
                jnp.arange(blocks * record_every, num_steps),
                unroll=unroll)
        state, max_overflow = carry
        return state, StepAux(overflow=max_overflow), {"pos": pos_t,
                                                       "vm": vm_t}
    carry, _ = jax.lax.scan(one_step, carry, jnp.arange(num_steps),
                            unroll=unroll)
    state, max_overflow = carry
    return state, StepAux(overflow=max_overflow)


simulate = partial(jax.jit, static_argnames=_SIM_STATIC)(_simulate)

# Above this capacity the non-donated scan-carry program's HBM claim
# (~3.9 kB/particle; tools/hbm_footprint.py --scan) exceeds the chip, so
# large-scene drivers donate the state AND unroll the scan (donation
# alone measures WORSE at 4.1M: aliasing constraints inhibit XLA's temp
# sharing across the backedge — 3941 -> 4817 B/particle — but together
# with unroll=4 the straight-line body shares temps: 1451 B/particle,
# ceiling ~12M). The profilers and bench tools key off the same constant
# so their timed programs match what run_protocol actually dispatches.
VERY_LARGE_CAP = 4_200_000

# `simulate` with the STATE DONATED: XLA reuses the input state's buffers
# for the outputs and loop carries, cutting the chunk program's HBM claim
# (measured at 1.03M particles: 3925 -> 2912 B/particle). The input state
# is dead after the call — callers must not reuse it (run_protocol copies
# its first chunk's input so the caller's scene stays alive).
simulate_donated = partial(jax.jit, static_argnames=_SIM_STATIC,
                           donate_argnums=(0,))(_simulate)


def run_protocol(scene, num_steps: int = 500, stim_off_step: int | None = None,
                 chunk: int = 100, record_every: int = 0, callback=None,
                 fused: bool | None = None, impl: str | None = None,
                 params=None, unroll: int | None = None):
    """Host-side chunked driver for long runs.

    Replays the reference app's experiment protocol (main.cpp:73, 329-334):
    `num_steps` total, turnOffStim before the step at `stim_off_step`
    (default: num_steps // 2). Device work is dispatched in `chunk`-step
    jitted scans so a single device call stays bounded (tunnel/runtime
    execution limits) and `callback(step_idx, state)` can observe progress.

    Runtime control (the headless equivalent of the reference's SPACE /
    'q' / ESC keys, main.cpp:393-408): `callback` may return a dict of
    commands applied between chunks — {"stim_off": True} fires turnOffStim
    immediately (key 'q'), {"stop": True} ends the run early (ESC);
    pausing (SPACE) is the callback simply blocking before it returns.

    `unroll`: scan unroll factor per chunk (None = auto: 4 on very large
    fused scenes, where the while-loop buffer overhead otherwise caps the
    single-chip particle count — see `simulate`; 1 elsewhere, because the
    unrolled body compiles several times longer).

    Memory: on the fused v1-v4 paths (whose chunked candidate windows
    cannot overflow, so a chunk is never redone) the chunk dispatches
    donate their input state, letting XLA reuse its buffers across the
    call. The caller's `scene.state` is copied once up front and stays
    valid; a `callback` must not retain the state object past its return
    (the next chunk donates those buffers — materialize with np.asarray
    inside the callback, as cli.py's render/checkpoint hooks do).

    Returns (state, StepAux, traj|None).
    """
    state, cfg = scene.state, scene.cfg
    fused_explicit = fused is not None
    if fused is None:
        # the fused Pallas sweeps are compiled (not interpreted) only on TPU
        fused = jax.default_backend() == "tpu"
    if params and fused and (impl or getattr(scene, "fused_impl",
                                             "v3")) != "v4":
        # only the v4 fused kernels accept dynamic params (step_fused)
        if fused_explicit:
            raise ValueError(
                "dynamic params on the fused path require impl='v4'; this "
                f"scene/driver selected impl="
                f"{impl or getattr(scene, 'fused_impl', 'v3')!r}")
        print("run_protocol: dynamic params with impl="
              f"{impl or getattr(scene, 'fused_impl', 'v3')!r} — falling "
              "back to the (slower) XLA path; retune the scene to v4 for "
              "fused-speed sweeps", flush=True)
        fused = False
    if stim_off_step is None:
        stim_off_step = num_steps // 2
    if record_every:
        # keep the global frame spacing exact across chunk boundaries:
        # each chunk must hold a whole number of record blocks
        chunk = max(record_every, chunk - chunk % record_every)
    run_impl = impl or getattr(scene, "fused_impl", "v3")
    # the v1-v4 fused paths never redo a chunk (no candidate capacity to
    # overflow), so their dispatches can safely donate the input state;
    # copy the caller's state once so scene.state survives the donation
    donate = (fused and run_impl in ("v1", "v2", "v3", "v4")
              and jax.default_backend() == "tpu")
    if donate:
        state = jax.tree_util.tree_map(jnp.copy, state)
    if unroll is None:
        # auto: unroll only where the while-loop buffer overhead would cap
        # the particle count (the unrolled body compiles ~5x longer)
        unroll = 4 if donate and state.capacity > VERY_LARGE_CAP else 1
    sim_fn = simulate_donated if donate else simulate
    trajs = []
    max_overflow = 0
    regrow = 0
    done = 0
    while done < num_steps:
        n = min(chunk, num_steps - done)
        # map the global stim-off index into this chunk (or disable)
        off = stim_off_step - done if done <= stim_off_step < done + n else -1
        out = sim_fn(state, cfg, scene.cell_capacity,
                     scene.neighbor_capacity, num_steps=n,
                     stim_off_step=off, record_every=record_every,
                     fused=fused, q_block=scene.q_block,
                     w_window=scene.block_window,
                     sub_q=(scene.sub_block or None),
                     impl=run_impl,
                     pack_cap=getattr(scene, "pack_cap", 0),
                     params=params, unroll=unroll)
        if record_every:
            new_state, aux, traj = out
        else:
            new_state, aux = out
            traj = None
        step_overflow = int(aux.overflow)
        if step_overflow and regrow < 3 and \
                (not fused or run_impl in ("v5", "v5s")):
            # failure detection + elastic recovery (SURVEY.md §5): a static
            # candidate capacity truncated neighbors (the cloud densified
            # past it). Regrow 1.5x and REDO this chunk from its input
            # state (recompiles once per growth). The v2-v4 fused paths
            # need no regrow: their chunked candidate windows have dynamic
            # trip counts, so coverage is exact for ANY density and their
            # overflow is structurally zero (step_fused). v5's packed
            # slabs DO carry a capacity (pack_cap) and regrow like the
            # window table.
            regrow += 1
            if fused:
                new_cap = ((int(scene.pack_cap * 1.5) + 127) // 128) * 128
                scene = scene._replace(pack_cap=new_cap)
            else:
                new_k = ((int(scene.neighbor_capacity * 1.5) + 8) // 9) * 9
                scene = scene._replace(neighbor_capacity=new_k)
            continue  # redo this chunk from its unchanged input state
        state = new_state
        if record_every:
            trajs.append(traj)
        max_overflow = max(max_overflow, step_overflow)
        done += n
        if callback is not None:
            cmd = callback(done, state) or {}
            if cmd.get("stim_off"):
                state = turn_off_stim(state, cfg)
                stim_off_step = -1  # already fired; don't re-fire later
            if cmd.get("stop"):
                break
    aux = StepAux(overflow=jnp.asarray(max_overflow, jnp.int32))
    if record_every:
        # num_steps == 0 (e.g. a resume with no remaining steps) records
        # no chunks: return an empty trajectory rather than crashing
        traj = ({k: jnp.concatenate([t[k] for t in trajs])
                 for k in trajs[0]} if trajs else {})
        return state, aux, traj
    return state, aux, None
