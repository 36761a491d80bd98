"""Per-phase timing + CSV report, reproducing the reference's report format.

Replaces component C14 (/root/reference/SPH_SM_monodomain/
SPH_SM_monodomain.cpp:785-824): the reference wraps each of the 7 step
phases in chrono timers and prints one semicolon-separated row
(schema documented at cpp:787). Two fixes over the reference:
  - accumulators are properly initialized (the reference's are
    default-constructed chrono durations, hence garbage columns in its
    committed results CSVs — SURVEY.md §5);
  - phase timing on TPU is measured scan-amortized (many iterations of the
    phase inside one compiled program), because the fused jitted step has no
    meaningful per-phase host timers and per-call timings through a remote
    tunnel are unreliable.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import ParticleState
from ..ops import grid, sph
from ..ops.shape_matching import corrected_velocity
from ..ops.electrophysiology import fhn_cell_model
from ..ops.integrate import update_properties

REPORT_HEADER = ("Avg FPS;Avg Step Duration;Time Steps;Find neighbors;"
                 "Corrected Velocity;Intermediate Velocity;Density-Pressure;"
                 "Cell model;Compute Force;Update Properties;K;Alpha;Beta;Mu;"
                 "sigma;Stim strength;FH_VT;FH_VP;FH_VR;C1;C2;C3;C4")


def _scan_time(body: Callable, init, length: int = 20, reps: int = 3,
               donate: bool = False, unroll: int = 1) -> float:
    """Best seconds per iteration of `body` inside one lax.scan program.

    `donate`/`unroll` reproduce run_protocol's very-large-scene dispatch
    (models.monodomain.VERY_LARGE_CAP): the init is donated (its buffers
    alias into the outputs, halving the program's HBM claim) and the reps
    CHAIN — each rep consumes the previous rep's output, like production's
    chained chunks — because a donated input is dead after the call. The
    caller's `init` survives (it is copied once up front)."""
    def run_fn(x):
        out, _ = jax.lax.scan(lambda c, _: (body(c), None), x, None,
                              length=length, unroll=unroll)
        return out

    run = jax.jit(run_fn, donate_argnums=(0,) if donate else ())

    def fetch(x):
        # value fetch = the only reliable sync through remote-TPU tunnels
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.asarray(leaf).ravel()[0])

    if donate:
        init = jax.tree_util.tree_map(jnp.copy, init)
    out = run(init)
    fetch(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = run(out if donate else init)
        fetch(out)
        best = min(best, (time.time() - t0) / length)
    return best


def profile_phases(state: ParticleState, cfg: SimConfig, cell_capacity: int,
                   neighbor_capacity: int, length: int = 20) -> dict:
    """Scan-amortized per-phase seconds for the XLA (non-fused) step,
    mirroring the 7 timed phases of compute_SPH_SM_monodomain
    (cpp:794-824). Every phase output feeds the scan carry with a NONZERO
    coefficient so no iteration can be folded or dead-code-eliminated."""
    nbr = jax.jit(lambda p, a: grid.build_neighbor_table(
        p, p, a, cfg, cell_capacity, neighbor_capacity))(state.pos,
                                                         state.active)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), nbr)
    mut = 1.0000001  # tiny mutation so scan iterations can't be CSE'd away

    phases = {
        "find_neighbors": lambda p: p * mut
        + 1e-9 * (grid.build_neighbor_table(
            p, p, state.active, cfg, cell_capacity,
            neighbor_capacity).idx[0, 0] % 2).astype(p.dtype),
        "corrected_velocity": lambda s: corrected_velocity(s, cfg).replace(
            pos=s.pos * mut),
        "intermediate_velocity": lambda s: s.replace(
            corrected_vel=sph.xsph_intermediate_velocity(
                s, nbr, cfg).inter_vel * 0.999),
        "density_pressure": lambda s: s.replace(
            vm=sph.density_pressure(s, nbr, cfg).dens * 1e-6 + s.vm * 0.99),
        "cell_model": lambda s: fhn_cell_model(s, cfg).replace(
            vm=s.vm * 0.9999),
        "compute_force": lambda s: s.replace(
            vm=sph.force_and_diffusion(s, nbr, cfg).acc[:, 0] * 1e-6
            + s.vm * 0.99),
        "update_properties": lambda s: update_properties(s, cfg),
    }
    out = {}
    for name, body in phases.items():
        init = state.pos if name == "find_neighbors" else state
        out[name] = _scan_time(body, init, length=length)
    return out


def _iter_cost(body: Callable, init, l0: int = 2, l1: int = 8,
               donate: bool = False, unroll: int = 1) -> float:
    """Per-iteration device cost of `body` from the WALL DIFFERENCE of two
    scan lengths of the same program (the fixed per-dispatch floor and host
    overhead cancel in the difference — the same trick the roofline
    microbench uses, DEVELOPMENT.md)."""
    w0 = _scan_time(body, init, length=l0, reps=2, donate=donate,
                    unroll=unroll) * l0
    w1 = _scan_time(body, init, length=l1, reps=2, donate=donate,
                    unroll=unroll) * l1
    return max((w1 - w0) / (l1 - l0), 1e-7)


def _auto_length(cheap_body: Callable, full_body: Callable, init,
                 donate: bool = False, unroll: int = 1) -> int:
    """Profile scan length sized from the scene's own measured cost: long
    enough that the CHEAPEST pipeline accumulates ~50 ms of device time per
    scan (stage deltas then dominate dispatch jitter), short enough that
    the full-step pipeline stays a few seconds per rep."""
    t_cheap = _iter_cost(cheap_body, init, donate=donate, unroll=unroll)
    t_full = _iter_cost(full_body, init, donate=donate, unroll=unroll)
    return max(4, int(min(250.0, max(4.0, 0.05 / t_cheap), 3.0 / t_full)))


def profile_phases_fused(scene, length: int | None = 250) -> dict:
    """Scan-amortized per-phase seconds for the PRODUCTION fused path.

    The v4 step has only four separable stages (bookkeeping, shape
    matching, sweep A, sweep B — the pointwise phases live inside the
    sweep epilogues, see ops/fused_step.py), so the 7 reference columns
    are attributed by an INCREMENTAL pipeline ablation: each stage's cost
    is the timing difference between running the pipeline up to and
    including it vs stopping before it. By construction the columns sum to
    the full fused step time:

      find_neighbors        <- sort + window bookkeeping
      corrected_velocity    <- shape matching
      density_pressure      <- sorted gather + sweep A (XSPH + density +
                               EOS + FHN epilogue)
      compute_force         <- feature stack + sweep B (forces + Vm
                               Laplacian + integration epilogue) + unsort
      intermediate_velocity, cell_model, update_properties -> 0 (fused
      into the sweep epilogues; the README documents this attribution)

    `length` defaults high because each dispatch costs ~33 ms wall through
    the tunnel regardless of the program (DEVELOPMENT.md): at 250
    iterations the fixed floor adds only ~0.13 ms to each stage and
    cancels in the stage DIFFERENCES.

    `length=None` picks the length from the scene's own measured cost: long
    enough that the cheapest pipeline (bookkeeping alone) accumulates
    ~50 ms of device time per scan — so the stage deltas dominate dispatch
    jitter instead of drowning in it — while capping the full-step
    pipeline's scan at a bounded wall. Use this for CPU smoke runs instead
    of a hand-picked tiny length (a 2-iteration profile is wall-clock-noise
    bound under suite contention).
    """
    import jax.numpy as jnp
    from ..models.monodomain import step_fused
    from ..ops.fused_step import (build_qm_feats, build_qm_feats5,
                                  pack_feats_a5, sweep_a3, sweep_a5)
    from ..ops.pallas_sweeps import (sweep_bookkeeping3, sweep_bookkeeping5)
    from ..ops.shape_matching import sm_invariants

    state, cfg = scene.state, scene.cfg
    qb, wc = scene.q_block, scene.block_window
    sub_q = scene.sub_block or 128
    impl = getattr(scene, "fused_impl", "v4")
    pack_cap = getattr(scene, "pack_cap", 0)
    sm_inv = jax.block_until_ready(
        jax.jit(lambda s: sm_invariants(s, cfg))(state))

    is_v5 = impl in ("v5", "v5s")
    if is_v5:
        def book(s):
            return sweep_bookkeeping5(s.pos, s.active, cfg, sub_q, pack_cap,
                                      w_chunk=wc)

        def stage3(s):  # + qm gather + slab pack + sweep A
            order, inv, src, trips, _ovf, cf, cm, cs = book(s)
            s = corrected_velocity(s, cfg, sm_inv=sm_inv)
            fs = build_qm_feats5(s, cf, cm, cs, order)
            packed_a = pack_feats_a5(fs, src, pack_cap)
            out_a = sweep_a5(fs, packed_a, trips, qb, wc, cfg, sub_q=sub_q,
                             static_trips=(impl == "v5s"))
            return s.replace(dens=out_a[:, 8][inv],
                             pos=s.pos + 1e-12 * s.corrected_vel)
    else:
        def book(s):
            return sweep_bookkeeping3(s.pos, s.active, cfg, sub_q)

        def stage3(s):  # + sorted gather + sweep A
            order, inv, blk_lo, blk_hi, cx, cyz = book(s)
            s = corrected_velocity(s, cfg, sm_inv=sm_inv)
            fs, feats_a = build_qm_feats(s, cx, cyz, order)
            out_a = sweep_a3(fs, feats_a, blk_lo, blk_hi, qb, wc, cfg,
                             sub_q=sub_q, stencil="xyz3")
            return s.replace(dens=out_a[:, 8][inv],
                             pos=s.pos + 1e-12 * s.corrected_vel)

    def stage1(s):  # bookkeeping (sort + window/slab index construction)
        order = book(s)[0]
        return s.replace(pos=s.pos
                         + 1e-9 * (order[0] % 2).astype(s.pos.dtype))

    def stage2(s):  # + shape matching
        order = book(s)[0]
        s = corrected_velocity(s, cfg, sm_inv=sm_inv)
        return s.replace(pos=s.pos + 1e-9 * s.corrected_vel
                         + 1e-9 * (order[0] % 2).astype(s.pos.dtype))

    def stage4(s):  # full fused step
        out, _ = step_fused(s, cfg, qb, wc, sub_q, impl=impl,
                            sm_inv=sm_inv, pack_cap=pack_cap)
        return out

    # very large scenes: profile with the SAME donated+unrolled dispatch
    # run_protocol uses there — the plain scan-carry program would not fit
    # HBM (models.monodomain.VERY_LARGE_CAP; hbm_footprint --scan)
    from ..models.monodomain import VERY_LARGE_CAP
    donate = (jax.default_backend() == "tpu"
              and state.capacity > VERY_LARGE_CAP)
    dk = {"donate": donate, "unroll": 4 if donate else 1}

    if length is None:
        length = _auto_length(stage1, stage4, state, **dk)

    t1 = _scan_time(stage1, state, length=length, **dk)
    t2 = _scan_time(stage2, state, length=length, **dk)
    t3 = _scan_time(stage3, state, length=length, **dk)
    t4 = _scan_time(stage4, state, length=length, **dk)
    # raw per-pipeline times ride along under non-schema keys so callers
    # can print them next to the attributed (clamped-difference) columns
    # and spot compile-noise-driven negative deltas instead of having them
    # silently zeroed (VERDICT r2 §7); _scan_time already takes the best
    # of `reps` runs per stage.
    return {
        "find_neighbors": t1,
        "corrected_velocity": max(t2 - t1, 0.0),
        "intermediate_velocity": 0.0,
        "density_pressure": max(t3 - t2, 0.0),
        "cell_model": 0.0,
        "compute_force": max(t4 - t3, 0.0),
        "update_properties": 0.0,
        "total_step": t4,
        "raw_pipeline_s": (t1, t2, t3, t4),
    }


def profile_phases_sph_fused(scene, length: int | None = 250) -> dict:
    """Scan-amortized per-phase seconds for the fused SPH-only mode
    (variants.step_sph_only_fused — the v4 sweeps with with_ep=False;
    BASELINE config 2). Incremental pipeline attribution like
    profile_phases_fused: bookkeeping -> +sweep A -> full step; the
    "Corrected Velocity" column is structurally 0 (no shape matching in
    this mode — corrected_vel := predicted_vel inside the step)."""
    from ..models.variants import step_sph_only_fused, sph_only_config
    from ..ops.fused_step import build_qm_feats, sweep_a3
    from ..ops.pallas_sweeps import sweep_bookkeeping3

    state = scene.state
    cfg = sph_only_config(scene.cfg)
    qb, wc = scene.q_block, scene.block_window
    sub_q = scene.sub_block or 128

    def book(s):
        return sweep_bookkeeping3(s.pos, s.active, cfg, sub_q)

    def stage1(s):
        order = book(s)[0]
        return s.replace(pos=s.pos
                         + 1e-9 * (order[0] % 2).astype(s.pos.dtype))

    def stage2(s):  # + sorted gather + sweep A (with_ep=False)
        order, inv, blk_lo, blk_hi, cx, cyz = book(s)
        fs, feats_a = build_qm_feats(
            s.replace(corrected_vel=s.vel), cx, cyz, order)
        out_a = sweep_a3(fs, feats_a, blk_lo, blk_hi, qb, wc, cfg,
                         with_ep=False, sub_q=sub_q, stencil="xyz3")
        return s.replace(dens=out_a[:, 8][inv],
                         pos=s.pos + 1e-12 * s.vel)

    def stage3(s):  # full sph-only fused step
        out, _ = step_sph_only_fused(s, cfg, qb, wc, sub_q)
        return out

    if length is None:
        length = _auto_length(stage1, stage3, state)
    t1 = _scan_time(stage1, state, length=length)
    t2 = _scan_time(stage2, state, length=length)
    t3 = _scan_time(stage3, state, length=length)
    return {
        "find_neighbors": t1,
        "corrected_velocity": 0.0,
        "intermediate_velocity": 0.0,
        "density_pressure": max(t2 - t1, 0.0),
        "cell_model": 0.0,
        "compute_force": max(t3 - t2, 0.0),
        "update_properties": 0.0,
        "total_step": t3,
        "raw_pipeline_s": (t1, t2, t3),
    }


def profile_phases_monodomain_fused(scene, length: int | None = 250) -> dict:
    """Scan-amortized per-phase seconds for the fused monodomain-only mode
    (variants.simulate_monodomain_only_fused): per step only the FHN
    reaction ODEs ("Cell model" column) and the Laplacian-only sweep
    ("Compute Force" column — the diffusion half of the reference's
    Compute_Force, cpp:562-563) run; geometry phases are hoisted into the
    prepare tables and are structurally 0 per step."""
    from ..models import variants

    state, cfg = scene.state, scene.cfg
    qb, wc = scene.q_block, scene.block_window
    sub_q = scene.sub_block or 128
    tables = variants.monodomain_prepare_fused(state, cfg, qb, wc,
                                               sub_q=sub_q)
    jax.tree_util.tree_map(lambda x: jnp.asarray(x).block_until_ready(),
                           tables)

    cell = lambda s: fhn_cell_model(s, cfg).replace(vm=s.vm * 0.9999)

    def full(s):
        return variants.simulate_monodomain_only_fused(
            s, tables, cfg, num_steps=1, q_block=qb, w_chunk=wc,
            sub_q=sub_q)

    if length is None:
        length = _auto_length(cell, full, state)
    t_cell = _scan_time(cell, state, length=length)
    t_full = _scan_time(full, state, length=length)
    return {
        "find_neighbors": 0.0,
        "corrected_velocity": 0.0,
        "intermediate_velocity": 0.0,
        "density_pressure": 0.0,
        "cell_model": t_cell,
        "compute_force": max(t_full - t_cell, 0.0),
        "update_properties": 0.0,
        "total_step": t_full,
        "raw_pipeline_s": (t_cell, t_full),
    }


def report_row(cfg: SimConfig, total_steps: int, avg_step_s: float,
               phase_seconds: dict, avg_fps: float | None = None) -> str:
    """One semicolon row in the reference print_report order (cpp:787-791)."""
    if avg_fps is None:
        avg_fps = 1.0 / avg_step_s if avg_step_s > 0 else 0.0
    p = phase_seconds
    cols = [
        avg_fps, avg_step_s, total_steps,
        p.get("find_neighbors", 0.0), p.get("corrected_velocity", 0.0),
        p.get("intermediate_velocity", 0.0), p.get("density_pressure", 0.0),
        p.get("cell_model", 0.0), p.get("compute_force", 0.0),
        p.get("update_properties", 0.0),
        cfg.k_stiffness, cfg.sm_alpha, cfg.sm_beta, cfg.mu_viscosity,
        cfg.sigma, cfg.stim_strength, cfg.fh_vt, cfg.fh_vp, cfg.fh_vr,
        cfg.fh_c1, cfg.fh_c2, cfg.fh_c3, cfg.fh_c4,
    ]
    return ";".join(f"{c:g}" if isinstance(c, float) else str(c)
                    for c in cols)
