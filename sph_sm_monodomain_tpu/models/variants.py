"""Model variants: SPH-only, monodomain-only, SM-only.

The reference runs only the fully-coupled model, but its phases are
separable and BASELINE.json's benchmark configs call for decoupled modes:
  - "SPH-only mode (density/pressure/viscosity, no activation)"
  - "monodomain-only FHN wave propagation ... (diffusion + reaction, frozen
    particles)"
Each variant reuses the exact phase transforms of the coupled model
(ops/sph.py, ops/electrophysiology.py, ops/shape_matching.py) so physics
stays consistent with the reference semantics.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SimConfig, resolve_params
from ..state import ParticleState
from ..ops.grid import NeighborTable, build_neighbor_table
from ..ops.shape_matching import (apply_external_forces, corrected_velocity,
                                  sm_invariants)
from ..ops.sph import (density_pressure, force_and_diffusion,
                       xsph_intermediate_velocity)
from ..ops.electrophysiology import fhn_cell_model
from ..ops.integrate import update_properties
from .monodomain import StepAux


def sph_only_config(cfg: SimConfig | None = None) -> SimConfig:
    """Config for pure-fluid runs: the stim pressure gate (a coupled-model
    quirk, cpp:493-503) must be off or an unstimulated fluid has no pressure
    forces at all; voltage coupling is inert since Vm stays 0."""
    cfg = cfg or SimConfig()
    return cfg.replace(quirk_pressure_stim_gate=False)


@partial(jax.jit, static_argnames=("cfg", "cell_capacity",
                                   "neighbor_capacity"))
def step_sph_only(state: ParticleState, cfg: SimConfig, cell_capacity: int,
                  neighbor_capacity: int) -> tuple[ParticleState, StepAux]:
    """Pure SPH: gravity -> XSPH -> density/pressure -> forces -> integrate.

    No shape matching (corrected_vel = predicted_vel) and no
    electrophysiology (EP state untouched; inter_vm zeroed so the voltage
    update in Update_Properties is a no-op)."""
    nbr = build_neighbor_table(state.pos, state.pos, state.active, cfg,
                               cell_capacity, neighbor_capacity)
    state = apply_external_forces(state, cfg)
    state = state.replace(corrected_vel=state.predicted_vel)
    state = xsph_intermediate_velocity(state, nbr, cfg)
    state = density_pressure(state, nbr, cfg)
    state = force_and_diffusion(state, nbr, cfg)
    state = state.replace(inter_vm=jnp.zeros_like(state.inter_vm))
    state = update_properties(state, cfg)
    return state, StepAux(overflow=nbr.overflow)


@partial(jax.jit, static_argnames=("cfg", "q_block", "w_window", "sub_q"))
def step_sph_only_fused(state: ParticleState, cfg: SimConfig,
                        q_block: int = 128, w_window: int = 128,
                        sub_q: int = 128) -> tuple[ParticleState, StepAux]:
    """Fused-Pallas pure SPH step (the v4 sweeps of ops/fused_step.py with
    with_ep=False — the EP terms of both epilogues drop out, leaving
    gravity -> XSPH + density + EOS -> pressure/viscosity forces ->
    integrate). Physics-equivalent to `step_sph_only`."""
    from ..ops.pallas_sweeps import sweep_bookkeeping3
    from ..ops.fused_step import (build_qm_feats, feats_from_out_a,
                                  sweep_a3, sweep_b3)

    order, inv, blk_lo, blk_hi, cx, cyz = sweep_bookkeeping3(
        state.pos, state.active, cfg, sub_q)
    state = apply_external_forces(state, cfg)
    state = state.replace(corrected_vel=state.predicted_vel)

    # single source of the QM_A column contract; with_ep=False reads the
    # EP columns as zeros (vm feeds the EOS coupling, iion/w the FHN
    # epilogue — all dropped by the kernels' with_ep switch anyway)
    zeros1 = jnp.zeros_like(state.mass)
    fs, feats_a = build_qm_feats(
        state.replace(vm=zeros1, iion=zeros1, w=zeros1), cx, cyz, order)
    out_a = sweep_a3(fs, feats_a, blk_lo, blk_hi, q_block, w_window, cfg,
                     with_ep=False, sub_q=sub_q, stencil="xyz3")

    vol_now = jnp.where(out_a[:, 8] > 0.0, out_a[:, 10] / out_a[:, 8], 0.0)
    feats_b = feats_from_out_a(out_a, vol_now)
    out_b = sweep_b3(out_a, feats_b, blk_lo, blk_hi, q_block, w_window,
                     cfg, with_ep=False, sub_q=sub_q, stencil="xyz3")

    ou = jnp.concatenate([out_b, out_a[:, 3:6]], axis=1)[inv]
    act = state.active
    upd = act & ~state.fixed
    state = state.replace(
        pos=jnp.where(upd[:, None], ou[:, 0:3], state.pos),
        vel=jnp.where(upd[:, None], ou[:, 3:6], state.vel),
        dens=ou[:, 7], pres=ou[:, 8], acc=ou[:, 12:15],
        inter_vel=ou[:, 16:19],
        inter_vm=jnp.zeros_like(state.inter_vm))
    return state, StepAux(overflow=jnp.zeros((), jnp.int32))


@partial(jax.jit, static_argnames=("cfg", "cell_capacity",
                                   "neighbor_capacity", "num_steps",
                                   "record_every", "fused", "q_block",
                                   "w_window", "sub_q"))
def simulate_sph_only(state: ParticleState, cfg: SimConfig,
                      cell_capacity: int, neighbor_capacity: int,
                      num_steps: int, record_every: int = 0,
                      fused: bool = False, q_block: int = 128,
                      w_window: int = 128, sub_q: int = 128):
    """Scan driver for pure-SPH runs (BASELINE config 2): `num_steps` steps
    in ONE compiled program, optionally recording (pos, vm-free) frames
    every `record_every` steps inside the scan."""
    def one(c, _):
        st, ovf = c
        if fused:
            st, aux = step_sph_only_fused(st, cfg, q_block, w_window, sub_q)
        else:
            st, aux = step_sph_only(st, cfg, cell_capacity,
                                    neighbor_capacity)
        return (st, jnp.maximum(ovf, aux.overflow)), ()

    return _scan_with_frames(one, state, num_steps, record_every,
                             lambda st: (st.pos,))


@partial(jax.jit, static_argnames=("cfg",))
def step_sm_only(state: ParticleState, cfg: SimConfig, sm_inv=None
                 ) -> tuple[ParticleState, StepAux]:
    """Shape matching + gravity only: viscoelastic solid, no fluid forces,
    no electrophysiology (and no neighbor table — SM is global)."""
    state = corrected_velocity(state, cfg, sm_inv=sm_inv)
    state = state.replace(inter_vel=state.corrected_vel,
                          acc=jnp.zeros_like(state.acc),
                          inter_vm=jnp.zeros_like(state.inter_vm))
    state = update_properties(state, cfg)
    return state, StepAux(overflow=jnp.zeros((), jnp.int32))


@partial(jax.jit, static_argnames=("cfg", "num_steps", "record_every"))
def simulate_sm_only(state: ParticleState, cfg: SimConfig, num_steps: int,
                     record_every: int = 0):
    """Scan driver for the SM-only viscoelastic solid."""
    sm_inv = sm_invariants(state, cfg)

    def one(c, _):
        st, ovf = c
        st, aux = step_sm_only(st, cfg, sm_inv)
        return (st, ovf), ()

    return _scan_with_frames(one, state, num_steps, record_every,
                             lambda st: (st.pos,))


def _scan_with_frames(one_step, state, num_steps: int, record_every: int,
                      extract):
    """Shared scan driver: run `num_steps` steps, recording `extract(state)`
    after each block of `record_every` steps INSIDE the scan (memory scales
    with num_steps / record_every). Returns (state, StepAux[, frames])."""
    carry = (state, jnp.asarray(0, jnp.int32))
    if record_every:
        blocks = num_steps // record_every
        rest = num_steps - blocks * record_every

        def block(c, _):
            c, _out = jax.lax.scan(one_step, c, None, length=record_every)
            return c, extract(c[0])

        carry, frames = jax.lax.scan(block, carry, None, length=blocks)
        if rest:
            carry, _ = jax.lax.scan(one_step, carry, None, length=rest)
        state, ovf = carry
        return state, StepAux(overflow=ovf), frames
    carry, _ = jax.lax.scan(one_step, carry, None, length=num_steps)
    state, ovf = carry
    return state, StepAux(overflow=ovf)


class MonodomainTables(NamedTuple):
    """Precomputed geometry for frozen-particle electrophysiology."""
    nbr: NeighborTable
    dens: jax.Array


@partial(jax.jit, static_argnames=("cfg", "cell_capacity",
                                   "neighbor_capacity"))
def monodomain_prepare(state: ParticleState, cfg: SimConfig,
                       cell_capacity: int,
                       neighbor_capacity: int) -> MonodomainTables:
    """Frozen particles: the neighbor table and SPH densities are static —
    build them once (vs every step in the coupled model)."""
    nbr = build_neighbor_table(state.pos, state.pos, state.active, cfg,
                               cell_capacity, neighbor_capacity)
    st = density_pressure(state, nbr, cfg)
    return MonodomainTables(nbr=nbr, dens=st.dens)


def _step_monodomain_only_impl(state: ParticleState,
                               tables: MonodomainTables,
                               cfg: SimConfig) -> ParticleState:
    """Unjitted body shared by the jitted step and the dynamic-params scan
    driver (whose effective cfg may hold tracers and so cannot cross a
    static-argument jit boundary)."""
    state = state.replace(dens=tables.dens)
    state = fhn_cell_model(state, cfg)
    state = force_and_diffusion(state, tables.nbr, cfg)
    dt = cfg.time_delta
    vm = state.vm + state.inter_vm * dt / state.mass
    vm = jnp.clip(vm, -cfg.max_voltage, cfg.max_voltage)
    return state.replace(vm=jnp.where(state.active, vm, state.vm))


@partial(jax.jit, static_argnames=("cfg",))
def step_monodomain_only(state: ParticleState, tables: MonodomainTables,
                         cfg: SimConfig) -> ParticleState:
    """FHN reaction + SPH-discretized diffusion on a frozen cloud
    (the reaction-diffusion core of Compute_Force cpp:562-571 +
    calculate_cell_model cpp:575-593 + the Vm update of cpp:612-616)."""
    return _step_monodomain_only_impl(state, tables, cfg)


@partial(jax.jit, static_argnames=("cfg", "num_steps", "record_every"))
def simulate_monodomain_only(state: ParticleState, tables: MonodomainTables,
                             cfg: SimConfig, num_steps: int,
                             record_every: int = 0, params=None):
    """Scan driver for the frozen-cloud FHN wave (BASELINE config 3).

    Frames are recorded INSIDE the scan, one vm snapshot after each block
    of `record_every` steps (the _scan_with_frames convention), so memory
    scales with num_steps / record_every, not num_steps.

    `params` (config.PARAM_FIELDS): traced EP-constant overrides —
    conductivities, Cm, Beta and the FHN constants re-run / batch /
    differentiate without recompiling. Mechanical fields are accepted but
    inert here (this mode has no force math), and the frozen density
    table ignores stand_density by definition of the mode."""
    cfg = resolve_params(cfg, params)

    def body(st, _):
        return _step_monodomain_only_impl(st, tables, cfg), ()

    if record_every:
        blocks = num_steps // record_every
        rest = num_steps - blocks * record_every

        def block(st, _):
            st, _out = jax.lax.scan(body, st, None, length=record_every)
            return st, st.vm

        state, vms = jax.lax.scan(block, state, None, length=blocks)
        if rest:
            state, _ = jax.lax.scan(body, state, None, length=rest)
        return state, vms
    state, _ = jax.lax.scan(body, state, None, length=num_steps)
    return state


# ---------------------------------------------------------------------------
# Fused-Pallas variant paths (TPU)
# ---------------------------------------------------------------------------

class MonodomainFusedTables(NamedTuple):
    """Static geometry for the fused frozen-cloud EP stepper: the cloud
    never moves, so the sort, window bookkeeping, densities and neighbor
    volumes are computed ONCE. Windows/features use the v4 xyz3
    merged-window layout (sweep_bookkeeping3); per step only the
    Laplacian-only kernel runs (ops/fused_step.sweep_lap3)."""
    order: jax.Array
    inv: jax.Array
    blk_lo: jax.Array
    blk_hi: jax.Array
    cx_s: jax.Array       # sorted f32 fast-axis cell coord (stencil)
    cyz_s: jax.Array      # sorted f32 mid+Gm*slow combined coord
    pos_s: jax.Array      # sorted positions
    vol_s: jax.Array      # sorted m/rho (current densities)
    rowsum_s: jax.Array   # sum_k vol_k*W2_jk per sorted row — the constant
    #                       Laplacian row sum, precomputed for the VJP
    mass: jax.Array       # original-order mass
    dens: jax.Array       # original-order densities


@partial(jax.jit, static_argnames=("cfg", "q_block", "w_chunk", "sub_q"))
def monodomain_prepare_fused(state: ParticleState, cfg: SimConfig,
                             q_block: int = 128, w_chunk: int = 128,
                             sub_q: int = 128) -> MonodomainFusedTables:
    from ..ops.pallas_sweeps import sweep_bookkeeping3
    from ..ops.fused_step import build_qm_feats, sweep_a3
    order, inv, blk_lo, blk_hi, cx, cyz = sweep_bookkeeping3(
        state.pos, state.active, cfg, sub_q)
    # one-time density over the same xyz3 windows (with_ep=False: the EOS
    # epilogue runs but only the dens column is consumed; the double-self
    # quirk is applied inside, cpp:483)
    fs, feats_a = build_qm_feats(
        state.replace(corrected_vel=jnp.zeros_like(state.pos)),
        cx, cyz, order)
    out_a = sweep_a3(fs, feats_a, blk_lo, blk_hi, q_block, w_chunk, cfg,
                     with_ep=False, sub_q=sub_q, stencil="xyz3")
    dens_s = out_a[:, 8]
    mass_s = state.mass[order]
    dens_guard = jnp.where(dens_s > 0.0, dens_s, 1.0)
    vol_s = mass_s / dens_guard
    pos_s = state.pos[order]
    cx_s, cyz_s = cx[order], cyz[order]
    # constant Laplacian row sum (geometry is frozen in this mode): one
    # extra one-time sweep here halves every backward step of the
    # custom-VJP Laplacian (_lap_vm_factory)
    from ..ops.fused_step import sweep_lap3
    n = pos_s.shape[0]
    z1 = jnp.zeros((n,), jnp.float32)
    qm0 = jnp.concatenate(
        [pos_s, jnp.zeros((n, 9), jnp.float32), cx_s[:, None],
         cyz_s[:, None], jnp.zeros((n, 2), jnp.float32)], axis=1)
    feats_rs = jnp.stack(
        [pos_s[:, 0], pos_s[:, 1], pos_s[:, 2], vol_s,
         jnp.ones((n,), jnp.float32), z1, z1, z1, z1, z1, z1, z1,
         cx_s, cyz_s, z1, z1], axis=0)
    rowsum_s = sweep_lap3(qm0, feats_rs, blk_lo, blk_hi, q_block, w_chunk,
                          cfg, sub_q=sub_q)[:, 0]
    return MonodomainFusedTables(order=order, inv=inv, blk_lo=blk_lo,
                                 blk_hi=blk_hi, cx_s=cx_s,
                                 cyz_s=cyz_s, pos_s=pos_s,
                                 vol_s=vol_s, rowsum_s=rowsum_s,
                                 mass=state.mass, dens=dens_s[inv])


def _lap_vm_factory(cfg: SimConfig, q_block: int, w_chunk: int, sub_q: int):
    """Differentiable sorted-order Vm Laplacian over hoisted xyz3 windows.

    The fused kernels are not autodiff-traceable, but the monodomain
    Laplacian is LINEAR in vm: lap = L vm with L = A - diag(rowsum(A)),
    A_ij = vol_j * B_spline_2(r_ij) over the (symmetric) 27-cell stencil
    with the symmetric r^2 > eps self-exclusion. Its VJP is therefore one
    more sweep of the SAME kernel (W2 is symmetric in r):

      (L^T g)_j = vol_j * sum_i W2_ij g_i  -  g_j * sum_k vol_k W2_jk

    — a sweep with unit candidate volumes gathering g (query-vm term
    zeroed), plus the constant row sum sum_k vol_k W2_jk precomputed once
    in monodomain_prepare_fused (geometry is frozen in this mode).

    Gradients are defined W.R.T. vm ONLY: the frozen-cloud mode holds
    geometry (pos/vol/windows) constant, so their cotangents are returned
    as zeros BY DEFINITION of the mode — do not reuse this outside it.
    For long scans differentiate under jax.checkpoint (the scan's VJP
    otherwise stacks per-step residuals)."""
    from ..ops.fused_step import sweep_lap3

    def raw(vm_q, vol_row, vm_row, pos_s, cx_s, cyz_s, blk_lo, blk_hi):
        n = pos_s.shape[0]
        z = jnp.zeros((n,), jnp.float32)
        qm = jnp.concatenate(
            [pos_s, vm_q[:, None], jnp.zeros((n, 8), jnp.float32),
             cx_s[:, None], cyz_s[:, None],
             jnp.zeros((n, 2), jnp.float32)], axis=1)
        feats = jnp.stack(
            [pos_s[:, 0], pos_s[:, 1], pos_s[:, 2], vol_row, vm_row,
             z, z, z, z, z, z, z, cx_s, cyz_s, z, z], axis=0)
        return sweep_lap3(qm, feats, blk_lo, blk_hi, q_block, w_chunk,
                          cfg, sub_q=sub_q)[:, 0]

    @jax.custom_vjp
    def lap(vm_s, vol_s, rowsum_s, pos_s, cx_s, cyz_s, blk_lo, blk_hi):
        return raw(vm_s, vol_s, vm_s, pos_s, cx_s, cyz_s, blk_lo, blk_hi)

    def fwd(vm_s, vol_s, rowsum_s, pos_s, cx_s, cyz_s, blk_lo, blk_hi):
        out = raw(vm_s, vol_s, vm_s, pos_s, cx_s, cyz_s, blk_lo, blk_hi)
        return out, (vol_s, rowsum_s, pos_s, cx_s, cyz_s, blk_lo, blk_hi)

    def bwd(res, g):
        import numpy as _np
        vol_s, rowsum_s, pos_s, cx_s, cyz_s, blk_lo, blk_hi = res
        ones = jnp.ones_like(vol_s)
        zq = jnp.zeros_like(vol_s)
        # sum_i W2_ij g_i: one sweep; the constant row sum is precomputed
        # in monodomain_prepare_fused (geometry is frozen)
        s = raw(zq, ones, g, pos_s, cx_s, cyz_s, blk_lo, blk_hi)
        d_vm = vol_s * s - g * rowsum_s
        f0 = lambda a: _np.zeros(a.shape, jax.dtypes.float0) \
            if jnp.issubdtype(a.dtype, jnp.integer) else jnp.zeros_like(a)
        return (d_vm, f0(vol_s), f0(rowsum_s), f0(pos_s), f0(cx_s),
                f0(cyz_s), f0(blk_lo), f0(blk_hi))

    lap.defvjp(fwd, bwd)
    return lap


@partial(jax.jit, static_argnames=("cfg", "num_steps", "q_block", "w_chunk",
                                   "record_every", "sub_q"))
def simulate_monodomain_only_fused(state: ParticleState,
                                   tables: MonodomainFusedTables,
                                   cfg: SimConfig, num_steps: int,
                                   q_block: int = 128, w_chunk: int = 128,
                                   record_every: int = 0, sub_q: int = 128,
                                   params=None):
    """Fused frozen-cloud FHN wave: per step only the reaction ODEs and one
    Laplacian-ONLY sweep run — all geometry is static (BASELINE config 3),
    so the sort/window bookkeeping, the candidate geometry features and
    the one-time density live in `tables` and the kernel carries two
    accumulators instead of sweep B's force machinery.
    Differentiable w.r.t. the EP state (vm/iion/w/stim) through the
    custom-VJP Laplacian (_lap_vm_factory) — geometry is constant in this
    mode by definition.
    `params` (config.PARAM_FIELDS): traced EP-constant overrides. Every
    EP constant lives in the XLA-side reaction/update (the Laplacian
    kernel is geometry-only), so conductivities, Cm, Beta and the FHN
    constants are BOTH dynamic AND differentiable here — jax.grad w.r.t.
    them flows through the custom-VJP Laplacian at fused speed.
    Frame recording follows the _scan_with_frames convention (one snapshot
    after each `record_every`-step block, recorded inside the scan)."""
    lap_fn = _lap_vm_factory(cfg, q_block, w_chunk, sub_q)
    cfg = resolve_params(cfg, params)  # AFTER the factory: it is geometry

    def body(st, _):
        st = fhn_cell_model(st, cfg)
        vm_s = st.vm[tables.order]
        lap_s = lap_fn(vm_s, tables.vol_s, tables.rowsum_s, tables.pos_s,
                       tables.cx_s, tables.cyz_s, tables.blk_lo,
                       tables.blk_hi)
        lap = lap_s[tables.inv]
        scale = cfg.sigma / (cfg.beta_sv_ratio * cfg.cm_capacitance)
        inter_vm = lap + scale * lap - (st.iion - st.stim * cfg.time_delta
                                        / st.mass) / cfg.cm_capacitance
        vm = st.vm + inter_vm * cfg.time_delta / st.mass
        vm = jnp.clip(vm, -cfg.max_voltage, cfg.max_voltage)
        st = st.replace(vm=jnp.where(st.active, vm, st.vm),
                        inter_vm=inter_vm, dens=tables.dens)
        return st, ()

    if record_every:
        blocks = num_steps // record_every
        rest = num_steps - blocks * record_every

        def block(st, _):
            st, _out = jax.lax.scan(body, st, None, length=record_every)
            return st, st.vm

        state, vms = jax.lax.scan(block, state, None, length=blocks)
        if rest:
            state, _ = jax.lax.scan(body, state, None, length=rest)
        return state, vms
    state, _ = jax.lax.scan(body, state, None, length=num_steps)
    return state
