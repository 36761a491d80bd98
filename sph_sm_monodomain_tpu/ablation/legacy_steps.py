"""Superseded (v1/v2) fused-step assemblies — ablation record.

See ablation/legacy_sweeps.py. models.monodomain.step_fused dispatches
here lazily for impl="v1"/"v2" so the production import graph never loads
this subpackage.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimConfig
from ..models.monodomain import StepAux
from ..ops.integrate import update_properties
from ..ops.shape_matching import corrected_velocity
from ..state import ParticleState
from .legacy_sweeps import (sweep_a, sweep_a2, sweep_b, sweep_b2,
                            sweep_bookkeeping)


def _step_fused_v1(state: ParticleState, cfg: SimConfig, q_block: int,
                   w_window: int, sub_q: int | None,
                   sm_inv=None) -> tuple[ParticleState, StepAux]:
    """v1 fused step: per-query bound arrays + MXU-contraction kernels
    (superseded by v2-v4; kept as the measured baseline)."""
    from ..ops.fused_step import _a_epilogue
    
    order, inv, qstart, qend, blk_start, blk_len = sweep_bookkeeping(
        state.pos, state.active, cfg, sub_q or q_block)

    # phase 2: shape matching (original order; MXU reductions)
    state = corrected_velocity(state, cfg, sm_inv=sm_inv)

    # sorted views: ONE (N, 16) gather instead of nine (N,) gathers — the
    # index traffic amortizes over the row
    fields = jnp.stack([
        state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
        state.corrected_vel[:, 0], state.corrected_vel[:, 1],
        state.corrected_vel[:, 2], state.mass, state.dens, state.vm,
        state.stim, state.iion, state.w,
        state.mass, state.mass, state.mass, state.mass], axis=1)
    fs = fields[order]                                      # (N, 16)
    pos_s = fs[:, 0:3]
    cvel_s = fs[:, 3:6]
    mass_s = fs[:, 6]
    vm_s = fs[:, 8]
    stim_s = fs[:, 9]
    iion_s = fs[:, 10]
    w_rec_s = fs[:, 11]

    # phases 3+4: fused XSPH + density (prev-step densities for volumes;
    # inactive padding carries dens == 0 after the first step — zero those
    # volumes so masked-lane products stay finite)
    vol_prev = jnp.where(fs[:, 7] > 0.0, mass_s / fs[:, 7], 0.0)
    dens_s, xsph_s = sweep_a(pos_s, cvel_s, vol_prev, mass_s, qstart, qend,
                             blk_start, blk_len, q_block, w_window, cfg,
                             sub_q=sub_q)
    inter_vel_s = cvel_s + xsph_s * cfg.velocity_mixing     # cpp:699

    # phases 4b+5: EOS + stim gate + FHN reaction — the SAME pointwise
    # block the fully-fused kernels run in their epilogue (cpp:483-593)
    dens_s, pres_s, react_s, iion_s, w_rec_s = _a_epilogue(
        cfg, True, mass_s, vm_s, stim_s, iion_s, w_rec_s, dens_s)

    # phase 6: fused force + Vm Laplacian (current densities)
    dens_guard = jnp.where(dens_s > 0.0, dens_s, 1.0)
    vol_now = mass_s / dens_guard
    acc_raw_s, lap_s = sweep_b(pos_s, inter_vel_s, vol_now, pres_s, vm_s,
                               qstart, qend, blk_start, blk_len, q_block,
                               w_window, cfg, sub_q=sub_q)
    acc_s = acc_raw_s / dens_guard[:, None]                 # cpp:568
    inter_vm_s = lap_s + (cfg.sigma / (cfg.beta_sv_ratio
                                       * cfg.cm_capacitance)) * lap_s \
        - react_s                                           # cpp:571

    # unsort in ONE (N, 16) gather and integrate (phase 7)
    outs = jnp.stack([
        dens_s, pres_s, inter_vel_s[:, 0], inter_vel_s[:, 1],
        inter_vel_s[:, 2], iion_s, w_rec_s, acc_s[:, 0], acc_s[:, 1],
        acc_s[:, 2], inter_vm_s, dens_s, dens_s, dens_s, dens_s, dens_s],
        axis=1)
    ou = outs[inv]
    state = state.replace(
        dens=ou[:, 0], pres=ou[:, 1], inter_vel=ou[:, 2:5],
        iion=ou[:, 5], w=ou[:, 6], acc=ou[:, 7:10], inter_vm=ou[:, 10])
    state = update_properties(state, cfg)
    # chunked windows cover every candidate exactly: no overflow possible
    return state, StepAux(overflow=jnp.zeros((), jnp.int32))



def _step_fused_v2(state: ParticleState, cfg: SimConfig, q_block: int,
                   w_window: int, sub_q: int,
                   sm_inv=None) -> tuple[ParticleState, StepAux]:
    """v2 fused step: lean bookkeeping + coordinate-mask sweep kernels."""
    from ..ops.fused_step import _a_epilogue
    from ..ops.pallas_sweeps import sweep_bookkeeping2

    order, inv, blk_lo, blk_hi, chash = sweep_bookkeeping2(
        state.pos, state.active, cfg, sub_q)

    # phase 2: shape matching (original order; MXU reductions)
    state = corrected_velocity(state, cfg, sm_inv=sm_inv)

    # sorted views: ONE (N, 16) gather instead of sixteen (N,) gathers
    zeros1 = jnp.zeros_like(state.mass)
    fields = jnp.stack([
        state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
        state.corrected_vel[:, 0], state.corrected_vel[:, 1],
        state.corrected_vel[:, 2], state.mass, state.dens, state.vm,
        state.stim, state.iion, state.w,
        chash, zeros1, zeros1, zeros1], axis=1)
    fs = fields[order]                                      # (N, 16)
    pos_s = fs[:, 0:3]
    cvel_s = fs[:, 3:6]
    mass_s = fs[:, 6]
    dens_prev_s = fs[:, 7]
    vm_s = fs[:, 8]
    stim_s = fs[:, 9]
    iion_s = fs[:, 10]
    w_rec_s = fs[:, 11]
    hash_s = fs[:, 12]

    # phases 3+4: fused XSPH + density (prev-step densities for volumes;
    # zero the volumes of lanes whose density is non-positive — inactive
    # padding — so masked-lane products stay finite)
    vol_prev = jnp.where(dens_prev_s > 0.0, mass_s / dens_prev_s, 0.0)
    dens_s, xsph_s = sweep_a2(pos_s, cvel_s, vol_prev, mass_s, hash_s,
                              blk_lo, blk_hi, q_block, w_window, cfg,
                              sub_q=sub_q)
    inter_vel_s = cvel_s + xsph_s * cfg.velocity_mixing     # cpp:699

    # phases 4b+5: EOS + stim gate + FHN reaction — the SAME pointwise
    # block the fully-fused kernels run in their epilogue (cpp:483-593)
    dens_s, pres_s, react_s, iion_s, w_rec_s = _a_epilogue(
        cfg, True, mass_s, vm_s, stim_s, iion_s, w_rec_s, dens_s)

    # phase 6: fused force + Vm Laplacian (current densities)
    dens_guard = jnp.where(dens_s > 0.0, dens_s, 1.0)
    vol_now = mass_s / dens_guard
    acc_raw_s, lap_s = sweep_b2(pos_s, inter_vel_s, vol_now, pres_s, vm_s,
                                hash_s, blk_lo, blk_hi, q_block, w_window,
                                cfg, sub_q=sub_q)
    acc_s = acc_raw_s / dens_guard[:, None]                 # cpp:568
    inter_vm_s = lap_s + (cfg.sigma / (cfg.beta_sv_ratio
                                       * cfg.cm_capacitance)) * lap_s \
        - react_s                                           # cpp:571

    # unsort in ONE (N, 16) gather and integrate (phase 7)
    outs = jnp.stack([
        dens_s, pres_s, inter_vel_s[:, 0], inter_vel_s[:, 1],
        inter_vel_s[:, 2], iion_s, w_rec_s, acc_s[:, 0], acc_s[:, 1],
        acc_s[:, 2], inter_vm_s, dens_s, dens_s, dens_s, dens_s, dens_s],
        axis=1)
    ou = outs[inv]
    state = state.replace(
        dens=ou[:, 0], pres=ou[:, 1], inter_vel=ou[:, 2:5],
        iion=ou[:, 5], w=ou[:, 6], acc=ou[:, 7:10], inter_vm=ou[:, 10])
    state = update_properties(state, cfg)
    # chunked windows cover every candidate exactly: no overflow possible
    return state, StepAux(overflow=jnp.zeros((), jnp.int32))


