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

from ..config import SimConfig
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
                        sub_q: int = 32) -> tuple[ParticleState, StepAux]:
    """Fused-Pallas pure SPH step (the v2 sweeps of ops/pallas_sweeps.py):
    gravity -> XSPH + density -> pressure/viscosity forces -> integrate.
    Physics-equivalent to `step_sph_only`."""
    from ..ops.pallas_sweeps import sweep_a2, sweep_b2, sweep_bookkeeping2

    order, inv, blk_lo, blk_hi, chash = sweep_bookkeeping2(
        state.pos, state.active, cfg, sub_q)
    state = apply_external_forces(state, cfg)
    state = state.replace(corrected_vel=state.predicted_vel)

    zeros1 = jnp.zeros_like(state.mass)
    fields = jnp.stack([
        state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
        state.corrected_vel[:, 0], state.corrected_vel[:, 1],
        state.corrected_vel[:, 2], state.mass, state.dens, state.stim,
        chash, zeros1, zeros1, zeros1,
        zeros1, zeros1, zeros1], axis=1)
    fs = fields[order]
    pos_s, cvel_s = fs[:, 0:3], fs[:, 3:6]
    mass_s, dens_prev_s, stim_s = fs[:, 6], fs[:, 7], fs[:, 8]
    hash_s = fs[:, 9]

    vol_prev = jnp.where(dens_prev_s > 0.0, mass_s / dens_prev_s, 0.0)
    dens_s, xsph_s = sweep_a2(pos_s, cvel_s, vol_prev, mass_s, hash_s,
                              blk_lo, blk_hi, q_block, w_window, cfg,
                              sub_q=sub_q)
    inter_vel_s = cvel_s + xsph_s * cfg.velocity_mixing     # cpp:699
    if cfg.quirk_double_self_density:                       # cpp:483
        from ..ops import kernels as K
        dens_s = dens_s + mass_s * K.poly6(jnp.zeros_like(dens_s), cfg)
    pres_s = cfg.k_stiffness * (dens_s - cfg.stand_density)  # cpp:486 (Vm=0)
    clamped = jnp.clip(pres_s, -cfg.max_pressure, cfg.max_pressure)
    if cfg.quirk_pressure_stim_gate:                        # cpp:493-503
        pres_s = jnp.where(stim_s > 0.0, clamped,
                           jnp.asarray(-0.0, pres_s.dtype))
    else:
        pres_s = clamped

    dens_guard = jnp.where(dens_s > 0.0, dens_s, 1.0)
    acc_raw_s, _lap = sweep_b2(pos_s, inter_vel_s, mass_s / dens_guard,
                               pres_s, jnp.zeros_like(dens_s), hash_s,
                               blk_lo, blk_hi, q_block, w_window, cfg,
                               sub_q=sub_q)
    acc_s = acc_raw_s / dens_guard[:, None]                 # cpp:568

    outs = jnp.stack([dens_s, pres_s, inter_vel_s[:, 0], inter_vel_s[:, 1],
                      inter_vel_s[:, 2], acc_s[:, 0], acc_s[:, 1],
                      acc_s[:, 2], dens_s, dens_s, dens_s, dens_s, dens_s,
                      dens_s, dens_s, dens_s], axis=1)
    ou = outs[inv]
    state = state.replace(dens=ou[:, 0], pres=ou[:, 1],
                          inter_vel=ou[:, 2:5], acc=ou[:, 5:8],
                          inter_vm=jnp.zeros_like(state.inter_vm))
    state = update_properties(state, cfg)
    return state, StepAux(overflow=jnp.zeros((), jnp.int32))


@partial(jax.jit, static_argnames=("cfg", "cell_capacity",
                                   "neighbor_capacity", "num_steps",
                                   "record_every", "fused", "q_block",
                                   "w_window", "sub_q"))
def simulate_sph_only(state: ParticleState, cfg: SimConfig,
                      cell_capacity: int, neighbor_capacity: int,
                      num_steps: int, record_every: int = 0,
                      fused: bool = False, q_block: int = 128,
                      w_window: int = 128, sub_q: int = 32):
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


@partial(jax.jit, static_argnames=("cfg",))
def step_monodomain_only(state: ParticleState, tables: MonodomainTables,
                         cfg: SimConfig) -> ParticleState:
    """FHN reaction + SPH-discretized diffusion on a frozen cloud
    (the reaction-diffusion core of Compute_Force cpp:562-571 +
    calculate_cell_model cpp:575-593 + the Vm update of cpp:612-616)."""
    state = state.replace(dens=tables.dens)
    state = fhn_cell_model(state, cfg)
    state = force_and_diffusion(state, tables.nbr, cfg)
    dt = cfg.time_delta
    vm = state.vm + state.inter_vm * dt / state.mass
    vm = jnp.clip(vm, -cfg.max_voltage, cfg.max_voltage)
    return state.replace(vm=jnp.where(state.active, vm, state.vm))


@partial(jax.jit, static_argnames=("cfg", "num_steps", "record_every"))
def simulate_monodomain_only(state: ParticleState, tables: MonodomainTables,
                             cfg: SimConfig, num_steps: int,
                             record_every: int = 0):
    """Scan driver for the frozen-cloud FHN wave (BASELINE config 3)."""
    def body(st, _):
        st = step_monodomain_only(st, tables, cfg)
        return st, (st.vm if record_every else ())

    state, vms = jax.lax.scan(body, state, None, length=num_steps)
    if record_every:
        return state, vms[::record_every]
    return state


# ---------------------------------------------------------------------------
# Fused-Pallas variant paths (TPU)
# ---------------------------------------------------------------------------

class MonodomainFusedTables(NamedTuple):
    """Static geometry for the fused frozen-cloud EP stepper: the cloud
    never moves, so the sort, window bookkeeping, densities and neighbor
    volumes are computed ONCE."""
    order: jax.Array
    inv: jax.Array
    qstart: jax.Array
    qend: jax.Array
    blk_start: jax.Array
    blk_len: jax.Array
    pos_s: jax.Array      # sorted positions
    vol_s: jax.Array      # sorted m/rho (current densities)
    mass: jax.Array       # original-order mass
    dens: jax.Array       # original-order densities


@partial(jax.jit, static_argnames=("cfg", "q_block", "w_chunk"))
def monodomain_prepare_fused(state: ParticleState, cfg: SimConfig,
                             q_block: int = 128,
                             w_chunk: int = 384) -> MonodomainFusedTables:
    from ..ops.pallas_sweeps import sweep_a, sweep_bookkeeping
    order, inv, qs, qe, bs, bl = sweep_bookkeeping(state.pos, state.active,
                                                   cfg, q_block)
    pos_s = state.pos[order]
    mass_s = state.mass[order]
    zeros3 = jnp.zeros_like(pos_s)
    vol_prev = mass_s / state.dens[order]
    dens_s, _ = sweep_a(pos_s, zeros3, vol_prev, mass_s, qs, qe, bs, bl,
                        q_block, w_chunk, cfg)
    if cfg.quirk_double_self_density:
        from ..ops import kernels as K
        dens_s = dens_s + mass_s * K.poly6(jnp.zeros_like(dens_s), cfg)
    return MonodomainFusedTables(order=order, inv=inv, qstart=qs, qend=qe,
                                 blk_start=bs, blk_len=bl, pos_s=pos_s,
                                 vol_s=mass_s / dens_s, mass=state.mass,
                                 dens=dens_s[inv])


@partial(jax.jit, static_argnames=("cfg", "num_steps", "q_block", "w_chunk",
                                   "record_every"))
def simulate_monodomain_only_fused(state: ParticleState,
                                   tables: MonodomainFusedTables,
                                   cfg: SimConfig, num_steps: int,
                                   q_block: int = 128, w_chunk: int = 384,
                                   record_every: int = 0):
    """Fused frozen-cloud FHN wave: per step only the reaction ODEs and one
    Laplacian sweep run — all geometry is static (BASELINE config 3)."""
    from ..ops.pallas_sweeps import sweep_b

    zeros3 = jnp.zeros_like(tables.pos_s)
    zeros1 = jnp.zeros_like(tables.vol_s)

    def body(st, _):
        st = fhn_cell_model(st, cfg)
        vm_s = st.vm[tables.order]
        _, lap_s = sweep_b(tables.pos_s, zeros3, tables.vol_s, zeros1, vm_s,
                           tables.qstart, tables.qend, tables.blk_start,
                           tables.blk_len, q_block, w_chunk, cfg)
        lap = lap_s[tables.inv]
        scale = cfg.sigma / (cfg.beta_sv_ratio * cfg.cm_capacitance)
        inter_vm = lap + scale * lap - (st.iion - st.stim * cfg.time_delta
                                        / st.mass) / cfg.cm_capacitance
        vm = st.vm + inter_vm * cfg.time_delta / st.mass
        vm = jnp.clip(vm, -cfg.max_voltage, cfg.max_voltage)
        st = st.replace(vm=jnp.where(st.active, vm, st.vm),
                        inter_vm=inter_vm, dens=tables.dens)
        return st, (st.vm if record_every else ())

    state, vms = jax.lax.scan(body, state, None, length=num_steps)
    if record_every:
        return state, vms[::record_every]
    return state
