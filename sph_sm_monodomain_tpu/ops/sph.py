"""SPH neighbor-sum phases: XSPH mixing, density/pressure, force + diffusion.

Replaces components C8, C9, C10 of the reference
(/root/reference/SPH_SM_monodomain/SPH_SM_monodomain.cpp:448-573, 669-701).
Each phase is a masked gather over the fixed-capacity compacted neighbor
table from ops/grid.py followed by vectorized pair math and a masked sum —
the VPU replaces the serial 27-cell pointer loops.

Each phase comes in two layers:
  - an array-level kernel (`*_arrays`) taking QUERY arrays (the particles
    being updated — possibly one shard) and GLOBAL arrays (the gather
    sources, full particle set). Neighbor indices in the table are global.
    This is what parallel/sharded_step.py calls inside shard_map, with the
    global arrays produced by all_gather over the mesh.
  - a state-level wrapper used on a single chip, where query == global.

Reference quirks preserved (flags in SimConfig):
  - self-density double count: the neighbor loop already includes self, and
    cpp:483 adds m_i * Poly6(0) again.
  - stim pressure gate: particles with stim <= 0 get pressure forced to -0.0
    (cpp:493-503), so pressure forces act only on stimulated particles.
  - pair guard r^2 > 1e-12 (INF at SPH_SM_monodomain.h:24) skips self and
    coincident pairs in the force loop only (cpp:546).
  - XSPH uses the PREVIOUS step's densities (phase order, cpp:794-824).
  - Inter_Vm update: L += (sigma/(Beta*Cm))*L - (Iion - stim*dt/m)/Cm
    (cpp:571), i.e. the Laplacian is scaled by (1 + sigma/(Beta*Cm)).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimConfig
from ..state import ParticleState
from .grid import NeighborTable
from .kernels import b_spline_2, poly6, spiky, visco

_PAIR_EPS = 1e-12  # INF at SPH_SM_monodomain.h:24


def xsph_arrays(pos_q, cvel_q, pos_g, cvel_g, mass_g, dens_g,
                nbr: NeighborTable, cfg: SimConfig):
    """inter_vel = corrected_vel + mixing * sum_j (vj - vi) W_poly6 m_j/rho_j
    (calculate_intermediate_velocity, cpp:669-701). Densities are last
    step's values — the density phase runs after this one."""
    idx, mask = nbr.idx, nbr.mask
    diff = pos_q[:, None, :] - pos_g[idx]                   # (Nq, K, 3)
    r2 = jnp.sum(diff * diff, axis=-1)
    w = poly6(r2, cfg)
    vol = mass_g[idx] / dens_g[idx]
    dv = cvel_g[idx] - cvel_q[:, None, :]
    contrib = dv * (w * vol)[..., None]
    partial = jnp.sum(jnp.where(mask[..., None], contrib, 0.0), axis=1)
    return cvel_q + partial * cfg.velocity_mixing


def density_pressure_arrays(pos_q, vm_q, stim_q, mass_q, pos_g, mass_g,
                            nbr: NeighborTable, cfg: SimConfig):
    """Density summation + single-pressure EOS with voltage coupling
    (Compute_Density_SingPressure, cpp:448-513). Returns (dens, pres)."""
    idx, mask = nbr.idx, nbr.mask
    diff = pos_q[:, None, :] - pos_g[idx]
    r2 = jnp.sum(diff * diff, axis=-1)
    w = poly6(r2, cfg)
    dens = jnp.sum(jnp.where(mask, mass_g[idx] * w, 0.0), axis=1)
    if cfg.quirk_double_self_density:
        # extra explicit self term on top of the self pair already summed
        # by the neighbor loop (cpp:483)
        dens = dens + mass_q * poly6(jnp.zeros_like(dens), cfg)

    pres = cfg.k_stiffness * (dens - cfg.stand_density)     # cpp:486
    # electromechanical coupling: voltage acts as a pressure offset (cpp:491)
    pres = pres - vm_q * cfg.voltage_constant

    clamped = jnp.clip(pres, -cfg.max_pressure, cfg.max_pressure)
    if cfg.quirk_pressure_stim_gate:
        # pressure only acts on stimulated particles (cpp:493-503)
        pres = jnp.where(stim_q > 0.0, clamped, jnp.asarray(-0.0, pres.dtype))
    else:
        pres = clamped
    return dens, pres


def force_diffusion_arrays(pos_q, ivel_q, pres_q, vm_q, dens_q, iion_q,
                           stim_q, mass_q, pos_g, ivel_g, pres_g, vm_g,
                           mass_g, dens_g, nbr: NeighborTable,
                           cfg: SimConfig):
    """Pressure + viscosity accelerations and the SPH-discretized monodomain
    Laplacian, fused in one neighbor sweep (Compute_Force, cpp:515-573).
    Returns (acc, inter_vm)."""
    idx, mask = nbr.idx, nbr.mask
    diff = pos_q[:, None, :] - pos_g[idx]                   # (Nq, K, 3)
    r2 = jnp.sum(diff * diff, axis=-1)
    pair = mask & (r2 > _PAIR_EPS)                          # cpp:546
    r = jnp.sqrt(jnp.where(pair, r2, 1.0))

    vol = mass_g[idx] / dens_g[idx]                         # cpp:551
    # pressure: acc -= d * Vol*(p_i+p_j)/2 * Spiky(r) / r (cpp:553-554)
    f_pres = vol * (pres_q[:, None] + pres_g[idx]) * 0.5 * spiky(r, cfg)
    acc = -jnp.sum(jnp.where(pair[..., None],
                             diff * (f_pres / r)[..., None], 0.0), axis=1)
    # viscosity: acc += (uj - ui) * Vol * mu * Visco(r) (cpp:558-560)
    dv = ivel_g[idx] - ivel_q[:, None, :]
    f_visc = vol * cfg.mu_viscosity * visco(r, cfg)
    acc = acc + jnp.sum(jnp.where(pair[..., None],
                                  dv * f_visc[..., None], 0.0), axis=1)
    acc = acc / dens_q[:, None]                             # cpp:568

    # voltage Laplacian: (Vm_j - Vm_i) * Vol * W''_bspline (cpp:562-563)
    lap = jnp.sum(jnp.where(pair, (vm_g[idx] - vm_q[:, None]) * vol
                            * b_spline_2(r, cfg), 0.0), axis=1)
    # currents + scaling (cpp:571)
    inter_vm = lap + (cfg.sigma / (cfg.beta_sv_ratio * cfg.cm_capacitance)) \
        * lap - (iion_q - stim_q * cfg.time_delta / mass_q) \
        / cfg.cm_capacitance
    return acc, inter_vm


# ---------------------------------------------------------------------------
# Single-chip state wrappers (query == global)
# ---------------------------------------------------------------------------

def xsph_intermediate_velocity(state: ParticleState, nbr: NeighborTable,
                               cfg: SimConfig) -> ParticleState:
    inter = xsph_arrays(state.pos, state.corrected_vel, state.pos,
                        state.corrected_vel, state.mass, state.dens, nbr, cfg)
    return state.replace(inter_vel=inter)


def density_pressure(state: ParticleState, nbr: NeighborTable,
                     cfg: SimConfig) -> ParticleState:
    dens, pres = density_pressure_arrays(state.pos, state.vm, state.stim,
                                         state.mass, state.pos, state.mass,
                                         nbr, cfg)
    return state.replace(dens=dens, pres=pres)


def force_and_diffusion(state: ParticleState, nbr: NeighborTable,
                        cfg: SimConfig) -> ParticleState:
    acc, inter_vm = force_diffusion_arrays(
        state.pos, state.inter_vel, state.pres, state.vm, state.dens,
        state.iion, state.stim, state.mass, state.pos, state.inter_vel,
        state.pres, state.vm, state.mass, state.dens, nbr, cfg)
    return state.replace(acc=acc, inter_vm=inter_vm)
