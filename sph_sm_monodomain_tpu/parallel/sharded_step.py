"""Multi-chip particle sharding via shard_map over a 1-D device mesh.

The reference has zero parallelism (SURVEY.md §2 'Parallelism & distributed
communication': serial loops, no threads/MPI/NCCL). This module is its
TPU-native replacement:

  - particles are sharded along the padded particle axis over mesh axis "p"
    (the DP/SP-equivalent for a particle system);
  - neighbor interactions gather from ALL_GATHERed global field arrays —
    an O(N) ICI collective per step, vs O(N*K) local compute, so compute
    scales with devices while communication stays linear;
  - the shape-matching global moments (center of mass, Apq/Aqq) are psum'd
    (ops/shape_matching.py axis_name path) — the only all-reduce the physics
    requires;
  - pointwise phases (FHN, integration, stimulus) run purely on local shards.

Everything happens inside ONE jitted shard_map program per step: no host
round-trips, collectives ride ICI.

Why all_gather rather than ppermute halo exchange: per step a device needs
~10 f32 fields of every neighbor-candidate particle. At the target scales
(<= ~1M particles over a v5e-8) a tiled all_gather moves ~40 B x N over ICI
(~0.2 ms at 131k particles) — far below the O(N*K/D) compute it feeds — and
keeps particle ownership static (no migration subsystem, no per-device
capacity overflow). A ppermute halo design (z-slab ownership in sorted
order, exchanging only boundary-cell particles with mesh neighbors) wins
only when N grows past the point where O(N) gather traffic or replicated
bookkeeping dominates; it additionally requires particle migration between
devices as the cloud deforms. That design is sketched here for a future
scale-up but deliberately not the default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig, resolve_params
from ..state import ParticleState
from ..ops.grid import build_neighbor_table
from ..ops.fused_step import apply_out_fused, build_dynp, \
    feats_a_from_fs, feats_from_out_a, sweep_a3, sweep_b3
from ..ops.pallas_sweeps import sweep_bookkeeping3
from ..ops.shape_matching import corrected_velocity, sm_invariants
from ..ops.sph import (density_pressure_arrays, force_diffusion_arrays,
                       xsph_arrays)
from ..ops.electrophysiology import fhn_cell_model, turn_off_stim
from ..ops.integrate import update_properties

AXIS = "p"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    """1-D device mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return jax.make_mesh((len(devices),), (axis,), devices=devices)


def state_pspec(axis: str = AXIS) -> ParticleState:
    """PartitionSpec pytree for ParticleState: every per-particle array is
    sharded on its leading axis; the scalar stim flag is replicated."""
    per_particle = P(axis)
    return ParticleState(
        pos=per_particle, vel=per_particle, predicted_vel=per_particle,
        corrected_vel=per_particle, inter_vel=per_particle, acc=per_particle,
        orig_pos=per_particle, goal_pos=per_particle, mass=per_particle,
        dens=per_particle, pres=per_particle, vm=per_particle,
        inter_vm=per_particle, iion=per_particle, stim=per_particle,
        w=per_particle, fixed=per_particle, active=per_particle,
        is_stim_on=P(),
    )


def shard_state(state: ParticleState, mesh: Mesh,
                axis: str = AXIS) -> ParticleState:
    """Place a (host/single-device) state onto the mesh, particle-sharded."""
    spec = state_pspec(axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, spec)


def _sharded_step_body(state: ParticleState, cfg: SimConfig,
                       cell_capacity: int, neighbor_capacity: int,
                       axis: str = AXIS, sm_inv=None, params=None):
    """One coupled step on LOCAL shards (runs inside shard_map).

    `params`: replicated traced physics-constant overrides
    (config.PARAM_FIELDS) — geometry stays on the static cfg."""
    cfg = resolve_params(cfg, params)

    def ag(x):
        return jax.lax.all_gather(x, axis, tiled=True)

    # global gather sources for the neighbor sweeps
    g_pos, g_active, g_mass = ag(state.pos), ag(state.active), ag(state.mass)

    # 1. neighbor table: buckets over the GLOBAL cloud (replicated compute,
    #    cheap), candidates/compaction for LOCAL queries only.
    nbr = build_neighbor_table(state.pos, g_pos, g_active, cfg,
                               cell_capacity, neighbor_capacity)

    # 2. shape matching: local moments + psum (ops/shape_matching.py);
    #    scan drivers hoist the step-invariant rest moments (sm_inv)
    state = corrected_velocity(state, cfg, axis_name=axis, sm_inv=sm_inv)

    # 3. XSPH (needs previous-step global densities + fresh corrected vel)
    g_cvel, g_dens_prev = ag(state.corrected_vel), ag(state.dens)
    inter = xsph_arrays(state.pos, state.corrected_vel, g_pos, g_cvel,
                        g_mass, g_dens_prev, nbr, cfg)
    state = state.replace(inter_vel=inter)

    # 4. density + pressure (local queries, global positions)
    dens, pres = density_pressure_arrays(state.pos, state.vm, state.stim,
                                         state.mass, g_pos, g_mass, nbr, cfg)
    state = state.replace(dens=dens, pres=pres)

    # 5. FHN reaction (pointwise)
    state = fhn_cell_model(state, cfg)

    # 6. force + Vm diffusion (needs freshly updated global fields)
    g_ivel, g_pres = ag(state.inter_vel), ag(state.pres)
    g_vm, g_dens = ag(state.vm), ag(state.dens)
    acc, inter_vm = force_diffusion_arrays(
        state.pos, state.inter_vel, state.pres, state.vm, state.dens,
        state.iion, state.stim, state.mass, g_pos, g_ivel, g_pres, g_vm,
        g_mass, g_dens, nbr, cfg)
    state = state.replace(acc=acc, inter_vm=inter_vm)

    # 7. integrate + walls (pointwise)
    state = update_properties(state, cfg)

    # overflow: bucket overflow is replicated (identical on every device);
    # compaction drops are per-shard -> psum gives a correct global signal
    # (bucket part scaled by device count — only zero/nonzero matters).
    overflow = jax.lax.psum(nbr.overflow, axis)
    return state, overflow


def _wrap_sharded(impl, mesh: Mesh, axis: str, dynamic_params: bool,
                  check_vma: bool = True):
    """jit(shard_map(impl)) with the module's argument conventions: state
    particle-sharded, optional replicated params dict, replicated outputs.
    check_vma=False for fused bodies (pallas_call outputs carry no
    varying-mesh-axes annotation, which shard_map's checker rejects)."""
    spec = state_pspec(axis)
    in_specs = (spec, P()) if dynamic_params else (spec,)
    return jax.jit(partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                           out_specs=(spec, P()),
                           check_vma=check_vma)(impl))


def make_sharded_step(mesh: Mesh, cfg: SimConfig, cell_capacity: int,
                      neighbor_capacity: int, axis: str = AXIS,
                      dynamic_params: bool = False):
    """Build a jitted multi-chip step: ParticleState -> (ParticleState, i32).

    state must be sharded with `state_pspec` over `mesh` (see shard_state).
    With dynamic_params=True the returned fn is (state, params) ->
    (state, i32): params is a dict of replicated traced physics-constant
    overrides (config.PARAM_FIELDS) — multi-chip sweeps without recompiles.
    """
    def impl(state, params=None):
        return _sharded_step_body(state, cfg, cell_capacity,
                                  neighbor_capacity, axis, params=params)

    return _wrap_sharded(impl, mesh, axis, dynamic_params)


def make_sharded_simulate(mesh: Mesh, cfg: SimConfig, cell_capacity: int,
                          neighbor_capacity: int, num_steps: int,
                          stim_off_step: int = -1, axis: str = AXIS,
                          dynamic_params: bool = False):
    """Build a jitted multi-chip N-step scan with the reference stim-off
    protocol (main.cpp:329-334). With dynamic_params=True the returned fn
    is (state, params) -> (state, i32) — see make_sharded_step."""
    def impl(state, params=None):
        # rows never migrate on this path: hoist the step-invariant SM
        # rest moments (psums + 3x3/9x9 inversions) out of the scan
        sm_inv = sm_invariants(state, cfg, axis_name=axis)

        def body(carry, i):
            st, ovf = carry
            if stim_off_step >= 0:
                st = jax.lax.cond(i == stim_off_step,
                                  lambda s: turn_off_stim(s, cfg),
                                  lambda s: s, st)
            st, o = _sharded_step_body(st, cfg, cell_capacity,
                                       neighbor_capacity, axis,
                                       sm_inv=sm_inv, params=params)
            return (st, jnp.maximum(ovf, o)), None

        (state, overflow), _ = jax.lax.scan(
            body, (state, jnp.asarray(0, jnp.int32)), jnp.arange(num_steps))
        return state, overflow

    return _wrap_sharded(impl, mesh, axis, dynamic_params)


def _sharded_fused_body(state: ParticleState, cfg: SimConfig, q_block: int,
                        w_chunk: int, sub_q: int, axis: str = AXIS,
                        sm_inv=None, params=None):
    """One fused-Pallas coupled step on LOCAL shards (inside shard_map).

    Strategy: all_gather the per-particle fields once per phase group
    (each group packed locally into ONE matrix so a phase costs one ICI
    collective, not one per field), compute global sort/window bookkeeping
    redundantly on every device (cheap), and run the v4 fused kernels
    (ops/fused_step.py, merged z-plane windows) over THIS device's
    contiguous slab of sorted query rows — compute scales 1/D while
    candidates come from the full gathered arrays. Slab outputs are
    all_gathered (sorted order) and mapped back to each device's
    original-order shard.
    """
    cfg_eff = resolve_params(cfg, params)
    dynp = build_dynp(cfg_eff) if params else None

    def ag(x):
        return jax.lax.all_gather(x, axis, tiled=True)

    d = jax.lax.axis_index(axis)
    n_loc = state.pos.shape[0]
    lo = d * n_loc  # this device's sorted-row slab

    # gather #1: positions + active mask (bookkeeping inputs), one packed
    # (n_loc, 4) block instead of two collectives
    g_pa = ag(jnp.concatenate(
        [state.pos, state.active.astype(jnp.float32)[:, None]], axis=1))
    g_pos, g_active = g_pa[:, 0:3], g_pa[:, 3] > 0.5
    order, inv, blk_lo, blk_hi, cx, cyz = sweep_bookkeeping3(
        g_pos, g_active, cfg, sub_q)
    my_inv = jax.lax.dynamic_slice(inv, (lo,), (n_loc,))

    # shape matching: local moments + psum (scan drivers hoist sm_inv);
    # sm_alpha/sm_beta come from the (possibly traced) effective config
    state = corrected_velocity(state, cfg_eff, axis_name=axis, sm_inv=sm_inv)

    n = g_pos.shape[0]
    # gather #2: the remaining QM_A columns as one packed (n_loc, 9) block
    g_rest = ag(jnp.concatenate(
        [state.corrected_vel, state.mass[:, None], state.dens[:, None],
         state.vm[:, None], state.stim[:, None], state.iion[:, None],
         state.w[:, None]], axis=1))
    # QM_A column contract: ops/fused_step.build_qm_feats (per-shard
    # rows here, so the arrays are sliced differently)
    fields = jnp.concatenate([
        g_pos, g_rest, cx[:, None], cyz[:, None],
        jnp.zeros((n, 2), jnp.float32)], axis=1)            # QM_A layout
    fs = fields[order]

    # sweep-A inert-lane contract: single shared implementation
    feats_a = feats_a_from_fs(fs)
    out_a_slab = sweep_a3(fs, feats_a, blk_lo, blk_hi, q_block, w_chunk,
                          cfg, q_slice=(lo, n_loc), sub_q=sub_q,
                          stencil="xyz3", dynp=dynp)
    out_a = ag(out_a_slab)                                  # global, sorted

    vol_now = jnp.where(out_a[:, 8] > 0.0, out_a[:, 10] / out_a[:, 8], 0.0)
    feats_b = feats_from_out_a(out_a, vol_now)
    out_b_slab = sweep_b3(out_a, feats_b, blk_lo, blk_hi, q_block, w_chunk,
                          cfg, q_slice=(lo, n_loc), sub_q=sub_q,
                          stencil="xyz3", dynp=dynp)
    out_b = ag(out_b_slab)

    state = apply_out_fused(state, out_a, out_b, my_inv)
    return state, jnp.zeros((), jnp.int32)


def make_sharded_simulate_fused(mesh: Mesh, cfg: SimConfig, num_steps: int,
                                stim_off_step: int = -1, q_block: int = 128,
                                w_chunk: int = 128, sub_q: int = 64,
                                axis: str = AXIS,
                                dynamic_params: bool = False):
    """Jitted multi-chip N-step scan over the fused-Pallas step with the
    reference stim-off protocol (main.cpp:329-334). Same slab strategy as
    make_sharded_step_fused; this is the production path `--devices N`
    dispatches on TPU (BASELINE config 5). With dynamic_params=True the
    returned fn is (state, params) -> (state, i32) — multi-chip sweeps on
    one compile (see make_sharded_step)."""
    def impl(state, params=None):
        # rows never migrate on this path: hoist the step-invariant SM
        # rest moments (psums + 3x3/9x9 inversions) out of the scan — the
        # same hoist run_protocol and make_halo_simulate already do
        sm_inv = sm_invariants(state, cfg, axis_name=axis)

        def body(st, i):
            if stim_off_step >= 0:
                st = jax.lax.cond(i == stim_off_step,
                                  lambda s: turn_off_stim(s, cfg),
                                  lambda s: s, st)
            st, _ = _sharded_fused_body(st, cfg, q_block, w_chunk, sub_q,
                                        axis, sm_inv=sm_inv, params=params)
            return st, None

        state, _ = jax.lax.scan(body, state, jnp.arange(num_steps))
        # the fused path's chunked windows cover every candidate: overflow
        # is structurally zero (see models/monodomain.py step_fused)
        return state, jnp.zeros((), jnp.int32)

    return _wrap_sharded(impl, mesh, axis, dynamic_params, check_vma=False)


def make_sharded_step_fused(mesh: Mesh, cfg: SimConfig, q_block: int = 128,
                            w_chunk: int = 128, sub_q: int = 64,
                            axis: str = AXIS,
                            dynamic_params: bool = False):
    """Multi-chip fused-Pallas step: ParticleState -> (ParticleState, i32).

    Requires state.capacity to be a multiple of n_devices * q_block so each
    device owns a whole number of sorted query blocks. With
    dynamic_params=True the returned fn is (state, params) -> (state, i32)
    — see make_sharded_step.
    """
    def impl(state, params=None):
        return _sharded_fused_body(state, cfg, q_block, w_chunk, sub_q,
                                   axis, params=params)

    return _wrap_sharded(impl, mesh, axis, dynamic_params, check_vma=False)
