"""ppermute halo-exchange + migration multi-chip step (slow-axis slabs).

The all_gather design (sharded_step.py) replicates the global sort and
window bookkeeping on every device and moves O(N) bytes per phase group;
this module implements the O(N/D)-per-device design from
docs/halo_exchange_design.md:

  - ownership: device d owns the cell planes with SLOW-axis coordinate in
    [sb[d], sb[d+1]) — one CONTIGUOUS interval of the axis-permuted hash
    cf + Gf*(cm + Gm*cs) (pallas_sweeps.hash_axis_perm puts the LARGEST
    grid extent on the slow axis, so stretched multi-muscle worlds slab
    along their long axis and every exchanged boundary plane stays one
    O(tile) fast x mid cross-section; the standard cubic world keeps the
    reference's z-plane split, SPH_SM_monodomain.cpp:142). Concatenating
    the devices' locally-sorted slabs yields a globally-sorted array.
  - per step, each device identifies emigrants elementwise on the hash
    (rows whose hash left its interval — after integration a particle
    moves less than one cell per CFL step, so only adjacent slabs ever
    receive), compacts them with a cumsum-rank scatter, ppermutes them to
    its neighbors, then restores the slab-sorted layout with ONE argsort
    over the merged (S + 2M) rows and ONE wide-matrix row gather (the
    carried fields travel as columns of a single (S+2M, 20) matrix — on
    TPU gathers pay per-row issue cost regardless of row width, so one
    wide gather beats the 19 per-field gathers a state permute costs).
    One boundary PLANE of candidate features is exchanged with each
    neighbor per sweep. All bookkeeping (sort, searchsorted windows) is
    O(S log S) per device; the only O(N) collectives left are the tiny
    psums of the shape-matching moments.
  - the sweeps are the v4 fused kernels (ops/fused_step.py, xyz3 merged
    windows + exact per-axis cell mask — the measured-fastest stencil)
    with LOCAL queries (S rows) gathering from [left halo | local | right
    halo] merged candidates — hash-sorted by construction.

The state keeps a device-sorted row layout (rows migrate and reorder
freely); particle identity travels in the per-particle fields themselves
(orig_pos, goal_pos, masses, ...), exactly like the reference's particles
have no global index either.

Fixed capacities, sized at sharding time with headroom and surfaced
through the step's overflow counter when exceeded (the host driver can
then re-shard — the same elastic-recovery pattern as run_protocol):
  S          per-device row capacity
  mig_cap    migration rows exchanged per direction per step
  halo_cap   boundary-plane rows exchanged per direction per sweep
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding

from ..config import SimConfig, resolve_params
from ..state import ParticleState
from ..ops.fused_step import (apply_out_fused, build_dynp, feats_a_from_fs,
                              feats_from_out_a, sweep_a3, sweep_b3)
from ..ops.pallas_sweeps import hash_axis_perm
from ..ops.shape_matching import (corrected_velocity, sm_invariants,
                                  sm_rebind_rows)
from ..ops.electrophysiology import turn_off_stim
from .sharded_step import AXIS, _wrap_sharded, state_pspec

_SENTINEL = -1048576.0  # matches pallas_sweeps._COORD_SENTINEL


def slab_bounds(cfg: SimConfig, n_devices: int) -> np.ndarray:
    """Slow-axis cell-plane split points: device d owns slow coords in
    [sb[d], sb[d+1]) of the permuted hash (hash_axis_perm)."""
    gs = cfg.grid_size[hash_axis_perm(cfg)[2]]
    return np.array([(d * gs) // n_devices for d in range(n_devices + 1)],
                    dtype=np.int32)


def z_slab_bounds(cfg: SimConfig, n_devices: int) -> np.ndarray:
    """Back-compat alias: on the standard cubic world the permuted slow
    axis IS z, so these are the z split points."""
    return slab_bounds(cfg, n_devices)


def _hash_ids(pos, active, cfg: SimConfig):
    """Slab-ownership sort key == the sweeps' window sort key, by
    construction: both call ops.pallas_sweeps.hash_cells_perm (migrating a
    row to a device whose windows hash it elsewhere would silently corrupt
    boundary physics)."""
    from ..ops.pallas_sweeps import hash_cells_perm
    return hash_cells_perm(pos, active, cfg)[4]


def shard_state_halo(state: ParticleState, mesh: Mesh, cfg: SimConfig,
                     mig_cap: int = 0, halo_cap: int = 0,
                     slack: float = 1.2, axis: str = AXIS,
                     q_block: int = 128):
    """Re-layout a single-device state into slow-axis slab ownership.

    Returns (sharded_state, S, mig_cap, halo_cap): a NEW state of capacity
    D*S whose rows live on their owning device (locally hash-sorted),
    padded with inactive rows. Capacities are auto-sized from the initial
    distribution with `slack` headroom when not given. S is rounded up to
    a multiple of `q_block` (the fused kernels' program block).

    Sizing policy (round 5): S = max slab occupancy * slack + 2*mig_cap,
    mig_cap = one boundary plane's occupancy * 1.25 (the CFL bound — see
    below). slack=1.2 trades the round-4 1.70x padded-row rent for a
    tighter fit; occupancy GROWTH past it surfaces through the step's
    overflow counter, on which the host re-shards elastically (the same
    recovery pattern as run_protocol's regrow — overflow never corrupts,
    it only reports)."""
    d = mesh.devices.size
    sb = slab_bounds(cfg, d)
    fa, ma, _sa = hash_axis_perm(cfg)
    gplane = cfg.grid_size[fa] * cfg.grid_size[ma]
    gs = cfg.grid_size[_sa]
    ids = np.asarray(_hash_ids(state.pos, state.active, cfg))
    order = np.argsort(ids, kind="stable")
    ids_s = ids[order]
    starts = np.searchsorted(ids_s, sb.astype(np.int64) * gplane)
    n_act = int(np.searchsorted(ids_s, cfg.num_cells))
    counts = np.diff(np.append(starts[:-1], n_act))
    # occupancy of each slow-axis cell plane: sizes both exchange caps
    plane = np.maximum(ids_s[:n_act] // gplane, 0)
    plane_counts = np.bincount(plane.astype(np.int64), minlength=gs)
    if not mig_cap:
        # CFL bound (round 5): a particle moves less than one cell per step
        # (cfg.time_delta sizing; SURVEY §7), so only rows currently in a
        # slab's boundary plane can leave it before the next sort — ONE
        # plane's max occupancy (plus headroom) bounds per-direction
        # migration. The round-4 default (10% of the slab) was ~10x larger
        # and its 2*mig_cap term dominated the padded-row capacity.
        mig_cap = max(128, int(-(-int(plane_counts.max() * 1.25)
                                 // 128) * 128))
    if not halo_cap:
        # max particles in any single boundary slow-plane, with slack
        halo_cap = int(-(-int(plane_counts.max() * slack) // 128) * 128)
    align = max(128, q_block)
    s_cap = int(-(-int(counts.max() * slack + 2 * mig_cap) // align)
                * align)

    leaves = jax.tree_util.tree_leaves(state)
    cap = state.capacity

    def slab(arr):
        arr = np.asarray(arr)
        if arr.ndim == 0 or arr.shape[0] != cap:
            return jnp.asarray(arr)
        out = np.zeros((d * s_cap,) + arr.shape[1:], dtype=arr.dtype)
        for k in range(d):
            rows = order[starts[k]:min(starts[k + 1], n_act)] \
                if k < d - 1 else order[starts[k]:n_act]
            seg = arr[rows]
            out[k * s_cap:k * s_cap + len(seg)] = seg
            if arr.dtype == np.float32 and arr.ndim == 2:
                # park padded positions far outside the grid
                out[k * s_cap + len(seg):(k + 1) * s_cap] = \
                    4.0 * max(cfg.world_size)
        return jnp.asarray(out)

    new = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(state), [slab(x) for x in leaves])
    # active mask: only the copied rows
    act = np.zeros((d * s_cap,), bool)
    for k in range(d):
        hi = min(starts[k + 1], n_act) if k < d - 1 else n_act
        act[k * s_cap:k * s_cap + (hi - starts[k])] = True
    actj = jnp.asarray(act)
    # padded lanes must keep nonzero mass / rest density like init_fluid's
    # padding (a zero mass turns g*dt/m into inf, which masked products
    # would then turn into NaN)
    new = new.replace(
        active=actj, is_stim_on=state.is_stim_on,
        mass=jnp.where(actj, new.mass, cfg.particle_mass),
        dens=jnp.where(actj, new.dens, cfg.stand_density))
    spec = state_pspec(axis)
    new = jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), new, spec)
    return new, s_cap, mig_cap, halo_cap


def _shift(x, axis, direction, n_devices):
    """ppermute by one slab; edge devices receive zeros."""
    perm = [(k, k + direction) for k in range(n_devices)
            if 0 <= k + direction < n_devices]
    return jax.lax.ppermute(x, axis, perm)


def _halo_body(state: ParticleState, cfg: SimConfig, q_block: int,
               w_chunk: int, sub_q: int, mig_cap: int, halo_cap: int,
               n_devices: int, sm_inv, axis: str, params=None):
    # dynamic physics params (config.PARAM_FIELDS): same contract as
    # _step_fused_v4 — traced overrides ride into the sweep kernels as one
    # (1, 16) SMEM operand; slab geometry/capacities stay static cfg
    cfg_eff = resolve_params(cfg, params)
    dynp = build_dynp(cfg_eff) if params else None
    s_cap = state.pos.shape[0]
    fa, ma, _sa = hash_axis_perm(cfg)
    gf, gm = cfg.grid_size[fa], cfg.grid_size[ma]
    gplane = gf * gm
    sb = jnp.asarray(slab_bounds(cfg, n_devices), jnp.int32)
    d = jax.lax.axis_index(axis)
    my_lo = sb[d] * gplane
    my_hi = sb[d + 1] * gplane
    num_cells = cfg.num_cells

    # ---- 1+2. migration + ONE local sort (round-5 redesign) ----------------
    # The round-4 body argsorted + whole-state-permuted TWICE per step: once
    # to make emigrant rows contiguous for dynamic-slice packing, then again
    # after landing immigrants. Each permute was 19 separate narrow row
    # gathers, and on TPU gathers pay ~per-ROW issue cost regardless of row
    # width (the v5 packed-slab measurements, DEVELOPMENT.md), so 38 narrow
    # gathers + 2 argsorts dominated the slab rent at the 1M tier. The
    # redesign: emigrant identification is elementwise on the hash, packing
    # is a cumsum-rank scatter into the fixed (mig_cap, C) buffer (no sorted
    # order needed), and ONE argsort over the merged (S + 2M) rows restores
    # the slab-sorted layout with ONE wide (S+2M, 20)-column matrix gather —
    # the carried fields travel as columns of a single matrix, exactly like
    # the migration pack itself.
    ids = _hash_ids(state.pos, state.active, cfg)
    # inactive rows hash to the num_cells sentinel: never left-emigrants,
    # excluded from the right test explicitly
    left_flag = ids < my_lo
    right_flag = (ids >= my_hi) & (ids < num_cells)
    count_lo = jnp.sum(left_flag.astype(jnp.int32))
    count_hi = jnp.sum(right_flag.astype(jnp.int32))
    overflow = jnp.maximum(count_lo - mig_cap, 0) \
        + jnp.maximum(count_hi - mig_cap, 0)

    mig_fields = ("pos", "vel", "orig_pos", "goal_pos", "mass", "dens",
                  "vm", "iion", "stim", "w")
    cols = [getattr(state, f) for f in mig_fields]
    cols = [c[:, None] if c.ndim == 1 else c for c in cols]
    core_valid = state.active & ~left_flag & ~right_flag
    mat = jnp.concatenate(
        cols + [state.fixed[:, None].astype(jnp.float32),
                core_valid.astype(jnp.float32)[:, None]], axis=1)

    def pack(flag):
        """Compact flagged rows to the head of a (mig_cap, C) buffer:
        cumsum ranks + one scatter (rows past mig_cap land on the dump row
        and are counted by the overflow above); the valid column marks the
        first min(count, mig_cap) rows for the receiver."""
        rank = jnp.cumsum(flag.astype(jnp.int32)) - 1
        idx = jnp.where(flag & (rank < mig_cap), rank, mig_cap)
        buf = jnp.zeros((mig_cap + 1, mat.shape[1]), mat.dtype)
        buf = buf.at[idx].set(mat)[:mig_cap]
        cnt = jnp.sum(flag.astype(jnp.int32))
        valid = jnp.arange(mig_cap, dtype=jnp.int32) < cnt
        return buf.at[:, -1].set(valid.astype(jnp.float32))

    left_out = pack(left_flag)
    right_out = pack(right_flag)
    left_in = _shift(right_out, axis, +1, n_devices)   # from d-1's tail
    right_in = _shift(left_out, axis, -1, n_devices)   # from d+1's head

    # land immigrants: merge (S + 2M) rows, sort ONCE, keep the first S
    merged = jnp.concatenate([mat, left_in, right_in], axis=0)
    ids2 = _hash_ids(merged[:, 0:3], merged[:, -1] > 0.5, cfg)
    order2 = jnp.argsort(ids2, stable=True).astype(jnp.int32)[:s_cap]
    ids2_s = ids2[order2]
    # active rows beyond S are LOST: surface through the overflow counter
    overflow = overflow + jnp.maximum(
        jnp.sum((ids2 < num_cells).astype(jnp.int32)) - s_cap, 0)
    ms = merged[order2]                     # the ONE wide row gather
    actj = ms[:, -1] > 0.5
    parts = {}
    k = 0
    for f in mig_fields:
        w = 3 if getattr(state, f).ndim == 2 else 1
        parts[f] = ms[:, k:k + w] if w == 3 else ms[:, k]
        k += w
    zero1 = jnp.zeros((s_cap,), jnp.float32)
    zero3 = jnp.zeros((s_cap, 3), jnp.float32)
    state = ParticleState(
        pos=parts["pos"], vel=parts["vel"], predicted_vel=zero3,
        corrected_vel=zero3, inter_vel=zero3, acc=zero3,
        orig_pos=parts["orig_pos"], goal_pos=parts["goal_pos"],
        # padding rows keep nonzero mass / rest density (the shard-time
        # invariant: zero mass turns dt/m into inf upstream of masking)
        mass=jnp.where(actj, parts["mass"], cfg.particle_mass),
        dens=jnp.where(actj, parts["dens"], cfg.stand_density),
        pres=zero1, vm=parts["vm"], inter_vm=zero1, iion=parts["iion"],
        stim=parts["stim"], w=parts["w"], fixed=ms[:, -2] > 0.5,
        active=actj, is_stim_on=state.is_stim_on)

    # ---- 3. shape matching (global psums) ---------------------------------
    # the hoisted invariants' per-row members must follow the migrated rows
    sm_inv = sm_rebind_rows(sm_inv, state, cfg)
    state = corrected_velocity(state, cfg_eff, axis_name=axis, sm_inv=sm_inv)

    # ---- 4. sweep A with one boundary-plane halo exchange -----------------
    act_end2 = jnp.searchsorted(ids2_s, num_cells).astype(jnp.int32)
    # xyz3 stencil features from the permuted hash: cx = fast-axis cell
    # coord (sentinel on dead rows), cyz = mid + Gm*slow combined coord
    # (pallas_sweeps.sweep_bookkeeping3 contract)
    live = ids2_s < num_cells
    cx = jnp.where(live, (ids2_s % gf).astype(jnp.float32),
                   jnp.float32(_SENTINEL))
    cyz = jnp.where(live, (ids2_s // gf).astype(jnp.float32), 0.0)
    # QM_A column contract: ops/fused_step.build_qm_feats (per-shard
    # rows here, so the arrays are sliced differently)
    fields = jnp.concatenate([
        state.pos, state.corrected_vel, state.mass[:, None],
        state.dens[:, None], state.vm[:, None], state.stim[:, None],
        state.iion[:, None], state.w[:, None], cx[:, None], cyz[:, None],
        jnp.zeros((s_cap, 2), jnp.float32)], axis=1)        # QM_A layout

    def exchange_halo(mat, ids_col):
        """Send my first/last boundary rows to my neighbors; return the
        (halo_cap, C) blocks to prepend/append, with id columns kept
        monotone (invalid lead/tail rows clamp onto the plane edges and
        carry sentinel hashes, so the stencil test ignores them)."""
        head = jax.lax.dynamic_slice(mat, (0, 0), (halo_cap, mat.shape[1]))
        tail_lo = jnp.maximum(act_end2 - halo_cap, 0)
        tail = jax.lax.dynamic_slice(mat, (tail_lo, 0),
                                     (halo_cap, mat.shape[1]))
        hiota = jnp.arange(halo_cap, dtype=jnp.int32)
        # invalid rows carry sentinel FEATURE hashes already (the stencil
        # test ignores them); only their id column must keep the receiver's
        # merged id array sorted. Head rows beyond my active set clamp UP
        # to num_cells (receiver appends); tail rows beyond it clamp DOWN
        # to my_hi - 1 == receiver's lo - 1 (receiver prepends).
        head_ok = hiota < act_end2
        head_ids = jnp.where(head_ok, ids_col[:halo_cap], num_cells)
        tail_ids_raw = jax.lax.dynamic_slice(ids_col, (tail_lo,),
                                             (halo_cap,))
        tail_ok = hiota < act_end2 - tail_lo
        tail_ids = jnp.where(tail_ok, jnp.minimum(tail_ids_raw, my_hi - 1),
                             my_hi - 1)
        # the int32 id column rides the float matrix through ppermute as a
        # BITCAST (not a value cast): ids can reach num_cells, which passes
        # 2^24 around ~12.3M-cell worlds — a value round-trip through f32
        # would silently collide adjacent planes' ids there and corrupt the
        # merged window bounds with overflow == 0
        bc_f = lambda i: jax.lax.bitcast_convert_type(i, jnp.float32)
        bc_i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        left_halo = _shift(jnp.concatenate(
            [tail, bc_f(tail_ids)[:, None]], axis=1),
            axis, +1, n_devices)                            # from d-1
        right_halo = _shift(jnp.concatenate(
            [head, bc_f(head_ids)[:, None]], axis=1),
            axis, -1, n_devices)                            # from d+1
        # edge devices receive zeros: mark those ids inert
        l_ids = jnp.where(d > 0, bc_i(left_halo[:, -1]), 0)
        r_ids = jnp.where(d < n_devices - 1,
                          bc_i(right_halo[:, -1]), num_cells)
        l_mat = jnp.where(d > 0, left_halo[:, :-1], _SENTINEL)
        r_mat = jnp.where(d < n_devices - 1, right_halo[:, :-1], _SENTINEL)
        return l_mat, l_ids, r_mat, r_ids

    l_mat, l_ids, r_mat, r_ids = exchange_halo(fields, ids2_s)
    # window ids must be GLOBALLY sorted across [left halo | core | right
    # halo]: clamp the core's inactive sentinel ids (num_cells, which would
    # sort AFTER the right halo's >= my_hi ids) down to my_hi - 1. Their
    # feature hash stays the sentinel, so the stencil test still ignores
    # them — the clamp only affects the CANDIDATE-side window bounds.
    win_ids = jnp.where(ids2_s < num_cells, ids2_s, my_hi - 1)
    merged_ids = jnp.concatenate([l_ids, win_ids, r_ids])
    # QUERY-side probe ids are a separate array, so padding rows need no
    # clamp: pure-padding sub-blocks probe far past every real plane and
    # get EMPTY windows (clipped probes land at num_cells, whose first
    # merged occurrence is past all real and clamped-padding candidates)
    # instead of sweeping real last-plane windows every step — the clamp
    # bloat VERDICT r3 flagged. Only the one sub-block straddling the
    # active/padding boundary keeps a window reaching the array's end.
    probe_ids = jnp.where(ids2_s < num_cells, ids2_s,
                          jnp.int32(num_cells + 2 * gplane))
    # halo feature matrices already carry sentinel hashes on every row the
    # receiver must ignore (inactive senders' rows; edge devices get a
    # whole-sentinel block), so no fix-up pass is needed here
    merged_fs = jnp.concatenate([l_mat, fields, r_mat], axis=0)

    overflow = overflow + _plane_overflow(ids2_s, act_end2, my_lo, my_hi,
                                          gplane, halo_cap, d, n_devices)

    blk_lo, blk_hi = _window_bounds3(probe_ids, merged_ids, cfg, sub_q)

    # sweep-A inert-lane contract: single shared implementation (dead rows
    # here = inactive core padding, invalid exchanged halo rows, edge
    # devices' all-sentinel blocks — all carry the cx sentinel)
    feats_a = feats_a_from_fs(merged_fs)
    out_a = sweep_a3(fields, feats_a, blk_lo, blk_hi, q_block, w_chunk,
                     cfg, sub_q=sub_q, stencil="xyz3", dynp=dynp)

    # ---- 5. sweep B with the second halo exchange -------------------------
    la, li, ra, ri = exchange_halo(out_a, ids2_s)
    merged_a = jnp.concatenate([la, out_a, ra], axis=0)
    vol_now = jnp.where(merged_a[:, 8] > 0.0,
                        merged_a[:, 10] / merged_a[:, 8], 0.0)
    feats_b = feats_from_out_a(merged_a, vol_now)
    out_b = sweep_b3(out_a, feats_b, blk_lo, blk_hi, q_block, w_chunk,
                     cfg, sub_q=sub_q, stencil="xyz3", dynp=dynp)

    # ---- 6. final state (device-sorted layout, no unsort) -----------------
    state = apply_out_fused(state, out_a, out_b)
    # overflow sums three failure modes across the mesh: emigrants beyond
    # mig_cap, active rows beyond the slab capacity, boundary-plane rows
    # beyond halo_cap (non-edge devices only)
    return state, jax.lax.psum(overflow, axis)


def _plane_overflow(ids_s, act_end, my_lo, my_hi, gplane, halo_cap, d,
                    n_devices):
    """Count boundary-plane rows beyond the halo capacity.

    Edge devices have no partner for their outer plane (device 0 never
    sends its first plane left, device D-1 never sends its last plane
    right), so those planes are excluded — counting them produced spurious
    overflow for exchanges that do not exist."""
    first_plane_end = jnp.searchsorted(ids_s,
                                       my_lo + gplane).astype(jnp.int32)
    last_plane_start = jnp.searchsorted(ids_s,
                                        my_hi - gplane).astype(jnp.int32)
    n_first = jnp.minimum(first_plane_end, act_end)
    n_last = act_end - jnp.minimum(last_plane_start, act_end)
    ovf_first = jnp.where(d > 0, jnp.maximum(n_first - halo_cap, 0), 0)
    ovf_last = jnp.where(d < n_devices - 1,
                         jnp.maximum(n_last - halo_cap, 0), 0)
    return ovf_first + ovf_last


def _window_bounds3(core_ids, merged_ids, cfg: SimConfig, sub_q: int):
    """Per-sub-block merged slow-plane candidate windows into the merged
    array (the local equivalent of pallas_sweeps.sweep_bookkeeping3's
    searchsorted step: three windows per sub-block, one per slow offset,
    each dilated +-(Gf + 1) to cover the full 3x3 (fast, mid) footprint)."""
    fa, ma, _sa = hash_axis_perm(cfg)
    gf, gm = cfg.grid_size[fa], cfg.grid_size[ma]
    num_cells = cfg.num_cells
    n = core_ids.shape[0]
    b = n // sub_q
    h_lo = core_ids[::sub_q][:b]
    h_hi = core_ids[sub_q - 1::sub_q][:b]
    dvec = jnp.asarray(np.array([-1, 0, 1], np.int32) * (gf * gm))
    blo = jnp.clip(h_lo[:, None] + dvec[None, :] - (gf + 1), 0, num_cells)
    bhi = jnp.clip(h_hi[:, None] + dvec[None, :] + (gf + 2), 0, num_cells)
    lo = jnp.searchsorted(merged_ids, blo).astype(jnp.int32)
    hi = jnp.searchsorted(merged_ids, bhi).astype(jnp.int32)
    flat4 = lambda a: jnp.pad(a, ((0, 0), (0, 1))).reshape(-1)
    return flat4(lo), flat4(hi)


def unshard_state_halo(state: ParticleState, num_particles: int,
                       cfg: SimConfig,
                       pad_to: int | None = None,
                       allow_loss: bool = False) -> ParticleState:
    """Gather a halo-sharded state back into a dense single-device state.

    Halo states are slab re-layouts with interleaved inactive padding and
    freely-migrated row order; this compacts the active rows (device-major
    order, i.e. globally slab-sorted — deterministic) into rows [0, n) of
    a fresh lane-aligned state padded exactly like state.init_fluid, so
    checkpoints, renders and trajectory dumps read it like any
    single-device state. Host-side (persistence path, not the hot loop).

    The reference keeps no global particle index either (particle identity
    lives in the per-particle fields, Particle.h:7-35), so 'original CSV
    order' is not recoverable — nor needed: every consumer treats rows as
    an unordered particle set.
    """
    act = np.asarray(state.active)
    idx = np.nonzero(act)[0]
    n = int(idx.size)
    if n != num_particles:
        # a lossy state must never silently become a resumable checkpoint;
        # lossy RENDERS are still useful, so callers on view-only paths
        # pass allow_loss=True (and get a stderr warning instead)
        msg = (f"unshard_state_halo: expected {num_particles} active "
               f"particles, state has {n} (capacity overflow loss)")
        if not allow_loss:
            raise ValueError(msg)
        import sys
        print(msg, file=sys.stderr, flush=True)
    cap = pad_to or ((max(n, 1) + 127) // 128) * 128
    if cap < n:
        raise ValueError(f"pad_to={cap} < active rows {n}")
    far = 4.0 * max(cfg.world_size)

    def compact(arr, fill=0.0):
        arr = np.asarray(arr)
        if arr.ndim == 0 or arr.shape[0] != act.shape[0]:
            return jnp.asarray(arr)
        out = np.full((cap,) + arr.shape[1:], fill, dtype=arr.dtype)
        out[:n] = arr[idx]
        return jnp.asarray(out)

    new = ParticleState(
        pos=compact(state.pos, far), vel=compact(state.vel),
        predicted_vel=compact(state.predicted_vel),
        corrected_vel=compact(state.corrected_vel),
        inter_vel=compact(state.inter_vel), acc=compact(state.acc),
        orig_pos=compact(state.orig_pos, far),
        goal_pos=compact(state.goal_pos, far),
        mass=compact(state.mass, cfg.particle_mass),
        dens=compact(state.dens, cfg.stand_density),
        pres=compact(state.pres), vm=compact(state.vm),
        inter_vm=compact(state.inter_vm), iion=compact(state.iion),
        stim=compact(state.stim), w=compact(state.w),
        fixed=compact(state.fixed, False), active=compact(state.active,
                                                          False),
        is_stim_on=jnp.asarray(np.asarray(state.is_stim_on)))
    return new


def make_halo_step(mesh: Mesh, cfg: SimConfig, mig_cap: int, halo_cap: int,
                   q_block: int = 128, w_chunk: int = 128, sub_q: int = 128,
                   axis: str = AXIS, dynamic_params: bool = False):
    """Build the jitted halo-exchange step: state -> (state, overflow).

    The per-device capacity (state.capacity / n_devices) must be a
    multiple of q_block. State must come from shard_state_halo.
    With dynamic_params=True the returned fn is (state, params) ->
    (state, i32): params is a dict of replicated traced physics-constant
    overrides (config.PARAM_FIELDS), riding into the sweep kernels as the
    same SMEM operand the single-chip and gather-sharded v4 paths use —
    one compiled halo program serves every parameter value.
    """
    n_devices = mesh.devices.size

    def impl(state, params=None):
        sm_inv = sm_invariants(state, cfg, axis_name=axis)
        return _halo_body(state, cfg, q_block, w_chunk, sub_q, mig_cap,
                          halo_cap, n_devices, sm_inv, axis, params=params)

    return _wrap_sharded(impl, mesh, axis, dynamic_params, check_vma=False)


def make_halo_simulate(mesh: Mesh, cfg: SimConfig, mig_cap: int,
                       halo_cap: int, num_steps: int,
                       stim_off_step: int = -1, q_block: int = 128,
                       w_chunk: int = 128, sub_q: int = 128,
                       axis: str = AXIS, dynamic_params: bool = False):
    """N halo-exchange steps under lax.scan with the reference stim-off
    protocol; SM rest-shape moments hoisted out of the scan (they are
    migration-invariant: psums are permutation-independent). With
    dynamic_params=True the returned fn is (state, params) -> (state, i32)
    — see make_halo_step."""
    n_devices = mesh.devices.size

    def impl(state, params=None):
        sm_inv = sm_invariants(state, cfg, axis_name=axis)

        def body(carry, i):
            st, ovf = carry
            if stim_off_step >= 0:
                st = jax.lax.cond(i == stim_off_step,
                                  lambda s: turn_off_stim(s, cfg),
                                  lambda s: s, st)
            st, o = _halo_body(st, cfg, q_block, w_chunk, sub_q, mig_cap,
                               halo_cap, n_devices, sm_inv, axis,
                               params=params)
            return (st, jnp.maximum(ovf, o)), None

        (state, overflow), _ = jax.lax.scan(
            body, (state, jnp.asarray(0, jnp.int32)),
            jnp.arange(num_steps))
        return state, overflow

    return _wrap_sharded(impl, mesh, axis, dynamic_params, check_vma=False)
