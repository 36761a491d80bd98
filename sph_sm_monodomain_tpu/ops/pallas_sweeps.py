"""Fused Pallas TPU kernels for the SPH neighbor sweeps.

The performance core of the framework (SURVEY.md §7.6): the three neighbor
phases of the reference (calculate_intermediate_velocity cpp:669-701,
Compute_Density_SingPressure cpp:448-513, Compute_Force cpp:515-573) fused
into TWO VMEM-resident sweeps over cell-sorted particle data:

  sweep A: XSPH partial velocity + density summation (one pair-geometry
           pass serves both; XSPH uses last step's densities via
           precomputed neighbor volumes, matching the reference phase order)
  sweep B: pressure + viscosity accelerations + monodomain Vm Laplacian

Why this maps well to the hardware:
  - particles are sorted by cell hash; with hash = x + Gx*(y + Gy*z)
    (cpp:142) a block of Q consecutive sorted queries spans a CONTIGUOUS
    hash interval, and each of the 9 (dy,dz) stencil offsets maps it to
    another contiguous interval -> every (block, run) candidate set is ONE
    contiguous row range of the sorted arrays. The kernel reads dense
    (16, W) windows with dynamic slices — no gathers, no scatters.
  - candidate features live as (16, N): N on the 128-lane axis, so VMEM /
    HBM hold them unpadded (a (N, 16) layout would lane-pad 8x).
  - pair geometry (dx, r^2, kernel weights) is exact fp32 on the VPU;
    weighted neighbor sums are (Q, W) x (W, 3) contractions on the MXU at
    HIGHEST precision.
  - per-query run bounds make superset windows exact: candidates outside a
    query's own 3-x-cell run are masked, so results equal the reference's
    27-cell stencil sums.

Coverage is EXACT for any density distribution: each (block, run) window is
swept in fixed-width lane-aligned chunks with a dynamic trip count, so no
candidate is ever truncated and VMEM stays bounded. Outputs are in sorted
order; the caller permutes back with the inverse permutation. Candidate
arrays larger than VMEM_FEATS_LIMIT_BYTES stay in HBM and each chunk is
DMA'd into a VMEM scratch buffer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig

_PAIR_EPS = 1e-12  # INF guard, SPH_SM_monodomain.h:24
# candidate arrays larger than this live in HBM with per-chunk DMA
VMEM_FEATS_LIMIT_BYTES = 4 * 2 ** 20
_HI = jax.lax.Precision.HIGHEST


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Bookkeeping (XLA, scatter-free)
# ---------------------------------------------------------------------------

# (dy, dz) run offsets, z-major like the reference stencil loop (cpp:462-464)
_RUN_OFFSETS = np.array([(dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1)],
                        dtype=np.int32)




# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------




# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _slice_rows(arr, offset, count):
    """dynamic_slice rows [offset, offset+count) (offset may be traced)."""
    return jax.lax.dynamic_slice(arr, (offset, 0), (count, arr.shape[1]))


# ---------------------------------------------------------------------------
# v2: lean bookkeeping + coordinate-mask kernels
# ---------------------------------------------------------------------------
#
# Differences from the v1 path above (measured on v5e, see DEVELOPMENT.md):
#   - window bounds are computed per SUB-BLOCK (tight) by direct binary
#     search into the sorted cell ids — no 55k-cell start table, no per-query
#     (N, 16) bound arrays;
#   - the kernel masks candidates with the in-kernel stencil test
#     |hash_q - hash_c - d_r| <= 1 on the linear cell hash ALONE (one f32
#     feature; hashes < 2^17 are exact in f32) — run windows are NOT
#     clamped disjoint (a pair passes under at most one run offset, so
#     overlap cannot double-count; see sweep_bookkeeping2). The
#     hash test admits x/y/z-boundary wrap pairs that the reference's
#     per-axis clamped stencil excludes (cpp:462-481), but every such pair
#     is >= one world edge minus two cells apart — far outside all kernel
#     supports (2h max), so its contribution is exactly 0 and the sums
#     still equal the reference's 27-cell stencil;
#   - neighbor sums accumulate lane-wise into (sub_q, Wc) VMEM accumulators
#     (chunks alias into the same columns) with ONE horizontal reduction per
#     sub-block — no per-chunk MXU contraction or VPU reduce.

_COORD_SENTINEL = -1048576.0  # marks out-of-grid / inactive particles


def sweep_bookkeeping2(pos: jax.Array, active: jax.Array, cfg: SimConfig,
                       win_block: int):
    """Sort + per-sub-block window bookkeeping for the v2/v3 sweeps.

    Returns (order, inv, blk_lo, blk_hi, chash):
      order (N,)      sorted-row -> original index
      inv (N,)        original -> sorted-row
      blk_lo (B*16,)  per-sub-block window start rows (9 used of each 16)
      blk_hi (B*16,)  per-sub-block window end rows (iteration bounds
                      only — the in-kernel stencil test is the exact mask
                      and accepts each pair under at most one run)
      chash (N,)      f32 linear cell hash in ORIGINAL order, sentinel for
                      out-of-grid / inactive lanes (feeds the in-kernel
                      stencil mask)
    """
    n = pos.shape[0]
    gx, gy, gz = cfg.grid_size
    num_cells = cfg.num_cells

    coords = (pos / cfg.cell_size).astype(jnp.int32)
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    inside = ((x >= 0) & (x < gx) & (y >= 0) & (y < gy)
              & (z >= 0) & (z < gz))
    valid = inside & active
    ids = jnp.where(valid, x + gx * (y + gy * z), num_cells)
    iota = jnp.arange(n, dtype=jnp.int32)
    if n <= 32768 and num_cells < 65536:
        # single-operand sort of (id << 15 | index): faster than a variadic
        # argsort and stable by construction
        comb = jnp.sort(ids * 32768 + iota)
        order = comb & 32767
        sorted_ids = comb >> 15
    else:
        order = jnp.argsort(ids, stable=True).astype(jnp.int32)
        sorted_ids = ids[order]
    inv = jnp.zeros((n,), jnp.int32).at[order].set(iota,
                                                   unique_indices=True)

    b = n // win_block
    h_lo = sorted_ids[::win_block][:b]
    h_hi = sorted_ids[win_block - 1::win_block][:b]
    d = jnp.asarray(gx * (_RUN_OFFSETS[:, 0] + gy * _RUN_OFFSETS[:, 1]))
    blo = jnp.clip(h_lo[:, None] + d[None, :] - 1, 0, num_cells)
    bhi = jnp.clip(h_hi[:, None] + d[None, :] + 2, 0, num_cells)
    lo = jnp.searchsorted(sorted_ids, blo).astype(jnp.int32)
    hi = jnp.searchsorted(sorted_ids, bhi).astype(jnp.int32)
    # overlapping run windows (sparse blocks spanning >= Gx cells) cannot
    # double-count: the per-run stencil test |hash_q + d_r - hash_c| <= 1
    # accepts a pair under AT MOST ONE run offset (offsets differ by >= Gx
    # > 2), so windows are pure iteration bounds and need no clamping

    chash = jnp.where(valid, ids.astype(jnp.float32),
                      jnp.float32(_COORD_SENTINEL))
    # FLAT (B*16,) layout: 2-D scalar-prefetch operands are lane-padded to
    # 128 columns in SMEM (8x waste blew the 1 MB budget at sub_q=16)
    flat16 = lambda a: jnp.pad(a, ((0, 0), (0, 16 - a.shape[1]))).reshape(-1)
    return order, inv, flat16(lo), flat16(hi), chash


def hash_axis_perm(cfg: SimConfig) -> tuple[int, int, int]:
    """(fast, mid, slow) axis indices for the v4 sort hash.

    The merged windows of fused_step._gather_loop4 span ~2*G_fast gap
    cells per sub-block, so the FAST axis must be the one with the
    smallest grid extent. Stable ascending sort keeps the reference's
    x-major order (cpp:142) for the standard cubic world and re-orders
    only stretched worlds (e.g. the x-replicated multi-muscle scenes,
    where x-major would put the 7*38-cell axis in the gap term)."""
    g = cfg.grid_size
    return tuple(sorted(range(3), key=lambda a: (g[a], a)))


def hash_cells_perm(pos: jax.Array, active: jax.Array, cfg: SimConfig):
    """Axis-permuted cell coordinates + linear sort hash — the SINGLE
    implementation shared by the v4/v5 sweep bookkeeping and the halo
    path's slab ownership/migration (parallel/halo_step): slab ownership
    and the window sort key must stay bit-identical or migrated rows land
    outside the windows that hash them.

    Returns (cf, cm, cs, valid, ids): per-axis cell coords in
    hash_axis_perm (fast, mid, slow) order, the in-grid & active mask, and
    ids = cf + Gf*(cm + Gm*cs) with a num_cells sentinel on invalid rows.
    """
    fa, ma, sa = hash_axis_perm(cfg)
    gf, gm = cfg.grid_size[fa], cfg.grid_size[ma]
    coords = (pos / cfg.cell_size).astype(jnp.int32)
    gxyz = jnp.asarray(cfg.grid_size)
    inside = jnp.all((coords >= 0) & (coords < gxyz[None, :]), axis=-1)
    valid = inside & active
    cf, cm, cs = coords[..., fa], coords[..., ma], coords[..., sa]
    ids = jnp.where(valid, cf + gf * (cm + gm * cs), cfg.num_cells)
    return cf, cm, cs, valid, ids


def sweep_bookkeeping3(pos: jax.Array, active: jax.Array, cfg: SimConfig,
                       win_block: int):
    """Sort + merged slow-plane window bookkeeping for the v4 sweeps
    (fused_step._gather_loop4).

    Like sweep_bookkeeping2, but each sub-block gets THREE windows (one per
    slow-axis offset) covering the full 3x3 (fast, mid) footprint of its
    hash interval in that plane, and the stencil features are the exact
    cell coordinates instead of the linear hash. Axes are permuted so the
    smallest grid extent is the fast hash axis (hash_axis_perm).

    Returns (order, inv, blk_lo (B*4,), blk_hi (B*4,), cx (N,), cyz (N,)):
      blk_lo/hi     window rows per sub-block, 3 used of each 4 (flat SMEM
                    layout, see sweep_bookkeeping2)
      cx (N,)       f32 fast-axis cell coordinate, ORIGINAL order; sentinel
                    on out-of-grid / inactive lanes
      cyz (N,)      f32 combined mid + G_mid*slow cell coordinate (< the
                    cell count < 2^21, exact in f32), ORIGINAL order
    """
    n = pos.shape[0]
    num_cells = cfg.num_cells
    fa, ma, sa = hash_axis_perm(cfg)
    gf, gm = cfg.grid_size[fa], cfg.grid_size[ma]

    cf, cm, cs, valid, ids = hash_cells_perm(pos, active, cfg)
    iota = jnp.arange(n, dtype=jnp.int32)
    if n <= 32768 and num_cells < 65536:
        comb = jnp.sort(ids * 32768 + iota)
        order = comb & 32767
        sorted_ids = comb >> 15
    else:
        order = jnp.argsort(ids, stable=True).astype(jnp.int32)
        sorted_ids = ids[order]
    inv = jnp.zeros((n,), jnp.int32).at[order].set(iota,
                                                   unique_indices=True)

    b = n // win_block
    h_lo = sorted_ids[::win_block][:b]
    h_hi = sorted_ids[win_block - 1::win_block][:b]
    # merged window per slow offset ds:
    #   [h_lo + ds*GfGm - Gf - 1, h_hi + ds*GfGm + Gf + 2)
    d = jnp.asarray(np.array([-1, 0, 1], np.int32) * (gf * gm))
    blo = jnp.clip(h_lo[:, None] + d[None, :] - (gf + 1), 0, num_cells)
    bhi = jnp.clip(h_hi[:, None] + d[None, :] + (gf + 2), 0, num_cells)
    lo = jnp.searchsorted(sorted_ids, blo).astype(jnp.int32)
    hi = jnp.searchsorted(sorted_ids, bhi).astype(jnp.int32)

    cx = jnp.where(valid, cf.astype(jnp.float32),
                   jnp.float32(_COORD_SENTINEL))
    cyz = jnp.where(valid, (cm + gm * cs).astype(jnp.float32), 0.0)
    flat4 = lambda a: jnp.pad(a, ((0, 0), (0, 1))).reshape(-1)
    return order, inv, flat4(lo), flat4(hi), cx, cyz


def sweep_bookkeeping5(pos: jax.Array, active: jax.Array, cfg: SimConfig,
                       sub_q: int, kb: int, w_chunk: int = 128):
    """Sort + per-sub-block PACKED candidate bookkeeping for the v5 sweeps.

    v5 eliminates the enumerated-lane waste of the merged v4 windows
    (~2.6x fewer tested pair slots on the biceps clouds): instead of
    sweeping wide superset windows of the sorted array, each sub-block of
    `sub_q` sorted queries gets the nine TIGHT dilated hash runs of its
    query span — [h_lo + off_r - 1, h_hi + off_r + 1] for the nine
    (dmid, dslow) stencil offsets off_r = gf*dm + gf*gm*ds — clamped
    mutually disjoint and left-packed into a private slab of `kb` slots.
    An XLA row-gather then materializes each slab's candidate features
    densely, so the kernel sweeps exactly the dilated union (plus slab
    padding), with no window setups and no alignment waste.

    Returns (order, inv, src, trips, overflow, cf, cm, cs):
      order/inv (N,)   sorted-row <-> original permutations
      src (B*kb,)      int32 SORTED-row index feeding each packed slot
                       (sentinel N for empty slots -> a zeroed feature row)
      trips (B,)       int32 per-block chunk trip counts for chunk width
                       `w_chunk` (ceil(min(total, kb)/w_chunk)) — MUST
                       match the w_chunk the sweep kernels run with, or
                       chunks past kb re-read (clamped ds) the last real
                       chunk and multi-count its contributions
      overflow ()      int32 total candidates dropped because a block's
                       dilated union exceeded kb (regrow kb and redo)
      cf/cm/cs (N,)    f32 per-axis cell coords in ORIGINAL order (fast,
                       mid, slow per hash_axis_perm); cf carries a
                       sentinel on out-of-grid / inactive lanes so such
                       queries and candidates never pass the mask
    """
    n = pos.shape[0]
    num_cells = cfg.num_cells
    fa, ma, sa = hash_axis_perm(cfg)
    gf, gm = cfg.grid_size[fa], cfg.grid_size[ma]
    if n % sub_q:
        raise ValueError(f"capacity {n} not divisible by sub_q={sub_q}")
    if kb % 128:
        raise ValueError(f"kb={kb} must be a multiple of the 128-lane "
                         "chunk width")
    if kb % w_chunk:
        raise ValueError(f"kb={kb} not divisible by w_chunk={w_chunk}")

    c_f, c_m, c_s, valid, ids = hash_cells_perm(pos, active, cfg)
    iota = jnp.arange(n, dtype=jnp.int32)
    if n <= 32768 and num_cells < 65536:
        comb = jnp.sort(ids * 32768 + iota)
        order = comb & 32767
        sorted_ids = comb >> 15
    else:
        order = jnp.argsort(ids, stable=True).astype(jnp.int32)
        sorted_ids = ids[order]
    inv = jnp.zeros((n,), jnp.int32).at[order].set(iota,
                                                   unique_indices=True)

    b = n // sub_q
    h_lo = sorted_ids[::sub_q][:b]
    h_hi = sorted_ids[sub_q - 1::sub_q][:b]
    offs = np.array([gf * dm + gf * gm * ds
                     for ds in (-1, 0, 1) for dm in (-1, 0, 1)], np.int32)
    d = jnp.asarray(offs)[None, :]                            # (1, 9)
    lo_h = jnp.clip(h_lo[:, None] + d - 1, 0, num_cells)
    hi_h = jnp.clip(h_hi[:, None] + d + 2, 0, num_cells)
    seg_s = jnp.searchsorted(sorted_ids, lo_h).astype(jnp.int32)
    seg_e = jnp.searchsorted(sorted_ids, hi_h).astype(jnp.int32)
    # segments are ordered by ascending offset; when a block's hash span
    # exceeds gf - 3 (sparse regions) consecutive dilated runs overlap —
    # clamp them disjoint so no candidate row is packed (and therefore
    # mask-accepted) twice. seg_e is non-decreasing in r, so only the
    # immediate predecessor can overlap.
    cols = [seg_s[:, 0]]
    for r in range(1, 9):
        cols.append(jnp.maximum(seg_s[:, r], seg_e[:, r - 1]))
    seg_s = jnp.stack(cols, axis=1)
    seg_len = jnp.maximum(seg_e - seg_s, 0)
    cum = jnp.cumsum(seg_len, axis=1)                         # (B, 9) incl.
    total = cum[:, -1]
    overflow = jnp.sum(jnp.maximum(total - kb, 0)).astype(jnp.int32)
    trips = jnp.clip((jnp.minimum(total, kb) + w_chunk - 1) // w_chunk,
                     1, kb // w_chunk)

    # packed slot k of block b holds sorted row seg_s[b, r] + (k - cum[b,
    # r-1]) where r is k's segment; loop the 9 segments instead of
    # materializing a (B, 9, kb) rank tensor (1M-particle scenes)
    k = jnp.arange(kb, dtype=jnp.int32)[None, :]              # (1, kb)
    src = jnp.full((b, kb), n, jnp.int32)
    start = jnp.zeros((b, 1), jnp.int32)
    for r in range(9):
        end = cum[:, r:r + 1]
        in_seg = (k >= start) & (k < end)
        src = jnp.where(in_seg, seg_s[:, r:r + 1] + (k - start), src)
        start = end
    return (order, inv, src.reshape(-1), trips, overflow,
            jnp.where(valid, c_f.astype(jnp.float32),
                      jnp.float32(_COORD_SENTINEL)),
            jnp.where(valid, c_m.astype(jnp.float32), 0.0),
            jnp.where(valid, c_s.astype(jnp.float32), 0.0))


def auto_sweep5_params(positions: np.ndarray, cfg: SimConfig,
                       headroom: float = 1.15,
                       sub_qs: tuple[int, ...] = (16, 32, 64)
                       ) -> tuple[int, int, int]:
    """(sub_q, kb, w_chunk) for the v5 packed sweeps. Host-side, once per
    scene: mirrors sweep_bookkeeping5's dilated-union construction over the
    initial cloud and picks the block granularity minimizing tested pair
    slots + packed-slab HBM traffic (the padding of kb = max block union
    is pure bandwidth; the per-block dynamic trip counts keep ALU at the
    true union)."""
    num_cells = cfg.num_cells
    fa, ma, sa = hash_axis_perm(cfg)
    gf, gm = cfg.grid_size[fa], cfg.grid_size[ma]
    coords = (np.asarray(positions) / cfg.cell_size).astype(np.int64)
    g = np.asarray(cfg.grid_size)
    inside = ((coords >= 0) & (coords < g[None, :])).all(1)
    ids = np.where(inside, coords[:, fa] + gf * (coords[:, ma]
                                                 + gm * coords[:, sa]),
                   num_cells)
    cap = ((len(ids) + 127) // 128) * 128
    s = np.full(cap, num_cells, np.int64)
    s[:len(ids)] = np.sort(ids)
    offs = np.array([gf * dm + gf * gm * ds
                     for ds in (-1, 0, 1) for dm in (-1, 0, 1)])
    best = None
    for sub_q in sub_qs:
        b = cap // sub_q
        h_lo = s[::sub_q][:b]
        h_hi = s[sub_q - 1::sub_q][:b]
        lo = np.searchsorted(s, np.clip(h_lo[:, None] + offs - 1,
                                        0, num_cells))
        hi = np.searchsorted(s, np.clip(h_hi[:, None] + offs + 2,
                                        0, num_cells))
        lo2 = lo.copy()
        for r in range(1, 9):
            lo2[:, r] = np.maximum(lo2[:, r], hi[:, r - 1])
        tot = np.maximum(hi - lo2, 0).sum(1)
        kb = max(int(np.ceil(tot.max() * headroom / 128)) * 128, 256)
        trips = np.maximum((tot + 127) // 128, 1)
        # cost in tested-pair-slot equivalents:
        #   ALU: tested slots = sum(trips)*Wc per query x sub_q queries
        #   + per-chunk fixed overhead (8 slot-equivalents, the
        #     auto_sweep4_params refit constant)
        #   + padded slab HBM traffic: the pool is written by the gather
        #     and read by the kernel (64 B/slot per sweep); v4 measures
        #     ~47 G tested slots/s against 819 GB/s HBM -> ~17 B per
        #     slot-equivalent, i.e. ~3.7 slot-equivalents per pool slot
        #     (independent of sub_q — smaller blocks mean MORE pool slots
        #     via the kb = max-union padding, which is the real tradeoff)
        cost = (trips * 128).sum() * sub_q + trips.sum() * 8 * sub_q \
            + int(3.7 * b * kb)
        if best is None or cost < best[0]:
            best = (cost, sub_q, kb)
    return best[1], best[2], 128


def auto_sweep4_params(positions: np.ndarray, cfg: SimConfig,
                       sub_q: int = 128) -> tuple[int, int]:
    """(sub_q, w_chunk) for the v4 sweeps (3 merged slow-plane windows per
    sub-block, fused_step._gather_loop4): minimize enumerated candidate
    lanes + a per-chunk overhead term over Wc in {128, 256, 384}.
    Host-side, once per scene."""
    num_cells = cfg.num_cells
    fa, ma, sa = hash_axis_perm(cfg)
    gf, gm = cfg.grid_size[fa], cfg.grid_size[ma]
    coords = (np.asarray(positions) / cfg.cell_size).astype(np.int64)
    g = np.asarray(cfg.grid_size)
    inside = ((coords >= 0) & (coords < g[None, :])).all(1)
    ids = np.where(inside, coords[:, fa] + gf * (coords[:, ma]
                                                 + gm * coords[:, sa]),
                   num_cells)
    s = np.sort(ids)
    n = len(s)
    b = max(n // sub_q, 1)
    h_lo = s[::sub_q][:b]
    h_hi = s[sub_q - 1::sub_q][:b]
    d = (np.array([-1, 0, 1], np.int64) * (gf * gm))[None, :]
    lo = np.searchsorted(s, np.clip(h_lo[:, None] + d - (gf + 1),
                                    0, num_cells))
    hi = np.searchsorted(s, np.clip(h_hi[:, None] + d + (gf + 2),
                                    0, num_cells))
    start = (lo // 128) * 128
    best = None
    for wc in (128, 256, 384):
        trips = np.maximum(0, -(-(hi - start) // wc))
        # chunk-lane count dominates: the kernels' accumulators are
        # (sub_q, Wc) tiles, so every padded lane costs full pair-op ALU
        # work, while per-chunk loop overhead is small (straight-lined
        # first chunk). 8 slot-equivalents/chunk refit from v5e A/B at
        # sub_q=128 (Wc=128: 2.55 ms vs Wc=256: 3.07 ms on biceps_full —
        # the old 40 constant mispicked 256 for the wider merged windows).
        cost = (trips * wc).sum() + trips.sum() * 8
        if best is None or cost < best[0]:
            best = (cost, wc)
    return sub_q, best[1]


def auto_block_window(positions: np.ndarray, cfg: SimConfig, q_block: int,
                      headroom: float = 1.0, minimum: int = 256) -> int:
    """Static chunk width Wc for the fused sweeps.

    With the dynamic-trip chunked windows, any Wc is CORRECT (coverage is
    exact); this just balances VPU efficiency (wide chunks) against padding
    waste on narrow windows. The median (block, run) window width at init,
    rounded to a lane multiple of 128 and clamped to [minimum, 512], works
    well (wider chunks never paid off in v5e measurements — the biceps
    clouds have median windows ~200). Host-side, once per scene.
    """
    gx, gy, gz = cfg.grid_size
    num_cells = cfg.num_cells
    coords = (np.asarray(positions) / cfg.cell_size).astype(np.int64)
    inside = ((coords >= 0).all(1) & (coords[:, 0] < gx)
              & (coords[:, 1] < gy) & (coords[:, 2] < gz))
    ids = np.where(inside, coords[:, 0] + gx * (coords[:, 1]
                                                + gy * coords[:, 2]),
                   num_cells)
    sorted_ids = np.sort(ids)
    n = len(sorted_ids)
    b = max(n // q_block, 1)
    h_lo = sorted_ids[::q_block][:b]
    h_hi = sorted_ids[q_block - 1::q_block][:b]
    d = (gx * (_RUN_OFFSETS[:, 0] + gy * _RUN_OFFSETS[:, 1]))[None, :]
    blo = np.clip(h_lo[:, None] + d - 1, 0, num_cells)
    bhi = np.clip(h_hi[:, None] + d + 2, 0, num_cells)
    widths = (np.searchsorted(sorted_ids, bhi)
              - np.searchsorted(sorted_ids, blo))
    med = float(np.median(widths)) * headroom if widths.size else minimum
    # measured on v5e: Wc=256 is optimal for the biceps clouds (median
    # window ~200); only very dense scenes warrant wider chunks
    w = int(np.clip(((med + 127) // 128) * 128, minimum, 512))
    return w
