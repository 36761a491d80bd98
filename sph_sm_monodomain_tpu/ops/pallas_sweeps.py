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


def sweep_bookkeeping(pos: jax.Array, active: jax.Array, cfg: SimConfig,
                      q_block: int):
    """Sort + window bookkeeping for the fused sweeps.

    Returns (order, inv, qstart, qend, blk_start, blk_len):
      order (N,)        sorted-row -> original index
      inv (N,)          original -> sorted-row
      qstart/qend (N,16) per-sorted-query exact run bounds (9 used columns)
      blk_start (B,16)  per-block candidate window starts (9 used columns)
      blk_len (B,16)    per-block candidate window lengths — the kernels
                        iterate ceil(len / w_chunk) fixed-width chunks, so
                        coverage is exact regardless of the static chunk
                        width (no overflow / truncation).
    """
    n = pos.shape[0]
    gx, gy, gz = cfg.grid_size
    num_cells = cfg.num_cells

    coords = (pos / cfg.cell_size).astype(jnp.int32)
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    inside = ((x >= 0) & (x < gx) & (y >= 0) & (y < gy)
              & (z >= 0) & (z < gz))
    ids0 = x + gx * (y + gy * z)
    ids = jnp.where(inside & active, ids0, num_cells)
    order = jnp.argsort(ids, stable=True).astype(jnp.int32)
    sorted_ids = ids[order]
    # inverse permutation via a unique-index scatter (cheaper than a second
    # sort)
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True)
    # first sorted row of every cell, scatter-free-search construction:
    # scatter each cell's run start (unique indices), then a reverse cummin
    # fills empty cells with the next occupied cell's start. All query /
    # block bounds below become cheap gathers from this table (binary
    # searches over 55k cells cost ~5ms on TPU; this is ~0.5ms).
    rows = jnp.arange(n, dtype=jnp.int32)
    is_run_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]])
    table = jnp.full((num_cells + 1,), n, jnp.int32)
    # non-run-starts target an out-of-bounds index and are dropped, so all
    # written indices are unique
    table = table.at[jnp.where(is_run_start, sorted_ids,
                               num_cells + 1)].set(
        rows, mode="drop", unique_indices=True)
    cell_start = jax.lax.associative_scan(jnp.minimum, table, reverse=True)

    # per-query exact run bounds (sorted space, queries in sorted order)
    cs = coords[order]
    cx, cy, cz = cs[..., 0], cs[..., 1], cs[..., 2]
    off = jnp.asarray(_RUN_OFFSETS)
    yy = cy[:, None] + off[None, :, 0]
    zz = cz[:, None] + off[None, :, 1]
    q_ok = (sorted_ids < num_cells)[:, None] & (yy >= 0) & (yy < gy) \
        & (zz >= 0) & (zz < gz)
    xlo = jnp.maximum(cx - 1, 0)
    xhi = jnp.minimum(cx + 1, gx - 1)
    lo_hash = xlo[:, None] + gx * (yy + gy * zz)
    hi_hash = xhi[:, None] + gx * (yy + gy * zz) + 1
    qstart = cell_start[jnp.where(q_ok, lo_hash, 0)]
    qend = cell_start[jnp.where(q_ok, hi_hash, 0)]
    qend = jnp.where(q_ok, qend, qstart)

    # per-block superset windows: the block's hash interval +- one x cell,
    # shifted by the run offset (always contiguous: the hash is linear)
    b = n // q_block
    h_lo = sorted_ids[::q_block][:b]                       # (B,)
    h_hi = sorted_ids[q_block - 1::q_block][:b]
    d = (gx * (off[:, 0] + gy * off[:, 1]))[None, :]       # (1, 9)
    blo = jnp.clip(h_lo[:, None] + d - 1, 0, num_cells)
    bhi = jnp.clip(h_hi[:, None] + d + 2, 0, num_cells)
    blk_start = cell_start[blo]
    blk_end = cell_start[bhi]
    # lane-align starts (Mosaic requires 128-multiple dynamic slices on the
    # lane dim); the per-query bounds mask the extra leading rows away
    blk_start = (blk_start // 128) * 128
    blk_len = blk_end - blk_start

    pad16 = lambda a: jnp.pad(a, ((0, 0), (0, 16 - a.shape[1])))
    return (order, inv, pad16(qstart), pad16(qend), pad16(blk_start),
            pad16(blk_len))


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------

def _dotT(a, b):
    """(Q, W) x (R, W) -> (Q, R) contraction over W, fp32 on the MXU."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               precision=_HI,
                               preferred_element_type=jnp.float32)


def _sweep_a_kernel(blk_start_ref, blk_len_ref, qm_ref, qs_ref, qe_ref,
                    feats_ref, out_ref, *scratch, cfg: SimConfig,
                    w_chunk: int, sub_q: int, hbm_feats: bool = False):
    """XSPH + density.

    qm cols: [x, y, z, cvx, cvy, cvz]; feats rows: [x, y, z, cvx, cvy, cvz,
    vol(prev), mass]. out cols: [dens, xsph_x, xsph_y, xsph_z, 0...].
    """
    bid = pl.program_id(0)
    q = qm_ref.shape[0]
    nsub = q // sub_q
    h2 = jnp.float32(cfg.kernel_h * cfg.kernel_h)
    p6c = jnp.float32(cfg.poly6_constant)
    wiota = jax.lax.broadcasted_iota(jnp.int32, (1, w_chunk), 1)

    for sb in range(nsub):
        lo = sb * sub_q
        qx = qm_ref[lo:lo + sub_q, 0:1]
        qy = qm_ref[lo:lo + sub_q, 1:2]
        qz = qm_ref[lo:lo + sub_q, 2:3]
        qcv = qm_ref[lo:lo + sub_q, 3:6]                    # (q', 3)

        dens = jnp.zeros((sub_q, 1), jnp.float32)
        xsph = jnp.zeros((sub_q, 3), jnp.float32)

        for r in range(9):
            start = pl.multiple_of(blk_start_ref[bid * nsub + sb, r], 128)
            trips = pl.cdiv(blk_len_ref[bid * nsub + sb, r], w_chunk)
            qs_r = qs_ref[lo:lo + sub_q, r:r + 1]
            qe_r = qe_ref[lo:lo + sub_q, r:r + 1]

            def chunk(c, carry, start=start, qs_r=qs_r, qe_r=qe_r,
                      qx=qx, qy=qy, qz=qz, qcv=qcv):
                d_acc, x_acc = carry
                off = pl.multiple_of(start + c * w_chunk, 128)
                if hbm_feats:
                    buf, sem = scratch
                    pltpu.make_async_copy(
                        feats_ref.at[:, pl.ds(off, w_chunk)], buf,
                        sem).start()
                    pltpu.make_async_copy(
                        feats_ref.at[:, pl.ds(off, w_chunk)], buf,
                        sem).wait()
                    cand = buf[:, :]                         # (16, Wc)
                else:
                    cand = feats_ref[:, pl.ds(off, w_chunk)]  # (16, Wc)
                rows = off + wiota                           # (1, Wc)
                m = (rows >= qs_r) & (rows < qe_r)
                dx = qx - cand[0:1, :]
                dy = qy - cand[1:2, :]
                dz = qz - cand[2:3, :]
                r2 = dx * dx + dy * dy + dz * dz             # (q', Wc)
                t = h2 - r2
                w6 = jnp.where(m & (r2 <= h2), p6c * t * t * t, 0.0)
                d_acc = d_acc + jnp.sum(w6 * cand[7:8, :], axis=1,
                                        keepdims=True)
                wv = w6 * cand[6:7, :]                       # * vol_j
                x_acc = x_acc + _dotT(wv, cand[3:6, :]) \
                    - jnp.sum(wv, axis=1, keepdims=True) * qcv
                return d_acc, x_acc

            dens, xsph = jax.lax.fori_loop(0, trips, chunk, (dens, xsph))

        out_ref[lo:lo + sub_q, 0:1] = dens
        out_ref[lo:lo + sub_q, 1:4] = xsph
        out_ref[lo:lo + sub_q, 4:8] = jnp.zeros((sub_q, 4), jnp.float32)


def _sweep_b_kernel(blk_start_ref, blk_len_ref, qm_ref, qs_ref, qe_ref,
                    feats_ref, out_ref, *scratch, cfg: SimConfig,
                    w_chunk: int, sub_q: int, hbm_feats: bool = False):
    """Force + Vm Laplacian.

    qm cols: [x, y, z, ivx, ivy, ivz, pres, vm]; feats rows: [x, y, z, ivx,
    ivy, ivz, vol, pres, vm]. out cols: [ax, ay, az, lap, 0...] (acc BEFORE
    the /dens_i of cpp:568, applied by the caller).
    """
    bid = pl.program_id(0)
    q = qm_ref.shape[0]
    nsub = q // sub_q
    h = jnp.float32(cfg.kernel_h)
    spiky_c = jnp.float32(cfg.spiky_constant)
    bs_c = jnp.float32(cfg.b_spline_constant)
    mu = jnp.float32(cfg.mu_viscosity)
    wiota = jax.lax.broadcasted_iota(jnp.int32, (1, w_chunk), 1)

    for sb in range(nsub):
      lo = sb * sub_q
      qpos = qm_ref[lo:lo + sub_q, 0:3]
      qx = qm_ref[lo:lo + sub_q, 0:1]
      qy = qm_ref[lo:lo + sub_q, 1:2]
      qz = qm_ref[lo:lo + sub_q, 2:3]
      qiv = qm_ref[lo:lo + sub_q, 3:6]
      qp = qm_ref[lo:lo + sub_q, 6:7]
      qvm = qm_ref[lo:lo + sub_q, 7:8]

      acc = jnp.zeros((sub_q, 3), jnp.float32)
      lap = jnp.zeros((sub_q, 1), jnp.float32)

      for r in range(9):
        start = pl.multiple_of(blk_start_ref[bid * nsub + sb, r], 128)
        trips = pl.cdiv(blk_len_ref[bid * nsub + sb, r], w_chunk)
        qs_r = qs_ref[lo:lo + sub_q, r:r + 1]
        qe_r = qe_ref[lo:lo + sub_q, r:r + 1]

        def chunk(c, carry, start=start, qs_r=qs_r, qe_r=qe_r,
                  qpos=qpos, qx=qx, qy=qy, qz=qz, qiv=qiv, qp=qp, qvm=qvm):
            a_acc, l_acc = carry
            off = pl.multiple_of(start + c * w_chunk, 128)
            if hbm_feats:
                buf, sem = scratch
                pltpu.make_async_copy(
                    feats_ref.at[:, pl.ds(off, w_chunk)], buf, sem).start()
                pltpu.make_async_copy(
                    feats_ref.at[:, pl.ds(off, w_chunk)], buf, sem).wait()
                cand = buf[:, :]                             # (16, Wc)
            else:
                cand = feats_ref[:, pl.ds(off, w_chunk)]     # (16, Wc)
            rows = off + wiota
            m = (rows >= qs_r) & (rows < qe_r)
            dx = qx - cand[0:1, :]
            dy = qy - cand[1:2, :]
            dz = qz - cand[2:3, :]
            r2 = dx * dx + dy * dy + dz * dz
            pair = m & (r2 > _PAIR_EPS)                      # cpp:546
            rr = jnp.sqrt(jnp.where(pair, r2, 1.0))
            inv_rr = 1.0 / rr
            vol_j = cand[6:7, :]

            # spiky/visco share support [0, h] and the (h - r) factor:
            # common = vol * c * (h - r) masked once
            hr = h - rr
            common = jnp.where(pair & (rr <= h),
                               vol_j * (spiky_c * hr), 0.0)

            # pressure (cpp:550-554): acc -= d*vol*(p_i+p_j)/2*Spiky(r)/r
            #   vol*Spiky = -common*hr
            f_p = common * (hr * (-0.5) * inv_rr) * (qp + cand[7:8, :])
            a_acc = a_acc - (qpos * jnp.sum(f_p, axis=1, keepdims=True)
                             - _dotT(f_p, cand[0:3, :]))

            # viscosity (cpp:556-560): acc += (uj - ui)*vol*mu*Visco(r)
            f_v = mu * common
            a_acc = a_acc + _dotT(f_v, cand[3:6, :]) \
                - jnp.sum(f_v, axis=1, keepdims=True) * qiv

            # monodomain Laplacian (cpp:562-563): B_spline_2 on [0, 2h)
            qr = rr * (1.0 / h)
            w2 = jnp.where(qr < 1.0, bs_c * (-3.0 + 4.5 * qr),
                           jnp.where(qr < 2.0, bs_c * 1.5 * (2.0 - qr), 0.0))
            vw = jnp.where(pair, vol_j * w2, 0.0)
            l_acc = l_acc + _dotT(vw, cand[8:9, :]) \
                - jnp.sum(vw, axis=1, keepdims=True) * qvm
            return a_acc, l_acc

        acc, lap = jax.lax.fori_loop(0, trips, chunk, (acc, lap))

      out_ref[lo:lo + sub_q, 0:3] = acc
      out_ref[lo:lo + sub_q, 3:4] = lap
      out_ref[lo:lo + sub_q, 4:8] = jnp.zeros((sub_q, 4), jnp.float32)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _slice_rows(arr, offset, count):
    """dynamic_slice rows [offset, offset+count) (offset may be traced)."""
    return jax.lax.dynamic_slice(arr, (offset, 0), (count, arr.shape[1]))


def _call_sweep(kernel, feats_t, qmat, qstart, qend, blk_start, blk_len,
                q_block, w_chunk, cfg, interpret, q_slice=None,
                sub_q=None):
    """Run one sweep kernel.

    q_slice=(row_offset, row_count): process only that slab of the sorted
    query rows (multi-chip: each device computes its contiguous slab while
    gathering candidates from the full arrays). row_offset may be traced;
    row_count must be static and a multiple of q_block.

    sub_q: window-bound granularity — bookkeeping was computed with blocks
    of sub_q queries (tighter windows), while each kernel program still
    processes q_block queries (grid overhead amortized). Defaults to
    q_block (one window per program block).
    """
    if sub_q is None:
        sub_q = q_block
    if sub_q > q_block or q_block % sub_q:
        raise ValueError(f"sub_q={sub_q} must divide q_block={q_block}")
    if qmat.shape[0] % q_block:
        raise ValueError(f"query rows {qmat.shape[0]} not divisible by "
                         f"q_block={q_block}; pad the state capacity")
    # the two (B,16) block-bound arrays are scalar-prefetched into SMEM
    # (1 MB); 2-D scalar-prefetch operands are lane-padded to 128 columns
    # (see sweep_bookkeeping2's flat layout note), so budget ~2*512 B per
    # window block
    if (qmat.shape[0] // sub_q) * 1024 > 900_000:
        raise ValueError(
            f"sub_q={sub_q} yields {qmat.shape[0] // sub_q} window blocks; "
            "their SMEM-prefetched bounds would exceed the 1 MB scalar "
            "memory budget — use a larger sub_q/q_block")
    if q_slice is not None:
        off, cnt = q_slice
        qmat = _slice_rows(qmat, off, cnt)
        qstart = _slice_rows(qstart, off, cnt)
        qend = _slice_rows(qend, off, cnt)
        blk_start = _slice_rows(blk_start, off // sub_q, cnt // sub_q)
        blk_len = _slice_rows(blk_len, off // sub_q, cnt // sub_q)
    n = qmat.shape[0]
    b = n // q_block
    # pad candidate columns by one chunk so the last (aligned) chunk of any
    # window can always be sliced; padded rows sit beyond every qend bound
    feats_t = jnp.pad(feats_t, ((0, 0), (0, w_chunk)))
    # small clouds: keep all candidates resident in VMEM; large clouds:
    # candidates stay in HBM and each chunk is DMA'd into a VMEM scratch
    hbm_feats = feats_t.size * 4 > VMEM_FEATS_LIMIT_BYTES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((q_block, 16), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, 16), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, 16), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=(pltpu.HBM if hbm_feats
                                       else pltpu.VMEM)),  # candidates
        ],
        out_specs=pl.BlockSpec((q_block, 8), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=([pltpu.VMEM((16, w_chunk), jnp.float32),
                         pltpu.SemaphoreType.DMA(())] if hbm_feats else []),
    )
    return pl.pallas_call(
        functools.partial(kernel, cfg=cfg, w_chunk=w_chunk, sub_q=sub_q,
                          hbm_feats=hbm_feats),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
        interpret=interpret,
    )(blk_start, blk_len, qmat, qstart, qend, feats_t)


def _pad_cols(cols, n):
    rows = list(cols)
    while len(rows) < 16:
        rows.append(jnp.zeros((n,), jnp.float32))
    return jnp.stack(rows, axis=0)                           # (16, N)


def sweep_a(pos_s, cvel_s, vol_s, mass_s, qstart, qend, blk_start, blk_len,
            q_block: int, w_chunk: int, cfg: SimConfig,
            interpret: bool | None = None, q_slice=None,
            sub_q: int | None = None):
    """Fused XSPH + density over sorted arrays.

    Returns (dens (N,), xsph_partial (N, 3)), sorted order. `vol_s` must use
    LAST step's densities (reference phase order, cpp:794-824)."""
    if interpret is None:
        interpret = _interpret_default()
    n = pos_s.shape[0]
    feats_t = _pad_cols([pos_s[:, 0], pos_s[:, 1], pos_s[:, 2],
                         cvel_s[:, 0], cvel_s[:, 1], cvel_s[:, 2],
                         vol_s, mass_s], n)
    qmat = jnp.concatenate([pos_s, cvel_s,
                            jnp.zeros((n, 10), jnp.float32)], axis=1)
    out = _call_sweep(_sweep_a_kernel, feats_t, qmat, qstart, qend,
                      blk_start, blk_len, q_block, w_chunk, cfg, interpret,
                      q_slice=q_slice, sub_q=sub_q)
    return out[:, 0], out[:, 1:4]


def sweep_b(pos_s, ivel_s, vol_s, pres_s, vm_s, qstart, qend, blk_start,
            blk_len, q_block: int, w_chunk: int, cfg: SimConfig,
            interpret: bool | None = None, q_slice=None,
            sub_q: int | None = None):
    """Fused pressure+viscosity forces and Vm Laplacian over sorted arrays.

    Returns (acc_raw (N, 3), lap (N,)), sorted order; acc_raw is BEFORE the
    division by the query's own density (cpp:568). `vol_s` uses CURRENT
    densities."""
    if interpret is None:
        interpret = _interpret_default()
    n = pos_s.shape[0]
    feats_t = _pad_cols([pos_s[:, 0], pos_s[:, 1], pos_s[:, 2],
                         ivel_s[:, 0], ivel_s[:, 1], ivel_s[:, 2],
                         vol_s, pres_s, vm_s], n)
    qmat = jnp.concatenate([pos_s, ivel_s, pres_s[:, None], vm_s[:, None],
                            jnp.zeros((n, 8), jnp.float32)], axis=1)
    out = _call_sweep(_sweep_b_kernel, feats_t, qmat, qstart, qend,
                      blk_start, blk_len, q_block, w_chunk, cfg, interpret,
                      q_slice=q_slice, sub_q=sub_q)
    return out[:, 0:3], out[:, 3]


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


def _sweep_a2_kernel(blk_lo_ref, blk_hi_ref, qm_ref, feats_ref, out_ref,
                     *scratch, cfg: SimConfig, w_chunk: int, sub_q: int,
                     hbm_feats: bool = False):
    """v2 XSPH + density.

    qm cols: [x, y, z, cvx, cvy, cvz, ..., chash @ 12]; feats rows:
    [x, y, z, cvx, cvy, cvz, vol(prev), mass, ..., chash @ 12].
    out cols: [dens, xsph_x, xsph_y, xsph_z, 0...].
    """
    bid = pl.program_id(0)
    q = qm_ref.shape[0]
    nsub = q // sub_q
    h2 = jnp.float32(cfg.kernel_h * cfg.kernel_h)
    p6c = jnp.float32(cfg.poly6_constant)
    gx, gy, _ = cfg.grid_size

    for sb in range(nsub):
        lo_q = sb * sub_q
        base = bid * nsub + sb
        qx = qm_ref[lo_q:lo_q + sub_q, 0:1]
        qy = qm_ref[lo_q:lo_q + sub_q, 1:2]
        qz = qm_ref[lo_q:lo_q + sub_q, 2:3]
        qcv = qm_ref[lo_q:lo_q + sub_q, 3:6]                 # (q', 3)
        qh = qm_ref[lo_q:lo_q + sub_q, 12:13]

        zeros = jnp.zeros((sub_q, w_chunk), jnp.float32)
        accs = (zeros, zeros, zeros, zeros, zeros)  # dens, wv, x, y, z

        for r in range(9):
            d_r = float(gx * (_RUN_OFFSETS[r, 0] + gy * _RUN_OFFSETS[r, 1]))
            qhd = qh + jnp.float32(d_r)
            w_lo = blk_lo_ref[base * 16 + r]
            w_hi = blk_hi_ref[base * 16 + r]
            start = pl.multiple_of((w_lo // 128) * 128, 128)
            trips = pl.cdiv(w_hi - start, w_chunk)

            def chunk(c, carry, start=start, qx=qx, qy=qy, qz=qz,
                      qhd=qhd):
                a_d, a_wv, a_x, a_y, a_z = carry
                off = pl.multiple_of(start + c * w_chunk, 128)
                if hbm_feats:
                    buf, sem = scratch
                    cp = pltpu.make_async_copy(
                        feats_ref.at[:, pl.ds(off, w_chunk)], buf, sem)
                    cp.start()
                    cp.wait()
                    cand = buf[:, :]                          # (16, Wc)
                else:
                    cand = feats_ref[:, pl.ds(off, w_chunk)]  # (16, Wc)
                # the stencil test alone is exact: rows outside [lo, hi)
                # can never satisfy it, zero-padded rows are inert
                # (mass = vol = 0), inactive rows carry a hash sentinel
                stencil = jnp.abs(qhd - cand[12:13, :]) <= 1.0
                dx = qx - cand[0:1, :]
                dy = qy - cand[1:2, :]
                dz = qz - cand[2:3, :]
                r2 = dx * dx + dy * dy + dz * dz              # (q', Wc)
                t = h2 - r2
                m = stencil & (r2 <= h2)
                w6 = jnp.where(m, p6c * t * t * t, 0.0)
                wv = w6 * cand[6:7, :]                        # * vol_j
                return (a_d + w6 * cand[7:8, :], a_wv + wv,
                        a_x + wv * cand[3:4, :], a_y + wv * cand[4:5, :],
                        a_z + wv * cand[5:6, :])

            accs = jax.lax.fori_loop(0, trips, chunk, accs)

        a_d, a_wv, a_x, a_y, a_z = accs
        swv = jnp.sum(a_wv, axis=1, keepdims=True)
        out_ref[lo_q:lo_q + sub_q, 0:1] = jnp.sum(a_d, axis=1, keepdims=True)
        out_ref[lo_q:lo_q + sub_q, 1:2] = \
            jnp.sum(a_x, axis=1, keepdims=True) - swv * qcv[:, 0:1]
        out_ref[lo_q:lo_q + sub_q, 2:3] = \
            jnp.sum(a_y, axis=1, keepdims=True) - swv * qcv[:, 1:2]
        out_ref[lo_q:lo_q + sub_q, 3:4] = \
            jnp.sum(a_z, axis=1, keepdims=True) - swv * qcv[:, 2:3]
        out_ref[lo_q:lo_q + sub_q, 4:8] = jnp.zeros((sub_q, 4), jnp.float32)


def _sweep_b2_kernel(blk_lo_ref, blk_hi_ref, qm_ref, feats_ref, out_ref,
                     *scratch, cfg: SimConfig, w_chunk: int, sub_q: int,
                     hbm_feats: bool = False):
    """v2 force + Vm Laplacian.

    qm cols: [x, y, z, ivx, ivy, ivz, pres, vm, ..., chash @ 12];
    feats rows: [x, y, z, ivx, ivy, ivz, vol, pres, vm, ..., chash @ 12].
    out cols: [ax, ay, az, lap, 0...] (acc BEFORE the /dens_i of cpp:568).
    """
    bid = pl.program_id(0)
    q = qm_ref.shape[0]
    nsub = q // sub_q
    h = jnp.float32(cfg.kernel_h)
    inv_h = jnp.float32(1.0 / cfg.kernel_h)
    spiky_c = jnp.float32(cfg.spiky_constant)
    bs_c = jnp.float32(cfg.b_spline_constant)
    mu = jnp.float32(cfg.mu_viscosity)
    gx, gy, _ = cfg.grid_size

    for sb in range(nsub):
        lo_q = sb * sub_q
        base = bid * nsub + sb
        qpos = qm_ref[lo_q:lo_q + sub_q, 0:3]
        qx = qm_ref[lo_q:lo_q + sub_q, 0:1]
        qy = qm_ref[lo_q:lo_q + sub_q, 1:2]
        qz = qm_ref[lo_q:lo_q + sub_q, 2:3]
        qiv = qm_ref[lo_q:lo_q + sub_q, 3:6]
        qp = qm_ref[lo_q:lo_q + sub_q, 6:7]
        qvm = qm_ref[lo_q:lo_q + sub_q, 7:8]
        qh = qm_ref[lo_q:lo_q + sub_q, 12:13]

        zeros = jnp.zeros((sub_q, w_chunk), jnp.float32)
        accs = (zeros,) * 10
        # fp, fpx, fpy, fpz, fv, fvx, fvy, fvz, vw, vwvm

        for r in range(9):
            d_r = float(gx * (_RUN_OFFSETS[r, 0] + gy * _RUN_OFFSETS[r, 1]))
            qhd = qh + jnp.float32(d_r)
            w_lo = blk_lo_ref[base * 16 + r]
            w_hi = blk_hi_ref[base * 16 + r]
            start = pl.multiple_of((w_lo // 128) * 128, 128)
            trips = pl.cdiv(w_hi - start, w_chunk)

            def chunk(c, carry, start=start, qx=qx, qy=qy, qz=qz,
                      qp=qp, qvm=qvm, qhd=qhd):
                (a_fp, a_fpx, a_fpy, a_fpz, a_fv, a_fvx, a_fvy, a_fvz,
                 a_vw, a_vwvm) = carry
                off = pl.multiple_of(start + c * w_chunk, 128)
                if hbm_feats:
                    buf, sem = scratch
                    cp = pltpu.make_async_copy(
                        feats_ref.at[:, pl.ds(off, w_chunk)], buf, sem)
                    cp.start()
                    cp.wait()
                    cand = buf[:, :]                          # (16, Wc)
                else:
                    cand = feats_ref[:, pl.ds(off, w_chunk)]  # (16, Wc)
                stencil = jnp.abs(qhd - cand[12:13, :]) <= 1.0
                dx = qx - cand[0:1, :]
                dy = qy - cand[1:2, :]
                dz = qz - cand[2:3, :]
                r2 = dx * dx + dy * dy + dz * dz
                pair = stencil & (r2 > _PAIR_EPS)             # cpp:546
                inv_rr = jax.lax.rsqrt(jnp.where(pair, r2, 1.0))
                rr = r2 * inv_rr
                vol_j = cand[6:7, :]

                # spiky/visco share support [0, h] and the (h - r) factor
                hr = h - rr
                common = jnp.where(pair & (rr <= h),
                                   vol_j * (spiky_c * hr), 0.0)

                # pressure (cpp:550-554): acc -= d*vol*(p_i+p_j)/2*Spiky/r
                f_p = common * (hr * (-0.5) * inv_rr) * (qp + cand[7:8, :])
                # viscosity (cpp:556-560): acc += (uj - ui)*vol*mu*Visco(r)
                f_v = mu * common
                # monodomain Laplacian (cpp:562-563): B_spline_2 on [0, 2h)
                qr = rr * inv_h
                w2 = jnp.where(qr < 1.0, bs_c * (-3.0 + 4.5 * qr),
                               jnp.where(qr < 2.0,
                                         bs_c * 1.5 * (2.0 - qr), 0.0))
                vw = jnp.where(pair, vol_j * w2, 0.0)
                return (a_fp + f_p, a_fpx + f_p * cand[0:1, :],
                        a_fpy + f_p * cand[1:2, :],
                        a_fpz + f_p * cand[2:3, :],
                        a_fv + f_v, a_fvx + f_v * cand[3:4, :],
                        a_fvy + f_v * cand[4:5, :],
                        a_fvz + f_v * cand[5:6, :],
                        a_vw + vw, a_vwvm + vw * cand[8:9, :])

            accs = jax.lax.fori_loop(0, trips, chunk, accs)

        (a_fp, a_fpx, a_fpy, a_fpz, a_fv, a_fvx, a_fvy, a_fvz,
         a_vw, a_vwvm) = accs
        red = lambda a: jnp.sum(a, axis=1, keepdims=True)
        sfp, sfv, svw = red(a_fp), red(a_fv), red(a_vw)
        out_ref[lo_q:lo_q + sub_q, 0:1] = \
            red(a_fpx) - qpos[:, 0:1] * sfp + red(a_fvx) - sfv * qiv[:, 0:1]
        out_ref[lo_q:lo_q + sub_q, 1:2] = \
            red(a_fpy) - qpos[:, 1:2] * sfp + red(a_fvy) - sfv * qiv[:, 1:2]
        out_ref[lo_q:lo_q + sub_q, 2:3] = \
            red(a_fpz) - qpos[:, 2:3] * sfp + red(a_fvz) - sfv * qiv[:, 2:3]
        out_ref[lo_q:lo_q + sub_q, 3:4] = red(a_vwvm) - svw * qvm
        out_ref[lo_q:lo_q + sub_q, 4:8] = jnp.zeros((sub_q, 4), jnp.float32)


def _call_sweep2(kernel, feats_t, qmat, blk_lo, blk_hi, q_block, w_chunk,
                 sub_q, cfg, interpret, q_slice=None):
    """Run one v2 sweep kernel (see _call_sweep for q_slice semantics)."""
    if sub_q > q_block or q_block % sub_q:
        raise ValueError(f"sub_q={sub_q} must divide q_block={q_block}")
    if qmat.shape[0] % q_block:
        raise ValueError(f"query rows {qmat.shape[0]} not divisible by "
                         f"q_block={q_block}; pad the state capacity")
    if (qmat.shape[0] // sub_q) * 128 > 900_000:
        raise ValueError(
            f"sub_q={sub_q} yields {qmat.shape[0] // sub_q} window blocks; "
            "their SMEM-prefetched bounds would exceed the 1 MB scalar "
            "memory budget — use a larger sub_q")
    if q_slice is not None:
        off, cnt = q_slice
        qmat = _slice_rows(qmat, off, cnt)
        blk_lo = jax.lax.dynamic_slice(blk_lo, (off // sub_q * 16,),
                                       (cnt // sub_q * 16,))
        blk_hi = jax.lax.dynamic_slice(blk_hi, (off // sub_q * 16,),
                                       (cnt // sub_q * 16,))
    n = qmat.shape[0]
    b = n // q_block
    feats_t = jnp.pad(feats_t, ((0, 0), (0, w_chunk)))
    hbm_feats = feats_t.size * 4 > VMEM_FEATS_LIMIT_BYTES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((q_block, 16), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=(pltpu.HBM if hbm_feats
                                       else pltpu.VMEM)),  # candidates
        ],
        out_specs=pl.BlockSpec((q_block, 8), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=([pltpu.VMEM((16, w_chunk), jnp.float32),
                         pltpu.SemaphoreType.DMA(())] if hbm_feats else []),
    )
    return pl.pallas_call(
        functools.partial(kernel, cfg=cfg, w_chunk=w_chunk, sub_q=sub_q,
                          hbm_feats=hbm_feats),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
        interpret=interpret,
    )(blk_lo, blk_hi, qmat, feats_t)


def sweep_a2(pos_s, cvel_s, vol_s, mass_s, hash_s, blk_lo, blk_hi,
             q_block: int, w_chunk: int, cfg: SimConfig,
             interpret: bool | None = None, q_slice=None,
             sub_q: int = 32):
    """v2 fused XSPH + density over sorted arrays.

    Returns (dens (N,), xsph_partial (N, 3)), sorted order. `vol_s` must use
    LAST step's densities (reference phase order, cpp:794-824) and be finite
    on every lane (sanitize inactive lanes to 0)."""
    if interpret is None:
        interpret = _interpret_default()
    n = pos_s.shape[0]
    z = jnp.zeros((n,), jnp.float32)
    feats_t = _pad_cols([pos_s[:, 0], pos_s[:, 1], pos_s[:, 2],
                         cvel_s[:, 0], cvel_s[:, 1], cvel_s[:, 2],
                         vol_s, mass_s, z, z, z, z, hash_s], n)
    qmat = jnp.concatenate([pos_s, cvel_s, jnp.zeros((n, 6), jnp.float32),
                            hash_s[:, None],
                            jnp.zeros((n, 3), jnp.float32)], axis=1)
    out = _call_sweep2(_sweep_a2_kernel, feats_t, qmat, blk_lo, blk_hi,
                       q_block, w_chunk, sub_q, cfg, interpret,
                       q_slice=q_slice)
    return out[:, 0], out[:, 1:4]


def sweep_b2(pos_s, ivel_s, vol_s, pres_s, vm_s, hash_s, blk_lo, blk_hi,
             q_block: int, w_chunk: int, cfg: SimConfig,
             interpret: bool | None = None, q_slice=None,
             sub_q: int = 32):
    """v2 fused pressure+viscosity forces and Vm Laplacian (sorted order).

    Returns (acc_raw (N, 3), lap (N,)); acc_raw is BEFORE the division by
    the query's own density (cpp:568). `vol_s` uses CURRENT densities and
    must be finite on every lane."""
    if interpret is None:
        interpret = _interpret_default()
    n = pos_s.shape[0]
    z = jnp.zeros((n,), jnp.float32)
    feats_t = _pad_cols([pos_s[:, 0], pos_s[:, 1], pos_s[:, 2],
                         ivel_s[:, 0], ivel_s[:, 1], ivel_s[:, 2],
                         vol_s, pres_s, vm_s, z, z, z, hash_s], n)
    qmat = jnp.concatenate([pos_s, ivel_s, pres_s[:, None], vm_s[:, None],
                            jnp.zeros((n, 4), jnp.float32),
                            hash_s[:, None],
                            jnp.zeros((n, 3), jnp.float32)], axis=1)
    out = _call_sweep2(_sweep_b2_kernel, feats_t, qmat, blk_lo, blk_hi,
                       q_block, w_chunk, sub_q, cfg, interpret,
                       q_slice=q_slice)
    return out[:, 0:3], out[:, 3]


def auto_sweep2_params(positions: np.ndarray, cfg: SimConfig,
                       sub_q: int = 32) -> tuple[int, int]:
    """(sub_q, w_chunk) for the v2 sweeps: minimize enumerated candidate
    lanes + a per-chunk overhead term over Wc in {128, 256, 384}.
    Host-side, once per scene."""
    gx, gy, gz = cfg.grid_size
    num_cells = cfg.num_cells
    coords = (np.asarray(positions) / cfg.cell_size).astype(np.int64)
    inside = ((coords >= 0).all(1) & (coords[:, 0] < gx)
              & (coords[:, 1] < gy) & (coords[:, 2] < gz))
    ids = np.where(inside, coords[:, 0] + gx * (coords[:, 1]
                                                + gy * coords[:, 2]),
                   num_cells)
    s = np.sort(ids)
    n = len(s)
    b = max(n // sub_q, 1)
    h_lo = s[::sub_q][:b]
    h_hi = s[sub_q - 1::sub_q][:b]
    d = (gx * (_RUN_OFFSETS[:, 0] + gy * _RUN_OFFSETS[:, 1]))[None, :]
    lo = np.searchsorted(s, np.clip(h_lo[:, None] + d - 1, 0, num_cells))
    hi = np.searchsorted(s, np.clip(h_hi[:, None] + d + 2, 0, num_cells))
    # NOTE: the kernel iterates each run window in full (overlap between
    # consecutive runs is handled by the stencil mask, never clamped away
    # since sweep_bookkeeping2 dropped the disjoint clamp), so the cost
    # model must not clamp either
    start = (lo // 128) * 128
    best = None
    for wc in (128, 256, 384):
        trips = np.maximum(0, -(-(hi - start) // wc))
        # enumerated lane slots + per-chunk fixed overhead; the 40
        # slot-equivalents/chunk constant is fit to v5e A/B timings of the
        # flagship scene with the straight-lined first chunk (Wc=128
        # measured fastest at both sub_q=64 and 128)
        cost = (trips * wc).sum() + trips.sum() * 40
        if best is None or cost < best[0]:
            best = (cost, wc)
    return sub_q, best[1]


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
