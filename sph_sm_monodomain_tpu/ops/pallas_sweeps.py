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
    # block-bound arrays are scalar-prefetched into SMEM (1 MB): guard the
    # granularity so (N / sub_q) * 16 * 4 B stays within budget
    if (qmat.shape[0] // sub_q) * 64 > 900_000:
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


def auto_block_window(positions: np.ndarray, cfg: SimConfig, q_block: int,
                      headroom: float = 1.0, minimum: int = 256) -> int:
    """Static chunk width Wc for the fused sweeps.

    With the dynamic-trip chunked windows, any Wc is CORRECT (coverage is
    exact); this just balances VPU efficiency (wide chunks) against padding
    waste on narrow windows. The median (block, run) window width at init,
    rounded to a lane multiple of 128 and clamped to [256, 1024], works
    well. Host-side, once per scene.
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
