"""Superseded (v1/v2) Pallas sweep generations — ablation record.

Measured-rejection archive (VERDICT r4 item 8): the production import
graph is v3/v4/v5 (ops/pallas_sweeps.py + ops/fused_step.py) plus the XLA
reference path (ops/grid.build_neighbor_table); these earlier generations
remain importable for tools/ablate_fused.py A/Bs and the regression tests
that pin their numerics, but nothing in the package imports them.

v1: per-query (N, 16) bound arrays + MXU-contraction kernels
    (measured loss vs v3's lane-wise difference-form accumulators —
    DEVELOPMENT.md "MXU output contractions").
v2: v3's window/bookkeeping shape with XLA pointwise glue between the
    sweeps (superseded by the in-kernel epilogues of ops/fused_step.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from ..ops.pallas_sweeps import (_COORD_SENTINEL, _HI, _PAIR_EPS, _RUN_OFFSETS,
                            VMEM_FEATS_LIMIT_BYTES, _interpret_default,
                            _slice_rows)

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
