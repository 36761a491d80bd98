"""Efficiency denominator for the fused sweeps: enumerated pair-slots,
useful-pair fractions, and %-of-VPU-peak per scene (VERDICT r2 §6).

"113x the reference" is a CPU-relative number; this tool gives the
HARDWARE-relative one. For a scene it reports:

  slots/query     candidate lanes the sweep kernels actually test per
                  query (v4 merged windows or v5 packed slabs — recomputed
                  from the initial cloud with the same window math the
                  bookkeeping uses)
  stencil-true    candidates inside the query's 27-cell stencil (what a
                  perfect per-query gather would test)
  within-2h       pairs inside the B-spline support (the physics' true
                  pair count; poly6/spiky support h is half of this)
  VPU peak        measured on THIS chip by a pure-FMA Pallas microbench
                  over register-resident (8,128) tiles — an empirical
                  ceiling, not a spec-sheet number
  % of peak       sweep flops (slots x per-slot op count) / step time /
                  VPU peak

Per-slot op counts are hand-counted from ops/fused_step._pair_step_a/_b
(every jnp elementwise op on the (sub_q, Wc) tile = 1 lane-op; selects and
compares count 1 each):
  sweep A: 3 yz-mask (sub+abs+cmp) + 3 sub + 5 r2 + 2 t(relu) +
           4 w6 (3 mul + sel) + 1 wv + 2 a_d +
           3x(1 diff + 1 mul + 1 add) = 29
           (the fast-axis mask half and the r2<=h2 compare were removed —
           Poly6's support clamp subsumes them, see _gather_loop4
           mask="yz")
  sweep B: 3 sub + 5 r2 + 2 cmp/and + 1 sel(volm) + 1 rsqrt + 1 rr +
           2 hr(relu) + 2 common + 4 f_p + 1 f_v + 3x(diff+2 fma-ish=9)
           + EP (2 qr + 4 w2 + 3 lap) = 40 (with_ep)

Usage:
  python tools/roofline.py --scene biceps_full [--ms-per-step 2.34]
  (omit --ms-per-step to measure a 200-step chained scan on the device)
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FLOPS_PER_SLOT_A = 29
FLOPS_PER_SLOT_B = 40


def measure_vpu_peak(reps: int = 3) -> float:
    """Achieved fp32 lane-ops/s of a pure multiply-add chain on resident
    VMEM tiles — the empirical VPU ceiling for the sweep kernels' op mix.

    Timing discipline: every dispatch on the remote tunnel costs ~33 ms
    wall regardless of program (DEVELOPMENT.md), so a single timed run
    under-reports peak ~20x. We time the SAME jitted program at two scan
    lengths and divide the op delta by the time delta — the dispatch floor
    and any fixed per-run overhead cancel exactly.

    Accumulators must be REGISTER-resident: one (8,128) VREG each. A
    probe over {4..64} chains x tile shapes (2026-08-17, v5e) peaked at
    16 chains / (8,128) tiles = 3.81 T ops/s — exactly 4 VPU ALUs x 1024
    lanes x ~940 MHz with mul and add issued as separate vector ops (the
    same mix the sweep kernels compile to). Larger tiles spill to VMEM
    (1.7 T), fewer chains expose too little ILP (2.2 T at 8)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    q, w, iters, chains = 8, 128, 800000, 16
    len_small, len_big = 2, 12

    def kernel(x_ref, o_ref):
        accs = tuple(x_ref[:, :] * (1.0 + 0.001 * k)
                     for k in range(chains))

        def body(i, accs):
            # chains independent FMA chains expose ILP like the sweep
            # accumulators; 2 lane-ops each per iteration
            return tuple(a * 1.0000001 + 0.5 for a in accs)

        accs = jax.lax.fori_loop(0, iters, body, accs)
        o_ref[:, :] = sum(accs)

    x = jnp.ones((q, w), jnp.float32)
    f = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((q, w), jnp.float32),
        interpret=jax.default_backend() != "tpu")

    @functools.partial(jax.jit, static_argnames="length")
    def run(x, length):
        def step(c, _):
            return f(c) * 1e-6, None
        out, _ = jax.lax.scan(step, x, None, length=length)
        return out

    best = {}
    for length in (len_small, len_big):
        out = run(x, length)
        float(out[0, 0])  # warm (compile) outside the timed region
        t_best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = run(x, length)
            float(out[0, 0])
            t_best = min(t_best, time.time() - t0)
        best[length] = t_best
    dt = best[len_big] - best[len_small]
    ops = (len_big - len_small) * iters * chains * 2 * q * w
    return ops / max(dt, 1e-9)


def scene_slot_stats(pts: np.ndarray, cfg, impl: str, sub_q: int,
                     kb: int = 0, w_chunk: int = 128) -> dict:
    """Host-side recount of tested/true candidate lanes (the same window
    math as sweep_bookkeeping3/5 over the initial cloud). `w_chunk` must be
    the scene's tuned chunk width — the kernels sweep whole w_chunk-wide
    chunks, so trips/slots are counted in those units (a hard-coded 128
    under-reported tested slots on scenes the tuner widens to 256+)."""
    from sph_sm_monodomain_tpu.ops.pallas_sweeps import hash_axis_perm

    fa, ma, sa = hash_axis_perm(cfg)
    gf, gm = cfg.grid_size[fa], cfg.grid_size[ma]
    num_cells = cfg.num_cells
    coords = (pts / cfg.cell_size).astype(np.int64)
    g = np.asarray(cfg.grid_size)
    inside = ((coords >= 0) & (coords < g[None, :])).all(1)
    ids = np.where(inside, coords[:, fa] + gf * (coords[:, ma]
                                                 + gm * coords[:, sa]),
                   num_cells)
    cap = ((len(ids) + 127) // 128) * 128
    s = np.full(cap, num_cells, np.int64)
    s[:len(ids)] = np.sort(ids)
    b = cap // sub_q
    h_lo = s[::sub_q][:b]
    h_hi = s[sub_q - 1::sub_q][:b]

    if impl == "v5":
        offs = np.array([gf * dm + gf * gm * ds
                         for ds in (-1, 0, 1) for dm in (-1, 0, 1)])
        lo = np.searchsorted(s, np.clip(h_lo[:, None] + offs - 1,
                                        0, num_cells))
        hi = np.searchsorted(s, np.clip(h_hi[:, None] + offs + 2,
                                        0, num_cells))
        lo2 = lo.copy()
        for r in range(1, 9):
            lo2[:, r] = np.maximum(lo2[:, r], hi[:, r - 1])
        tot = np.maximum(hi - lo2, 0).sum(1)
        trips = np.maximum(
            (np.minimum(tot, kb or 10 ** 9) + w_chunk - 1) // w_chunk, 1)
        slots = int((trips * w_chunk).sum()) * sub_q
        pool = b * (kb or int(trips.max() * w_chunk))
    else:  # v4 merged windows
        d = (np.array([-1, 0, 1], np.int64) * (gf * gm))[None, :]
        lo = np.searchsorted(s, np.clip(h_lo[:, None] + d - (gf + 1),
                                        0, num_cells))
        hi = np.searchsorted(s, np.clip(h_hi[:, None] + d + (gf + 2),
                                        0, num_cells))
        start = (lo // 128) * 128      # kernel starts stay 128-aligned
        trips = np.maximum(0, -(-(hi - start) // w_chunk))
        slots = int((trips * w_chunk).sum()) * sub_q
        pool = 0

    # stencil-true + within-2h counts via cell occupancy
    c = coords[inside]
    occ = np.zeros(tuple(g), np.int64)
    np.add.at(occ, (c[:, 0], c[:, 1], c[:, 2]), 1)
    pad = np.pad(occ, 1)
    sten = sum(pad[1 + dx:g[0] + 1 + dx, 1 + dy:g[1] + 1 + dy,
                   1 + dz:g[2] + 1 + dz]
               for dx in (-1, 0, 1) for dy in (-1, 0, 1)
               for dz in (-1, 0, 1))
    stencil_true = int(sten[c[:, 0], c[:, 1], c[:, 2]].sum())

    # a subsample of query points for the within-support pair estimate
    rng = np.random.default_rng(0)
    m = min(2000, len(c))
    sel = rng.choice(len(c), m, replace=False)
    pts_in = pts[inside]
    return {"slots_per_query": slots / cap, "stencil_true":
            stencil_true / max(len(c), 1), "pool_slots": pool,
            "_sample": (pts_in, sel), "n": len(c), "cap": cap}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="biceps_full")
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--impl", default=None)
    ap.add_argument("--ms-per-step", type=float, default=None,
                    help="known step time; omit to measure a 200-step scan")
    ap.add_argument("--peak", type=float, default=None,
                    help="known VPU peak in lane-ops/s (from a prior "
                         "measure_vpu_peak run); omit to measure")
    args = ap.parse_args()

    import jax
    import sph_sm_monodomain_tpu as smt
    from sph_sm_monodomain_tpu.utils.io import scene_positions

    sc = smt.build_scene(args.scene, replicate=args.replicate,
                         fused_impl=args.impl)
    cfg = sc.cfg
    pts = scene_positions(args.scene, cfg, args.replicate)
    stats = scene_slot_stats(pts, cfg, sc.fused_impl, sc.sub_block or 128,
                             sc.pack_cap, w_chunk=sc.block_window)

    # within-2h / within-h pair fractions on a subsample
    pts_in, sel = stats.pop("_sample")
    d2 = ((pts_in[sel, None, :] - pts_in[None, :: max(1, len(pts_in)
                                                      // 4000), :]) ** 2
          ).sum(-1)
    frac = len(pts_in) / d2.shape[1]
    within_2h = d2 <= (2 * cfg.kernel_h) ** 2
    within_h = d2 <= cfg.kernel_h ** 2
    n2h = within_2h.sum(1).mean() * frac
    nh = within_h.sum(1).mean() * frac

    ms = args.ms_per_step
    if ms is None:
        import jax.numpy as jnp
        state = sc.state
        fused = jax.default_backend() == "tpu"
        t = None
        for rep in range(3):
            out = smt.simulate(state, cfg, sc.cell_capacity,
                               sc.neighbor_capacity, num_steps=200,
                               fused=fused, q_block=sc.q_block,
                               w_window=sc.block_window,
                               sub_q=(sc.sub_block or None),
                               impl=sc.fused_impl, pack_cap=sc.pack_cap)
            state = out[0]
            if rep == 0:
                float(state.pos[0, 0])
                t0 = time.time()
            else:
                float(state.pos[0, 0])
        ms = (time.time() - t0) / 400 * 1e3

    peak = args.peak if args.peak else measure_vpu_peak()
    n = stats["n"]
    spq = stats["slots_per_query"]
    slots_step = spq * stats["cap"] * 2          # both sweeps
    flops = spq * stats["cap"] * (FLOPS_PER_SLOT_A + FLOPS_PER_SLOT_B)
    pct = flops / (ms * 1e-3) / peak * 100.0
    print(f"scene={args.scene} n={n} impl={sc.fused_impl} "
          f"sub_q={sc.sub_block} kb={sc.pack_cap}")
    print(f"  slots/query tested : {spq:8.1f}")
    print(f"  stencil-true /query: {stats['stencil_true']:8.1f} "
          f"(useful fraction {stats['stencil_true'] / spq:.2f})")
    print(f"  within-2h    /query: {n2h:8.1f}   within-h: {nh:6.1f}")
    if stats["pool_slots"]:
        print(f"  packed pool slots  : {stats['pool_slots']:,} "
              f"({stats['pool_slots'] * 12 * 4 / 2 ** 20:.1f} MB/sweep)")
    print(f"  step time          : {ms:.3f} ms  "
          f"({slots_step / (ms * 1e-3) / 1e9:.2f} G slots/s)")
    print(f"  measured VPU peak  : {peak / 1e12:.2f} T lane-ops/s")
    print(f"  sweep ALU vs peak  : {pct:.0f}% of peak over the whole step "
          f"(sweeps only; glue/bookkeeping excluded from flops)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
