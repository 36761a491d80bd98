"""Per-phase profile of the fused step for any scene size — the tool that
filled the 1M row's phase columns (component C14 at scale; reference
per-phase timing: SPH_SM_monodomain.cpp:794-824).

Times the four incremental stage pipelines (bookkeeping -> +SM ->
+sweep A -> full step) as chained scans and prints both the RAW pipeline
times and the clamped-difference attribution (utils/report
profile_phases_fused), so compile-to-compile noise is visible instead of
vanishing into a zeroed column. At multi-million-particle scale each
pipeline is its own multi-minute remote compile — run in the background.

Usage:
  python tools/profile_phases.py --scene biceps_full --replicate 56 \
      [--length 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--scene", default="biceps_full")
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--impl", default=None)
    ap.add_argument("--length", type=int, default=None,
                    help="scan length per timed pipeline (default: "
                         "profile_phases_fused's own; use 8 at 1M+)")
    args = ap.parse_args()

    import sph_sm_monodomain_tpu as smt
    from sph_sm_monodomain_tpu.utils.report import profile_phases_fused

    t0 = time.time()

    def log(m):
        print(f"[{time.time() - t0:7.1f}s] {m}", flush=True)

    sc = smt.build_scene(args.scene, replicate=args.replicate,
                         fused_impl=args.impl)
    log(f"scene {sc.name} x{args.replicate}: n={sc.num_particles} "
        f"impl={sc.fused_impl} sub_q={sc.sub_block} wc={sc.block_window} "
        f"clusters={sc.cfg.sm_clusters}")
    kw = {"length": args.length} if args.length else {}
    ph = profile_phases_fused(sc, **kw)
    t1, t2, t3, t4 = ph["raw_pipeline_s"]
    log(f"raw pipelines: book={t1*1e3:.2f} +sm={t2*1e3:.2f} "
        f"+sweepA={t3*1e3:.2f} full={t4*1e3:.2f} ms")
    log(f"attributed: find_neighbors={ph['find_neighbors']*1e3:.3f} "
        f"corrected_velocity={ph['corrected_velocity']*1e3:.3f} "
        f"density_pressure={ph['density_pressure']*1e3:.3f} "
        f"compute_force={ph['compute_force']*1e3:.3f} "
        f"total={ph['total_step']*1e3:.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
