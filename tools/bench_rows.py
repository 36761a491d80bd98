"""Regenerate results_tpu.csv end-to-end — the committed provenance for
every benchmark row (reference report schema, SPH_SM_monodomain.cpp:785-792,
plus scene;particles prefix columns).

Small scenes (<=130k particles) run the full chunked protocol and the
scan-amortized fused phase profiler; --big adds the 1M+ chunk-wall rows
(best of `--big-reps` steady 10-step chained chunks, phase columns from the
incremental-pipeline attribution rescaled to the chunk wall — the same
discipline as the committed rows; see results_tpu.csv header).

Timings drift day-to-day on the HBM path through the remote tunnel
(DEVELOPMENT.md "Same-day isolation note"), so regenerate ALL rows you
intend to compare, in one session.

Usage:
  python tools/bench_rows.py [--out results_tpu_regen.csv] [--big]
      [--scenes biceps_full,biceps_18475,...] [--steps 500]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = [("biceps_full", 1, 500), ("biceps_18475", 1, 500),
         ("biceps_4944", 1, 500), ("biceps_full", 7, 200)]
BIG = [("biceps_full", 56, 60), ("biceps_full", 112, 60),
       ("biceps_full", 224, 60)]


def _row_name(name, replicate):
    return name if replicate == 1 else f"multi_muscle_x{replicate}"


def _chunk_wall(scene, reps=6, length=10):
    """Best steady chained chunk wall (value-fetch synced), ms/step."""
    import jax
    from sph_sm_monodomain_tpu.models.monodomain import step_fused
    from sph_sm_monodomain_tpu.ops.shape_matching import sm_invariants

    state, cfg = scene.state, scene.cfg
    sm_inv = jax.block_until_ready(
        jax.jit(lambda s: sm_invariants(s, cfg))(state))

    @jax.jit
    def run(st):
        def body(c, _):
            out, _aux = step_fused(c, cfg, scene.q_block,
                                   scene.block_window,
                                   scene.sub_block or 128,
                                   impl=scene.fused_impl or "v4",
                                   sm_inv=sm_inv)
            return out, None
        out, _ = jax.lax.scan(body, st, None, length=length)
        return out

    out = run(state)
    float(out.pos[0, 0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = run(state)
        float(out.pos[0, 0])
        best = min(best, (time.time() - t0) / length)
    return best


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default="results_tpu_regen.csv")
    ap.add_argument("--big", action="store_true",
                    help="include the 1M+ chunk-wall rows (several extra "
                         "minutes of remote compile each)")
    ap.add_argument("--big-reps", type=int, default=6)
    ap.add_argument("--scenes", default=None,
                    help="comma list of name[:replicate[:steps]] overriding "
                         "the default row set")
    ap.add_argument("--profile-length", default=None,
                    help="scan length per profiled stage: an integer, or "
                         "'auto' to size it from the scene's measured cost "
                         "(use auto for CPU smoke runs; default: the "
                         "profiler's own 250)")
    args = ap.parse_args()

    import sph_sm_monodomain_tpu as smt
    from sph_sm_monodomain_tpu.utils.report import (REPORT_HEADER,
                                                    profile_phases_fused,
                                                    report_row)

    rows = SMALL + (BIG if args.big else [])
    if args.scenes:
        rows = []
        for spec in args.scenes.split(","):
            parts = spec.split(":")
            rows.append((parts[0],
                         int(parts[1]) if len(parts) > 1 and parts[1]
                         else 1,
                         int(parts[2]) if len(parts) > 2 and parts[2]
                         else 500))

    t0 = time.time()

    def log(m):
        print(f"[{time.time() - t0:7.1f}s] {m}", flush=True)

    out_rows = []
    for name, rep, steps in rows:
        sc = smt.build_scene(name, replicate=rep)
        n = sc.num_particles
        log(f"{_row_name(name, rep)}: n={n}")
        pk = {}
        if args.profile_length == "auto":
            pk = {"length": None}
        elif args.profile_length:
            pk = {"length": int(args.profile_length)}
        if n <= 200_000:
            # full protocol (stim off at half) + scan-amortized profile
            _state, aux, _ = smt.run_protocol(sc, num_steps=steps,
                                              chunk=min(100, steps))
            assert int(aux.overflow) == 0, "overflow during protocol run"
            phases = profile_phases_fused(sc, **pk)
            avg = phases["total_step"]
        else:
            # chunk-wall timing + incremental attribution rescaled so the
            # phase columns sum to the measured wall (committed-row rule)
            avg = _chunk_wall(sc, reps=args.big_reps)
            phases = profile_phases_fused(sc, **(pk or {"length": 8}))
            s = sum(phases[k] for k in
                    ("find_neighbors", "corrected_velocity",
                     "density_pressure", "compute_force"))
            scale = avg / s if s > 0 else 0.0
            phases = {k: (v * scale if isinstance(v, float) else v)
                      for k, v in phases.items()}
        row = report_row(sc.cfg, steps, avg, phases)
        out_rows.append(f"{_row_name(name, rep)};{n};{row}")
        log(f"  {avg * 1e3:.3f} ms/step")

    with open(args.out, "w") as f:
        f.write("scene;particles;" + REPORT_HEADER + "\n")
        for r in out_rows:
            f.write(r + "\n")
    log(f"{len(out_rows)} rows -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
