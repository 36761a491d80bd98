"""Regenerate results_tpu.csv end-to-end — the committed provenance for
every benchmark row (reference report schema, SPH_SM_monodomain.cpp:785-792,
plus scene;particles prefix columns).

Small scenes (<=130k particles) run the full chunked protocol and the
scan-amortized fused phase profiler; --big adds the 1M+ chunk-wall rows
(best of `--big-reps` steady 10-step chained chunks, phase columns from the
incremental-pipeline attribution rescaled to the chunk wall — the same
discipline as the committed rows; see results_tpu.csv header).

--modes sph,monodomain adds the per-variant rows (BASELINE configs 2-3):
SPH-only runs on susane + biceps_full, monodomain-only (frozen-cloud FHN
wave) at 5k/18k/1M; each uses its mode-specific profiler
(utils/report.profile_phases_{sph,monodomain}_fused) and is tagged
"scene[mode]" in the scene column.

Timings drift day-to-day on the HBM path through the remote tunnel
(DEVELOPMENT.md "Same-day isolation note"), so regenerate ALL rows you
intend to compare, in one session. With --big (or --anchor) every row also
carries a SAME-SESSION biceps_full chunk-wall anchor column ("Anchor18k
ms") so future comparisons can normalize out the tunnel drift.

Usage:
  python tools/bench_rows.py [--out results_tpu_regen.csv] [--big]
      [--modes coupled,sph,monodomain]
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
       ("biceps_full", 224, 60), ("biceps_full", 448, 60)]
# per-variant default row sets (BASELINE configs 2-3)
VARIANT_ROWS = {
    "sph": [("susane", 1, 500), ("biceps_full", 1, 500)],
    "monodomain": [("biceps_18475", 1, 500), ("biceps_full", 1, 500),
                   ("biceps_full", 56, 100)],
}


def _row_name(name, replicate):
    return name if replicate == 1 else f"multi_muscle_x{replicate}"


def _chunk_wall(scene, reps=6, length=10):
    """Best steady chained chunk wall (value-fetch synced), seconds/step.

    Very large scenes (> models.monodomain.VERY_LARGE_CAP) time the SAME
    donated+unrolled dispatch run_protocol uses there — the plain
    scan-carry program would not fit HBM (hbm_footprint --scan)."""
    import jax
    from sph_sm_monodomain_tpu.models.monodomain import (VERY_LARGE_CAP,
                                                         step_fused)
    from sph_sm_monodomain_tpu.ops.shape_matching import sm_invariants
    from sph_sm_monodomain_tpu.utils.report import _scan_time

    state, cfg = scene.state, scene.cfg
    sm_inv = jax.block_until_ready(
        jax.jit(lambda s: sm_invariants(s, cfg))(state))

    def body(c):
        out, _aux = step_fused(c, cfg, scene.q_block, scene.block_window,
                               scene.sub_block or 128,
                               impl=scene.fused_impl or "v4", sm_inv=sm_inv)
        return out

    donate = state.capacity > VERY_LARGE_CAP
    return _scan_time(body, state, length=length, reps=reps,
                      donate=donate, unroll=4 if donate else 1)


def _variant_row(sc, mode, steps, pk):
    """(avg_step_s, phases, row_cfg) for one SPH-only / monodomain-only row
    — each mode runs its real scan driver end-to-end first (so the row is
    backed by an executed run, not just the profiler), then takes the
    scan-amortized mode profiler's attribution."""
    import jax
    from sph_sm_monodomain_tpu.models import variants
    from sph_sm_monodomain_tpu.utils.report import (
        profile_phases_monodomain_fused, profile_phases_sph_fused)

    fused = jax.default_backend() == "tpu"
    state, cfg = sc.state, sc.cfg
    sub_q = sc.sub_block or 128
    if mode == "sph":
        row_cfg = variants.sph_only_config(cfg)
        out = variants.simulate_sph_only(
            state, row_cfg, sc.cell_capacity, sc.neighbor_capacity,
            num_steps=min(steps, 500), fused=fused, q_block=sc.q_block,
            w_window=sc.block_window, sub_q=sub_q)
        assert int(out[1].overflow) == 0, "overflow during SPH-only run"
        phases = profile_phases_sph_fused(sc, **pk)
    elif mode == "monodomain":
        row_cfg = cfg
        tables = variants.monodomain_prepare_fused(
            state, cfg, sc.q_block, sc.block_window, sub_q=sub_q)
        st = variants.simulate_monodomain_only_fused(
            state, tables, cfg, num_steps=min(steps, 500),
            q_block=sc.q_block, w_chunk=sc.block_window, sub_q=sub_q)
        float(st.vm[0])  # sync
        phases = profile_phases_monodomain_fused(sc, **pk)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return phases["total_step"], phases, row_cfg


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default="results_tpu_regen.csv")
    ap.add_argument("--big", action="store_true",
                    help="include the 1M+ chunk-wall rows (several extra "
                         "minutes of remote compile each)")
    ap.add_argument("--big-reps", type=int, default=6)
    ap.add_argument("--modes", default="coupled",
                    help="comma list of coupled,sph,monodomain — variant "
                         "rows (BASELINE configs 2-3) are tagged "
                         "'scene[mode]' and use their mode profilers")
    ap.add_argument("--anchor", action="store_true",
                    help="measure a same-session biceps_full chunk-wall "
                         "anchor and append it as a drift-normalizer "
                         "column (implied by --big)")
    ap.add_argument("--campaign", action="store_true",
                    help="add the two FULL-LENGTH reference-campaign "
                         "reproduction rows (results_171107.csv: 2000 "
                         "steps sigma=1 stim=500000; results_171114.csv: "
                         "1000 steps sigma=0.383 stim=800000; both at the "
                         "5,211-particle biceps_18475 scene with the "
                         "campaign-era K=0.8 alpha=0.5 beta=0.2)")
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

    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    for m in modes:
        if m not in ("coupled",) + tuple(VARIANT_ROWS):
            raise SystemExit(f"unknown mode {m!r} (coupled/sph/monodomain)")

    rows = SMALL + (BIG if args.big else [])
    scene_rows = None
    if args.scenes:
        scene_rows = []
        for spec in args.scenes.split(","):
            parts = spec.split(":")
            scene_rows.append((parts[0],
                               int(parts[1]) if len(parts) > 1 and parts[1]
                               else 1,
                               int(parts[2]) if len(parts) > 2 and parts[2]
                               else 500))
        rows = scene_rows

    t0 = time.time()

    def log(m):
        print(f"[{time.time() - t0:7.1f}s] {m}", flush=True)

    anchor_ms = None
    if args.big or args.anchor:
        # same-session drift normalizer: the flagship chunk wall, measured
        # FIRST so every row in this file shares one anchor (the HBM-path
        # tier drifts ~13% day-to-day through the tunnel; VMEM-path scales
        # are stable — DEVELOPMENT.md drift log)
        sc_a = smt.build_scene("biceps_full")
        anchor_ms = _chunk_wall(sc_a, reps=3) * 1e3
        log(f"same-session anchor biceps_full: {anchor_ms:.3f} ms/step")

    pk = {}
    if args.profile_length == "auto":
        pk = {"length": None}
    elif args.profile_length:
        pk = {"length": int(args.profile_length)}

    # incremental writes: a multi-hour remote regen must not lose completed
    # rows to a tunnel drop on the last scene — header first, append per row
    hdr = ("scene;particles;" + REPORT_HEADER
           + (";Anchor18k ms" if anchor_ms is not None else "")
           + ";Phase Provenance")
    with open(args.out, "w") as f:
        f.write(hdr + "\n")

    out_rows = []
    for mode in modes:
        mode_rows = rows if mode == "coupled" \
            else (scene_rows or VARIANT_ROWS[mode])
        for name, rep, steps in mode_rows:
            sc = smt.build_scene(name, replicate=rep)
            n = sc.num_particles
            tag = _row_name(name, rep) + (
                "" if mode == "coupled" else f"[{mode}]")
            log(f"{tag}: n={n}")
            big = n > 200_000
            # phase-attribution provenance, machine-readable per row
            # (ADVICE r4): "measured" = the scan-amortized profiler's own
            # numbers; "rescaled-to-wall" = same-session incremental
            # attribution rescaled so columns sum to the chunk wall (the
            # big-row rule — the sum check is then true by construction).
            prov = "rescaled-to-wall" if (big and mode == "coupled") \
                else "measured"
            if mode != "coupled":
                avg, phases, row_cfg = _variant_row(
                    sc, mode, steps, pk if not big else (pk
                                                         or {"length": 8}))
            elif not big:
                # full protocol (stim off at half) + scan-amortized profile
                _state, aux, _ = smt.run_protocol(sc, num_steps=steps,
                                                  chunk=min(100, steps))
                assert int(aux.overflow) == 0, "overflow during protocol"
                phases = profile_phases_fused(sc, **pk)
                avg = phases["total_step"]
                row_cfg = sc.cfg
            else:
                # chunk-wall timing + incremental attribution rescaled so
                # the phase columns sum to the measured wall (committed-row
                # rule)
                avg = _chunk_wall(sc, reps=args.big_reps)
                phases = profile_phases_fused(sc, **(pk or {"length": 8}))
                s = sum(phases[k] for k in
                        ("find_neighbors", "corrected_velocity",
                         "density_pressure", "compute_force"))
                scale = avg / s if s > 0 else 0.0
                phases = {k: (v * scale if isinstance(v, float) else v)
                          for k, v in phases.items()}
                row_cfg = sc.cfg
            row = report_row(row_cfg, steps, avg, phases)
            suffix = f";{anchor_ms:g}" if anchor_ms is not None else ""
            line = f"{tag};{n};{row}{suffix};{prov}"
            out_rows.append(line)
            with open(args.out, "a") as f:
                f.write(line + "\n")
            log(f"  {avg * 1e3:.3f} ms/step [{prov}]")

    if args.campaign:
        # full-length reproductions of the two committed reference-campaign
        # anchors (BASELINE.md): same scene (5,211 particles), same step
        # counts, campaign-era constants (K=0.8, alpha=0.5, beta=0.2 —
        # results_171107/171114.csv cols 11-14 predate the checked-in ctor
        # defaults, SURVEY.md section 6)
        from sph_sm_monodomain_tpu.config import SimConfig
        era = dict(k_stiffness=0.8, sm_alpha=0.5, sm_beta=0.2)
        # sigma is derived (sigma_i*sigma_e/(sigma_i+sigma_e)); the 171107
        # era ran sigma=1 -> sigma_i=sigma_e=2, the 171114 era is the
        # default 0.383
        for steps, over in (
                (2000, dict(sigma_i=2.0, sigma_e=2.0,
                            stim_strength=500000.0, **era)),
                (1000, dict(stim_strength=800000.0, **era))):
            sc = smt.build_scene("biceps_18475",
                                 cfg=SimConfig().replace(**over))
            log(f"campaign biceps_18475 x{steps}: n={sc.num_particles} "
                f"{over}")
            # stim off at step 250 regardless of length, as the reference
            # app does (main.cpp:329-334)
            _state, aux, _ = smt.run_protocol(sc, num_steps=steps,
                                              stim_off_step=250, chunk=100)
            assert int(aux.overflow) == 0
            phases = profile_phases_fused(sc, **pk)
            avg = phases["total_step"]
            row = report_row(sc.cfg, steps, avg, phases)
            suffix = f";{anchor_ms:g}" if anchor_ms is not None else ""
            line = f"biceps_18475;{sc.num_particles};{row}{suffix};measured"
            out_rows.append(line)
            with open(args.out, "a") as f:
                f.write(line + "\n")
            log(f"  {avg * 1e3:.3f} ms/step [measured]")

    log(f"{len(out_rows)} rows -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
