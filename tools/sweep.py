"""Parameter-sweep benchmark campaign — the TPU re-issue of the
reference's committed run-log campaign (component D2).

The reference ships 109 + 133 full-run rows (results_171107.csv /
results_171114.csv, schema printed by print_report at
/root/reference/SPH_SM_monodomain/SPH_SM_monodomain.cpp:785-792). Their
recorded parameter columns are CONSTANT within each file — the campaign is
two configurations, (sigma=1, stim=500000) and (sigma=0.383, stim=800000),
measured repeatedly. This tool reproduces both anchors exactly and extends
them with a grid over the headline physics constants (K, alpha, beta, mu —
the knobs the reference exposes as ctor constants, cpp:40, 64-65, 49),
emitting one print_report-schema row per configuration.

Timing discipline (DEVELOPMENT.md): each row's step time is measured over
chained lax.scan chunks with a value fetch per chunk; each configuration is
a separate XLA compile (cfg is a static argument), so a full campaign is
dominated by compile time on the remote tunnel — run it in the background.

Per-phase columns: the sort/SM/sweep-A stages are profiled ONCE per scene
at the anchor configuration (4 extra compiles) and reused across rows;
each row's compute_force column is its measured total minus those shared
stage costs, so every row's phase columns sum to its own avg step by
construction. (Re-profiling all 4 pipelines per row would quadruple the
campaign's compile cost for <1% column movement: the sort and SM stage
costs do not depend on K/alpha/beta/mu.)

Usage:
  python tools/sweep.py --scene biceps_18475 --steps 500 \
      --out results_tpu_sweep.csv
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def reference_anchor_configs(base):
    """The two configurations of the committed reference campaign.

    sigma is derived (sigma_i*sigma_e/(sigma_i+sigma_e), cpp:26):
    sigma=1 needs sigma_i=sigma_e=2; the 171114 file's 0.3828 is the
    checked-in default. K/alpha/beta in the logs predate the checked-in
    constants (K=0.8, a=0.5, b=0.2 vs ctor 0.5/0.3/0.4 — BASELINE.md)."""
    common = dict(k_stiffness=0.8, sm_alpha=0.5, sm_beta=0.2,
                  mu_viscosity=100.0)
    return [
        base.replace(sigma_i=2.0, sigma_e=2.0, stim_strength=500000.0,
                     **common),
        base.replace(stim_strength=800000.0, **common),
    ]


def grid_configs(base, full: bool = False):
    """K x alpha/beta x mu grid around the reference constants; --grid full
    crosses in the two axes the reference anchors vary (sigma, stim)."""
    cfgs = []
    ep_axes = [(None, None)]  # (sigma_i/e override, stim override)
    if full:
        # sigma=1 needs sigma_i=sigma_e=2 (derived, cpp:26); the stim
        # values are the two committed campaign anchors
        ep_axes = [(None, 300.0), (None, 800000.0),
                   (2.0, 300.0), (2.0, 500000.0)]
    for k, (al, be), mu, (sig, stim) in itertools.product(
            (0.3, 0.5, 0.8),
            ((0.3, 0.4), (0.5, 0.2)),
            (50.0, 100.0, 200.0),
            ep_axes):
        kw = dict(k_stiffness=k, sm_alpha=al, sm_beta=be, mu_viscosity=mu)
        if sig is not None:
            kw.update(sigma_i=sig, sigma_e=sig)
        if stim is not None:
            kw.update(stim_strength=stim)
        cfgs.append(base.replace(**kw))
    return cfgs


def summarize(csv_path: str, out_md: str | None) -> int:
    """Analysis pass over a campaign CSV — the TPU stand-in for the
    reference's results.ods spreadsheet: per-parameter sensitivity of the
    avg step time, campaign extremes, and phase-share sanity."""
    import numpy as np
    rows = []
    with open(csv_path) as f:
        for ln in f:
            if ln.startswith("#") or ln.startswith("Avg FPS"):
                continue
            cols = ln.strip().split(";")
            if len(cols) < 23:
                continue
            rows.append([float(c) for c in cols])
    if not rows:
        print(f"no rows in {csv_path}")
        return 1
    a = np.array(rows)
    step_ms = a[:, 1] * 1e3
    # schema indices: 1=step, 3..9=phases, 10=K, 11=alpha, 12=beta,
    # 13=mu, 14=sigma, 15=stim
    lines = [
        "# Sweep campaign analysis",
        "",
        f"Source: `{os.path.basename(csv_path)}` — {len(rows)} runs, "
        f"{int(a[0, 2])} steps each (stim-off at half), biceps_18475 "
        "anchor scene. The TPU re-issue of the analysis the reference "
        "keeps in `results.ods` over results_171107/171114.csv.",
        "",
        f"- avg step: min {step_ms.min():.3f} ms / median "
        f"{np.median(step_ms):.3f} ms / max {step_ms.max():.3f} ms",
        f"- throughput spread across the whole physics grid: "
        f"{step_ms.max() / step_ms.min():.2f}x",
        "",
        "Per-parameter sensitivity (mean step ms per value; the step time "
        "is dominated by candidate-lane enumeration, so physics constants "
        "only move it through density/contraction state):",
        "",
        "| param | value -> mean ms/step |",
        "|---|---|",
    ]
    for name, col in (("K", 10), ("alpha", 11), ("beta", 12), ("mu", 13),
                      ("sigma", 14), ("stim", 15)):
        vals = sorted(set(a[:, col]))
        cells = ", ".join(
            f"{v:g} -> {step_ms[a[:, col] == v].mean():.3f}" for v in vals)
        lines.append(f"| {name} | {cells} |")
    head = a[:, 3] + a[:, 4] + a[:, 6]   # find + corrvel + dens-pressure
    share = (head + a[:, 8]) / a[:, 1]   # + compute_force
    lines += [
        "",
        f"Phase-column reconciliation: phases sum to "
        f"{share.mean() * 100:.1f}% of the row step on average "
        f"(min {share.min() * 100:.1f}%, by construction ~100).",
    ]

    obs_path = csv_path.rsplit(".", 1)[0] + "_obs.csv"
    if os.path.exists(obs_path):
        # physics-observable sensitivity (dynamic campaigns): how the peak
        # contraction at stim-off moves with each swept constant
        orows = []
        with open(obs_path) as f:
            for ln in f:
                if ln.startswith("#") or ln.startswith("K;"):
                    continue
                orows.append([float(c) for c in ln.strip().split(";")])
        if orows:
            b = np.array(orows)
            lines += [
                "",
                "Physics sensitivity (mean displacement at stim-off — peak "
                "contraction — per parameter value; "
                f"`{os.path.basename(obs_path)}`):",
                "",
                "| param | value -> mean disp_mid |",
                "|---|---|",
            ]
            for name, col in (("K", 0), ("alpha", 1), ("beta", 2),
                              ("mu", 3), ("sigma", 4), ("stim", 5)):
                vals = sorted(set(b[:, col]))
                cells = ", ".join(
                    f"{v:g} -> {b[b[:, col] == v, 6].mean():.4f}"
                    for v in vals)
                lines.append(f"| {name} | {cells} |")
    text = "\n".join(lines) + "\n"
    if out_md:
        with open(out_md, "w") as f:
            f.write(text)
        print(f"summary -> {out_md}")
    else:
        print(text)
    return 0


def run_dynamic(args, cfgs, scene0) -> int:
    """Recompile-free campaign: every configuration runs through ONE
    compiled program, its physics constants fed as traced params
    (config.PARAM_FIELDS — on TPU they ride into the v4 fused kernels as
    an SMEM operand, ops/fused_step.build_dynp). stim_strength lives in
    state.stim (set at scene build), so rows that change it rescale the
    stimulated entries instead.

    The reference's campaign workflow is one app launch per configuration
    (242 committed rows = 242 builds/runs); the static sweep above is one
    ~minutes-long XLA compile per configuration; this mode compiles ONCE
    and then pays only device time per row (~0.4 s at the anchor scene).
    The protocol runs as two half-length dispatches (stim-on, then
    stim-off from its first step) so a single device execution stays far
    below the tunnel's kill limit at any scene size."""
    import time as _time

    import jax
    import jax.numpy as jnp
    import sph_sm_monodomain_tpu as smt
    from sph_sm_monodomain_tpu.utils.report import (REPORT_HEADER,
                                                    profile_phases,
                                                    profile_phases_fused,
                                                    report_row)

    base_cfg = cfgs[0]  # static program config; physics arrive as params
    state0 = scene0.state
    stim_mask = state0.stim > 0.0
    dyn_fields = ("k_stiffness", "sm_alpha", "sm_beta", "mu_viscosity",
                  "sigma_i", "sigma_e")
    fused = jax.default_backend() == "tpu"  # CPU: interpret-mode Pallas
    impl = scene0.fused_impl if fused else None
    if fused and impl != "v4":
        raise SystemExit(f"--dynamic rides the v4 fused kernels; scene "
                         f"tuned to impl={impl!r} (use --impl v4)")
    half = args.steps // 2
    print(f"dynamic campaign: {len(cfgs)} configs x {args.steps} steps on "
          f"{args.scene} ({scene0.num_particles} particles), ONE compile, "
          f"path={'fused-v4' if fused else 'xla'}, "
          f"backend={jax.default_backend()}", flush=True)

    def fetch(st):
        return float(st.pos[0, 0])

    def run_row(cfg):
        """Full stim-on -> stim-off protocol; returns (mid_state, end
        state) so each row also yields PHYSICS observables — peak
        contraction at stim-off and the relaxed end state — not just wall
        time (the reference campaign records timing only)."""
        st = state0.replace(stim=jnp.where(
            stim_mask, jnp.float32(cfg.stim_strength), state0.stim))
        params = {f: jnp.asarray(getattr(cfg, f), jnp.float32)
                  for f in dyn_fields}
        kw = dict(fused=fused, q_block=scene0.q_block,
                  w_window=scene0.block_window,
                  sub_q=(scene0.sub_block or None), impl=impl or "v3",
                  params=params)
        # two half-protocol dispatches: [0, half) stim-on, then stim-off
        # fires before the first step of the second half (main.cpp:329-334)
        mid, _ = smt.simulate(st, base_cfg, scene0.cell_capacity,
                              scene0.neighbor_capacity, num_steps=half,
                              stim_off_step=-1, **kw)
        end, _ = smt.simulate(mid, base_cfg, scene0.cell_capacity,
                              scene0.neighbor_capacity,
                              num_steps=args.steps - half,
                              stim_off_step=0, **kw)
        return mid, end

    n_act = scene0.num_particles

    def observables(cfg, mid, end):
        """Host-side physics summary of one run (active rows only)."""
        import numpy as np
        o = {}
        for tag, st in (("mid", mid), ("end", end)):
            disp = np.linalg.norm(
                np.asarray(st.pos)[:n_act] - np.asarray(st.orig_pos)[:n_act],
                axis=1)
            vm = np.asarray(st.vm)[:n_act]
            o[f"disp_mean_{tag}"] = float(disp.mean())
            o[f"disp_max_{tag}"] = float(disp.max())
            o[f"vm_min_{tag}"] = float(vm.min())
            o[f"vm_max_{tag}"] = float(vm.max())
        return o

    t0 = _time.time()
    fetch(run_row(cfgs[0])[1])  # the one compile
    compile_s = _time.time() - t0
    # shared stage profile at the anchor config (constants move the split
    # by <1%; each row's compute_force absorbs its residual)
    if fused:
        shared = profile_phases_fused(scene0)
        shared.pop("total_step", None)
        shared.pop("raw_pipeline_s", None)
        shared.pop("compute_force", None)
    else:
        shared = profile_phases(state0, base_cfg, scene0.cell_capacity,
                                scene0.neighbor_capacity)
    head = sum(v for k, v in shared.items() if k != "compute_force")
    print(f"compiled+warm in {compile_s:.0f}s; shared phase head "
          f"{head*1e3:.3f}ms", flush=True)

    write_header = not os.path.exists(args.out)
    with open(args.out, "a") as f:
        if write_header:
            f.write("# TPU re-issue of the reference benchmark campaign "
                    "(dynamic-params mode: one compiled program, physics "
                    "constants as traced inputs to the v4 fused "
                    "kernels).\n")
            f.write(REPORT_HEADER + "\n")
        else:
            f.write("# --- dynamic-params rows below (one compile for "
                    "the whole grid) ---\n")
        obs_path = args.out.rsplit(".", 1)[0] + "_obs.csv"
        obs_keys = ("disp_mean_mid", "disp_max_mid", "vm_min_mid",
                    "vm_max_mid", "disp_mean_end", "disp_max_end",
                    "vm_min_end", "vm_max_end")
        obs_f = open(obs_path, "a")
        if obs_f.tell() == 0:
            obs_f.write("# Physics observables per campaign row (active "
                        "particles; 'mid' = at stim-off, step "
                        f"{half}; 'end' = after relaxation, step "
                        f"{args.steps}). The scientific output the "
                        "reference's timing-only campaign lacks.\n")
            obs_f.write("K;Alpha;Beta;Mu;sigma;Stim strength;"
                        + ";".join(obs_keys) + "\n")
        for i, cfg in enumerate(cfgs):
            avg_step = 1e9
            for _ in range(2):
                t0 = _time.time()
                mid, end = run_row(cfg)
                fetch(end)
                avg_step = min(avg_step,
                               (_time.time() - t0) / args.steps)
            phases = dict(shared)
            phases["compute_force"] = max(avg_step - head, 0.0)
            f.write(report_row(cfg, args.steps, avg_step, phases) + "\n")
            f.flush()
            o = observables(cfg, mid, end)
            obs_f.write(";".join(
                [f"{cfg.k_stiffness:g}", f"{cfg.sm_alpha:g}",
                 f"{cfg.sm_beta:g}", f"{cfg.mu_viscosity:g}",
                 f"{cfg.sigma:.6g}", f"{cfg.stim_strength:g}"]
                + [f"{o[k]:.6g}" for k in obs_keys]) + "\n")
            obs_f.flush()
            print(f"[{i + 1}/{len(cfgs)}] K={cfg.k_stiffness} "
                  f"a={cfg.sm_alpha} b={cfg.sm_beta} "
                  f"mu={cfg.mu_viscosity} sigma={cfg.sigma:.3f} "
                  f"stim={cfg.stim_strength:g}: {avg_step*1e3:.2f} ms/step "
                  f"disp_mid={o['disp_mean_mid']:.4f}", flush=True)
    obs_f.close()
    print(f"campaign -> {args.out}; observables -> {obs_path}")
    return 0


def _at_least_one(s: str) -> int:
    v = int(s)
    if v < 1:
        raise argparse.ArgumentTypeError(f"must be >= 1 (got {v})")
    return v


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--scene", default="biceps_18475",
                    help="reference app scene (5,211 particles)")
    ap.add_argument("--steps", type=int, default=500,
                    help="steps per run (reference: 500..2000)")
    ap.add_argument("--out", default="results_tpu_sweep.csv")
    ap.add_argument("--quick", action="store_true",
                    help="anchors + a 6-point grid (smoke test)")
    ap.add_argument("--grid", default="default",
                    choices=("default", "full"),
                    help="'full' crosses in the sigma/stim anchor axes "
                         "(74 configs, ~reference campaign breadth)")
    ap.add_argument("--impl", default=None, help="fused impl override")
    ap.add_argument("--dynamic", action="store_true",
                    help="recompile-free campaign: ONE compiled XLA-path "
                         "program serves every configuration via traced "
                         "params (config.PARAM_FIELDS); stim differences "
                         "rescale state.stim. Trades the fused step's "
                         "speed for zero per-config compiles — the whole "
                         "grid runs in minutes instead of hours")
    ap.add_argument("--repeat", type=_at_least_one, default=1, metavar="N",
                    help="variance mode: run ONLY the two reference anchor "
                         "configurations, N raw timed runs each, one row "
                         "per run (no best-of filtering). This is the "
                         "artifact shape the reference actually committed "
                         "— results_171107/171114.csv are 108 + 132 "
                         "repeats of one configuration each (run-to-run "
                         "CoV 1.4%/1.5%) — so the TPU framework's timing "
                         "stability is directly comparable")
    ap.add_argument("--summarize", action="store_true",
                    help="analyze an existing campaign CSV (no TPU work)")
    ap.add_argument("--summary-out", default=None, metavar="PATH.md")
    args = ap.parse_args()

    if args.summarize:
        return summarize(args.out, args.summary_out)
    if args.dynamic and args.repeat > 1:
        # run_dynamic emits its own best-of rows and never reads --repeat;
        # silently dropping variance mode would produce the wrong artifact
        raise SystemExit("--repeat is not supported with --dynamic (the "
                         "one-compile campaign emits best-of rows); run "
                         "variance mode without --dynamic")

    import jax
    import numpy as np
    import sph_sm_monodomain_tpu as smt
    from sph_sm_monodomain_tpu.config import SimConfig
    from sph_sm_monodomain_tpu.utils.report import (REPORT_HEADER,
                                                    profile_phases_fused,
                                                    report_row)

    base = SimConfig()
    if args.repeat > 1:
        cfgs = reference_anchor_configs(base)  # the committed campaign
    else:
        cfgs = reference_anchor_configs(base) + grid_configs(
            base, full=args.grid == "full")
    if args.quick:
        cfgs = cfgs[:8]
    scene0 = smt.build_scene(args.scene, cfgs[0], fused_impl=args.impl)
    if args.dynamic:
        return run_dynamic(args, cfgs, scene0)
    fused = jax.default_backend() == "tpu"
    print(f"campaign: {len(cfgs)} configs x {args.steps} steps on "
          f"{args.scene} ({scene0.num_particles} particles), "
          f"impl={scene0.fused_impl}, backend={jax.default_backend()}",
          flush=True)

    # shared stage profile at the first anchor (phases reused across rows,
    # see module docstring)
    shared = {}
    if fused:
        t0 = time.time()
        shared = profile_phases_fused(scene0)
        print(f"shared stage profile in {time.time() - t0:.0f}s: "
              f"book={shared['find_neighbors']*1e3:.3f}ms "
              f"sm={shared['corrected_velocity']*1e3:.3f}ms "
              f"sweepA={shared['density_pressure']*1e3:.3f}ms", flush=True)

    def fetch(st):
        return float(st.pos[0, 0])

    write_header = not os.path.exists(args.out)
    with open(args.out, "a") as f:
        if write_header:
            f.write("# TPU re-issue of the reference benchmark campaign "
                    "(results_171107/171114.csv). One row per run; "
                    "find_neighbors/corrected_velocity/density_pressure "
                    "profiled once per scene at the anchor config, "
                    "compute_force = row total - those (columns sum to "
                    "the row's avg step).\n")
            f.write(REPORT_HEADER + "\n")
        for i, cfg in enumerate(cfgs):
            sc = smt.build_scene(args.scene, cfg, fused_impl=args.impl)
            state = sc.state
            t0 = time.time()
            out = smt.simulate(state, cfg, sc.cell_capacity,
                               sc.neighbor_capacity, num_steps=args.steps,
                               stim_off_step=args.steps // 2, fused=fused,
                               q_block=sc.q_block, w_window=sc.block_window,
                               sub_q=(sc.sub_block or None),
                               impl=sc.fused_impl, pack_cap=sc.pack_cap)
            fetch(out[0])
            compile_s = time.time() - t0
            # timed run: the SAME program as the warm call (stim_off_step
            # is a static argument — dropping it would recompile INSIDE the
            # timing), re-fed with the fresh scene state so the row covers
            # the full stim-on -> stim-off protocol like the reference runs
            def emit(avg_step):
                phases = dict(shared)
                if fused and shared:
                    head = (shared["find_neighbors"]
                            + shared["corrected_velocity"]
                            + shared["density_pressure"])
                    phases["compute_force"] = max(avg_step - head, 0.0)
                    phases.pop("total_step", None)
                    phases.pop("raw_pipeline_s", None)
                f.write(report_row(cfg, args.steps, avg_step, phases)
                        + "\n")
                f.flush()

            samples = []
            for rep in range(max(args.repeat, 2)):
                t0 = time.time()
                out = smt.simulate(state, cfg, sc.cell_capacity,
                                   sc.neighbor_capacity,
                                   num_steps=args.steps,
                                   stim_off_step=args.steps // 2,
                                   fused=fused, q_block=sc.q_block,
                                   w_window=sc.block_window,
                                   sub_q=(sc.sub_block or None),
                                   impl=sc.fused_impl, pack_cap=sc.pack_cap)
                fetch(out[0])
                samples.append((time.time() - t0) / args.steps)
                if args.repeat > 1:
                    # variance mode: one RAW row per run, like the
                    # reference's committed repeat files
                    emit(samples[-1])
            if args.repeat > 1:
                m = sum(samples) / len(samples)
                sd = (sum((s - m) ** 2 for s in samples)
                      / max(len(samples) - 1, 1)) ** 0.5
                print(f"[{i + 1}/{len(cfgs)}] anchor "
                      f"sigma={cfg.sigma:.3f} stim={cfg.stim_strength:g}: "
                      f"n={len(samples)} mean={m*1e3:.3f} ms/step "
                      f"sd={sd*1e3:.3f} CoV={sd/m*100:.2f}% "
                      f"min={min(samples)*1e3:.3f} "
                      f"max={max(samples)*1e3:.3f} "
                      f"(reference files: CoV 1.4% / 1.5%)", flush=True)
                continue
            avg_step = min(samples)
            emit(avg_step)
            print(f"[{i + 1}/{len(cfgs)}] K={cfg.k_stiffness} "
                  f"a={cfg.sm_alpha} b={cfg.sm_beta} mu={cfg.mu_viscosity} "
                  f"sigma={cfg.sigma:.3f} stim={cfg.stim_strength:g}: "
                  f"{avg_step*1e3:.2f} ms/step "
                  f"(compile+warm {compile_s:.0f}s)", flush=True)
    print(f"campaign -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
