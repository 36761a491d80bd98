"""Aux subsystem tests: bounds, debug/health, determinism, CLI trajectory."""

import numpy as np
import pytest
import jax.numpy as jnp

from sph_sm_monodomain_tpu import SimConfig, init_fluid, step
from sph_sm_monodomain_tpu.ops.bounds import Bounds
from sph_sm_monodomain_tpu.utils.debug import (check_step_determinism,
                                               validate_state)

CFG = SimConfig()


def test_bounds_clamp_and_combine():
    b = Bounds.of((0, 0, 0), (1.5, 1.5, 1.5))
    pos = jnp.asarray([[-1.0, 0.5, 2.0], [0.1, 0.2, 0.3]])
    out = np.asarray(b.clamp(pos))
    np.testing.assert_allclose(out, [[0.0, 0.5, 1.5], [0.1, 0.2, 0.3]])
    c = b.combine(Bounds.of((-1, 0, 0), (1, 1, 1)))
    np.testing.assert_allclose(np.asarray(c.min), [-1, 0, 0])
    np.testing.assert_allclose(np.asarray(c.max), [1.5, 1.5, 1.5])
    i = b.intersect(Bounds.of((0.5, 0.5, 0.5), (2, 2, 2)))
    np.testing.assert_allclose(np.asarray(i.min), [0.5, 0.5, 0.5])


def test_bounds_contain_2d_quirk():
    # m3Bounds.h:70-74: contain only tests x and y
    b = Bounds.of((0, 0, 0), (1, 1, 1))
    p = jnp.asarray([0.5, 0.5, 99.0])  # z way outside
    assert bool(b.contain(p, strict=True))        # quirk: z ignored
    assert not bool(b.contain(p, strict=False))   # corrected 3D test


def test_bounds_clamp_offset_2d_quirk():
    b = Bounds.of((0, 0, 0), (1, 1, 1))
    p = jnp.asarray([[2.0, 2.0, 2.0]])
    out = np.asarray(b.clamp_offset(p, 0.1, strict=True))[0]
    np.testing.assert_allclose(out, [0.9, 0.9, 2.0])  # z untouched (quirk)
    out = np.asarray(b.clamp_offset(p, 0.1, strict=False))[0]
    np.testing.assert_allclose(out, [0.9, 0.9, 0.9])


def test_validate_state_detects_nan(rng):
    pts = np.clip(rng.random((32, 3)).astype(np.float32), 0.1, 1.4)
    st = init_fluid(pts, CFG)
    assert validate_state(st, CFG) == []
    bad = st.replace(vm=st.vm.at[3].set(jnp.nan))
    problems = validate_state(bad, CFG)
    assert any("vm" in p for p in problems)
    # NaN on a PADDED lane is not a problem
    pad_bad = st.replace(vm=st.vm.at[-1].set(jnp.nan))
    assert validate_state(pad_bad, CFG) == []


def test_step_is_deterministic(rng):
    pts = np.clip(rng.normal(size=(96, 3)).astype(np.float32) * 0.05 + 0.6,
                  0.1, 1.3)
    st = init_fluid(pts, CFG)
    assert check_step_determinism(lambda s: step(s, CFG, 32, 9 * 32), st)


def test_assert_state_healthy_raises(rng):
    from sph_sm_monodomain_tpu.utils.debug import assert_state_healthy
    pts = np.clip(rng.random((16, 3)).astype(np.float32), 0.1, 1.4)
    st = init_fluid(pts, CFG)
    assert_state_healthy(st, CFG)   # clean state passes
    bad = st.replace(pos=st.pos.at[2, 1].set(jnp.inf))
    with pytest.raises(AssertionError):
        assert_state_healthy(bad, CFG, where="unit-test")


def test_nan_guard_raises_on_nonfinite_step(rng):
    from sph_sm_monodomain_tpu.utils.debug import nan_guard
    pts = np.clip(rng.random((24, 3)).astype(np.float32), 0.1, 1.4)
    st = init_fluid(pts, CFG)

    healthy = nan_guard(lambda s: step(s, CFG, 32, 9 * 32))
    out, _ = healthy(st)  # clean step passes through

    def poisoned(s):
        s2, aux = step(s, CFG, 32, 9 * 32)
        return s2.replace(pos=s2.pos.at[0, 0].set(jnp.nan)), aux

    with pytest.raises(FloatingPointError):
        nan_guard(poisoned)(st)
    # non-finite values on INACTIVE lanes are not an error
    def pad_poisoned(s):
        s2, aux = step(s, CFG, 32, 9 * 32)
        return s2.replace(pos=s2.pos.at[-1, 0].set(jnp.nan)), aux
    nan_guard(pad_poisoned)(st)


def test_profile_phases_xla_covers_all_seven(rng):
    """The unfused profiler must time each of the reference's 7 phases
    (cpp:794-824) independently and return positive seconds for each."""
    from sph_sm_monodomain_tpu.utils.report import profile_phases
    pts = np.clip(rng.normal(size=(96, 3)).astype(np.float32) * 0.05 + 0.6,
                  0.1, 1.3)
    st = init_fluid(pts, CFG)
    ph = profile_phases(st, CFG, 32, 9 * 32, length=2)
    expected = {"find_neighbors", "corrected_velocity",
                "intermediate_velocity", "density_pressure", "cell_model",
                "compute_force", "update_properties"}
    assert set(ph) == expected
    assert all(v > 0 for v in ph.values()), ph


@pytest.mark.slow
def test_profile_phases_fused_schema_and_reconciliation():
    """The fused-path phase profiler must emit the 7 print_report phase
    columns plus the raw pipeline times, with the attributed columns
    summing to the measured full step (clamped differences, VERDICT r2
    §6/§7)."""
    from sph_sm_monodomain_tpu import build_scene
    from sph_sm_monodomain_tpu.utils.report import profile_phases_fused
    sc = build_scene("susane")
    ph = profile_phases_fused(sc, length=2)
    for k in ("find_neighbors", "corrected_velocity",
              "intermediate_velocity", "density_pressure", "cell_model",
              "compute_force", "update_properties", "total_step"):
        assert k in ph, f"missing column {k}"
    assert ph["total_step"] > 0.0
    attributed = (ph["find_neighbors"] + ph["corrected_velocity"]
                  + ph["intermediate_velocity"] + ph["density_pressure"]
                  + ph["cell_model"] + ph["compute_force"]
                  + ph["update_properties"])
    # exact when no stage delta clamped to zero; generous bound otherwise
    assert attributed <= ph["total_step"] * 1.5 + 1e-9
    assert attributed >= ph["total_step"] * 0.5


def test_profile_phases_monodomain_fused_schema():
    """The monodomain-fused profiler emits the print_report schema with
    only the cell-model and compute-force (Laplacian) columns live —
    geometry phases are hoisted and structurally 0 in that mode."""
    from sph_sm_monodomain_tpu import build_scene
    from sph_sm_monodomain_tpu.utils.report import (
        profile_phases_monodomain_fused)
    sc = build_scene("susane")
    ph = profile_phases_monodomain_fused(sc, length=2)
    assert ph["total_step"] > 0.0
    for k in ("find_neighbors", "corrected_velocity",
              "intermediate_velocity", "density_pressure",
              "update_properties"):
        assert ph[k] == 0.0
    attributed = ph["cell_model"] + ph["compute_force"]
    assert attributed <= ph["total_step"] * 1.5 + 1e-9
    assert attributed >= ph["total_step"] * 0.5


def test_committed_results_row_inventory():
    """The regenerated results_tpu.csv (round 5, one-session regen) must
    keep its full row inventory: the coupled ladder 5k -> 8.28M, the
    BASELINE config 2-3 variant rows, and the two FULL-LENGTH campaign
    reproductions at campaign-era constants (K=0.8, sigma=1 for the
    171107 era) — the committed-campaign discipline
    (/root/reference/results_171107.csv, results_171114.csv)."""
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "results_tpu.csv")
    rows = {}
    for l in open(path):
        if l.strip() and not l.startswith(("#", "scene;")):
            c = l.strip().split(";")
            rows.setdefault(c[0], []).append(c)
    for scene in ("biceps_full", "biceps_18475", "biceps_4944", "biceps_1",
                  "multi_muscle_x7", "multi_muscle_x56", "multi_muscle_x112",
                  "multi_muscle_x224", "multi_muscle_x448", "susane[sph]",
                  "biceps_full[sph]", "biceps_18475[monodomain]",
                  "biceps_full[monodomain]", "multi_muscle_x56[monodomain]"):
        assert scene in rows, f"missing committed row: {scene}"
    # the x448 row is the 165x-beyond-reference-cap evidence
    assert int(rows["multi_muscle_x448"][0][1]) == 8_276_800
    # full-length campaign reproductions: steps 2000 (K=0.8, sigma=1) and
    # 1000 (K=0.8, sigma=0.383)
    camp = {c[4]: c for c in rows["biceps_18475"]}
    assert "2000" in camp and "1000" in camp, camp.keys()
    assert float(camp["2000"][12]) == 0.8 and float(camp["2000"][16]) == 1.0
    assert float(camp["1000"][12]) == 0.8
    assert abs(float(camp["1000"][16]) - 0.382796) < 1e-6


def test_committed_results_rows_phase_sum():
    """Artifact invariant (VERDICT r2 item 3 done-criterion): every row of
    the committed results_tpu.csv has phase columns summing to ~ its avg
    step duration — no garbage or missing attribution like the reference's
    own uninitialized-chrono columns (SURVEY.md §5)."""
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "results_tpu.csv")
    lines = [l for l in open(path) if l.strip() and not l.startswith("#")]
    header = next(l for l in lines if l.startswith("scene;"))
    cols = header.strip().split(";")
    # provenance column (ADVICE r4): synthetic attribution must be labeled
    # so it can't be mistaken for measurement. Rows tagged rescaled-to-wall
    # sum to the wall BY CONSTRUCTION, so the sum check only certifies
    # measurement on rows tagged "measured".
    prov_i = cols.index("Phase Provenance") if "Phase Provenance" in cols \
        else None
    rows = [l for l in lines if not l.startswith("scene;")]
    assert len(rows) >= 9
    for l in rows:
        c = l.strip().split(";")
        scene, avg = c[0], float(c[3])
        phase_sum = sum(float(c[i]) for i in range(5, 12))
        assert avg > 0, l
        assert 0.85 * avg <= phase_sum <= 1.15 * avg, (
            f"{scene}: phases {phase_sum:.6f} vs step {avg:.6f}")
        if prov_i is not None:
            assert c[prov_i] in ("measured", "rescaled-to-wall"), l


def test_halo_row_artifact_format(tmp_path):
    """append_halo_row writes a parseable pricing row (header once, then
    rows); the committed results_tpu_halo.csv — the halo-on-real-TPU
    artifact (VERDICT r3 item 3) — satisfies the same invariants."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "halo_tpu_under_test",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "halo_tpu.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    HALO_ROW_HEADER, append_halo_row = mod.HALO_ROW_HEADER, mod.append_halo_row

    def check(path, min_rows):
        lines = [l for l in open(path) if l.strip()
                 and not l.startswith("#")]
        assert lines[0].strip() == HALO_ROW_HEADER
        rows = lines[1:]
        assert len(rows) >= min_rows
        for l in rows:
            c = l.strip().split(";")
            scene, n, dev = c[0], int(c[1]), int(c[2])
            halo_s, v4_s, ratio = float(c[3]), float(c[4]), float(c[5])
            assert scene.startswith("halo_d") and n > 0 and dev >= 1
            assert halo_s > v4_s > 0  # slab rent is real
            assert abs(ratio - halo_s / v4_s) < 1e-3 * ratio

    p = tmp_path / "halo.csv"
    append_halo_row(str(p), "halo_d1_x7", 129325, 1, 0.0924, 0.0211,
                    1.70, 20, 18.0, "tpu")
    append_halo_row(str(p), "halo_d1_x56", 1034600, 1, 0.642, 0.1857,
                    1.70, 10, 60.0, "tpu")
    check(str(p), 2)

    committed = os.path.join(os.path.dirname(__file__), "..",
                             "results_tpu_halo.csv")
    if os.path.exists(committed):
        check(committed, 1)


def test_profile_phases_sph_fused_schema():
    """The SPH-fused profiler: no SM / EP columns, bookkeeping + sweep
    attribution sums to the measured full step."""
    from sph_sm_monodomain_tpu import build_scene
    from sph_sm_monodomain_tpu.utils.report import profile_phases_sph_fused
    sc = build_scene("susane")
    ph = profile_phases_sph_fused(sc, length=2)
    assert ph["total_step"] > 0.0
    for k in ("corrected_velocity", "intermediate_velocity", "cell_model",
              "update_properties"):
        assert ph[k] == 0.0
    attributed = (ph["find_neighbors"] + ph["density_pressure"]
                  + ph["compute_force"])
    assert attributed <= ph["total_step"] * 1.5 + 1e-9
    assert attributed >= ph["total_step"] * 0.5


@pytest.mark.slow
def test_bench_rows_tool_smoke(tmp_path):
    """tools/bench_rows.py regenerates results_tpu.csv rows end-to-end
    (provenance for the committed benchmark table): one tiny CPU run must
    emit a schema-correct row whose phase columns sum to ~ the step."""
    import subprocess, sys
    out = tmp_path / "rows.csv"
    root = __file__.rsplit("/tests/", 1)[0]
    # profile-length 'auto' sizes the stage scans from the scene's own
    # measured cost, so the stage deltas dominate dispatch jitter even
    # under suite contention — no retry band needed (VERDICT r3 §7)
    r = subprocess.run(
        [sys.executable, f"{root}/tools/bench_rows.py",
         "--scenes", "susane::4", "--profile-length", "auto",
         "--out", str(out)],
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = out.read_text().splitlines()
    assert lines[0].startswith("scene;particles;Avg FPS")
    cols = lines[1].split(";")
    assert cols[0] == "susane"
    avg = float(cols[3])
    phase_sum = sum(float(cols[i]) for i in range(5, 12))
    assert avg > 0
    assert 0.85 * avg <= phase_sum <= 1.15 * avg + 1e-9, \
        f"phase columns did not reconcile: sum {phase_sum} vs avg {avg}"


@pytest.mark.slow
def test_hbm_footprint_tool_smoke():
    """tools/hbm_footprint.py AOT-compiles the fused step and reports
    XLA's memory analysis (the tool-computed single-chip ceiling)."""
    import subprocess, sys
    root = __file__.rsplit("/tests/", 1)[0]
    r = subprocess.run(
        [sys.executable, f"{root}/tools/hbm_footprint.py",
         "--scenes", "susane"],
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [ln.split() for ln in r.stdout.splitlines()
            if ln.strip().startswith("susane")]
    assert len(rows) == 1 and rows[0][1] == "507"
    assert float(rows[0][6]) > 0          # bytes per particle
    assert int(rows[0][7].replace(",", "")) > 507   # projected ceiling


def test_sweep_summarize_committed_campaign(tmp_path):
    """tools/sweep.py --summarize (the results.ods analog) must analyze
    the committed campaign CSV: sensitivity table per parameter and a
    phase-column reconciliation near 100%."""
    import subprocess
    import sys
    from pathlib import Path
    repo = Path(__file__).parent.parent
    out_md = tmp_path / "summary.md"
    r = subprocess.run(
        [sys.executable, str(repo / "tools" / "sweep.py"), "--summarize",
         "--out", str(repo / "results_tpu_sweep.csv"),
         "--summary-out", str(out_md)],
        capture_output=True, text=True, cwd=repo, timeout=300)
    assert r.returncode == 0, r.stderr
    text = out_md.read_text()
    for param in ("| K |", "| alpha |", "| beta |", "| mu |"):
        assert param in text
    # reconciliation: phases sum to ~100% of each row's step
    import re
    m = re.search(r"phases sum to ([\d.]+)% ", text)
    assert m and 90.0 <= float(m.group(1)) <= 110.0, text[-300:]


@pytest.mark.slow
def test_sweep_repeat_smoke(tmp_path):
    """tools/sweep.py --repeat N (variance mode): the two reference anchor
    configurations only, N RAW rows each (no best-of filtering) — the
    artifact shape of results_171107/171114.csv, which are 108/132
    repeats of one configuration each."""
    import subprocess
    import sys
    from pathlib import Path
    repo = Path(__file__).parent.parent
    out_csv = tmp_path / "rep.csv"
    r = subprocess.run(
        [sys.executable, str(repo / "tools" / "sweep.py"), "--repeat", "3",
         "--scene", "susane", "--steps", "4", "--out", str(out_csv)],
        capture_output=True, text=True, cwd=repo, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "CoV" in r.stdout
    rows = [ln.split(";") for ln in out_csv.read_text().splitlines()
            if ln and not ln.startswith("#") and not ln.startswith("Avg F")]
    assert len(rows) == 6  # 2 anchors x 3 raw samples
    stims = [float(row[15]) for row in rows]
    assert stims == [500000.0] * 3 + [800000.0] * 3
    # raw samples, not copies of one measurement: the tool computes sd/CoV
    # from them and reports min <= mean <= max (string-uniqueness of the
    # formatted durations would flake when two timings collide at 6
    # significant digits on a very stable machine)
    import re
    m = re.search(r"n=3 mean=([\d.]+) ms/step sd=[\d.]+ CoV=[\d.]+% "
                  r"min=([\d.]+) max=([\d.]+)", r.stdout)
    assert m, r.stdout[-2000:]
    mean, lo, hi = (float(g) for g in m.groups())
    assert lo <= mean <= hi


@pytest.mark.slow
def test_sweep_dynamic_smoke(tmp_path):
    """tools/sweep.py --dynamic end-to-end at tiny size: one compiled
    program (XLA path on CPU) serves every grid row via traced params;
    rows land in print_report schema with phase columns summing to the
    row step (compute_force absorbs the residual by construction)."""
    import subprocess
    import sys
    from pathlib import Path
    repo = Path(__file__).parent.parent
    out_csv = tmp_path / "dyn.csv"
    r = subprocess.run(
        [sys.executable, str(repo / "tools" / "sweep.py"), "--dynamic",
         "--quick", "--scene", "susane", "--steps", "6",
         "--out", str(out_csv)],
        capture_output=True, text=True, cwd=repo, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ONE compile" in r.stdout
    rows = [ln.split(";") for ln in out_csv.read_text().splitlines()
            if ln and not ln.startswith("#") and not ln.startswith("Avg F")]
    assert len(rows) == 8, r.stdout[-500:]
    ks = {float(row[10]) for row in rows}
    assert ks == {0.8, 0.3}  # anchor + grid K values reached the rows
    for row in rows:
        step = float(row[1])
        phases = sum(float(row[i]) for i in range(3, 10))
        assert step > 0 and abs(phases - step) / step < 0.05
    # physics observables land in the sibling _obs.csv (one row per config)
    obs = [ln.split(";") for ln in
           (tmp_path / "dyn_obs.csv").read_text().splitlines()
           if ln and not ln.startswith("#") and not ln.startswith("K;")]
    assert len(obs) == 8
    assert all(float(row[6]) >= 0 for row in obs)  # disp_mean_mid


def test_roofline_host_side_accounting(capsys):
    """tools/roofline.py with --ms-per-step/--peak supplied is pure
    host-side window math (the efficiency-denominator recount, VERDICT r2
    §6) — it must report tested/true slot counts and a sane utilization
    for a small scene without touching a device for timing."""
    import runpy
    import sys
    from pathlib import Path
    script = Path(__file__).parent.parent / "tools" / "roofline.py"
    argv0 = sys.argv
    try:
        sys.argv = [str(script), "--scene", "susane",
                    "--ms-per-step", "0.114", "--peak", "3.81e12"]
        try:
            runpy.run_path(str(script), run_name="__main__")
        except SystemExit as e:  # script exits 0 on success
            assert not e.code
    finally:
        sys.argv = argv0
    out = capsys.readouterr().out
    assert "slots/query tested" in out
    import re
    m = re.search(r"slots/query tested :\s*([\d.]+)", out)
    assert m and float(m.group(1)) > 0


def test_time_chained_measures_dependent_calls(rng):
    from sph_sm_monodomain_tpu.utils.profiling import time_chained
    pts = np.clip(rng.random((24, 3)).astype(np.float32), 0.1, 1.4)
    st = init_fluid(pts, CFG)
    per_step, final = time_chained(lambda s: step(s, CFG, 32, 9 * 32),
                                   st, steps=3)
    assert per_step > 0.0
    # the returned state really is 3 steps downstream of the warmup input
    ref = st
    for _ in range(3):
        ref, _ = step(ref, CFG, 32, 9 * 32)
    np.testing.assert_array_equal(np.asarray(final.pos), np.asarray(ref.pos))


@pytest.mark.slow
def test_cli_traj_streaming(tmp_path):
    from sph_sm_monodomain_tpu.cli import main
    from sph_sm_monodomain_tpu.runtime import read_trajectory
    traj = tmp_path / "t.bin"
    rc = main(["--scene", "cube", "--steps", "4", "--stim-off-step", "-1",
               "--chunk", "2", "--traj", str(traj)])
    assert rc == 0
    steps, payload = read_trajectory(traj)
    assert len(steps) == 2  # one frame per chunk
    assert payload.shape[2] == 4
    assert np.isfinite(payload).all()


def test_config_runtime_toggles():
    # add_viscosity guard (cpp:87-91), flip_quadratic/flip_volume (h:154-155)
    cfg = CFG
    assert cfg.add_viscosity(50.0).mu_viscosity == 150.0
    assert cfg.add_viscosity(-100.0).mu_viscosity == 0.0
    # guard: mu + value < 0 -> unchanged
    assert cfg.add_viscosity(-150.0).mu_viscosity == 100.0
    assert cfg.flip_quadratic().quadratic_match != cfg.quadratic_match
    assert cfg.flip_volume().volume_conservation != cfg.volume_conservation


def test_cli_rejects_unknown_config_key():
    import pytest
    from sph_sm_monodomain_tpu.cli import main
    with pytest.raises(SystemExit):
        main(["--scene", "cube", "--steps", "1", "--set", "nope=1"])


def test_checkpoint_roundtrip_sharded(tmp_path, rng):
    import jax
    import numpy as np
    from sph_sm_monodomain_tpu import (SimConfig, init_fluid,
                                       save_checkpoint, load_checkpoint)
    from sph_sm_monodomain_tpu.parallel.sharded_step import (make_mesh,
                                                             shard_state)
    cfg = SimConfig()
    pts = np.clip(rng.random((100, 3)).astype(np.float32), 0.1, 1.4)
    st = init_fluid(pts, cfg, pad_to=128)
    sharded = shard_state(st, make_mesh(jax.devices()[:8]))
    path = str(tmp_path / "sharded.npz")
    save_checkpoint(path, sharded, step=7)
    restored, step_no = load_checkpoint(path)
    assert step_no == 7
    np.testing.assert_array_equal(np.asarray(restored.pos),
                                  np.asarray(st.pos))


def test_susane_sph_only_scene(rng):
    # BASELINE config 2: SPH-only mode on the susane cloud
    import numpy as np
    from sph_sm_monodomain_tpu import build_scene
    from sph_sm_monodomain_tpu.models import variants
    cfg = variants.sph_only_config(CFG)
    sc = build_scene("susane", cfg, stim=False)
    assert sc.num_particles == 507  # SURVEY.md D1
    st = sc.state
    pos0 = np.asarray(st.pos)[:507]
    assert (pos0 >= 0).all() and (pos0 <= 1.5).all()  # rescaled into world
    for _ in range(3):
        st, aux = variants.step_sph_only(st, sc.cfg, sc.cell_capacity,
                                         sc.neighbor_capacity)
        assert int(aux.overflow) == 0
    assert np.isfinite(np.asarray(st.pos)[:507]).all()
