"""Harness-parity tests: renderer colormap, report schema, CLI smoke."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sph_sm_monodomain_tpu import SimConfig, init_fluid
from sph_sm_monodomain_tpu.utils.render import render_points, set_color
from sph_sm_monodomain_tpu.utils.report import REPORT_HEADER, report_row

CFG = SimConfig()


def test_set_color_matches_reference_ramp():
    # main.cpp:122-143: value <= mid -> (r, r, 1-r); value > mid -> (1, 1-r, 0)
    lo, hi = -0.05, 0.05
    mid = (hi - lo) / 2  # 0.05
    c = set_color(np.array([0.025]), lo, hi)[0]  # ratio = 0.5
    np.testing.assert_allclose(c, [0.5, 0.5, 0.5], atol=1e-6)
    c = set_color(np.array([0.075]), lo, hi)[0]  # above mid: ratio = 0.5
    np.testing.assert_allclose(c, [1.0, 0.5, 0.0], atol=1e-6)
    c = set_color(np.array([0.0]), lo, hi)[0]    # zero -> pure blue
    np.testing.assert_allclose(c, [0.0, 0.0, 1.0], atol=1e-6)


def test_render_points_shape_and_content(rng):
    pts = np.clip(rng.random((100, 3)).astype(np.float32), 0.1, 1.4)
    st = init_fluid(pts, CFG)
    img = render_points(st, CFG, size=128)
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8
    # some pixels differ from background
    assert (img != 26).any()
    img_v = render_points(st, CFG, mode="voltage", size=64)
    assert img_v.shape == (64, 64, 3)


def test_render_world_box_decoration(rng):
    """world_box=True draws the reference display()'s decoration: a white
    wireframe world cube and the origin axes with the reference's color
    quirk (BLUE x / RED y / GREEN z, main.cpp:311-324). The particle ramp
    can never produce pure white / pure axis colors, so their presence is
    an exact signature of the overlay."""
    pts = np.clip(rng.random((40, 3)).astype(np.float32), 0.4, 1.1)
    st = init_fluid(pts, CFG)
    plain = render_points(st, CFG, size=128, azimuth=0.4, elevation=0.3)
    boxed = render_points(st, CFG, size=128, azimuth=0.4, elevation=0.3,
                          world_box=True)
    white = (boxed == [255, 255, 255]).all(axis=-1)
    assert white.sum() > 50, "wireframe cube missing"
    assert not (plain == [255, 255, 255]).all(axis=-1).any()
    for color in ([0, 0, 255], [255, 0, 0], [0, 255, 0]):
        assert (boxed == color).all(axis=-1).any(), f"axis {color} missing"


def test_render_voltage_vrange(rng):
    # an FHN-scale Vm field (a few mV) is invisible under the reference's
    # [-200, 200] ramp (uniform blue) but spans the ramp under a tight
    # vrange override
    pts = np.clip(rng.random((64, 3)).astype(np.float32), 0.1, 1.4)
    st = init_fluid(pts, CFG)
    vm = np.linspace(0.0, 15.0, st.capacity).astype(np.float32)
    st = st.replace(vm=jnp.asarray(vm))
    img_def = render_points(st, CFG, mode="voltage", size=64)
    img_tight = render_points(st, CFG, mode="voltage", size=64,
                              vrange=(0.0, 15.0))
    bg = np.array([26, 26, 26], np.uint8)
    fg_def = img_def[(img_def != bg).any(-1)]
    fg_tight = img_tight[(img_tight != bg).any(-1)]
    # default: every particle pixel is in the blue half (tiny red channel)
    assert fg_def[:, 0].max() <= 140
    # tight range: the same field reaches the red end of the ramp
    assert fg_tight[:, 0].max() > 200


def test_save_png_returns_path_and_ppm_roundtrip(tmp_path):
    # save_png returns the path it actually wrote (the no-PIL fallback
    # swaps .png -> .ppm); read_png_rgb decodes the fallback's raw P6 by
    # magic bytes so --gif assembly works in a no-PIL environment
    from sph_sm_monodomain_tpu.utils.animate import read_png_rgb
    from sph_sm_monodomain_tpu.utils.render import save_png
    img = (np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3) * 3) % 255
    p = save_png(str(tmp_path / "frame.png"), img)
    assert p.endswith((".png", ".ppm"))
    np.testing.assert_array_equal(read_png_rgb(p), img)
    # the fallback's exact PPM form decodes identically
    ppm = tmp_path / "frame2.ppm"
    ppm.write_bytes(b"P6 5 4 255\n" + img.tobytes())
    np.testing.assert_array_equal(read_png_rgb(str(ppm)), img)


def test_report_row_schema():
    phases = {k: 0.001 for k in
              ("find_neighbors", "corrected_velocity",
               "intermediate_velocity", "density_pressure", "cell_model",
               "compute_force", "update_properties")}
    row = report_row(CFG, 500, 0.01, phases)
    cols = row.split(";")
    assert len(cols) == len(REPORT_HEADER.split(";")) == 23
    # parameter columns in reference order (cpp:791)
    assert float(cols[10]) == CFG.k_stiffness
    assert float(cols[11]) == CFG.sm_alpha
    assert float(cols[14]) == round(CFG.sigma, 10) or \
        abs(float(cols[14]) - CFG.sigma) < 1e-6
    assert float(cols[22]) == CFG.fh_c4


@pytest.mark.slow
def test_cli_smoke(tmp_path):
    from sph_sm_monodomain_tpu.cli import main
    report = tmp_path / "report.csv"
    ckpt = tmp_path / "state.npz"
    rc = main(["--scene", "cube", "--steps", "3", "--stim-off-step", "-1",
               "--chunk", "2", "--report", str(report),
               "--save-checkpoint", str(ckpt)])
    assert rc == 0
    assert report.exists() and ckpt.exists()
    lines = report.read_text().strip().splitlines()
    assert lines[0] == REPORT_HEADER and len(lines) == 2
    # resume from checkpoint
    rc = main(["--scene", "cube", "--steps", "2", "--stim-off-step", "-1",
               "--load-checkpoint", str(ckpt)])
    assert rc == 0


@pytest.mark.slow
def test_cli_dynamic_set(tmp_path, capsys):
    """--dynamic-set feeds a traced physics override into the run and the
    report row records the EFFECTIVE value (not the static default);
    non-dynamic fields are rejected with the whitelist in the message."""
    from sph_sm_monodomain_tpu.cli import main
    report = tmp_path / "report.csv"
    rc = main(["--scene", "cube", "--steps", "3", "--stim-off-step", "-1",
               "--dynamic-set", "mu_viscosity=55",
               "--dynamic-set", "k_stiffness=0.8",
               "--report", str(report)])
    assert rc == 0
    cols = report.read_text().strip().splitlines()[-1].split(";")
    assert float(cols[10]) == 0.8 and float(cols[13]) == 55.0
    # checkpoints must snapshot the EFFECTIVE config: a resume trusts it
    # as authoritative for the physics
    from sph_sm_monodomain_tpu.state import load_checkpoint
    ckpt = tmp_path / "dyn.npz"
    rc = main(["--scene", "cube", "--steps", "2", "--stim-off-step", "-1",
               "--dynamic-set", "mu_viscosity=55",
               "--save-checkpoint", str(ckpt)])
    assert rc == 0
    _, _, ck_cfg = load_checkpoint(str(ckpt), with_config=True)
    assert ck_cfg.mu_viscosity == 55.0
    # monodomain mode takes the EP constants dynamically too
    rc = main(["--scene", "cube", "--steps", "2", "--mode", "monodomain",
               "--dynamic-set", "fh_c1=0.2"])
    assert rc == 0
    with pytest.raises(SystemExit, match="not a dynamic field"):
        main(["--scene", "cube", "--steps", "1",
              "--dynamic-set", "kernel_h=0.05"])


@pytest.mark.slow
def test_cli_flag_free_resume(tmp_path, capsys):
    """Resume must not depend on re-passing identical --set flags: the
    checkpoint's SimConfig snapshot is authoritative (VERDICT r2 §5)."""
    from sph_sm_monodomain_tpu.cli import main
    from sph_sm_monodomain_tpu.state import load_checkpoint
    ckpt = tmp_path / "state.npz"
    rc = main(["--scene", "cube", "--steps", "2", "--stim-off-step", "-1",
               "--set", "k_stiffness=0.7", "--set", "mu_viscosity=150",
               "--save-checkpoint", str(ckpt)])
    assert rc == 0
    _, step, cfg = load_checkpoint(str(ckpt), with_config=True)
    assert step == 2 and cfg.k_stiffness == 0.7 and cfg.mu_viscosity == 150
    capsys.readouterr()
    # resume WITHOUT the --set flags: the snapshot must win over defaults
    rc = main(["--scene", "cube", "--steps", "4", "--stim-off-step", "-1",
               "--load-checkpoint", str(ckpt)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "config restored from checkpoint" in out
    assert "k_stiffness" in out and "mu_viscosity" in out


@pytest.mark.slow
def test_cli_mode_variants(tmp_path):
    from sph_sm_monodomain_tpu.cli import main
    for mode in ("sph", "sm", "monodomain"):
        rc = main(["--scene", "cube", "--steps", "2", "--mode", mode])
        assert rc == 0


def test_cli_render(tmp_path):
    from sph_sm_monodomain_tpu.cli import main
    out = tmp_path / "frames"
    rc = main(["--scene", "cube", "--steps", "4", "--stim-off-step", "-1",
               "--render-every", "2", "--render-dir", str(out)])
    assert rc == 0
    assert len(list(out.glob("frame_*.png"))) == 2


def test_surface_mesh_load_and_render():
    from sph_sm_monodomain_tpu import build_scene
    from sph_sm_monodomain_tpu.utils.io import ASSETS_DIR, load_surface_mesh
    from sph_sm_monodomain_tpu.utils.render import render_mesh
    import pytest
    if not ASSETS_DIR.exists():
        pytest.skip("assets missing")
    faces, normals, nidx = load_surface_mesh("biceps")
    assert faces.shape == (5120, 3) and faces.min() >= 0
    assert normals.shape[1] == 3 and nidx.shape == faces.shape
    sc = build_scene("biceps_4944", stim=False)
    assert faces.max() < sc.num_particles
    img = render_mesh(sc.state, sc.cfg, faces, size=96)
    assert img.shape == (96, 96, 3) and (img != 26).any()
    rf_faces, rf_n, rf_ni = load_surface_mesh("rectus_femoris")
    assert rf_faces.max() < 42


def test_simulate_record_every(rng):
    import jax
    import jax.numpy as jnp
    from sph_sm_monodomain_tpu import SimConfig, init_fluid, simulate
    import numpy as np
    cfg = SimConfig()
    pts = np.clip(rng.normal(size=(64, 3)).astype(np.float32) * 0.05 + 0.6,
                  0.1, 1.3)
    st = init_fluid(pts, cfg)
    state, aux, traj = simulate(st, cfg, 32, 9 * 32, num_steps=6,
                                record_every=2)
    assert traj["pos"].shape[0] == 3 and traj["vm"].shape[0] == 3
    # last recorded frame == a state reached mid-run (recorded after step 5)
    assert np.isfinite(np.asarray(traj["pos"])).all()


@pytest.mark.slow
def test_run_protocol_record_and_regrow(rng, monkeypatch):
    # force a tiny neighbor capacity so the window table overflows and the
    # elastic regrow kicks in (failure detection + recovery, SURVEY.md §5)
    import numpy as np
    from sph_sm_monodomain_tpu import SimConfig, init_fluid, run_protocol
    from sph_sm_monodomain_tpu.utils.io import Scene
    cfg = SimConfig()
    pts = np.clip(rng.normal(size=(128, 3)).astype(np.float32) * 0.03 + 0.6,
                  0.1, 1.3)
    st = init_fluid(pts, cfg)
    sc = Scene(state=st, cfg=cfg, cell_capacity=64, neighbor_capacity=9,
               num_particles=128, name="blob")  # 1 slot/run: must overflow
    state, aux, traj = run_protocol(sc, num_steps=4, chunk=2,
                                    stim_off_step=-1, record_every=1,
                                    fused=False)
    assert traj["pos"].shape[0] == 4
    assert np.isfinite(np.asarray(state.pos)[:128]).all()


@pytest.mark.slow
@pytest.mark.parametrize("parallel", ["gather", "fused"])
def test_cli_multi_device(parallel):
    import jax
    from sph_sm_monodomain_tpu.cli import main
    assert jax.device_count() >= 8
    rc = main(["--scene", "cube", "--steps", "4", "--chunk", "2",
               "--devices", "8", "--parallel", parallel])
    assert rc == 0


@pytest.mark.slow
def test_cli_halo_checkpoint_and_render(tmp_path):
    """The halo path persists: --save-checkpoint and --render-every work
    under --parallel halo through the automatic unshard (VERDICT r2 §2/3),
    and the checkpoint resumes on a single device."""
    import jax
    from sph_sm_monodomain_tpu.cli import main
    from sph_sm_monodomain_tpu.state import load_checkpoint
    assert jax.device_count() >= 8
    ckpt = tmp_path / "halo.npz"
    out = tmp_path / "frames"
    rc = main(["--scene", "cube", "--steps", "2", "--chunk", "1",
               "--stim-off-step", "-1", "--devices", "8",
               "--parallel", "halo", "--render-every", "1",
               "--render-dir", str(out), "--save-checkpoint", str(ckpt)])
    assert rc == 0
    assert ckpt.exists() and len(list(out.iterdir())) >= 2
    state, step_no, _cfg = load_checkpoint(str(ckpt), with_config=True)
    assert step_no == 2
    import numpy as np
    assert np.isfinite(np.asarray(state.pos)[np.asarray(state.active)]).all()
    # resume the unsharded checkpoint single-device
    rc = main(["--scene", "cube", "--steps", "4", "--stim-off-step", "-1",
               "--load-checkpoint", str(ckpt)])
    assert rc == 0


@pytest.mark.slow
def test_cli_render_live_and_gif(tmp_path):
    """--render-live rewrites one file between chunks (the GLUT-window
    stand-in) and --gif assembles the frame sequence (VERDICT r2 §8)."""
    from sph_sm_monodomain_tpu.cli import main
    out = tmp_path / "frames"
    live = tmp_path / "latest.png"
    gif = tmp_path / "run.gif"
    rc = main(["--scene", "cube", "--steps", "4", "--stim-off-step", "-1",
               "--render-every", "2", "--render-dir", str(out),
               "--render-live", str(live), "--gif", str(gif)])
    assert rc == 0
    assert live.exists() and live.stat().st_size > 0
    assert gif.exists()
    with open(gif, "rb") as f:
        assert f.read(6) in (b"GIF89a", b"GIF87a")


@pytest.mark.slow
def test_cli_monodomain_mode_honors_control_stim_off(tmp_path):
    """The control-file 'q' equivalent must work in --mode monodomain too
    (ADVICE r2: the variant has a live stimulus; it was silently
    discarded). After the command fires between chunks, stim must stay
    off for the rest of the run."""
    import numpy as np
    from sph_sm_monodomain_tpu.cli import main
    from sph_sm_monodomain_tpu.state import load_checkpoint
    ctl = tmp_path / "ctl"
    ctl.write_text("stim-off\n")
    ckpt = tmp_path / "end.npz"
    rc = main(["--scene", "susane", "--mode", "monodomain", "--steps", "4",
               "--chunk", "2", "--control", str(ctl),
               "--save-checkpoint", str(ckpt)])
    assert rc == 0
    state, _step = load_checkpoint(str(ckpt))
    act = np.asarray(state.active)
    assert float(np.asarray(state.stim)[act].max()) <= 0.0, \
        "control-file stim-off was ignored in monodomain mode"


def test_cli_flag_free_resume_restores_config(tmp_path):
    """A checkpoint written with non-default physics resumes with the SAME
    physics even when the resume command passes no flags (VERDICT r2 §5)."""
    import numpy as np
    from sph_sm_monodomain_tpu.cli import main
    from sph_sm_monodomain_tpu.state import load_checkpoint
    ckpt = tmp_path / "state.npz"
    rc = main(["--scene", "cube", "--steps", "2", "--stim-off-step", "-1",
               "--set", "mu_viscosity=37.5", "--set", "k_stiffness=0.9",
               "--save-checkpoint", str(ckpt)])
    assert rc == 0
    _, step_no, cfg = load_checkpoint(str(ckpt), with_config=True)
    assert step_no == 2
    assert cfg.mu_viscosity == 37.5 and cfg.k_stiffness == 0.9
    # flag-free resume adopts the snapshot (visible in the report row's
    # Mu/K columns)
    report = tmp_path / "resume_report.csv"
    rc = main(["--scene", "cube", "--steps", "4", "--stim-off-step", "-1",
               "--load-checkpoint", str(ckpt), "--report", str(report)])
    assert rc == 0
    row = report.read_text().strip().splitlines()[-1].split(";")
    assert float(row[10]) == 0.9     # K
    assert float(row[13]) == 37.5    # Mu
