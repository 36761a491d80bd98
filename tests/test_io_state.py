"""Loader, scene, state, and checkpoint tests (C3, C4, C13, D1)."""

import numpy as np
import pytest

from sph_sm_monodomain_tpu import (SimConfig, build_scene, init_fluid,
                                   load_checkpoint, read_cloud_csv,
                                   save_checkpoint)
from sph_sm_monodomain_tpu.utils.io import (ASSETS_DIR, cube_positions,
                                            rescale_into_world)

CFG = SimConfig()

needs_assets = pytest.mark.skipif(not ASSETS_DIR.exists(),
                                  reason="data assets not present")


@needs_assets
def test_biceps_18475_subsample_rule():
    # reference loader: keep first 3000 rows, then every 7th (main.cpp:157-176)
    pts = read_cloud_csv(ASSETS_DIR / "biceps_simple_out_18475.csv",
                         subsample_freq=7)
    assert pts.shape == (5211, 3)  # SURVEY.md C4: 5,211 effective particles
    full = read_cloud_csv(ASSETS_DIR / "biceps_simple_out_18475.csv")
    assert full.shape == (18475, 3)


@needs_assets
def test_scene_builds_and_stimulates():
    sc = build_scene("biceps_18475")
    assert sc.num_particles == 5211
    st = sc.state
    n = sc.num_particles
    stim = np.asarray(st.stim)[:n]
    # turnOnStim_Mesh effectively stimulates the whole cloud (SURVEY.md C13)
    assert (stim == CFG.stim_strength).mean() > 0.99
    fixed = np.asarray(st.fixed)[:n]
    x = np.asarray(st.pos)[:n, 0]
    y = np.asarray(st.pos)[:n, 1]
    want_fixed = ((x >= 0.0) & (x <= 0.07)) | ((x >= 0.90) & (y >= 0.80))
    np.testing.assert_array_equal(fixed, want_fixed)


def test_scene_v5s_gets_packed_tuning():
    # the static-trips v5 variant must get the same auto_sweep5_params
    # tuning as v5: a v4-tuned scene with pack_cap=0 raises on first step
    sc = build_scene("susane", stim=False, fused_impl="v5s")
    assert sc.fused_impl == "v5s" and sc.pack_cap > 0
    assert sc.state.capacity % sc.sub_block == 0


def test_cube_scene_seeding():
    pts = cube_positions(CFG)
    assert pts.shape[0] > 1000
    assert (pts[:, 0] >= 0.45 - 1e-6).all() and (pts[:, 0] < 1.05).all()
    assert (pts[:, 1] >= 0.0).all() and (pts[:, 1] < 0.6).all()


def test_rescale_into_world():
    pts = np.array([[-10, 0, 5], [20, 3, 9]], np.float32)
    out = rescale_into_world(pts, CFG)
    assert (out >= 0).all() and (out <= 1.5).all()


def test_capacity_clamp():
    cfg = CFG.replace(max_particles=10)
    pts = np.random.default_rng(0).random((50, 3)).astype(np.float32)
    st = init_fluid(pts, cfg)
    assert int(st.num_active) == 10  # cpp:103-104 drops the rest


def test_checkpoint_roundtrip(tmp_path):
    pts = np.random.default_rng(1).random((40, 3)).astype(np.float32)
    st = init_fluid(pts, CFG)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, st, step=123)
    st2, step_no = load_checkpoint(path)
    assert step_no == 123
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st2.pos))
    np.testing.assert_array_equal(np.asarray(st.active),
                                  np.asarray(st2.active))


def test_checkpoint_suffixless_path_roundtrip(tmp_path):
    """save_checkpoint must write the LITERAL path (np.savez appends .npz
    to suffix-less paths, which broke a same-string save/resume round
    trip), and unaligned capacities written by init_fluid(pad_to=...)
    must load back."""
    pts = np.random.default_rng(2).random((40, 3)).astype(np.float32)
    st = init_fluid(pts, CFG, pad_to=50)        # deliberately unaligned
    path = str(tmp_path / "run.ckpt")           # no .npz suffix
    save_checkpoint(path, st, step=9)
    import os
    assert os.path.exists(path) and not os.path.exists(path + ".npz")
    st2, step_no = load_checkpoint(path)
    assert step_no == 9 and st2.capacity == 50
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st2.pos))


def test_checkpoint_load_rejects_bad_files(tmp_path):
    """load_checkpoint validates schema + shapes instead of crashing later
    (VERDICT r1 §9)."""
    import pytest

    not_ckpt = str(tmp_path / "not_ckpt.npz")
    np.savez(not_ckpt, foo=np.zeros(3))
    with pytest.raises(ValueError, match="missing __step__"):
        load_checkpoint(not_ckpt)

    few = str(tmp_path / "few.npz")
    np.savez(few, __step__=np.asarray(0),
             **{f"leaf_{i}": np.zeros((128,), np.float32) for i in range(4)})
    with pytest.raises(ValueError, match="schema mismatch"):
        load_checkpoint(few)

    # capacity axis mismatch between leaves
    pts = np.random.default_rng(2).random((40, 3)).astype(np.float32)
    st = init_fluid(pts, CFG)
    good = str(tmp_path / "good.npz")
    save_checkpoint(good, st, step=1)
    data = dict(np.load(good))
    data["field_pos"] = data["field_pos"][:64]
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, **data)
    with pytest.raises(ValueError):
        load_checkpoint(bad)


def test_checkpoint_self_describing(tmp_path):
    """v2 checkpoints store fields BY NAME: renamed/missing/unknown fields
    fail loudly (a field reorder can no longer silently permute state),
    and the SimConfig snapshot round-trips (VERDICT r2 §5)."""
    pts = np.random.default_rng(3).random((40, 3)).astype(np.float32)
    cfg = CFG.replace(mu_viscosity=42.0, quadratic_match=True)
    st = init_fluid(pts, cfg)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, st, step=7, cfg=cfg)

    st2, step_no, cfg2 = load_checkpoint(path, with_config=True)
    assert step_no == 7
    assert cfg2 == cfg        # exact dataclass round-trip (incl. tuples)
    assert isinstance(cfg2.world_size, tuple)
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st2.pos))

    # simulate a writer with a permuted/renamed field schema
    data = dict(np.load(path))
    data["field_velocity"] = data.pop("field_vel")
    bad = str(tmp_path / "renamed.npz")
    np.savez(bad, **data)
    with pytest.raises(ValueError, match="field mismatch"):
        load_checkpoint(bad)


def test_checkpoint_legacy_positional_format(tmp_path):
    """v1 (leaf_<i>) checkpoints still load, in tree_flatten order."""
    import jax
    pts = np.random.default_rng(4).random((40, 3)).astype(np.float32)
    st = init_fluid(pts, CFG)
    leaves = jax.tree_util.tree_leaves(st)
    path = str(tmp_path / "legacy.npz")
    np.savez(path, __step__=np.asarray(11),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
    st2, step_no = load_checkpoint(path)
    assert step_no == 11
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st2.pos))
    np.testing.assert_array_equal(np.asarray(st.vm), np.asarray(st2.vm))


def test_displacement():
    pts = np.zeros((4, 3), np.float32) + 0.5
    st = init_fluid(pts, CFG)
    st = st.replace(pos=st.pos.at[0, 0].add(0.3))
    d = np.asarray(st.displacement())
    np.testing.assert_allclose(d[0], 0.3, rtol=1e-6)
    np.testing.assert_allclose(d[1:4], 0.0)


def test_replicated_scenes_seed_inside_world():
    """Procedural / rescaled scenes must be built against ONE tile's world
    before tiling — seeding against the replicate-expanded box pushed the
    cube past the y/z walls (regression: 4-step displacement exploded
    ~350x from the AABB clamp snapping out-of-grid seeds)."""
    import numpy as np
    from sph_sm_monodomain_tpu.utils.io import build_scene
    for name in ("cube", "susane"):
        sc = build_scene(name, replicate=2, stim=False)
        pts = np.asarray(sc.state.pos)[:sc.num_particles]
        w = np.asarray(sc.cfg.world_size)
        assert (pts >= 0).all() and (pts <= w).all(), \
            f"{name} x2 seeds outside the world box"
        half = sc.num_particles // 2
        np.testing.assert_allclose(
            pts[half:] - [sc.cfg.world_size[0] / 2, 0, 0], pts[:half],
            atol=1e-5, err_msg=f"{name} tiles are not translates")
