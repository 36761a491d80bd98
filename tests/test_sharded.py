"""Multi-chip sharding tests on the faked 8-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sph_sm_monodomain_tpu import SimConfig, init_fluid, step
from sph_sm_monodomain_tpu.ops.electrophysiology import set_stim
from sph_sm_monodomain_tpu.parallel.sharded_step import (
    make_mesh, make_sharded_simulate, make_sharded_step, shard_state)

CFG = SimConfig()


def _state(rng, n=300):
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.06 + 0.6
    pts = np.clip(pts, 0.05, 1.2)
    st = init_fluid(pts, CFG)
    st = set_stim(st, (0.6, 0.6, 0.6), 0.5, CFG.stim_strength, CFG)
    fixed = np.zeros(st.capacity, bool)
    fixed[:7] = True
    return st.replace(fixed=jnp.asarray(fixed)), n


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
    return make_mesh(jax.devices()[:8])


def test_sharded_step_matches_single_chip(rng, mesh):
    st, n = _state(rng)
    sharded = shard_state(st, mesh)
    step_fn = make_sharded_step(mesh, CFG, 32, 9 * 64)

    ref = st
    for i in range(3):
        ref, _ = step(ref, CFG, 32, 9 * 64)
        sharded, ovf = step_fn(sharded)
        assert int(ovf) == 0

    # psum reduces shape-matching moments in shard order, not particle
    # order; the fp reassociation is amplified by alpha/dt (~97x) in
    # corrected_vel, so velocities carry ~1e-4 noise after a few steps.
    tol = {"pos": (5e-5, 0), "vel": (5e-4, 0), "vm": (1e-3, 0),
           "dens": (0, 1e-5), "pres": (0.5, 1e-4), "iion": (1e-5, 0),
           "w": (1e-6, 0), "goal_pos": (5e-5, 0)}
    for name, (atol, rtol) in tol.items():
        a = np.asarray(getattr(ref, name))[:n]
        b = np.asarray(getattr(sharded, name))[:n]
        np.testing.assert_allclose(
            a, b, atol=atol, rtol=rtol,
            err_msg=f"{name} diverged between sharded and single-chip")


@pytest.mark.slow
def test_sharded_simulate_with_stim_off(rng, mesh):
    st, n = _state(rng, 200)
    sharded = shard_state(st, mesh)
    sim = make_sharded_simulate(mesh, CFG, 32, 9 * 64, num_steps=6,
                                stim_off_step=3)
    out, ovf = sim(sharded)
    assert int(ovf) == 0
    stim = np.asarray(out.stim)[:n]
    np.testing.assert_array_equal(stim, -10000.0)  # turnOffStim applied
    assert np.isfinite(np.asarray(out.pos)[:n]).all()

    # matches the single-chip scan driver
    from sph_sm_monodomain_tpu import simulate
    ref, _ = simulate(st, CFG, 32, 9 * 64, num_steps=6, stim_off_step=3)
    np.testing.assert_allclose(np.asarray(ref.pos)[:n],
                               np.asarray(out.pos)[:n], atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref.vm)[:n],
                               np.asarray(out.vm)[:n], atol=1e-3)


def test_sharded_output_sharding_preserved(rng, mesh):
    st, _ = _state(rng, 160)
    sharded = shard_state(st, mesh)
    step_fn = make_sharded_step(mesh, CFG, 32, 9 * 32)
    out, _ = step_fn(sharded)
    # output stays particle-sharded over the mesh (no silent replication)
    shd = out.pos.sharding
    assert shd.spec[0] == "p", f"expected particle-sharded output, got {shd}"


@pytest.mark.slow
def test_sharded_clustered_sm_matches_single_chip(rng, mesh):
    """Multi-muscle (sm_clusters=2) under particle sharding: the blocked
    segment reductions psum per-cluster moments across the mesh and must
    match the clustered single-chip step (BASELINE config 5)."""
    cfg = CFG.replace(world_size=(3.0, 1.5, 1.5), sm_clusters=2)
    n = 144
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.06 + 0.6
    pts = np.clip(pts, 0.05, 1.2)
    both = np.concatenate([pts, pts + [1.5, 0, 0]], axis=0).astype(
        np.float32)
    st = init_fluid(both, cfg, pad_to=512)   # 512 = 8 devices * 64 rows
    st = set_stim(st, (0.6, 0.6, 0.6), 0.5, cfg.stim_strength, cfg)
    st = set_stim(st, (2.1, 0.6, 0.6), 0.5, cfg.stim_strength, cfg)

    sharded = shard_state(st, mesh)
    step_fn = make_sharded_step(mesh, cfg, 32, 9 * 64)
    ref = st
    for _ in range(3):
        ref, _ = step(ref, cfg, 32, 9 * 64)
        sharded, ovf = step_fn(sharded)
        assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(ref.pos)[:2 * n],
                               np.asarray(sharded.pos)[:2 * n], atol=5e-5)
    np.testing.assert_allclose(np.asarray(ref.goal_pos)[:2 * n],
                               np.asarray(sharded.goal_pos)[:2 * n],
                               atol=5e-5)
