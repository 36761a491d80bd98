"""Multi-chip fused-Pallas step (interpret mode) vs single-chip fused step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sph_sm_monodomain_tpu import SimConfig, init_fluid
from sph_sm_monodomain_tpu.models.monodomain import step_fused
from sph_sm_monodomain_tpu.ops.electrophysiology import set_stim
from sph_sm_monodomain_tpu.parallel.sharded_step import (
    make_mesh, make_sharded_simulate_fused, make_sharded_step_fused,
    shard_state)

CFG = SimConfig()
QB = 32  # capacity 512 = 8 devices x 2 blocks x 32


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh(jax.devices()[:8])


@pytest.mark.slow
def test_sharded_fused_matches_single_chip(rng, mesh):
    n = 400
    pts = np.clip(rng.normal(size=(n, 3)).astype(np.float32) * 0.06 + 0.6,
                  0.05, 1.2)
    st = init_fluid(pts, CFG, pad_to=512)  # 512 = 8 * 2 * QB
    st = set_stim(st, (0.6, 0.6, 0.6), 0.5, CFG.stim_strength, CFG)
    fixed = np.zeros(st.capacity, bool)
    fixed[:5] = True
    st = st.replace(fixed=jnp.asarray(fixed))

    sharded = shard_state(st, mesh)
    step_fn = make_sharded_step_fused(mesh, CFG, q_block=QB, w_chunk=256,
                                      sub_q=QB)

    ref = st
    for _ in range(2):
        ref, _ = step_fused(ref, CFG, QB, 256, QB)
        sharded, _ = step_fn(sharded)

    tol = {"pos": (5e-5, 0), "vel": (5e-4, 0), "vm": (1e-3, 0),
           "dens": (0, 1e-5), "inter_vm": (5e-3, 0)}
    for name, (atol, rtol) in tol.items():
        np.testing.assert_allclose(
            np.asarray(getattr(ref, name))[:n],
            np.asarray(getattr(sharded, name))[:n], atol=atol, rtol=rtol,
            err_msg=f"{name} diverged sharded-fused vs single-fused")
    # output stays sharded
    assert sharded.pos.sharding.spec[0] == "p"


@pytest.mark.slow
def test_sharded_simulate_fused_scan_with_stim_off(rng, mesh):
    """The CLI's --devices production driver: fused scan + stim-off cond."""
    from sph_sm_monodomain_tpu import simulate
    n = 300
    pts = np.clip(rng.normal(size=(n, 3)).astype(np.float32) * 0.06 + 0.6,
                  0.05, 1.2)
    st = init_fluid(pts, CFG, pad_to=512)
    st = set_stim(st, (0.6, 0.6, 0.6), 0.5, CFG.stim_strength, CFG)

    sharded = shard_state(st, mesh)
    sim = make_sharded_simulate_fused(mesh, CFG, num_steps=5,
                                      stim_off_step=3, q_block=QB,
                                      w_chunk=256, sub_q=QB)
    out, ovf = sim(sharded)
    assert int(ovf) == 0
    stim = np.asarray(out.stim)[:n]
    np.testing.assert_array_equal(stim, -10000.0)  # turnOffStim applied

    ref, _ = simulate(st, CFG, 32, 9 * 64, num_steps=5, stim_off_step=3,
                      fused=True, q_block=QB, w_window=256, sub_q=QB)
    np.testing.assert_allclose(np.asarray(ref.pos)[:n],
                               np.asarray(out.pos)[:n], atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref.vm)[:n],
                               np.asarray(out.vm)[:n], atol=1e-3)
