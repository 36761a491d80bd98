"""Per-muscle shape-matching clusters (cfg.sm_clusters > 1).

Oracle: two clouds separated by more than the kernel support do not
interact through SPH, so a clustered two-tile simulation must evolve each
cloud exactly like an independent single-tile simulation of that cloud
(up to the fp32 noise of the shifted coordinates). A single GLOBAL cluster
would fit one affine transform across both clouds and fail this.
"""

import numpy as np
import pytest

from sph_sm_monodomain_tpu import SimConfig, init_fluid
from sph_sm_monodomain_tpu.models.monodomain import step, step_fused
from sph_sm_monodomain_tpu.ops.electrophysiology import set_stim
from sph_sm_monodomain_tpu.ops.shape_matching import (cluster_ids,
                                                      sm_invariants)

N = 160
STEPS = 3


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _cloud(rng):
    return (rng.random((N, 3)).astype(np.float32) * 0.5 + 0.4)


def _single_run(pts, cfg1, steps=STEPS):
    st = init_fluid(pts, cfg1)
    st = set_stim(st, tuple(pts[0]), 0.5, cfg1.stim_strength, cfg1)
    for _ in range(steps):
        st, _ = step(st, cfg1, 64, 9 * 64)
    return np.asarray(st.pos)[:N]


def _two_tile_state(pts, cfg2):
    shifted = pts + np.array([1.5, 0, 0], np.float32)
    both = np.concatenate([pts, shifted], axis=0)
    st = init_fluid(both, cfg2)
    st = set_stim(st, tuple(pts[0]), 0.5, cfg2.stim_strength, cfg2)
    st = set_stim(st, tuple(shifted[0]), 0.5, cfg2.stim_strength, cfg2)
    return st


@pytest.mark.parametrize("quadratic", [False, True])
@pytest.mark.slow
def test_clustered_matches_independent_runs(rng, quadratic):
    pts = _cloud(rng)
    cfg1 = SimConfig(quadratic_match=quadratic)
    cfg2 = cfg1.replace(world_size=(3.0, 1.5, 1.5), sm_clusters=2)
    ref = _single_run(pts, cfg1)

    st = _two_tile_state(pts, cfg2)
    assert int(cluster_ids(st.orig_pos, cfg2)[:N].max()) == 0
    assert int(cluster_ids(st.orig_pos, cfg2)[N:2 * N].min()) == 1
    for _ in range(STEPS):
        st, _ = step(st, cfg2, 64, 9 * 64)
    pos = np.asarray(st.pos)
    np.testing.assert_allclose(pos[:N], ref, atol=2e-4,
                               err_msg="tile 0 diverged from its "
                                       "independent run")
    np.testing.assert_allclose(pos[N:2 * N] - [1.5, 0, 0], ref, atol=2e-4,
                               err_msg="tile 1 diverged from its "
                                       "independent run")


@pytest.mark.slow
def test_clustered_fused_path_parity(rng):
    """The fused v4 step consumes clustered corrected velocities through
    the same sm_invariants hoisting — must match the bucketed step."""
    pts = _cloud(rng)
    cfg2 = SimConfig(world_size=(3.0, 1.5, 1.5), sm_clusters=2)
    a = _two_tile_state(pts, cfg2)
    b = a
    for _ in range(2):
        a, _ = step(a, cfg2, 64, 9 * 64)
        b, _ = step_fused(b, cfg2, 64, 128, 64, impl="v4")
    np.testing.assert_allclose(np.asarray(a.pos)[:2 * N],
                               np.asarray(b.pos)[:2 * N], atol=5e-5)


@pytest.mark.parametrize("quadratic", [False, True])
@pytest.mark.slow
def test_segment_forms_agree(rng, quadratic, monkeypatch):
    """The three clustered segment-reduction forms (blocked matmul /
    contiguous reshape / one-hot) must produce the same goal positions
    (fp32 reduction-order tolerance)."""
    from sph_sm_monodomain_tpu.ops import shape_matching as SM
    pts = _cloud(rng)
    base = SimConfig(world_size=(3.0, 1.5, 1.5), sm_clusters=2,
                     quadratic_match=quadratic)
    st = _two_tile_state(pts, base)
    st = st.replace(predicted_vel=st.vel)
    g_blocked = np.asarray(SM.project_positions(st, base))   # f*K=6 <= 128
    monkeypatch.setattr(SM, "_BLOCKED_MAX_LANES", 0)
    g_oh = np.asarray(SM.project_positions(st, base))
    g_ct = np.asarray(SM.project_positions(
        st, base.replace(sm_tile_rows=N)))
    np.testing.assert_allclose(g_oh[:2 * N], g_blocked[:2 * N], atol=2e-5)
    np.testing.assert_allclose(g_ct[:2 * N], g_blocked[:2 * N], atol=2e-5)


def test_clustered_invariants_shapes(rng):
    pts = _cloud(rng)
    cfg2 = SimConfig(world_size=(3.0, 1.5, 1.5), sm_clusters=2,
                     quadratic_match=True)
    st = _two_tile_state(pts, cfg2)
    inv = sm_invariants(st, cfg2)
    assert inv.mass_cm_sum.shape == (2,)
    assert inv.ocm.shape == (2, 3)
    assert inv.mq9.shape == (2, 9)
    assert inv.a9qq_pinv.shape == (2, 9, 9)
    assert inv.q.shape == st.pos.shape
    # the two identical rest shapes must produce identical moments
    np.testing.assert_allclose(inv.mass_cm_sum[0], inv.mass_cm_sum[1],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(inv.ocm[1] - inv.ocm[0]),
                               [1.5, 0, 0], atol=1e-5)
