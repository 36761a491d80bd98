"""Model variant tests: SPH-only, SM-only, monodomain-only (BASELINE configs)."""

import numpy as np
import pytest
import jax.numpy as jnp

from sph_sm_monodomain_tpu import SimConfig, init_fluid
from sph_sm_monodomain_tpu.models import variants
from sph_sm_monodomain_tpu.ops.electrophysiology import set_stim

CFG = SimConfig()


def _blob(rng, n=200):
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.05 + 0.6
    return np.clip(pts, 0.05, 1.2)


def test_sph_only_falls_and_has_pressure(rng):
    cfg = variants.sph_only_config(CFG)
    assert not cfg.quirk_pressure_stim_gate
    pts = _blob(rng)
    st = init_fluid(pts, cfg)
    y0 = np.asarray(st.pos)[:200, 1].mean()
    for _ in range(5):
        st, aux = variants.step_sph_only(st, cfg, 32, 9 * 64)
        assert int(aux.overflow) == 0
    assert np.asarray(st.pos)[:200, 1].mean() < y0  # gravity acts
    # pressure is live without any stimulus (gate disabled)
    assert np.abs(np.asarray(st.pres)[:200]).max() > 0
    # EP state untouched
    np.testing.assert_array_equal(np.asarray(st.vm)[:200], 0.0)
    np.testing.assert_array_equal(np.asarray(st.iion)[:200], 0.0)


@pytest.mark.slow
def test_sph_only_fused_matches_unfused(rng):
    cfg = variants.sph_only_config(CFG)
    pts = _blob(rng, 300)
    st = init_fluid(pts, cfg)
    ref = st
    for _ in range(5):
        ref, _ = variants.step_sph_only(ref, cfg, 32, 9 * 64)
    out, aux = variants.simulate_sph_only(st, cfg, 32, 9 * 64, num_steps=5,
                                          fused=True, q_block=64,
                                          w_window=128, sub_q=32)
    assert int(aux.overflow) == 0
    np.testing.assert_allclose(np.asarray(out.pos)[:300],
                               np.asarray(ref.pos)[:300], atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.dens)[:300],
                               np.asarray(ref.dens)[:300], rtol=1e-4)


def test_sph_only_scan_driver_records_frames(rng):
    cfg = variants.sph_only_config(CFG)
    st = init_fluid(_blob(rng, 150), cfg)
    out, aux, frames = variants.simulate_sph_only(
        st, cfg, 32, 9 * 64, num_steps=12, record_every=5)
    assert frames[0].shape[0] == 2  # two full blocks of 5; 2 leftover steps
    loop = st
    for _ in range(12):
        loop, _ = variants.step_sph_only(loop, cfg, 32, 9 * 64)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(loop.pos),
                               atol=1e-6)


def test_sm_only_scan_driver(rng):
    pts = _blob(rng, 150)
    st = init_fluid(pts, CFG)
    out, _ = variants.simulate_sm_only(st, CFG, num_steps=10)
    loop = st
    for _ in range(10):
        loop, _ = variants.step_sm_only(loop, CFG)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(loop.pos),
                               atol=1e-6)


def test_sm_only_preserves_shape(rng):
    pts = _blob(rng, 150)
    st = init_fluid(pts, CFG)
    for _ in range(10):
        st, _ = variants.step_sm_only(st, CFG)
    # shape matching pulls toward the (falling) rest shape: displacement
    # stays finite/small and relative geometry roughly intact
    disp = np.asarray(st.displacement())[:150]
    assert np.isfinite(disp).all()
    # no SPH forces -> acc stays zero
    np.testing.assert_array_equal(np.asarray(st.acc)[:150], 0.0)


def test_monodomain_only_wave_propagates(rng):
    pts = _blob(rng, 250)
    st = init_fluid(pts, CFG)
    # stimulate a small region around one particle only
    st = set_stim(st, tuple(pts[0]), 0.001, CFG.stim_strength, CFG)
    n_stim = int((np.asarray(st.stim)[:250] > 0).sum())
    assert 0 < n_stim < 250, "stimulus should be local"
    tables = variants.monodomain_prepare(st, CFG, 32, 9 * 64)
    pos0 = np.asarray(st.pos)
    vm_prev = np.asarray(st.vm)[:250]
    st2 = st
    for _ in range(200):
        st2 = variants.step_monodomain_only(st2, tables, CFG)
    vm = np.asarray(st2.vm)[:250]
    # particles never move
    np.testing.assert_array_equal(np.asarray(st2.pos), pos0)
    # voltage rose somewhere (wave active) and spread beyond init
    assert vm.max() > vm_prev.max()
    assert (np.abs(vm) > 1e-3).sum() > n_stim


def test_monodomain_influence_propagates_at_most_h_per_step():
    """Causality of the SPH-discretized monodomain operator: the voltage
    diffusion couples only particles within the kernel support h
    (B_spline_2, cpp:562-563), so a local stimulus perturbation can
    influence AT MOST one support radius per step. Differencing a
    stimulated run against an unstimulated one must be bit-zero outside
    radius + k*h after k steps, and visibly nonzero inside."""
    xs = 0.1 + 0.02 * np.arange(60)
    ys = 0.6 + 0.02 * np.arange(3)
    pts = np.stack(np.meshgrid(xs, ys, ys, indexing="ij"),
                   -1).reshape(-1, 3).astype(np.float32)
    n = pts.shape[0]
    base = init_fluid(pts, CFG)
    stim = set_stim(base, (0.1, 0.62, 0.62), 0.001, CFG.stim_strength, CFG)
    hit = np.asarray(stim.stim)[:n] > 0
    assert 0 < hit.sum() < n / 4, "stimulus should be local to the rod end"
    tables = variants.monodomain_prepare(base, CFG, 32, 9 * 64)
    dist = np.linalg.norm(pts[:, None, :] - pts[None, hit, :],
                          axis=-1).min(axis=1)
    sa, sb = base, stim
    for k in range(1, 9):
        sa = variants.step_monodomain_only(sa, tables, CFG)
        sb = variants.step_monodomain_only(sb, tables, CFG)
        dv = np.abs(np.asarray(sb.vm)[:n] - np.asarray(sa.vm)[:n])
        far = dist > (k + 0.5) * CFG.kernel_h
        assert far.any() and dv[far].max() == 0.0, \
            f"influence escaped the {k}-step light cone"
        assert dv[~far].max() > 1e-3, f"no influence inside cone at step {k}"


def test_monodomain_only_scan_driver(rng):
    pts = _blob(rng, 150)
    st = init_fluid(pts, CFG)
    st = set_stim(st, (0.6, 0.6, 0.6), 0.5, CFG.stim_strength, CFG)
    tables = variants.monodomain_prepare(st, CFG, 32, 9 * 64)
    out, vms = variants.simulate_monodomain_only(st, tables, CFG,
                                                 num_steps=20, record_every=5)
    assert vms.shape[0] == 4
    loop = st
    for _ in range(20):
        loop = variants.step_monodomain_only(loop, tables, CFG)
    np.testing.assert_allclose(np.asarray(out.vm), np.asarray(loop.vm),
                               atol=1e-5)


@pytest.mark.slow
def test_monodomain_fused_matches_unfused(rng):
    from sph_sm_monodomain_tpu.models.variants import (
        monodomain_prepare, monodomain_prepare_fused,
        simulate_monodomain_only, simulate_monodomain_only_fused)
    pts = _blob(rng, 200)
    st = init_fluid(pts, CFG)
    st = set_stim(st, tuple(pts[0]), 0.001, CFG.stim_strength, CFG)

    tab = monodomain_prepare(st, CFG, 32, 9 * 64)
    ref = simulate_monodomain_only(st, tab, CFG, num_steps=30)

    ftab = monodomain_prepare_fused(st, CFG, q_block=64, w_chunk=256,
                                    sub_q=64)
    out = simulate_monodomain_only_fused(st, ftab, CFG, num_steps=30,
                                         q_block=64, w_chunk=256, sub_q=64)
    np.testing.assert_allclose(np.asarray(out.vm)[:200],
                               np.asarray(ref.vm)[:200], atol=1e-3,
                               err_msg="fused monodomain diverged")
    np.testing.assert_allclose(np.asarray(out.dens)[:200],
                               np.asarray(ref.dens)[:200], rtol=1e-5)


def test_monodomain_lap3_kernel_quick(rng):
    """Quick (non-slow) coverage of the Laplacian-only xyz3 kernel
    (ops/fused_step.sweep_lap3) — 5 steps vs the XLA frozen-cloud path;
    the 30-step version lives in test_monodomain_fused_matches_unfused."""
    from sph_sm_monodomain_tpu.models.variants import (
        monodomain_prepare, monodomain_prepare_fused,
        simulate_monodomain_only, simulate_monodomain_only_fused)
    pts = _blob(rng, 150)
    st = init_fluid(pts, CFG)
    st = set_stim(st, tuple(pts[0]), 0.001, CFG.stim_strength, CFG)

    tab = monodomain_prepare(st, CFG, 32, 9 * 64)
    ref = simulate_monodomain_only(st, tab, CFG, num_steps=5)
    ftab = monodomain_prepare_fused(st, CFG, q_block=64, w_chunk=128,
                                    sub_q=64)
    out = simulate_monodomain_only_fused(st, ftab, CFG, num_steps=5,
                                         q_block=64, w_chunk=128, sub_q=64)
    np.testing.assert_allclose(np.asarray(out.vm)[:150],
                               np.asarray(ref.vm)[:150], atol=1e-4,
                               err_msg="lap3 kernel diverged from XLA path")


def test_monodomain_record_every_blocks(rng):
    """record_every frames are recorded INSIDE the scan, one per block
    (the _scan_with_frames convention) — num_steps//k frames, the last one
    equal to the final state (not every-step stacking downsampled)."""
    pts = _blob(rng, 150)
    st = init_fluid(pts, CFG)
    st = set_stim(st, tuple(pts[0]), 0.001, CFG.stim_strength, CFG)
    tab = variants.monodomain_prepare(st, CFG, 32, 9 * 64)
    full = variants.simulate_monodomain_only(st, tab, CFG, num_steps=10)
    out, vms = variants.simulate_monodomain_only(st, tab, CFG, num_steps=10,
                                                 record_every=5)
    assert vms.shape[0] == 2
    # nested-scan compilation reorders fp slightly vs the flat scan
    np.testing.assert_allclose(np.asarray(vms[-1]), np.asarray(full.vm),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.vm), np.asarray(full.vm),
                               atol=1e-6)


def test_step_fused_unknown_impl_raises(rng):
    from sph_sm_monodomain_tpu.models.monodomain import step_fused
    pts = _blob(rng, 150)
    st = init_fluid(pts, CFG)
    with pytest.raises(ValueError, match="unknown fused impl"):
        step_fused(st, CFG, 64, 128, 32, impl="v6")
