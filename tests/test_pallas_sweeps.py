"""Fused Pallas sweep kernels vs the XLA reference phases (interpret mode
on CPU; the same code compiles natively on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sph_sm_monodomain_tpu import SimConfig, init_fluid
from sph_sm_monodomain_tpu.models.monodomain import step, step_fused
from sph_sm_monodomain_tpu.ops import grid, sph
from sph_sm_monodomain_tpu.ops.pallas_sweeps import auto_block_window
from sph_sm_monodomain_tpu.ablation.legacy_sweeps import (sweep_a, sweep_b,
                                                          sweep_bookkeeping)
from sph_sm_monodomain_tpu.ops.electrophysiology import set_stim

CFG = SimConfig()
QB = 128


def _state(rng, n=256):
    pts = np.clip(rng.normal(size=(n, 3)).astype(np.float32) * 0.05 + 0.6,
                  0.05, 1.2)
    st = init_fluid(pts, CFG)
    st = set_stim(st, (0.6, 0.6, 0.6), 0.5, CFG.stim_strength, CFG)
    # give fields non-trivial values
    st = st.replace(corrected_vel=jnp.asarray(
        rng.normal(size=st.pos.shape).astype(np.float32) * 0.1),
        inter_vel=jnp.asarray(
        rng.normal(size=st.pos.shape).astype(np.float32) * 0.1),
        vm=jnp.asarray(rng.normal(size=(st.capacity,)).astype(np.float32)
                       * 10.0))
    return st, pts


@pytest.mark.slow
def test_sweep_a_matches_xla_phase(rng):
    st, pts = _state(rng)
    w_win = auto_block_window(pts, CFG, QB)
    order, inv, qs, qe, bs, bl = sweep_bookkeeping(st.pos, st.active, CFG, QB)
    pos_s = st.pos[order]
    mass_s = st.mass[order]
    cvel_s = st.corrected_vel[order]
    vol_prev = mass_s / st.dens[order]
    dens_s, xsph_s = sweep_a(pos_s, cvel_s, vol_prev, mass_s, qs, qe, bs,
                             bl, QB, w_win, CFG, interpret=True)
    dens = np.asarray(dens_s[inv])
    xsph = np.asarray(xsph_s[inv])

    # XLA reference: window-table phases
    nbr = grid.build_neighbor_table(st.pos, st.pos, st.active, CFG, 64,
                                    9 * 64)
    ref_x = sph.xsph_intermediate_velocity(st, nbr, CFG).inter_vel
    ref_d = sph.density_pressure(st, nbr, CFG).dens

    n = 256
    want_partial = (np.asarray(ref_x) - np.asarray(st.corrected_vel))[:n]
    np.testing.assert_allclose(xsph[:n], want_partial, atol=2e-5,
                               err_msg="xsph partial mismatch")
    want_dens = np.asarray(ref_d)[:n] - np.asarray(st.mass)[:n] * \
        float(315.0 / (64.0 * np.pi * CFG.kernel_h ** 9)) \
        * CFG.kernel_h ** 6  # remove the quirk self term: m * poly6(0)
    np.testing.assert_allclose(dens[:n], want_dens, rtol=1e-5, atol=1e-2,
                               err_msg="density mismatch")


def test_sweep_b_matches_xla_phase(rng):
    st, pts = _state(rng)
    # give dens/pres realistic values first
    nbr = grid.build_neighbor_table(st.pos, st.pos, st.active, CFG, 64,
                                    9 * 64)
    st = sph.density_pressure(st, nbr, CFG)
    ref = sph.force_and_diffusion(st, nbr, CFG)

    w_win = auto_block_window(pts, CFG, QB)
    order, inv, qs, qe, bs, bl = sweep_bookkeeping(st.pos, st.active, CFG, QB)
    pos_s = st.pos[order]
    mass_s = st.mass[order]
    dens_s = st.dens[order]
    acc_raw, lap = sweep_b(pos_s, st.inter_vel[order], mass_s / dens_s,
                           st.pres[order], st.vm[order], qs, qe, bs, bl, QB,
                           w_win, CFG, interpret=True)
    acc = np.asarray((acc_raw / dens_s[:, None])[inv])
    lap = np.asarray(lap[inv])

    n = 256
    np.testing.assert_allclose(acc[:n], np.asarray(ref.acc)[:n], atol=5e-4,
                               err_msg="acc mismatch")
    # reconstruct the laplacian from the reference inter_vm (cpp:571)
    scale = CFG.sigma / (CFG.beta_sv_ratio * CFG.cm_capacitance)
    currents = (np.asarray(st.iion) - np.asarray(st.stim) * CFG.time_delta
                / np.asarray(st.mass)) / CFG.cm_capacitance
    want_lap = (np.asarray(ref.inter_vm) + currents) / (1.0 + scale)
    np.testing.assert_allclose(lap[:n], want_lap[:n], atol=5e-3,
                               err_msg="laplacian mismatch")


@pytest.mark.slow
def test_step_fused_matches_step(rng):
    st, pts = _state(rng, 200)
    w_win = auto_block_window(pts, CFG, QB)
    a = st
    b = st
    for i in range(3):
        a, aux_a = step(a, CFG, 64, 9 * 64)
        b, aux_b = step_fused(b, CFG, QB, w_win)
        assert int(aux_b.overflow) == 0
    for name, atol in (("pos", 5e-5), ("vel", 5e-3), ("vm", 5e-3),
                       ("iion", 1e-5), ("w", 1e-6)):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name))[:200],
            np.asarray(getattr(b, name))[:200], atol=atol,
            err_msg=f"{name} diverged fused vs unfused")
    np.testing.assert_allclose(np.asarray(a.dens)[:200],
                               np.asarray(b.dens)[:200], rtol=1e-5)


def test_step_fused_v4_matches_step(rng):
    """The production v4 path (merged z-plane windows, per-axis cell mask)
    against the bucketed XLA step."""
    st, pts = _state(rng, 200)
    a = st
    b = st
    for i in range(3):
        a, _ = step(a, CFG, 64, 9 * 64)
        b, aux_b = step_fused(b, CFG, 64, 128, 64, impl="v4")
        assert int(aux_b.overflow) == 0
    for name, atol in (("pos", 5e-5), ("vel", 5e-3), ("vm", 5e-3),
                       ("iion", 1e-5), ("w", 1e-6)):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name))[:200],
            np.asarray(getattr(b, name))[:200], atol=atol,
            err_msg=f"{name} diverged v4-fused vs unfused")
    np.testing.assert_allclose(np.asarray(a.dens)[:200],
                               np.asarray(b.dens)[:200], rtol=1e-5)


def test_step_fused_v4_randomized_config():
    """Config plumbing through the fused kernels: the Pallas sweeps bake
    cfg constants at trace time (SMEM scalars / inlined literals), so a
    non-default config must reproduce the XLA step exactly like the
    default one does."""
    r = np.random.default_rng(7)
    cfg = CFG.replace(
        k_stiffness=float(r.uniform(0.3, 1.0)),
        sm_alpha=float(r.uniform(0.1, 0.6)),
        sm_beta=float(r.uniform(0.1, 0.6)),
        mu_viscosity=float(r.uniform(20.0, 300.0)),
        sigma_i=float(r.uniform(0.3, 2.0)),
        stim_strength=float(r.uniform(100.0, 800.0)),
        velocity_mixing=float(r.uniform(0.05, 0.6)),
    )
    pts = np.clip(r.normal(size=(200, 3)).astype(np.float32) * 0.05 + 0.6,
                  0.05, 1.2)
    a = init_fluid(pts, cfg)
    a = set_stim(a, (0.6, 0.6, 0.6), 0.5, cfg.stim_strength, cfg)
    b = a
    for i in range(3):
        a, _ = step(a, cfg, 64, 9 * 64)
        b, aux_b = step_fused(b, cfg, 64, 128, 64, impl="v4")
        assert int(aux_b.overflow) == 0
    for name, atol in (("pos", 5e-5), ("vel", 5e-3), ("vm", 5e-3),
                       ("iion", 1e-5), ("w", 1e-6)):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name))[:200],
            np.asarray(getattr(b, name))[:200], atol=atol,
            err_msg=f"{name} diverged v4-fused vs unfused (random cfg)")
    np.testing.assert_allclose(np.asarray(a.dens)[:200],
                               np.asarray(b.dens)[:200], rtol=1e-5)


@pytest.mark.slow
def test_step_fused_v4_quadratic_volume_sm(rng):
    """Quadratic shape matching + volume-conservation clamp through the
    production fused path: SM runs in XLA glue shared with the bucketed
    step, but the fused kernels consume its corrected velocities — this
    pins the plumbing for the two SM toggles the fidelity suite only
    covers on the XLA path (flip_quadratic/flip_volume, h:154-155)."""
    cfg = CFG.replace(quadratic_match=True, volume_conservation=False)
    pts = np.clip(rng.normal(size=(200, 3)).astype(np.float32) * 0.05 + 0.6,
                  0.05, 1.2)
    a = init_fluid(pts, cfg)
    a = set_stim(a, (0.6, 0.6, 0.6), 0.5, cfg.stim_strength, cfg)
    b = a
    for _ in range(3):
        a, _ = step(a, cfg, 64, 9 * 64)
        b, aux_b = step_fused(b, cfg, 64, 128, 64, impl="v4")
        assert int(aux_b.overflow) == 0
    for name, atol in (("pos", 5e-5), ("vel", 5e-3), ("vm", 5e-3)):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name))[:200],
            np.asarray(getattr(b, name))[:200], atol=atol,
            err_msg=f"{name} diverged v4-fused vs unfused (quadratic SM)")


def test_step_fused_v4_world_boundary_cells(rng):
    """Clouds hugging the world box exercise the v4 mask's wrap-pair
    argument (y=0 / y=Gy-1 cells): wrap pairs are accepted by the cyz test
    but must contribute exactly 0."""
    n = 180
    pts = rng.random((n, 3)).astype(np.float32)
    pts[:, 1] = np.where(pts[:, 1] < 0.5, pts[:, 1] * 0.05,
                         1.5 - 0.05 * (1.0 - pts[:, 1]) - 1e-4)
    pts[:, 0] = 0.02 + pts[:, 0] * 0.1
    pts[:, 2] = 0.02 + pts[:, 2] * 0.1
    st = init_fluid(np.clip(pts, 0.0, 1.5 - 1e-4), CFG)
    st = set_stim(st, (0.07, 0.02, 0.07), 0.5, CFG.stim_strength, CFG)
    a, b = st, st
    for _ in range(2):
        a, _ = step(a, CFG, 64, 9 * 64)
        b, _ = step_fused(b, CFG, 64, 128, 64, impl="v4")
    np.testing.assert_allclose(np.asarray(a.pos)[:n],
                               np.asarray(b.pos)[:n], atol=5e-5,
                               err_msg="v4 boundary cells diverged")
    np.testing.assert_allclose(np.asarray(a.dens)[:n],
                               np.asarray(b.dens)[:n], rtol=1e-5)


@pytest.mark.slow
def test_step_fused_v4_wide_world_axis_perm(rng):
    """Stretched worlds (multi-muscle replicate scenes) permute the v4
    hash axes so the smallest extent is fast — physics must match the
    bucketed step regardless."""
    from sph_sm_monodomain_tpu.ops.pallas_sweeps import hash_axis_perm
    cfg = CFG.replace(world_size=(4.5, 1.5, 1.5))
    assert hash_axis_perm(cfg)[0] != 0  # x (widest) must not be fast
    n = 220
    pts = rng.random((n, 3)).astype(np.float32) * [4.3, 0.4, 0.4] \
        + [0.1, 0.5, 0.5]
    st = init_fluid(pts.astype(np.float32), cfg)
    st = set_stim(st, tuple(pts[0]), 0.5, cfg.stim_strength, cfg)
    a, b = st, st
    for _ in range(2):
        a, _ = step(a, cfg, 64, 9 * 64)
        b, _ = step_fused(b, cfg, 64, 128, 64, impl="v4")
    np.testing.assert_allclose(np.asarray(a.pos)[:n],
                               np.asarray(b.pos)[:n], atol=5e-5,
                               err_msg="v4 axis-permuted hash diverged")
    np.testing.assert_allclose(np.asarray(a.dens)[:n],
                               np.asarray(b.dens)[:n], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a.vm)[:n],
                               np.asarray(b.vm)[:n], atol=5e-3)


def test_step_fused_v4_wide_sub_blocks(rng):
    """sub_q=q_block=256 — the granularity utils/io.build_scene falls back
    to when the per-sub-block SMEM bounds would overflow the ~1 MB scalar
    budget (multi-million-particle scenes)."""
    st, pts = _state(rng, 256)  # capacity 256 divides q_block=256
    a, b = st, st
    for _ in range(2):
        a, _ = step(a, CFG, 64, 9 * 64)
        b, aux_b = step_fused(b, CFG, 256, 128, 256, impl="v4")
        assert int(aux_b.overflow) == 0
    for name, atol in (("pos", 5e-5), ("vel", 5e-3), ("vm", 5e-3)):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name))[:256],
            np.asarray(getattr(b, name))[:256], atol=atol,
            err_msg=f"{name} diverged at sub_q=256")
    np.testing.assert_allclose(np.asarray(a.dens)[:256],
                               np.asarray(b.dens)[:256], rtol=1e-5)


def test_build_scene_smem_budget_widens_sub_blocks():
    """The SMEM-bounds budget rule: 128-row sub-blocks up to ~3.6M padded
    rows, then doubled until (cap/sub_q)*4*8 <= 900 kB (the x224 4.1M
    scene failed _call_kernel3's budget check before this tuner rule)."""
    from sph_sm_monodomain_tpu.utils.io import smem_budget_sub_q
    for cap, want in ((1_034_624, 128), (3_600_000, 128),
                      (4_138_496, 256), (16_000_000, 1024)):
        assert smem_budget_sub_q(cap) == want, (cap, want)


@pytest.mark.slow
def test_fused_padded_lanes_inert(rng):
    st, pts = _state(rng, 150)  # capacity 256, 106 padded lanes
    w_win = auto_block_window(pts, CFG, QB)
    pad_pos = np.asarray(st.pos)[150:]
    out, _ = step_fused(st, CFG, QB, w_win)
    np.testing.assert_array_equal(np.asarray(out.pos)[150:], pad_pos)


def test_step_fused_v4_permutation_equivariance(rng):
    """Permuting particle rows must permute the trajectory: the sort /
    window / unsort machinery may not depend on input row order beyond fp
    reassociation (stable sort ties break by original index, so summation
    order inside a cell changes — hence tolerances, not bit equality)."""
    st, pts = _state(rng, 200)
    cap = st.capacity
    perm = rng.permutation(cap)

    def permute(s):
        return jax.tree_util.tree_map(
            lambda a: a[perm] if hasattr(a, "ndim") and a.ndim
            and a.shape[0] == cap else a, s)

    a = st
    b = permute(st)
    for _ in range(2):
        a, _ = step_fused(a, CFG, 64, 128, 64, impl="v4")
        b, _ = step_fused(b, CFG, 64, 128, 64, impl="v4")
    a = permute(a)   # bring the baseline into the permuted row order
    act = np.asarray(a.active)
    for name, atol in (("pos", 5e-5), ("vel", 5e-3), ("vm", 5e-3),
                       ("dens", 0.05), ("iion", 1e-5), ("w", 1e-6)):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name))[act],
            np.asarray(getattr(b, name))[act], atol=atol,
            err_msg=f"{name} not permutation-equivariant")


def test_fused_v4_inactive_lanes_on_top_of_active(rng):
    """Adversarial inert-lane contract: inactive padded lanes placed
    EXACTLY on top of active particles, with init-style nonzero mass and
    stand-density dens. The v4 sweep-A mask no longer tests the
    sentinel-bearing cx feature (ops/fused_step._gather_loop4 mask="yz"),
    so only the zeroed mass/vol candidate features (build_qm_feats) keep
    such lanes from contributing to their hosts' density/XSPH — this is
    the test that fails if that contract breaks."""
    st, pts = _state(rng, 150)
    # park every padded lane on an active particle (worst case: distance 0,
    # same cell, passes every geometric test)
    pad_rows = st.capacity - 150
    host = np.asarray(st.pos)[:150][
        rng.integers(0, 150, size=pad_rows)]
    pos = np.asarray(st.pos).copy()
    pos[150:] = host
    dens = np.asarray(st.dens).copy()
    dens[150:] = CFG.stand_density       # plausible stale values
    st_adv = st.replace(pos=jnp.asarray(pos), dens=jnp.asarray(dens))

    a = st  # clean padding (baseline)
    b = st_adv
    for _ in range(2):
        a, _ = step_fused(a, CFG, 64, 128, 64, impl="v4")
        b, _ = step_fused(b, CFG, 64, 128, 64, impl="v4")
    for name in ("pos", "vel", "dens", "vm", "iion", "w"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name))[:150],
            np.asarray(getattr(b, name))[:150],
            err_msg=f"{name}: overlapping inactive lanes leaked into "
                    "active results")


@pytest.mark.slow
def test_step_fused_hbm_candidate_path(rng, monkeypatch):
    # force the large-N path (candidates in HBM, per-chunk DMA); patch the
    # threshold in BOTH modules that bind it (fused_step imports the value)
    from sph_sm_monodomain_tpu.ops import fused_step as fsm
    from sph_sm_monodomain_tpu.ops import pallas_sweeps as ps
    monkeypatch.setattr(ps, "VMEM_FEATS_LIMIT_BYTES", 1)
    monkeypatch.setattr(fsm, "VMEM_FEATS_LIMIT_BYTES", 1)
    st, pts = _state(rng, 200)
    # q_block=64 differs from every other test so jit can't reuse a cached
    # trace made with the normal (VMEM) threshold
    w_win = auto_block_window(pts, CFG, 64)
    a, b = st, st
    for _ in range(2):
        a, _ = step(a, CFG, 64, 9 * 64)
        b, _ = step_fused(b, CFG, 64, w_win)
    np.testing.assert_allclose(np.asarray(a.pos)[:200],
                               np.asarray(b.pos)[:200], atol=5e-5,
                               err_msg="HBM candidate path diverged")


@pytest.mark.slow
def test_step_fused_v4_hbm_double_buffer(rng, monkeypatch):
    # the v4 large-array HBM path double-buffers the candidate DMA
    # (_gather_loop4); physics must match the bucketed step exactly as in
    # the VMEM path
    from sph_sm_monodomain_tpu.ops import fused_step as fsm
    from sph_sm_monodomain_tpu.ops import pallas_sweeps as ps
    monkeypatch.setattr(ps, "VMEM_FEATS_LIMIT_BYTES", 1)
    monkeypatch.setattr(fsm, "VMEM_FEATS_LIMIT_BYTES", 1)
    monkeypatch.setattr(fsm, "DB_FEATS_MIN_BYTES", 1)
    st, pts = _state(rng, 210)
    a, b = st, st
    for _ in range(2):
        a, _ = step(a, CFG, 32, 9 * 64)
        b, _ = step_fused(b, CFG, 32, 128, 32, impl="v4")
    np.testing.assert_allclose(np.asarray(a.pos)[:210],
                               np.asarray(b.pos)[:210], atol=5e-5,
                               err_msg="v4 double-buffered HBM path "
                                       "diverged")
    np.testing.assert_allclose(np.asarray(a.dens)[:210],
                               np.asarray(b.dens)[:210], rtol=1e-5)


@pytest.mark.slow
def test_step_fused_v4_hbm_blocking(rng, monkeypatch):
    # v4 mid-size HBM path (blocking single-buffer DMA, db off)
    from sph_sm_monodomain_tpu.ops import fused_step as fsm
    from sph_sm_monodomain_tpu.ops import pallas_sweeps as ps
    monkeypatch.setattr(ps, "VMEM_FEATS_LIMIT_BYTES", 1)
    monkeypatch.setattr(fsm, "VMEM_FEATS_LIMIT_BYTES", 1)
    st, pts = _state(rng, 230)
    a, b = st, st
    for _ in range(2):
        a, _ = step(a, CFG, 32, 9 * 64)
        b, _ = step_fused(b, CFG, 32, 256, 32, impl="v4")
    np.testing.assert_allclose(np.asarray(a.pos)[:230],
                               np.asarray(b.pos)[:230], atol=5e-5,
                               err_msg="v4 blocking HBM path diverged")


@pytest.mark.slow
def test_step_fused_sub_blocks_match(rng):
    # sub-block windows (tighter bounds per 32 queries) == plain windows
    st, pts = _state(rng, 200)
    a, b = st, st
    for _ in range(2):
        a, _ = step_fused(a, CFG, 128, 256)
        b, _ = step_fused(b, CFG, 128, 256, 32)
    np.testing.assert_allclose(np.asarray(a.pos)[:200],
                               np.asarray(b.pos)[:200], atol=2e-5,
                               err_msg="sub-block windows diverged")
    np.testing.assert_allclose(np.asarray(a.vm)[:200],
                               np.asarray(b.vm)[:200], atol=1e-3)


@pytest.mark.slow
def test_step_fused_v5_matches_step(rng):
    """The v5 packed-slab path (per-sub-block dilated-union candidate
    slabs, exact 3-axis cell mask) against the bucketed XLA step."""
    st, pts = _state(rng, 200)
    a = st
    b = st
    for i in range(3):
        a, _ = step(a, CFG, 64, 9 * 64)
        b, aux_b = step_fused(b, CFG, 64, 128, 16, impl="v5", pack_cap=640)
        assert int(aux_b.overflow) == 0
    for name, atol in (("pos", 5e-5), ("vel", 5e-3), ("vm", 5e-3),
                       ("iion", 1e-5), ("w", 1e-6)):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name))[:200],
            np.asarray(getattr(b, name))[:200], atol=atol,
            err_msg=f"{name} diverged v5-fused vs unfused")
    np.testing.assert_allclose(np.asarray(a.dens)[:200],
                               np.asarray(b.dens)[:200], rtol=1e-5)


@pytest.mark.slow
def test_step_fused_v5_overflow_counter(rng):
    """A deliberately undersized pack_cap must report overflow (the v5
    regrow signal) instead of silently truncating."""
    st, pts = _state(rng, 200)
    _, aux = step_fused(st, CFG, 64, 128, 16, impl="v5", pack_cap=128)
    assert int(aux.overflow) > 0


@pytest.mark.slow
def test_step_fused_v5_wide_chunks_match(rng):
    """w_chunk != 128 must produce the SAME densities: the per-block trip
    counts are sized in w_chunk-wide chunks (a hard-coded 128 made every
    chunk past kb re-read the last real chunk via the clamped dynamic
    slice and multi-count its contributions ~3.7x)."""
    st, pts = _state(rng, 200)
    a, _ = step_fused(st, CFG, 64, 128, 16, impl="v5", pack_cap=1024)
    b, aux_b = step_fused(st, CFG, 64, 512, 16, impl="v5", pack_cap=1024)
    assert int(aux_b.overflow) == 0
    np.testing.assert_allclose(np.asarray(a.dens)[:200],
                               np.asarray(b.dens)[:200], rtol=1e-6,
                               err_msg="v5 dens diverged at w_chunk=512")
    np.testing.assert_allclose(np.asarray(a.pos)[:200],
                               np.asarray(b.pos)[:200], atol=1e-7)


@pytest.mark.slow
def test_step_fused_v5_wide_world_axis_perm(rng):
    """Stretched worlds permute the hash axes (multi-muscle scenes); the
    packed slabs must follow the permutation like v4 does."""
    from sph_sm_monodomain_tpu.ops.pallas_sweeps import hash_axis_perm
    cfg = CFG.replace(world_size=(4.5, 1.5, 1.5))
    assert hash_axis_perm(cfg)[0] != 0
    n = 220
    pts = rng.random((n, 3)).astype(np.float32) * [4.3, 0.4, 0.4] \
        + [0.1, 0.5, 0.5]
    st = init_fluid(pts.astype(np.float32), cfg)
    st = set_stim(st, tuple(pts[0]), 0.5, cfg.stim_strength, cfg)
    a, b = st, st
    for _ in range(2):
        a, _ = step(a, cfg, 64, 9 * 64)
        b, aux = step_fused(b, cfg, 64, 128, 32, impl="v5", pack_cap=768)
        assert int(aux.overflow) == 0
    np.testing.assert_allclose(np.asarray(a.pos)[:n],
                               np.asarray(b.pos)[:n], atol=5e-5,
                               err_msg="v5 axis-permuted hash diverged")
    np.testing.assert_allclose(np.asarray(a.dens)[:n],
                               np.asarray(b.dens)[:n], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a.vm)[:n],
                               np.asarray(b.vm)[:n], atol=5e-3)


@pytest.mark.slow
def test_step_fused_v5_sparse_block_overlap(rng):
    """Blocks whose hash span exceeds G_fast make consecutive dilated runs
    overlap; the disjoint clamp must keep each candidate packed once (a
    double-pack would double-count pair contributions)."""
    n = 96
    # two tight clusters far apart along the fast axis -> one sub-block
    # straddles a huge hash gap
    pts = np.concatenate([
        rng.random((n // 2, 3)).astype(np.float32) * 0.08 + 0.05,
        rng.random((n // 2, 3)).astype(np.float32) * 0.08 + 1.3,
    ]).astype(np.float32)
    st = init_fluid(pts, CFG)
    st = set_stim(st, tuple(pts[0]), 0.5, CFG.stim_strength, CFG)
    a, b = st, st
    for _ in range(2):
        a, _ = step(a, CFG, 64, 9 * 64)
        b, aux = step_fused(b, CFG, 64, 128, 32, impl="v5", pack_cap=512)
        assert int(aux.overflow) == 0
    np.testing.assert_allclose(np.asarray(a.pos)[:n],
                               np.asarray(b.pos)[:n], atol=5e-5,
                               err_msg="v5 sparse-block overlap diverged")
    np.testing.assert_allclose(np.asarray(a.dens)[:n],
                               np.asarray(b.dens)[:n], rtol=1e-5)
