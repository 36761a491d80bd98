"""Reference-quirk flags: strict mode reproduces them, corrected mode fixes
them (SURVEY.md §7 'Hard parts' — each quirk has a documented switch)."""

import numpy as np
import jax.numpy as jnp

from sph_sm_monodomain_tpu import SimConfig, init_fluid, step
from sph_sm_monodomain_tpu.ops import sph
from sph_sm_monodomain_tpu.ops.grid import build_neighbor_table
from sph_sm_monodomain_tpu.ops.electrophysiology import (fhn_cell_model,
                                                         set_stim)

STRICT = SimConfig()
CORRECTED = STRICT.replace(strict_reference_mode=False,
                           quirk_double_self_density=False,
                           quirk_pressure_stim_gate=False,
                           quirk_iion_accumulate=False,
                           quirk_stim_radius_squared=False)


def _blob(rng, n=128):
    return np.clip(rng.normal(size=(n, 3)).astype(np.float32) * 0.05 + 0.6,
                   0.05, 1.2)


def test_double_self_density_quirk(rng):
    pts = _blob(rng)
    st = init_fluid(pts, STRICT)
    nbr = build_neighbor_table(st.pos, st.pos, st.active, STRICT, 32, 9 * 32)
    d_strict = np.asarray(sph.density_pressure(st, nbr, STRICT).dens)[:128]
    d_fixed = np.asarray(sph.density_pressure(st, nbr, CORRECTED).dens)[:128]
    poly6_0 = 315.0 / (64.0 * np.pi * STRICT.kernel_h ** 9) \
        * STRICT.kernel_h ** 6
    np.testing.assert_allclose(d_strict - d_fixed,
                               np.asarray(st.mass)[:128] * poly6_0,
                               rtol=1e-4)


def test_pressure_stim_gate_quirk(rng):
    pts = _blob(rng)
    st = init_fluid(pts, STRICT)  # stim == 0 everywhere
    nbr = build_neighbor_table(st.pos, st.pos, st.active, STRICT, 32, 9 * 32)
    p_strict = np.asarray(sph.density_pressure(st, nbr, STRICT).pres)[:128]
    p_fixed = np.asarray(sph.density_pressure(st, nbr, CORRECTED).pres)[:128]
    np.testing.assert_array_equal(p_strict, -0.0)      # gated (cpp:502)
    assert np.abs(p_fixed).max() > 0                   # corrected: live EOS


def test_iion_accumulation_quirk(rng):
    pts = _blob(rng, 64)
    st = init_fluid(pts, STRICT)
    st = st.replace(vm=jnp.full_like(st.vm, -60.0),
                    iion=jnp.full_like(st.iion, 5.0))
    acc = np.asarray(fhn_cell_model(st, STRICT).iion)[:64]
    assign = np.asarray(fhn_cell_model(st, CORRECTED).iion)[:64]
    np.testing.assert_allclose(acc - assign, 5.0, atol=1e-6)  # += vs =


def test_stim_radius_squared_quirk(rng):
    pts = np.asarray([[0.5, 0.5, 0.5], [0.55, 0.5, 0.5], [0.8, 0.5, 0.5]],
                     np.float32)
    st = init_fluid(pts, STRICT)
    # radius=0.01: strict gate is dist^2 <= 0.01 (dist <= 0.1, cpp:712);
    # corrected gate is dist <= 0.01
    strict = np.asarray(set_stim(st, (0.5, 0.5, 0.5), 0.01, 300.0,
                                 STRICT).stim)[:3]
    fixed = np.asarray(set_stim(st, (0.5, 0.5, 0.5), 0.01, 300.0,
                                CORRECTED).stim)[:3]
    np.testing.assert_array_equal(strict, [300.0, 300.0, 0.0])
    np.testing.assert_array_equal(fixed, [300.0, 0.0, 0.0])


def test_corrected_mode_full_step_runs(rng):
    pts = _blob(rng, 200)
    st = init_fluid(pts, CORRECTED)
    st = set_stim(st, (0.6, 0.6, 0.6), 0.5, CORRECTED.stim_strength,
                  CORRECTED)
    for _ in range(3):
        st, aux = step(st, CORRECTED, 32, 9 * 64)
    assert np.isfinite(np.asarray(st.pos)[:200]).all()
    assert np.isfinite(np.asarray(st.vm)[:200]).all()


def test_strict_vs_corrected_diverge(rng):
    pts = _blob(rng, 150)
    a = init_fluid(pts, STRICT)
    b = init_fluid(pts, CORRECTED)
    for _ in range(3):
        a, _ = step(a, STRICT, 32, 9 * 64)
        b, _ = step(b, CORRECTED, 32, 9 * 64)
    # unstimulated: strict mode has zero pressure forces, corrected doesn't
    assert not np.allclose(np.asarray(a.vel)[:150], np.asarray(b.vel)[:150])


def test_stim_mesh_cloud_shortcut_matches_distance_pass(rng):
    """turn_on_stim_mesh's cloud shortcut (hit = active) must equal the
    general set_stim-union distance pass when the centers ARE the cloud —
    the O(N*M) pass is the round-3 >1.5M scale-ceiling root cause
    (DEVELOPMENT.md); the shortcut must not change the physics."""
    from sph_sm_monodomain_tpu.ops.electrophysiology import turn_on_stim_mesh
    pts = _blob(rng, 150)
    st = init_fluid(pts, STRICT)   # capacity 256: 106 padded inactive rows
    a = turn_on_stim_mesh(st, pts, STRICT)                   # shortcut
    b = turn_on_stim_mesh(st, pts, STRICT,
                          centers_are_cloud=False)           # distance pass
    np.testing.assert_array_equal(np.asarray(a.stim), np.asarray(b.stim))
    np.testing.assert_array_equal(np.asarray(a.fixed), np.asarray(b.fixed))
    assert bool(a.is_stim_on) and bool(b.is_stim_on)
