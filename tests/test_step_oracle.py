"""Golden integration tests: jitted grid step vs independent NumPy oracle.

Covers both regimes of the piecewise dynamics (SURVEY.md §7): stimulated
(live SPH pressure) and post-turnOffStim (SM-dominated relaxation).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sph_sm_monodomain_tpu import SimConfig, init_fluid, step
from sph_sm_monodomain_tpu.ops.electrophysiology import (set_stim,
                                                         turn_off_stim)
from oracle import oracle_step, oracle_turn_off_stim, state_to_oracle

CFG = SimConfig()


def _cloud(rng, n=220):
    # dense blob so there are real neighbor interactions
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.05 + 0.55
    return np.clip(pts, 0.05, 1.2)


def _compare(state, o, n, step_idx, atol_pos=2e-5, atol_vm=5e-3):
    np.testing.assert_allclose(np.asarray(state.pos)[:n], o["pos"],
                               atol=atol_pos,
                               err_msg=f"pos mismatch at step {step_idx}")
    np.testing.assert_allclose(np.asarray(state.vel)[:n], o["vel"],
                               atol=5e-3,
                               err_msg=f"vel mismatch at step {step_idx}")
    np.testing.assert_allclose(np.asarray(state.vm)[:n], o["vm"],
                               atol=atol_vm,
                               err_msg=f"vm mismatch at step {step_idx}")
    np.testing.assert_allclose(np.asarray(state.dens)[:n], o["dens"],
                               rtol=1e-4,
                               err_msg=f"dens mismatch at step {step_idx}")


def test_step_matches_oracle_stimulated(rng):
    pts = _cloud(rng)
    n = pts.shape[0]
    state = init_fluid(pts, CFG)
    # stimulate everything (mesh-protocol style) + pin a few particles
    state = set_stim(state, (0.55, 0.55, 0.55), 0.5, CFG.stim_strength, CFG)
    fixed = np.zeros(state.capacity, bool)
    fixed[:5] = True
    state = state.replace(fixed=jnp.asarray(fixed))

    o = state_to_oracle(state, n)
    assert (o["stim"] > 0).all()

    for i in range(5):
        state, aux = step(state, CFG, 32, 9 * 64)
        assert int(aux.overflow) == 0
        o = oracle_step(o, CFG)
        _compare(state, o, n, i)


def test_step_matches_oracle_after_stim_off(rng):
    pts = _cloud(rng, 150)
    n = pts.shape[0]
    state = init_fluid(pts, CFG)
    state = set_stim(state, (0.55, 0.55, 0.55), 0.5, CFG.stim_strength, CFG)
    o = state_to_oracle(state, n)

    for i in range(3):
        state, _ = step(state, CFG, 32, 9 * 64)
        o = oracle_step(o, CFG)

    state = turn_off_stim(state, CFG)
    o = oracle_turn_off_stim(o)
    np.testing.assert_array_equal(np.asarray(state.stim)[:n], o["stim"])
    np.testing.assert_array_equal(np.asarray(state.pres)[:n], o["pres"])

    for i in range(3):
        state, _ = step(state, CFG, 32, 9 * 64)
        o = oracle_step(o, CFG)
        _compare(state, o, n, i, atol_pos=5e-5)


def test_step_matches_oracle_wall_reflection(rng):
    """Wall handling (cpp:618-649): per-axis velocity flip (Wall_Hit=-1)
    with position snap into [0, World-1e-4]. The random-blob tests never
    reach the walls, so drive particles INTO all six faces explicitly."""
    world = np.asarray(CFG.world_size, np.float32)
    pts, vel = [], []
    r = rng
    for axis in range(3):
        for side in (0, 1):
            p = r.uniform(0.3, 1.2, size=(5, 3)).astype(np.float32)
            v = np.zeros((5, 3), np.float32)
            p[:, axis] = 0.01 if side == 0 else world[axis] - 0.01
            v[:, axis] = -3.0 if side == 0 else 3.0  # outward, fast
            pts.append(p)
            vel.append(v)
    pts = np.concatenate(pts)
    vel = np.concatenate(vel)
    n = pts.shape[0]
    state = init_fluid(pts, CFG, velocities=vel)
    state = set_stim(state, (0.75, 0.75, 0.75), 2.0, CFG.stim_strength, CFG)
    o = state_to_oracle(state, n)
    hit_any = False
    for i in range(3):
        state, _ = step(state, CFG, 32, 9 * 64)
        o = oracle_step(o, CFG)
        _compare(state, o, n, i)
        hit_any |= bool((np.asarray(state.pos)[:n] <= 0.0).any()
                        or (np.asarray(state.pos)[:n]
                            >= world - 1e-4).any())
    # the scenario actually exercised the reflection/snap path (measured:
    # 30 snap events over the 3 steps with this seed/geometry)
    assert hit_any, "no particle ever reached a wall — scenario too tame"
    assert np.isfinite(np.asarray(state.pos)[:n]).all()
    assert (np.asarray(state.pos)[:n] >= 0.0).all()
    assert (np.asarray(state.pos)[:n] <= world[None, :] - 1e-4 + 1e-6).all()


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_step_matches_oracle_randomized_config(seed):
    """Config plumbing: every physics constant must reach the kernels.
    Random draws over the reference's sweep ranges (results_171114.csv
    campaign axes: K, alpha, beta, mu, sigma, stim) plus the runtime
    toggles, diffed against the config-driven oracle."""
    r = np.random.default_rng(seed)
    cfg = CFG.replace(
        k_stiffness=float(r.uniform(0.3, 1.0)),
        sm_alpha=float(r.uniform(0.1, 0.6)),
        sm_beta=float(r.uniform(0.1, 0.6)),
        mu_viscosity=float(r.uniform(20.0, 300.0)),
        sigma_i=float(r.uniform(0.3, 2.0)),   # sigma is derived (cpp:26)
        stim_strength=float(r.uniform(100.0, 800.0)),
        velocity_mixing=float(r.uniform(0.05, 0.6)),
        volume_conservation=bool(r.integers(0, 2)),
        quirk_double_self_density=bool(r.integers(0, 2)),
        quirk_pressure_stim_gate=bool(r.integers(0, 2)),
    )
    pts = _cloud(r, 180)
    n = pts.shape[0]
    state = init_fluid(pts, cfg)
    state = set_stim(state, (0.55, 0.55, 0.55), 0.5, cfg.stim_strength, cfg)
    o = state_to_oracle(state, n)
    for i in range(3):
        state, aux = step(state, cfg, 32, 9 * 64)
        assert int(aux.overflow) == 0
        o = oracle_step(o, cfg)
        _compare(state, o, n, i)


@pytest.mark.slow
def test_step_matches_oracle_quadratic_match(rng):
    cfg = CFG.replace(quadratic_match=True)
    pts = _cloud(rng, 120)
    n = pts.shape[0]
    state = init_fluid(pts, cfg)
    state = set_stim(state, (0.55, 0.55, 0.55), 0.5, cfg.stim_strength, cfg)
    o = state_to_oracle(state, n)
    state, _ = step(state, cfg, 32, 9 * 64)
    # oracle has no quadratic path; just check physical sanity + shape here
    assert np.isfinite(np.asarray(state.pos)[:n]).all()
    assert np.isfinite(np.asarray(state.vm)[:n]).all()
    # goal positions moved for non-fixed particles
    assert not np.allclose(np.asarray(state.goal_pos)[:n], o["goal_pos"])


def test_padded_lanes_stay_inert(rng):
    pts = _cloud(rng, 100)
    state = init_fluid(pts, CFG)  # pads to 128
    state = set_stim(state, (0.55, 0.55, 0.55), 0.5, CFG.stim_strength, CFG)
    pad_pos0 = np.asarray(state.pos)[100:]
    for _ in range(3):
        state, _ = step(state, CFG, 32, 9 * 64)
    np.testing.assert_array_equal(np.asarray(state.pos)[100:], pad_pos0)
    np.testing.assert_array_equal(np.asarray(state.vm)[100:], 0.0)


def test_fixed_particles_never_move(rng):
    pts = _cloud(rng, 120)
    state = init_fluid(pts, CFG)
    state = set_stim(state, (0.55, 0.55, 0.55), 0.5, CFG.stim_strength, CFG)
    fixed = np.zeros(state.capacity, bool)
    fixed[:10] = True
    state = state.replace(fixed=jnp.asarray(fixed))
    p0 = np.asarray(state.pos)[:10]
    for _ in range(4):
        state, _ = step(state, CFG, 32, 9 * 64)
    np.testing.assert_array_equal(np.asarray(state.pos)[:10], p0)
    # but their voltage DOES evolve (cpp:612 applies to all)
    assert not np.allclose(np.asarray(state.vm)[:10], 0.0)
