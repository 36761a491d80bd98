"""ppermute halo-exchange path vs single-chip fused step.

The halo step keeps a device-sorted row layout (rows migrate between
devices), so states are compared by matching particles through their
orig_pos, which is unique per particle and travels with it.
"""

import numpy as np
import jax
import pytest

from sph_sm_monodomain_tpu import SimConfig, init_fluid
from sph_sm_monodomain_tpu.models.monodomain import step_fused
from sph_sm_monodomain_tpu.ops.electrophysiology import turn_on_stim_mesh
from sph_sm_monodomain_tpu.parallel.sharded_step import make_mesh
from sph_sm_monodomain_tpu.parallel import halo_step as H

CFG = SimConfig()


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh(jax.devices()[:8])


def _sorted_by_identity(state, fields):
    act = np.asarray(state.active)
    op = np.asarray(state.orig_pos)[act]
    key = np.lexsort((op[:, 2], op[:, 1], op[:, 0]))
    return {f: np.asarray(getattr(state, f))[act][key] for f in fields}, \
        int(act.sum())


@pytest.mark.slow
def test_halo_matches_single_chip(rng, mesh):
    n = 900
    pts = rng.uniform(0.06, 1.44, size=(n, 3)).astype(np.float32)
    st = init_fluid(pts, CFG)
    st = turn_on_stim_mesh(st, pts, CFG)

    halo, s_cap, mig_cap, halo_cap = H.shard_state_halo(st, mesh, CFG)
    assert s_cap % 128 == 0
    step_fn = H.make_halo_step(mesh, CFG, mig_cap, halo_cap, q_block=128,
                               w_chunk=128, sub_q=64)

    ref = st
    steps = 4
    ovf = None
    for _ in range(steps):
        ref, _ = step_fused(ref, CFG, 128, 128, 64, impl="v3")
        halo, ovf = step_fn(halo)
    assert int(ovf) == 0

    fields = ("pos", "vel", "vm", "dens", "iion", "w")
    r, n_r = _sorted_by_identity(ref, fields)
    h, n_h = _sorted_by_identity(halo, fields)
    assert n_r == n_h == n, "particles lost or duplicated by migration"
    tol = {"pos": 2e-5, "vel": 5e-3, "vm": 1e-3, "dens": 1.0,
           "iion": 1e-6, "w": 1e-7}
    for f in fields:
        np.testing.assert_allclose(h[f], r[f], atol=tol[f],
                                   err_msg=f"{f} diverged halo vs single")


@pytest.mark.slow
def test_halo_empty_devices_match_single_chip(rng, mesh):
    """A cloud concentrated in ONE slab: most devices own zero particles.
    Empty-slab bookkeeping, zero-contribution SM psums, and empty halo
    planes must all be inert — the step must still match single-chip and
    conserve particles."""
    n = 400
    pts = rng.uniform(0.05, 0.15, size=(n, 3)).astype(np.float32)
    pts[:, :2] = rng.uniform(0.4, 1.1, size=(n, 2)).astype(np.float32)
    st = init_fluid(pts, CFG)
    st = turn_on_stim_mesh(st, pts, CFG)

    halo, s_cap, mig_cap, halo_cap = H.shard_state_halo(st, mesh, CFG)
    # the blob spans ~3 cells along the slab axis of 8+ slabs: at least
    # half the devices must start empty for this test to mean anything
    owners = np.asarray(halo.active).reshape(8, -1).any(axis=1)
    assert owners.sum() <= 4, "cloud unexpectedly spread across slabs"

    step_fn = H.make_halo_step(mesh, CFG, mig_cap, halo_cap, q_block=128,
                               w_chunk=128, sub_q=64)
    ref = st
    ovf = None
    for _ in range(3):
        ref, _ = step_fused(ref, CFG, 128, 128, 64, impl="v3")
        halo, ovf = step_fn(halo)
    assert int(ovf) == 0

    fields = ("pos", "vel", "vm", "dens")
    r, n_r = _sorted_by_identity(ref, fields)
    h, n_h = _sorted_by_identity(halo, fields)
    assert n_r == n_h == n, "particles lost or duplicated"
    tol = {"pos": 2e-5, "vel": 5e-3, "vm": 1e-3, "dens": 1.0}
    for f in fields:
        np.testing.assert_allclose(h[f], r[f], atol=tol[f],
                                   err_msg=f"{f} diverged (empty devices)")


@pytest.mark.slow
def test_halo_migration_moves_particles(rng, mesh):
    """Particles given z-velocity must cross slab boundaries without loss."""
    n = 600
    pts = rng.uniform(0.06, 1.3, size=(n, 3)).astype(np.float32)
    vel = np.zeros_like(pts)
    vel[:, 2] = 2.5  # ~0.6 cells over 8 steps: crossings guaranteed
    st = init_fluid(pts, CFG, velocities=vel)

    halo, s_cap, mig_cap, halo_cap = H.shard_state_halo(st, mesh, CFG)
    sim = H.make_halo_simulate(mesh, CFG, mig_cap, halo_cap, num_steps=8,
                               q_block=128, w_chunk=128, sub_q=64)
    out, ovf = sim(halo)
    assert int(ovf) == 0
    act = np.asarray(out.active)
    assert int(act.sum()) == n
    pos = np.asarray(out.pos)[act]
    assert np.isfinite(pos).all()
    # ownership invariant: every active particle sits inside its device's
    # z-slab (one step of drift at most, which the next sort migrates)
    zb = H.z_slab_bounds(CFG, 8)
    rows = np.nonzero(act)[0]
    dev = rows // s_cap
    zcell = (pos[:, 2] / CFG.cell_size).astype(np.int64)
    lo, hi = zb[dev], zb[dev + 1]
    drift = np.maximum(lo - 1 - zcell, zcell - hi)  # allow 1-step lag
    assert (drift <= 0).mean() > 0.99


@pytest.mark.slow
def test_halo_clustered_sm_matches_single_chip(rng, mesh):
    """Multi-muscle clusters under the halo path: rows migrate between
    devices, so the clustered moments must use the one-hot form keyed on
    orig_pos (sm_rebind_rows re-centers q after every migration)."""
    cfg = CFG.replace(world_size=(3.0, 1.5, 1.5), sm_clusters=2)
    n = 260
    pts = rng.uniform(0.06, 1.44, size=(n, 3)).astype(np.float32)
    both = np.concatenate([pts, pts + [1.5, 0, 0]], axis=0).astype(
        np.float32)
    st = init_fluid(both, cfg)
    st = turn_on_stim_mesh(st, both, cfg, tile_width=1.5)

    halo, s_cap, mig_cap, halo_cap = H.shard_state_halo(st, mesh, cfg)
    step_fn = H.make_halo_step(mesh, cfg, mig_cap, halo_cap, q_block=128,
                               w_chunk=128, sub_q=64)
    ref = st
    for _ in range(3):
        ref, _ = step_fused(ref, cfg, 128, 128, 64, impl="v3")
        halo, ovf = step_fn(halo)
    assert int(ovf) == 0

    fields = ("pos", "vel", "vm")
    r, n_r = _sorted_by_identity(ref, fields)
    h, n_h = _sorted_by_identity(halo, fields)
    assert n_r == n_h == 2 * n
    np.testing.assert_allclose(r["pos"], h["pos"], atol=2e-5)
    np.testing.assert_allclose(r["vm"], h["vm"], atol=1e-3)


@pytest.mark.slow
def test_halo_stretched_world_slabs_follow_slow_axis(rng, mesh):
    """x-stretched worlds (the multi-muscle regime) must slab along x —
    the permuted SLOW hash axis — so each exchanged boundary plane is one
    O(tile) y-z cross-section instead of a full-length x-y plane
    (VERDICT r2 §2)."""
    from sph_sm_monodomain_tpu.ops.pallas_sweeps import hash_axis_perm
    cfg = CFG.replace(world_size=(6.0, 1.5, 1.5))
    assert hash_axis_perm(cfg)[2] == 0          # slow axis = x
    sb = H.slab_bounds(cfg, 8)
    assert sb[-1] == cfg.grid_size[0]           # slabs split the x extent
    n = 700
    pts = rng.uniform(0.06, 1.44, size=(n, 3)).astype(np.float32)
    pts[:, 0] = rng.uniform(0.06, 5.9, size=n).astype(np.float32)
    st = init_fluid(pts, cfg)
    st = turn_on_stim_mesh(st, pts, cfg)

    halo, s_cap, mig_cap, halo_cap = H.shard_state_halo(st, mesh, cfg)
    step_fn = H.make_halo_step(mesh, cfg, mig_cap, halo_cap, q_block=128,
                               w_chunk=128, sub_q=64)
    ref = st
    for _ in range(3):
        ref, _ = step_fused(ref, cfg, 128, 128, 64, impl="v4")
        halo, ovf = step_fn(halo)
    assert int(ovf) == 0

    fields = ("pos", "vel", "vm", "dens")
    r, n_r = _sorted_by_identity(ref, fields)
    h, n_h = _sorted_by_identity(halo, fields)
    assert n_r == n_h == n
    for f, tol in (("pos", 2e-5), ("vel", 5e-3), ("vm", 1e-3),
                   ("dens", 1.0)):
        np.testing.assert_allclose(h[f], r[f], atol=tol,
                                   err_msg=f"{f} diverged on x-slabs")
    # ownership invariant: every active particle sits inside its device's
    # x-slab (one step of drift at most)
    act = np.asarray(halo.active)
    rows = np.nonzero(act)[0]
    dev = rows // s_cap
    xcell = (np.asarray(halo.pos)[act][:, 0]
             / cfg.cell_size).astype(np.int64)
    lo, hi = sb[dev], sb[dev + 1]
    assert ((xcell >= lo - 1) & (xcell < hi + 1)).mean() > 0.99


@pytest.mark.slow
def test_halo_rectus_femoris_multi_muscle_scene(mesh):
    """BASELINE.json config 5 verbatim: the RectusFemoris replicated
    multi-muscle scene (per-muscle SM clusters, x-stretched world, mesh
    stim) sharded over the 8-device mesh via the halo path matches the
    single-chip fused step and conserves particles."""
    from sph_sm_monodomain_tpu import build_scene
    rep = 24
    sc = build_scene("rectus_femoris", replicate=rep)
    cfg, st = sc.cfg, sc.state
    assert cfg.sm_clusters == rep
    from sph_sm_monodomain_tpu.ops.pallas_sweeps import hash_axis_perm
    assert hash_axis_perm(cfg)[2] == 0          # stretched => x slabs

    halo, s_cap, mig_cap, halo_cap = H.shard_state_halo(st, mesh, cfg)
    step_fn = H.make_halo_step(mesh, cfg, mig_cap, halo_cap, q_block=128,
                               w_chunk=128, sub_q=64)
    ref = st
    ovf = None
    for _ in range(3):
        ref, _ = step_fused(ref, cfg, 128, 128, 64, impl="v4")
        halo, ovf = step_fn(halo)
    assert int(ovf) == 0

    fields = ("pos", "vel", "vm", "dens")
    r, n_r = _sorted_by_identity(ref, fields)
    h, n_h = _sorted_by_identity(halo, fields)
    assert n_r == n_h == sc.num_particles == 42 * rep
    # the rectus cloud is ~10x denser than biceps (dens ~1e4), so dens
    # carries a RELATIVE tolerance — reduction-order fp noise scales with
    # the magnitude, not with the biceps-calibrated 1.0 absolute
    tol = {"pos": (2e-5, 0.0), "vel": (5e-3, 0.0), "vm": (1e-3, 0.0),
           "dens": (0.0, 5e-4)}
    for f in fields:
        np.testing.assert_allclose(h[f], r[f], atol=tol[f][0],
                                   rtol=tol[f][1],
                                   err_msg=f"{f} diverged (rectus halo)")


def test_unshard_state_halo_roundtrip(rng, mesh):
    """unshard compacts a slab layout back to a dense lane-aligned state
    (the persistence path for halo checkpoints/renders)."""
    n = 300
    pts = rng.uniform(0.06, 1.44, size=(n, 3)).astype(np.float32)
    st = init_fluid(pts, CFG)
    halo, s_cap, *_ = H.shard_state_halo(st, mesh, CFG)
    dense = H.unshard_state_halo(halo, n, CFG)
    assert dense.capacity % 128 == 0
    act = np.asarray(dense.active)
    assert act[:n].all() and not act[n:].any()
    # same particle set (orig_pos is the identity)
    a = np.sort(np.asarray(st.orig_pos)[:n], axis=0)
    b = np.sort(np.asarray(dense.orig_pos)[:n], axis=0)
    np.testing.assert_array_equal(a, b)
    # padding matches init_fluid conventions (inert but finite)
    assert (np.asarray(dense.mass)[n:] == CFG.particle_mass).all()
    assert (np.asarray(dense.dens)[n:] == CFG.stand_density).all()
    # a lossy state must refuse to unshard by default (a checkpoint of it
    # would silently resume wrong physics) and only warn with allow_loss
    with pytest.raises(ValueError, match="overflow loss"):
        H.unshard_state_halo(halo, n + 1, CFG)
    lossy = H.unshard_state_halo(halo, n + 1, CFG, allow_loss=True)
    assert int(np.asarray(lossy.active).sum()) == n

@pytest.mark.slow
def test_halo_dynamic_params_match_baked(rng, mesh):
    """Dynamic physics params on the halo path (make_halo_step
    dynamic_params=True): traced PARAM_FIELDS overrides riding into the
    sweep kernels as the SMEM operand must reproduce the same trajectory
    as a halo step whose config bakes those values as immediates — the
    parity the single-chip and gather-sharded v4 paths already pin."""
    n = 700
    pts = rng.uniform(0.06, 1.44, size=(n, 3)).astype(np.float32)
    overrides = {"k_stiffness": 0.8, "mu_viscosity": 150.0,
                 "sm_alpha": 0.5, "fh_c1": 0.2}
    cfg_baked = CFG.replace(**overrides)

    st = init_fluid(pts, CFG)
    st = turn_on_stim_mesh(st, pts, CFG)

    halo_d, s_cap, mig_cap, halo_cap = H.shard_state_halo(st, mesh, CFG)
    halo_b = halo_d
    dyn_fn = H.make_halo_step(mesh, CFG, mig_cap, halo_cap, q_block=128,
                              w_chunk=128, sub_q=64, dynamic_params=True)
    baked_fn = H.make_halo_step(mesh, cfg_baked, mig_cap, halo_cap,
                                q_block=128, w_chunk=128, sub_q=64)
    import jax.numpy as jnp
    params = {k: jnp.float32(v) for k, v in overrides.items()}
    for _ in range(3):
        halo_d, ovf_d = dyn_fn(halo_d, params)
        halo_b, ovf_b = baked_fn(halo_b)
    assert int(ovf_d) == int(ovf_b) == 0
    fields = ("pos", "vel", "vm", "dens", "iion", "w")
    d, n_d = _sorted_by_identity(halo_d, fields)
    b, n_b = _sorted_by_identity(halo_b, fields)
    assert n_d == n_b == n
    for f in fields:
        np.testing.assert_allclose(
            d[f], b[f], atol=1e-6, rtol=1e-6,
            err_msg=f"{f}: dynamic params diverged from baked constants")
