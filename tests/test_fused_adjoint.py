"""Hand-adjoint coupled sweeps (ops/fused_adjoint.py): gradient parity.

Three layers of evidence, strongest first:
1. Primitive VJPs vs an O(N^2) dense jnp replica of the SAME pair math +
   the SAME epilogues, with random output cotangents — catches any error
   in the backward kernels' derivative algebra (this is the oracle that
   caught the out-of-support viscosity d_pos term during development).
2. End-to-end jax.grad parity: step_fused_diff vs the XLA autodiff path
   (models.monodomain.step) on a multi-step rollout loss w.r.t. traced
   material params (config.PARAM_FIELDS) — the flagship-fit use case.
3. jax.checkpoint composition (the long-rollout memory policy the fits
   rely on).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sph_sm_monodomain_tpu as smt
from sph_sm_monodomain_tpu.config import resolve_params
from sph_sm_monodomain_tpu.models.monodomain import step
from sph_sm_monodomain_tpu.ops import fused_adjoint as FA
from sph_sm_monodomain_tpu.ops.fused_step import (_PAIR_EPS, build_dynp,
                                                  build_qm_feats)
from sph_sm_monodomain_tpu.ops.pallas_sweeps import (hash_axis_perm,
                                                     sweep_bookkeeping3)
from sph_sm_monodomain_tpu.ops.shape_matching import (corrected_velocity,
                                                      sm_invariants)


def _scene():
    sc = smt.build_scene("susane")
    return sc


def _prepped(sc, rng):
    """Sorted QM/out_a with a RANDOMIZED EP state (uniform vm would make
    every Laplacian cotangent term vacuously zero) and the real windows."""
    st0, cfg = sc.state, sc.cfg
    n = st0.capacity
    st0 = st0.replace(
        vm=st0.vm + jnp.asarray(rng.standard_normal(n) * 3.0, jnp.float32),
        iion=jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32),
        w=jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32),
        vel=st0.vel + jnp.asarray(rng.standard_normal((n, 3)) * 0.05,
                                  jnp.float32))
    sub_q = sc.sub_block or 128
    sm_inv = jax.jit(lambda s: sm_invariants(s, cfg))(st0)
    order, inv, blk_lo, blk_hi, cx, cyz = sweep_bookkeeping3(
        st0.pos, st0.active, cfg, sub_q)
    st = corrected_velocity(st0, cfg, sm_inv=sm_inv)
    fs, _ = build_qm_feats(st, cx, cyz, order)
    return st0, cfg, sub_q, fs, blk_lo, blk_hi, build_dynp(cfg)


def _stencil_mask(cfg, mat):
    gm = cfg.grid_size[hash_axis_perm(cfg)[1]]
    cxs, cyzs = mat[:, 12], mat[:, 13]
    live = cxs >= 0.0
    dcx = jnp.abs(cxs[:, None] - cxs[None, :]) <= 1.0
    dyz = cyzs[:, None] - cyzs[None, :]
    ok = jnp.zeros_like(dcx)
    for r in (-1, 0, 1):
        ok = ok | (jnp.abs(dyz + r * gm) <= 1.0)
    return dcx & ok & live[:, None] & live[None, :]


def _dense_a(cfg, fsx, dp):
    m = _stencil_mask(cfg, fsx)
    pos, v = fsx[:, 0:3], fsx[:, 3:6]
    live = fsx[:, 12] >= 0.0
    mass_c = jnp.where(live, fsx[:, 6], 0.0)
    vol = jnp.where(live & (fsx[:, 7] > 0.0), fsx[:, 6] / fsx[:, 7], 0.0)
    d = pos[:, None, :] - pos[None, :, :]
    r2 = jnp.sum(d * d, axis=-1)
    h2 = jnp.float32(cfg.kernel_h ** 2)
    t = jnp.where(m, jnp.maximum(h2 - r2, 0.0), 0.0)
    w6 = jnp.float32(cfg.poly6_constant) * t ** 3
    raw_d = jnp.sum(w6 * mass_c[None, :], axis=1)
    dv = v[None, :, :] - v[:, None, :]
    raw_x = jnp.sum((w6 * vol[None, :])[:, :, None] * dv, axis=1)
    return FA._epi_a_jnp(cfg, raw_d, raw_x, fsx, dp)


def _dense_b(cfg, oa, dp):
    m = _stencil_mask(cfg, oa)
    pos, u, P, vm = oa[:, 0:3], oa[:, 3:6], oa[:, 6], oa[:, 7]
    live = oa[:, 12] >= 0.0
    vol = jnp.where(live & (oa[:, 8] > 0.0), oa[:, 10] / oa[:, 8], 0.0)
    d = pos[:, None, :] - pos[None, :, :]
    r2 = jnp.sum(d * d, axis=-1)
    p = m & (r2 > _PAIR_EPS)
    inv_r = jax.lax.rsqrt(jnp.where(p, r2, 1.0))
    rr = r2 * inv_r
    h = jnp.float32(cfg.kernel_h)
    hr = jnp.where(p, jnp.maximum(h - rr, 0.0), 0.0)
    S = jnp.float32(cfg.spiky_constant)
    mu = dp[0, 12]
    volm = vol[None, :]
    common = volm * S * hr
    f_p = common * hr * (-0.5) * inv_r * (P[:, None] + P[None, :])
    f_v = mu * common
    du = u[None, :, :] - u[:, None, :]
    raw_acc = jnp.sum(f_v[:, :, None] * du - f_p[:, :, None] * d, axis=1)
    qr = rr / h
    bs = jnp.float32(cfg.b_spline_constant)
    w2 = jnp.where(p, bs * (1.5 * jnp.maximum(2.0 - qr, 0.0)
                            - 6.0 * jnp.maximum(1.0 - qr, 0.0)), 0.0)
    raw_lap = jnp.sum(volm * w2 * (vm[None, :] - vm[:, None]), axis=1)
    return FA._epi_b_jnp(cfg, raw_acc, raw_lap, oa, dp)


@pytest.mark.slow
def test_diff_sweep_primitives_vs_dense(rng):
    sc = _scene()
    st0, cfg, sub_q, fs, blk_lo, blk_hi, dynp = _prepped(sc, rng)
    swa, swb = FA.make_diff_sweeps(cfg, sc.q_block, sc.block_window, sub_q)

    out_a = swa(fs, dynp, blk_lo, blk_hi)
    np.testing.assert_allclose(np.asarray(out_a),
                               np.asarray(_dense_a(cfg, fs, dynp)),
                               rtol=0, atol=2e-2)

    g = jnp.asarray(rng.standard_normal(out_a.shape), jnp.float32)
    _, vjp_k = jax.vjp(lambda f, d: swa(f, d, blk_lo, blk_hi), fs, dynp)
    _, vjp_d = jax.vjp(lambda f, d: _dense_a(cfg, f, d), fs, dynp)
    for a, b in zip(vjp_k(g), vjp_d(g)):
        scale = max(float(jnp.abs(b).max()), 1.0)
        assert float(jnp.abs(a - b).max()) / scale < 1e-5

    g = jnp.asarray(rng.standard_normal(out_a.shape), jnp.float32)
    _, vjp_k = jax.vjp(lambda o, d: swb(o, d, blk_lo, blk_hi), out_a, dynp)
    _, vjp_d = jax.vjp(lambda o, d: _dense_b(cfg, o, d), out_a, dynp)
    for a, b in zip(vjp_k(g), vjp_d(g)):
        scale = max(float(jnp.abs(b).max()), 1.0)
        assert float(jnp.abs(a - b).max()) / scale < 1e-5


def _rollout_loss(step_one, st0, steps):
    def loss(log_theta):
        params = {"k_stiffness": jnp.exp(log_theta[0]),
                  "mu_viscosity": jnp.exp(log_theta[1])}
        s = st0
        for _ in range(steps):
            s = step_one(s, params)
        d = jnp.where(s.active[:, None], s.pos - s.orig_pos, 0.0)
        return jnp.sum(d * d) * 1e6
    return loss


def test_step_fused_diff_grad_parity_vs_xla():
    """jax.grad through the hand-adjoint fused step == through the XLA
    autodiff path, w.r.t. traced material params (the flagship-fit path).
    One step keeps this in the quick tier; the slow tier runs three."""
    sc = _scene()
    st0, cfg = sc.state, sc.cfg
    sub_q = sc.sub_block or 128
    sm_inv = jax.jit(lambda s: sm_invariants(s, cfg))(st0)

    fused = _rollout_loss(
        lambda s, p: FA.step_fused_diff(s, cfg, sc.q_block, sc.block_window,
                                        sub_q, sm_inv=sm_inv, params=p),
        st0, 1)
    xla = _rollout_loss(
        lambda s, p: step(s, cfg, sc.cell_capacity, sc.neighbor_capacity,
                          sm_inv=sm_inv, params=p)[0], st0, 1)
    theta = jnp.log(jnp.asarray([0.5, 100.0]))
    vf, gf = jax.jit(jax.value_and_grad(fused))(theta)
    vx, gx = jax.jit(jax.value_and_grad(xla))(theta)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), rtol=1e-4)


@pytest.mark.slow
def test_step_fused_diff_multistep_checkpoint_parity():
    """3-step rollout under jax.checkpoint: gradients stay fp-close to the
    XLA path (custom_vjp composes with remat — the fit's memory policy)."""
    sc = _scene()
    st0, cfg = sc.state, sc.cfg
    sub_q = sc.sub_block or 128
    sm_inv = jax.jit(lambda s: sm_invariants(s, cfg))(st0)

    def fused_step_ckpt(s, p):
        f = jax.checkpoint(
            lambda st: FA.step_fused_diff(st, cfg, sc.q_block,
                                          sc.block_window, sub_q,
                                          sm_inv=sm_inv, params=p))
        return f(s)

    fused = _rollout_loss(fused_step_ckpt, st0, 3)
    xla = _rollout_loss(
        lambda s, p: step(s, cfg, sc.cell_capacity, sc.neighbor_capacity,
                          sm_inv=sm_inv, params=p)[0], st0, 3)
    theta = jnp.log(jnp.asarray([0.5, 100.0]))
    vf, gf = jax.jit(jax.value_and_grad(fused))(theta)
    vx, gx = jax.jit(jax.value_and_grad(xla))(theta)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), rtol=1e-3)
