"""Dynamic (traced) physics parameters — config.PARAM_FIELDS overrides.

A capability layer the reference cannot offer (its constants are hard-coded
in the constructor, SPH_SM_monodomain.cpp:13-79): the same compiled XLA step
serves ANY value of the whitelisted physics constants, so
  - sweeps re-run without recompiling (tools/sweep.py --dynamic),
  - jax.vmap batches whole parameter grids into one program,
  - jax.grad fits material constants to observed motion.

The load-bearing test is exactness: a traced override must produce the SAME
trajectory as baking the value into a static SimConfig.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sph_sm_monodomain_tpu import PARAM_FIELDS, SimConfig, init_fluid
from sph_sm_monodomain_tpu.config import resolve_params
from sph_sm_monodomain_tpu.models.monodomain import simulate, step
from sph_sm_monodomain_tpu.ops.electrophysiology import set_stim

CFG = SimConfig()


def _state(rng, n=96, cfg=CFG):
    pts = np.clip(rng.normal(size=(n, 3)).astype(np.float32) * 0.05 + 0.6,
                  0.1, 1.3)
    st = init_fluid(pts, cfg)
    return set_stim(st, (0.6, 0.6, 0.6), 0.5, cfg.stim_strength, cfg), n


# every dynamic field, set off its default so a missed override would show
_OVERRIDES = dict(k_stiffness=0.8, stand_density=1000.0, mu_viscosity=55.0,
                  velocity_mixing=0.7, sm_alpha=0.45, sm_beta=0.25,
                  sigma_i=2.0, sigma_e=2.0, cm_capacitance=1.2,
                  beta_sv_ratio=42.0, fh_vt=-70.0, fh_vp=12.0, fh_vr=-80.0,
                  fh_c1=0.2, fh_c2=0.04, fh_c3=0.02, fh_c4=0.5,
                  voltage_constant=1.5)


def test_param_fields_cover_the_overrides():
    assert set(_OVERRIDES) == set(PARAM_FIELDS)


def test_traced_override_matches_baked_config(rng):
    """simulate(cfg_base, params=V) must equal simulate(cfg_baked(V)) to
    fp32 roundoff: resolve_params is an overlay, not an approximation.

    Exact bitwise equality is unattainable BY CONSTRUCTION: with a baked
    config Python folds constant products (e.g. dt * fh_c3) in double
    precision before they enter f32 array math, while a traced override
    multiplies already-rounded f32 device scalars — a ~1-ulp constant
    difference that compounds only at fp32 noise level over a short run."""
    st, n = _state(rng)
    baked = CFG.replace(**_OVERRIDES)
    params = {k: jnp.asarray(v, jnp.float32) for k, v in _OVERRIDES.items()}

    out_baked, _ = simulate(st, baked, 32, 9 * 32, num_steps=4,
                            stim_off_step=2)
    out_traced, _ = simulate(st, CFG, 32, 9 * 32, num_steps=4,
                             stim_off_step=2, params=params)
    for name in ("pos", "vel", "dens", "pres", "vm", "iion", "w"):
        a = np.asarray(getattr(out_baked, name))[:n]
        b = np.asarray(getattr(out_traced, name))[:n]
        scale = max(1e-6, float(np.abs(a).max()))
        np.testing.assert_allclose(b, a, rtol=3e-5, atol=3e-5 * scale,
                                   err_msg=f"field {name}")
    # and the params run actually differs from the defaults run
    out_def, _ = simulate(st, CFG, 32, 9 * 32, num_steps=4, stim_off_step=2)
    assert not np.allclose(np.asarray(out_def.pos)[:n],
                           np.asarray(out_traced.pos)[:n])


def test_resolve_params_rejects_non_dynamic_fields():
    with pytest.raises(ValueError, match="kernel_h"):
        resolve_params(CFG, {"kernel_h": 0.05})
    with pytest.raises(ValueError, match="non-dynamic"):
        resolve_params(CFG, {"max_particles": 10})
    assert resolve_params(CFG, None) is CFG
    assert resolve_params(CFG, {}) is CFG


def test_params_rejected_on_non_v4_fused_impls(rng):
    st, _ = _state(rng)
    with pytest.raises(ValueError, match="v4"):
        simulate(st, CFG, 32, 9 * 32, num_steps=1, fused=True,
                 q_block=32, w_window=128, impl="v3",
                 params={"mu_viscosity": jnp.asarray(50.0)})


def test_fused_v4_traced_override_matches_baked(rng):
    """The v4 fused path accepts dynamic params as an SMEM kernel operand
    (ops.fused_step.build_dynp): its trajectory must match the same
    values baked into a static config, to the same fp32-roundoff
    tolerance as the XLA path (constant folding differs, see above)."""
    st, n = _state(rng, 128)
    pad = 128  # capacity already 128-row aligned for q_block=64
    baked = CFG.replace(**_OVERRIDES)
    params = {k: jnp.asarray(v, jnp.float32) for k, v in _OVERRIDES.items()}
    kw = dict(num_steps=3, stim_off_step=2, fused=True, impl="v4",
              q_block=64, w_window=128, sub_q=64)

    out_baked, _ = simulate(st, baked, 32, 9 * 32, **kw)
    out_traced, _ = simulate(st, CFG, 32, 9 * 32, params=params, **kw)
    out_def, _ = simulate(st, CFG, 32, 9 * 32, **kw)
    for name in ("pos", "vel", "dens", "pres", "vm", "iion", "w"):
        a = np.asarray(getattr(out_baked, name))[:n]
        b = np.asarray(getattr(out_traced, name))[:n]
        scale = max(1e-6, float(np.abs(a).max()))
        np.testing.assert_allclose(b, a, rtol=3e-5, atol=3e-5 * scale,
                                   err_msg=f"field {name}")
    assert not np.allclose(np.asarray(out_def.pos)[:n],
                           np.asarray(out_traced.pos)[:n])


@pytest.mark.slow
def test_grad_wrt_material_constants(rng):
    """True parameter gradients through the coupled step: d(displacement
    loss)/d(K, mu, alpha) are finite and nonzero — the differentiable-
    physics capability the static-config path cannot express."""
    st, n = _state(rng)

    def loss(theta):
        params = {"k_stiffness": theta[0], "mu_viscosity": theta[1],
                  "sm_alpha": theta[2]}
        s = st
        for _ in range(3):
            s, _ = step(s, CFG, 32, 9 * 32, params=params)
        disp = s.pos - s.orig_pos
        return jnp.sum(jnp.where(s.active[:, None], disp, 0.0) ** 2)

    theta0 = jnp.asarray([CFG.k_stiffness, CFG.mu_viscosity, CFG.sm_alpha])
    g = np.asarray(jax.grad(loss)(theta0))
    assert np.isfinite(g).all()
    assert (np.abs(g) > 0).all(), f"a parameter gradient vanished: {g}"


def test_fused_monodomain_grad_wrt_ep_constants_matches_xla(rng):
    """In the frozen-cloud monodomain mode every EP constant is XLA-side
    (the Laplacian kernel is geometry-only), so dynamic params there are
    DIFFERENTIABLE through the fused path: d(loss)/d(C1, sigma_i) via the
    custom-VJP Laplacian must match the autodiff gradient of the XLA
    path."""
    from sph_sm_monodomain_tpu.models.variants import (
        monodomain_prepare, monodomain_prepare_fused,
        simulate_monodomain_only, simulate_monodomain_only_fused)
    st, n = _state(rng, 96)
    # spatially-varying initial voltage: a uniform field has zero Laplacian
    # and thus a vanishing conductivity gradient
    st = st.replace(vm=jnp.asarray(
        rng.normal(size=st.vm.shape).astype(np.float32) * 5.0))
    wgt = jnp.asarray(np.random.default_rng(7).normal(
        size=st.vm.shape).astype(np.float32))
    tab = monodomain_prepare(st, CFG, 32, 9 * 32)
    ftab = monodomain_prepare_fused(st, CFG, q_block=64, w_chunk=128,
                                    sub_q=64)

    def loss_xla(theta):
        p = {"fh_c1": theta[0], "sigma_i": theta[1]}
        out = simulate_monodomain_only(st, tab, CFG, num_steps=3, params=p)
        return jnp.sum(jnp.where(out.active, out.vm * wgt, 0.0))

    def loss_fused(theta):
        p = {"fh_c1": theta[0], "sigma_i": theta[1]}
        out = simulate_monodomain_only_fused(st, ftab, CFG, num_steps=3,
                                             q_block=64, w_chunk=128,
                                             sub_q=64, params=p)
        return jnp.sum(jnp.where(out.active, out.vm * wgt, 0.0))

    theta = jnp.asarray([CFG.fh_c1, CFG.sigma_i], jnp.float32)
    v_x, g_x = jax.value_and_grad(loss_xla)(theta)
    v_f, g_f = jax.value_and_grad(loss_fused)(theta)
    g_x, g_f = np.asarray(g_x), np.asarray(g_f)
    assert np.abs(g_x).min() > 0, f"an XLA gradient vanished: {g_x}"
    np.testing.assert_allclose(float(v_f), float(v_x), rtol=1e-5)
    np.testing.assert_allclose(g_f, g_x, rtol=2e-4,
                               err_msg="fused EP-constant gradient diverged")


@pytest.mark.slow
def test_sharded_fused_dynamic_params_matches_single_chip(rng):
    """Multi-chip dynamic params: the gather-sharded fused scan with
    dynamic_params=True (params replicated into every device's SMEM
    operand) must match the single-chip v4 fused run with the same traced
    overrides — multi-chip parameter sweeps on one compile."""
    from sph_sm_monodomain_tpu.parallel.sharded_step import (
        make_mesh, make_sharded_simulate_fused, shard_state)
    assert jax.device_count() >= 8
    mesh = make_mesh(jax.devices()[:8])
    qb = 32  # capacity 512 = 8 devices x 2 blocks x 32
    pts = np.clip(rng.normal(size=(300, 3)).astype(np.float32) * 0.06 + 0.6,
                  0.05, 1.2)
    st = init_fluid(pts, CFG, pad_to=512)
    st = set_stim(st, (0.6, 0.6, 0.6), 0.5, CFG.stim_strength, CFG)
    params = {"mu_viscosity": jnp.asarray(55.0, jnp.float32),
              "k_stiffness": jnp.asarray(0.8, jnp.float32),
              "fh_c1": jnp.asarray(0.2, jnp.float32)}

    sim = make_sharded_simulate_fused(mesh, CFG, num_steps=4,
                                      stim_off_step=2, q_block=qb,
                                      w_chunk=256, sub_q=qb,
                                      dynamic_params=True)
    out, ovf = sim(shard_state(st, mesh), params)
    assert int(ovf) == 0

    # the other dynamic factories share _wrap_sharded: one XLA-gather
    # dynamic scan (vs its baked twin) + one fused dynamic single step
    from sph_sm_monodomain_tpu.parallel.sharded_step import (
        make_sharded_simulate, make_sharded_step_fused)
    xsim = make_sharded_simulate(mesh, CFG, 32, 9 * 64, num_steps=2,
                                 dynamic_params=True)
    x_out, _ = xsim(shard_state(st, mesh), params)
    baked = CFG.replace(**{k: float(v) for k, v in params.items()})
    bsim = make_sharded_simulate(mesh, baked, 32, 9 * 64, num_steps=2)
    b_out, _ = bsim(shard_state(st, mesh))
    np.testing.assert_allclose(np.asarray(x_out.pos)[:300],
                               np.asarray(b_out.pos)[:300], atol=1e-5)
    fstep = make_sharded_step_fused(mesh, CFG, q_block=qb, w_chunk=256,
                                    sub_q=qb, dynamic_params=True)
    f_out, _ = fstep(shard_state(st, mesh), params)
    assert np.isfinite(np.asarray(f_out.pos)[:300]).all()

    ref, _ = simulate(st, CFG, 32, 9 * 64, num_steps=4, stim_off_step=2,
                      fused=True, impl="v4", q_block=qb, w_window=256,
                      sub_q=qb, params=params)
    n = 300
    np.testing.assert_allclose(np.asarray(ref.pos)[:n],
                               np.asarray(out.pos)[:n], atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref.vm)[:n],
                               np.asarray(out.vm)[:n], atol=1e-3)
    # and the overrides actually changed the dynamics vs defaults
    base, _ = simulate(st, CFG, 32, 9 * 64, num_steps=4, stim_off_step=2,
                       fused=True, impl="v4", q_block=qb, w_window=256,
                       sub_q=qb)
    assert not np.allclose(np.asarray(base.pos)[:n],
                           np.asarray(out.pos)[:n])


def test_vmap_over_parameter_grid(rng):
    """One compiled program, a batch of configurations: vmap over a
    stiffness x viscosity grid (the TPU-native form of the reference's
    one-run-per-config campaign)."""
    st, n = _state(rng, 64)
    ks = jnp.asarray([0.3, 0.5, 0.8], jnp.float32)
    mus = jnp.asarray([50.0, 100.0, 200.0], jnp.float32)
    kk, mm = [x.ravel() for x in jnp.meshgrid(ks, mus)]

    def run(k, mu):
        out, _ = simulate(st, CFG, 32, 9 * 32, num_steps=3,
                          params={"k_stiffness": k, "mu_viscosity": mu})
        disp = out.pos - out.orig_pos
        return jnp.sum(jnp.where(out.active[:, None], disp, 0.0) ** 2)

    batched = jax.vmap(run)(kk, mm)
    assert batched.shape == (9,)
    assert np.isfinite(np.asarray(batched)).all()
    assert len(np.unique(np.asarray(batched))) > 1  # params actually matter
