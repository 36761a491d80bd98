"""Differentiable-simulation demo: recover MATERIAL constants (EOS
stiffness K and viscosity mu) from an observed deformation, by gradient
descent through the coupled physics with dynamic (traced) parameters.

The reference hard-codes every constant in its constructor
(SPH_SM_monodomain.cpp:13-79); re-running with a new K means recompiling
and re-running the whole app. Here the constants are traced inputs
(config.PARAM_FIELDS / resolve_params): ONE compiled program serves every
(K, mu), `jax.grad` differentiates the whole rollout w.r.t. them, and the
inverse problem "what material produced this motion?" becomes a few Adam
iterations.

Parameters are optimized in log-space (they are positive scale factors
spanning decades), and the observable is the full active displacement
field after a short stimulated rollout.

Run: python examples/fit_material_demo.py [steps] [iters]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sph_sm_monodomain_tpu as smt
from sph_sm_monodomain_tpu.models.monodomain import step


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    sc = smt.build_scene("susane")           # 507-particle cloud
    st0, cfg = sc.state, sc.cfg
    act = np.asarray(st0.active)

    def rollout_disp(log_theta):
        """Active-particle displacement field after `steps` coupled steps
        under material constants theta = (K, mu) = exp(log_theta)."""
        params = {"k_stiffness": jnp.exp(log_theta[0]),
                  "mu_viscosity": jnp.exp(log_theta[1])}

        def body(s, _):
            s, _aux = step(s, cfg, sc.cell_capacity, sc.neighbor_capacity,
                           params=params)
            return s, ()

        s, _ = jax.lax.scan(body, st0, None, length=steps)
        return jnp.where(s.active[:, None], s.pos - s.orig_pos, 0.0)

    true_k, true_mu = 0.9, 40.0              # hidden material
    target = rollout_disp(jnp.log(jnp.asarray([true_k, true_mu])))
    print(f"target: displacement field from hidden K={true_k} mu={true_mu} "
          f"(|disp| mean {float(jnp.abs(target).mean()):.2e})")

    def loss(log_theta):
        d = rollout_disp(log_theta) - target
        return jnp.sum(d * d) * 1e6          # mm^2-scale for readable logs

    f_and_df = jax.jit(jax.value_and_grad(loss))

    log_theta = jnp.log(jnp.asarray([0.3, 150.0]))   # poor initial guess
    m = v = jnp.zeros(2)                             # Adam state
    lr, b1, b2, eps = 0.1, 0.9, 0.999, 1e-8
    for i in range(iters):
        val, g = f_and_df(log_theta)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh, vh = m / (1 - b1 ** (i + 1)), v / (1 - b2 ** (i + 1))
        log_theta = log_theta - lr * mh / (jnp.sqrt(vh) + eps)
        if i % 10 == 0 or i == iters - 1:
            k, mu = [float(x) for x in jnp.exp(log_theta)]
            print(f"iter {i:3d}: loss {float(val):10.4e}  "
                  f"K {k:7.4f}  mu {mu:8.3f}")

    k, mu = [float(x) for x in jnp.exp(log_theta)]
    err_k = abs(k - true_k) / true_k
    err_mu = abs(mu - true_mu) / true_mu
    print(f"recovered K={k:.4f} (true {true_k}, {err_k*100:.1f}% off), "
          f"mu={mu:.3f} (true {true_mu}, {err_mu*100:.1f}% off)")
    if max(err_k, err_mu) > 0.2:
        raise SystemExit("material recovery did not converge")


if __name__ == "__main__":
    main()
