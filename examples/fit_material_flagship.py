"""Flagship-scale differentiable simulation: recover the material
constants (EOS stiffness K and viscosity mu) at the FULL biceps cloud
(18,475 particles) by gradient descent through a long stimulated coupled
rollout — the scale the headline benchmarks are quoted at.

This is the TPU-native answer to the reference's 242-run manual parameter
search (results_171114.csv): where the reference re-compiles and re-runs
the whole app per constant (SPH_SM_monodomain.cpp:13-79 bakes every value
in the constructor), here the constants are traced inputs
(config.PARAM_FIELDS / resolve_params) and `jax.grad` differentiates the
entire rollout w.r.t. them.

What makes the FLAGSHIP scale work (vs examples/fit_material_demo.py's
507-particle toy) is the rematerialization policy: the scan body is
wrapped in `jax.checkpoint`, so the adjoint stores ONE state carry per
step (~0.9 MB at 18,475 particles) and recomputes the step's
internals — neighbor windows, per-pair kernel sums — during the backward
sweep. Without it XLA must keep every step's pair-interaction residuals
live across the whole rollout and a 250-step adjoint does not fit HBM;
the script prints the compiled grad program's memory analysis so the
fit is a measured fact, not a claim.

Parameters are optimized in log-space (positive scale factors spanning
decades); the observable is the active-particle displacement field after
the rollout (stim stays on throughout, as in the reference experiment's
first half, main.cpp:329-334).

Run: python examples/fit_material_flagship.py [scene] [steps] [iters]
Defaults: biceps_full 250 30 (real TPU, a few minutes; most of it is the
one-off remote compile). The CPU smoke in tests/test_examples.py runs
`susane 4 40`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sph_sm_monodomain_tpu as smt
from sph_sm_monodomain_tpu.models.monodomain import step
from sph_sm_monodomain_tpu.ops.shape_matching import sm_invariants


FIT_ROW_HEADER = ("scene;particles;rollout_steps;adam_iters;"
                  "fwd_ms_per_step;grad_ms_per_step;grad_over_fwd;"
                  "adjoint_temps_gib;K_true;K_recovered;mu_true;"
                  "mu_recovered;err_K;err_mu;backend;grad_path")


def append_fit_row(path, vals):
    """Append one fit-evidence row (the committed artifact for the
    flagship-fit done-criterion, VERDICT r4 item 3); header once."""
    new = not os.path.exists(path) or os.path.getsize(path) == 0
    with open(path, "a") as f:
        if new:
            f.write("# Executed flagship material fits: gradient descent "
                    "through the full coupled rollout\n# (examples/"
                    "fit_material_flagship.py). The reference's analog is "
                    "a 242-run manual search\n# (results_171114.csv) at "
                    "one compile+run per constant.\n")
            f.write(FIT_ROW_HEADER + "\n")
        f.write(";".join(f"{v:g}" if isinstance(v, float) else str(v)
                         for v in vals) + "\n")


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    csv_out = next((a.split("=", 1)[1] for a in sys.argv[1:]
                    if a.startswith("--csv=")), None)
    fused = "--fused" in sys.argv[1:]
    scene = argv[0] if argv else "biceps_full"
    steps = int(argv[1]) if len(argv) > 1 else 250
    iters = int(argv[2]) if len(argv) > 2 else 30

    sc = smt.build_scene(scene)
    st0, cfg = sc.state, sc.cfg
    n = sc.num_particles
    print(f"{scene}: {n} particles, {steps}-step stim-on rollout, "
          f"{iters} Adam iters ({jax.default_backend()})", flush=True)

    # rest-shape SM moments are rollout constants (same hoist as
    # models.monodomain.simulate) and carry no theta dependence
    sm_inv = jax.jit(lambda s: sm_invariants(s, cfg))(st0)

    if fused:
        # hand-adjoint fused path (ops/fused_adjoint.py): the production v4
        # Pallas sweeps forward, one extra backward sweep per kernel —
        # gradients at fused speed instead of the XLA autodiff step
        from sph_sm_monodomain_tpu.ops.fused_adjoint import step_fused_diff
        sub_q = sc.sub_block or 128
        print("path: fused hand-adjoint (step_fused_diff)", flush=True)

    # The observable is the displacement field at SEVERAL times along the
    # rollout, not just the endpoint: a contraction's endpoint is weakly
    # sensitive to (K, mu) (stiff and viscous trajectories can end near the
    # same place), while the PATH there is not — the multi-snapshot loss is
    # what makes the 250-step flagship fit well-conditioned.
    snaps = max(1, min(5, steps))
    blk = steps // snaps

    def rollout_disp(log_theta):
        """Active-particle displacement snapshots (snaps, N, 3) under
        material constants theta = (K, mu) = exp(log_theta)."""
        params = {"k_stiffness": jnp.exp(log_theta[0]),
                  "mu_viscosity": jnp.exp(log_theta[1])}

        @jax.checkpoint
        def body(s, _):
            if fused:
                s = step_fused_diff(s, cfg, sc.q_block, sc.block_window,
                                    sub_q, sm_inv=sm_inv, params=params)
            else:
                s, _aux = step(s, cfg, sc.cell_capacity,
                               sc.neighbor_capacity, sm_inv=sm_inv,
                               params=params)
            return s, ()

        def block(s, _):
            s, _ = jax.lax.scan(body, s, None, length=blk)
            return s, jnp.where(s.active[:, None], s.pos - s.orig_pos, 0.0)

        s, disp = jax.lax.scan(block, st0, None, length=snaps)
        return disp

    true_k, true_mu = 0.9, 40.0              # hidden material
    theta_true = jnp.log(jnp.asarray([true_k, true_mu]))
    fwd = jax.jit(rollout_disp)

    t0 = time.time()
    target = fwd(theta_true)
    # value fetch, not block_until_ready: the only reliable sync through
    # the remote tunnel (DEVELOPMENT.md "Benchmarking on the remote TPU")
    disp_mean = float(jnp.abs(target).mean())
    compile_fwd = time.time() - t0
    t0 = time.time()
    float(jnp.abs(fwd(theta_true)).mean())
    fwd_ms = (time.time() - t0) / steps * 1e3
    print(f"target: displacement field from hidden K={true_k} mu={true_mu} "
          f"(|disp| mean {disp_mean:.2e}); forward {fwd_ms:.3f} ms/step "
          f"(compile {compile_fwd:.0f}s)", flush=True)

    def loss(log_theta):
        d = rollout_disp(log_theta) - target
        return jnp.sum(d * d) * 1e6          # mm^2-scale for readable logs

    theta0 = jnp.log(jnp.asarray([0.3, 150.0]))      # poor initial guess
    f_and_df = jax.jit(jax.value_and_grad(loss))

    t0 = time.time()
    compiled = f_and_df.lower(theta0).compile()
    ma = compiled.memory_analysis()
    temps_gib = (ma.temp_size_in_bytes / 2 ** 30) if ma is not None else -1.0
    if ma is not None:
        print(f"grad program: temps "
              f"{ma.temp_size_in_bytes / 2**30:.2f} GiB, args+outs "
              f"{(ma.argument_size_in_bytes + ma.output_size_in_bytes) / 2**30:.2f} GiB "
              f"(compile {time.time() - t0:.0f}s) — the {steps}-step "
              f"adjoint fits because jax.checkpoint stores one carry per "
              f"step and rematerializes the pair sums", flush=True)

    val, g = compiled(theta0)
    float(val)
    t0 = time.time()
    val, g = compiled(theta0)
    float(val)
    grad_ms = (time.time() - t0) / steps * 1e3
    print(f"value_and_grad: {grad_ms:.3f} ms/step "
          f"({grad_ms / max(fwd_ms, 1e-9):.2f}x forward)", flush=True)

    log_theta = theta0
    m = v = jnp.zeros(2)                             # Adam state
    lr0 = next((float(a.split("=", 1)[1]) for a in sys.argv[1:]
                if a.startswith("--lr=")), 0.15)
    b1, b2, eps = 0.9, 0.999, 1e-8
    import math
    for i in range(iters):
        # cosine decay to lr0/20: the (K, mu) valley is coupled (K passes
        # through its optimum while mu is still correcting), so a flat lr
        # orbits the minimum instead of settling into it
        lr = lr0 * (0.05 + 0.95 * 0.5
                    * (1 + math.cos(math.pi * i / max(iters - 1, 1))))
        val, g = compiled(log_theta)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh, vh = m / (1 - b1 ** (i + 1)), v / (1 - b2 ** (i + 1))
        log_theta = log_theta - lr * mh / (jnp.sqrt(vh) + eps)
        if i % 5 == 0 or i == iters - 1:
            k, mu = [float(x) for x in jnp.exp(log_theta)]
            print(f"iter {i:3d}: loss {float(val):10.4e}  "
                  f"K {k:7.4f}  mu {mu:8.3f}", flush=True)

    k, mu = [float(x) for x in jnp.exp(log_theta)]
    err_k = abs(k - true_k) / true_k
    err_mu = abs(mu - true_mu) / true_mu
    print(f"recovered K={k:.4f} (true {true_k}, {err_k*100:.1f}% off), "
          f"mu={mu:.3f} (true {true_mu}, {err_mu*100:.1f}% off)")
    if csv_out:
        append_fit_row(csv_out, [
            scene, n, steps, iters, round(fwd_ms, 4), round(grad_ms, 4),
            round(grad_ms / max(fwd_ms, 1e-9), 3), round(temps_gib, 3),
            true_k, round(k, 5), true_mu, round(mu, 4),
            round(err_k, 5), round(err_mu, 5), jax.default_backend(),
            "fused-hand-adjoint" if fused else "xla-autodiff"])
        print(f"fit row appended to {csv_out}", flush=True)
    if iters >= 20 and max(err_k, err_mu) > 0.2:
        raise SystemExit("material recovery did not converge")


if __name__ == "__main__":
    main()
