"""Differentiable-simulation demo: fit the stimulus amplitude to a target
contraction with gradient descent THROUGH the coupled physics.

The reference application cannot do this in any form — its step is an
imperative C++ loop (SPH_SM_monodomain.cpp:794-824). Here the step is a
pure function of the state pytree, so `jax.grad` differentiates a whole
K-step `lax.scan` rollout end-to-end: SPH density/forces, shape matching
(fixed-iteration Jacobi polar decomposition), FHN reaction, the
voltage->pressure electromechanical coupling, and the integrator.

The mean-voltage observable is near-linear in the amplitude, so the Newton
iteration typically recovers the hidden amplitude in ONE step — which is
itself the demonstration: the gradient through the full coupled rollout is
exact, not a finite-difference estimate.

Run: python examples/fit_stimulus_demo.py [steps] [iters]
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
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    sc = smt.build_scene("susane")           # 507-particle cloud
    st0, cfg = sc.state, sc.cfg
    stim_mask = st0.stim > 0.0

    def rollout_vm(amp):
        """Mean transmembrane voltage after `steps` coupled steps under
        stimulus `amp` — the electrophysiological footprint of the
        stimulus through diffusion + FHN reaction + the mechanics
        (positions move, so the SPH Laplacian's neighborhoods move too)."""
        s = st0.replace(stim=jnp.where(stim_mask, amp, st0.stim))

        def body(s, _):
            s, _aux = step(s, cfg, sc.cell_capacity, sc.neighbor_capacity)
            return s, ()

        s, _ = jax.lax.scan(body, s, None, length=steps)
        return jnp.sum(jnp.where(s.active, s.vm, 0.0)) / sc.num_particles

    # target: the voltage footprint of a hidden "true" amplitude
    true_amp = 420.0
    target = rollout_vm(jnp.asarray(true_amp))
    print(f"target mean Vm {float(target):.4f} mV "
          f"(hidden amplitude {true_amp:.0f})")

    f_and_df = jax.jit(jax.value_and_grad(rollout_vm))

    amp = jnp.asarray(150.0)                 # deliberately poor initial guess
    for i in range(iters):
        v, g = f_and_df(amp)
        # Newton step on the scalar inverse problem f(amp) = target
        amp = amp - (v - target) / g
        print(f"iter {i:2d}: amplitude {float(amp):9.2f}  "
              f"Vm {float(v):9.4f}  dVm/damp {float(g):.3e}")

    err = abs(float(amp) - true_amp) / true_amp
    print(f"recovered amplitude {float(amp):.2f} vs true {true_amp:.0f} "
          f"({err * 100:.2f}% off)")


if __name__ == "__main__":
    main()
