"""SPH smoothing kernels as pure, vectorized jnp functions.

Replaces the scalar kernel methods at
/root/reference/SPH_SM_monodomain/SPH_SM_monodomain.cpp:148-197 (component C6
in SURVEY.md). All functions broadcast over arbitrary array shapes and are
branch-free (jnp.where instead of if/else) so they vectorize onto the VPU and
stay fusible inside the jitted step.

Conventions match the reference:
  - Poly6 takes SQUARED distance r2 (density kernel, cpp:149-152).
  - Spiky is the derivative magnitude used for pressure (cpp:155-158), already
    negated: returns -45/(pi h^6) (h-r)^2 on [0, h].
  - Visco is the Laplacian magnitude for viscosity (cpp:161-164).
  - B_spline / B_spline_1 / B_spline_2 are the cubic B-spline kernel and its
    first/second radial derivatives divided by the constant 1/(pi h^3)
    (cpp:166-197); B_spline_2 is the live Laplacian for voltage diffusion
    (used at cpp:563).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimConfig


def poly6(r2, cfg: SimConfig):
    """Poly6 density kernel on squared distance (cpp:149-152)."""
    h2 = cfg.kernel_h * cfg.kernel_h
    val = cfg.poly6_constant * (h2 - r2) ** 3
    return jnp.where((r2 >= 0) & (r2 <= h2), val, 0.0)


def spiky(r, cfg: SimConfig):
    """Spiky pressure-gradient magnitude (cpp:155-158). Negative on support."""
    h = cfg.kernel_h
    val = -cfg.spiky_constant * (h - r) * (h - r)
    return jnp.where((r >= 0) & (r <= h), val, 0.0)


def visco(r, cfg: SimConfig):
    """Viscosity Laplacian magnitude (cpp:161-164)."""
    h = cfg.kernel_h
    val = cfg.spiky_constant * (h - r)
    return jnp.where((r >= 0) & (r <= h), val, 0.0)


def b_spline(r, cfg: SimConfig):
    """Cubic B-spline kernel W(q), q = r/h (cpp:166-175)."""
    q = r / cfg.kernel_h
    c = cfg.b_spline_constant
    inner = c * (1.0 - 1.5 * q * q + 0.75 * q * q * q)
    outer = c * (0.25 * (2.0 - q) ** 3)
    return jnp.where((q >= 0) & (q < 1), inner,
                     jnp.where((q >= 1) & (q < 2), outer, 0.0))


def b_spline_1(r, cfg: SimConfig):
    """First radial derivative of the B-spline (cpp:177-186)."""
    q = r / cfg.kernel_h
    c = cfg.b_spline_constant
    inner = c * (-3.0 * q + 2.25 * q * q)
    outer = c * (-0.75 * (2.0 - q) ** 2)
    return jnp.where((q >= 0) & (q < 1), inner,
                     jnp.where((q >= 1) & (q < 2), outer, 0.0))


def b_spline_2(r, cfg: SimConfig):
    """Second radial derivative of the B-spline (cpp:188-197).

    This is the kernel used for the SPH-discretized monodomain Laplacian
    (Compute_Force, cpp:563).
    """
    q = r / cfg.kernel_h
    c = cfg.b_spline_constant
    inner = c * (-3.0 + 4.5 * q)
    outer = c * (1.5 * (2.0 - q))
    return jnp.where((q >= 0) & (q < 1), inner,
                     jnp.where((q >= 1) & (q < 2), outer, 0.0))
