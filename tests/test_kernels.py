"""Unit tests: SPH smoothing kernels vs closed form (SURVEY.md §4, C6)."""

import math

import numpy as np
import jax.numpy as jnp

from sph_sm_monodomain_tpu.config import SimConfig
from sph_sm_monodomain_tpu.ops import kernels

CFG = SimConfig()
H = CFG.kernel_h


def test_poly6_closed_form():
    r2 = np.array([0.0, (0.5 * H) ** 2, H * H, H * H * 1.0001, 4.0])
    got = np.asarray(kernels.poly6(jnp.asarray(r2), CFG))
    c = 315.0 / (64.0 * math.pi * H ** 9)
    want = np.where(r2 <= H * H, c * (H * H - r2) ** 3, 0.0)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)
    assert got[-1] == 0.0 and got[-2] == 0.0


def test_spiky_is_negative_derivative_magnitude():
    r = np.array([0.0, 0.01, 0.02, H, H + 1e-5], dtype=np.float32)
    got = np.asarray(kernels.spiky(jnp.asarray(r), CFG))
    c = 45.0 / (math.pi * H ** 6)
    want = np.where(r <= H, -c * (H - r) ** 2, 0.0)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)
    assert (got[:-1] <= 0).all() and got[-1] == 0.0


def test_visco_closed_form():
    r = np.array([0.0, 0.015, H], dtype=np.float32)
    got = np.asarray(kernels.visco(jnp.asarray(r), CFG))
    c = 45.0 / (math.pi * H ** 6)
    np.testing.assert_allclose(got, c * (H - r), rtol=1e-6)


def test_bspline_family_piecewise():
    c = 1.0 / (math.pi * H ** 3)
    r = np.array([0.0, 0.5 * H, H, 1.5 * H, 2 * H, 3 * H], dtype=np.float32)
    q = r / H
    w0 = np.asarray(kernels.b_spline(jnp.asarray(r), CFG))
    w1 = np.asarray(kernels.b_spline_1(jnp.asarray(r), CFG))
    w2 = np.asarray(kernels.b_spline_2(jnp.asarray(r), CFG))
    want0 = np.where(q < 1, c * (1 - 1.5 * q ** 2 + 0.75 * q ** 3),
                     np.where(q < 2, c * 0.25 * (2 - q) ** 3, 0.0))
    want1 = np.where(q < 1, c * (-3 * q + 2.25 * q ** 2),
                     np.where(q < 2, c * -0.75 * (2 - q) ** 2, 0.0))
    want2 = np.where(q < 1, c * (-3 + 4.5 * q),
                     np.where(q < 2, c * 1.5 * (2 - q), 0.0))
    np.testing.assert_allclose(w0, want0.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(w1, want1.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(w2, want2.astype(np.float32), rtol=1e-6)
    # support ends at 2h
    assert w0[-1] == w1[-1] == w2[-1] == 0.0
    assert w0[-2] == 0.0  # q=2 exactly is outside [1,2)


def test_poly6_rejects_negative_r2():
    # branchless form must still return 0 for (impossible) negative r2
    got = np.asarray(kernels.poly6(jnp.asarray([-1.0]), CFG))
    assert got[0] == 0.0
