"""Unit tests: Jacobi eigendecomposition / polar decomposition / pseudo-inverse
vs numpy.linalg ground truth (SURVEY.md §4, M3/M4)."""

import numpy as np
import jax.numpy as jnp

from sph_sm_monodomain_tpu.ops import linalg


def _sym(rng, n, scale=1.0):
    a = rng.normal(size=(n, n)) * scale
    return ((a + a.T) / 2).astype(np.float32)


def test_jacobi_eigh_3x3(rng):
    for _ in range(20):
        A = _sym(rng, 3)
        lam, R = linalg.jacobi_eigh(jnp.asarray(A), 20)
        lam, R = np.asarray(lam), np.asarray(R)
        want = np.sort(np.linalg.eigvalsh(A.astype(np.float64)))
        np.testing.assert_allclose(np.sort(lam), want, rtol=1e-4, atol=1e-5)
        # R orthonormal and reconstructs A
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(R @ np.diag(lam) @ R.T, A,
                                   rtol=1e-4, atol=1e-5)


def test_jacobi_eigh3_cyclic_matches_numpy(rng):
    """The branch-free cyclic 3x3 variant (the production polar-decomp
    path, linalg.py:154) must agree with numpy eigh like the max-pivot
    form does."""
    for _ in range(20):
        A = _sym(rng, 3)
        lam, R = linalg.jacobi_eigh3_cyclic(jnp.asarray(A), sweeps=7)
        lam, R = np.asarray(lam), np.asarray(R)
        want = np.sort(np.linalg.eigvalsh(A.astype(np.float64)))
        np.testing.assert_allclose(np.sort(lam), want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(R @ np.diag(lam) @ R.T, A,
                                   rtol=1e-4, atol=1e-5)


def test_jacobi_eigh_9x9(rng):
    A = _sym(rng, 9)
    lam, R = linalg.jacobi_eigh(jnp.asarray(A), 100)  # enough sweeps for 9x9
    lam, R = np.asarray(lam), np.asarray(R)
    want = np.sort(np.linalg.eigvalsh(A.astype(np.float64)))
    np.testing.assert_allclose(np.sort(lam), want, rtol=1e-3, atol=1e-4)


def test_jacobi_eigh_diagonal_input_is_fixed_point():
    A = jnp.diag(jnp.asarray([3.0, 1.0, 2.0]))
    lam, R = linalg.jacobi_eigh(A, 20)
    np.testing.assert_allclose(np.asarray(lam), [3.0, 1.0, 2.0])
    np.testing.assert_allclose(np.asarray(R), np.eye(3))


def test_polar_decomposition(rng):
    for _ in range(10):
        A = rng.normal(size=(3, 3)).astype(np.float32)
        if abs(np.linalg.det(A)) < 0.1:
            continue
        R, S = linalg.polar_decomposition(jnp.asarray(A), 20)
        R, S = np.asarray(R), np.asarray(S)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=2e-4)
        np.testing.assert_allclose(R @ S, A, rtol=1e-3, atol=2e-4)
        # S symmetric
        np.testing.assert_allclose(S, S.T, atol=2e-4)


def test_polar_matches_numpy_reference(rng):
    # S1 = (A^T A)^(-1/2) is unique -> R must match an eigh-based construction
    for _ in range(10):
        A64 = rng.normal(size=(3, 3))
        if abs(np.linalg.det(A64)) < 0.2:
            continue
        lam, U = np.linalg.eigh(A64.T @ A64)
        S1 = (U * (1.0 / np.sqrt(lam))) @ U.T
        want_R = A64 @ S1
        R, _ = linalg.polar_decomposition(jnp.asarray(A64, jnp.float32), 20)
        np.testing.assert_allclose(np.asarray(R), want_R, rtol=1e-3, atol=1e-3)


def test_pseudo_inverse_9x9(rng):
    a = rng.normal(size=(9, 9))
    A = (a @ a.T + 9 * np.eye(9)).astype(np.float32)  # SPD, well-conditioned
    Ainv = np.asarray(linalg.pseudo_inverse(jnp.asarray(A), 200))
    np.testing.assert_allclose(Ainv @ A, np.eye(9), atol=5e-3)


def test_invert3_and_det3(rng):
    A = rng.normal(size=(3, 3)).astype(np.float32) + 2 * np.eye(3, dtype=np.float32)
    d = np.asarray(linalg.det3(jnp.asarray(A)))
    np.testing.assert_allclose(d, np.linalg.det(A.astype(np.float64)),
                               rtol=1e-4)
    inv = np.asarray(linalg.invert3(jnp.asarray(A)))
    np.testing.assert_allclose(inv @ A, np.eye(3), atol=1e-4)
    # singular matrix stays unchanged (reference `invert` returns false)
    S = jnp.asarray(np.ones((3, 3), np.float32))
    np.testing.assert_allclose(np.asarray(linalg.invert3(S)), np.ones((3, 3)))
