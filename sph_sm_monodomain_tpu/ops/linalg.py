"""Small dense linear algebra for shape matching.

TPU-native replacement for Math3D's m3Matrix / m9Matrix routines
(/root/reference/Math3D/m3Matrix.cpp:3-113, m9Matrix.cpp:10-102; components
M3/M4 in SURVEY.md). Semantics are matched to the reference:

  - `jacobi_eigh` runs a FIXED number of max-off-diagonal-pivot Jacobi
    rotations (JACOBI_ITERATIONS = 20 in the reference) rather than iterating
    to convergence; rotations are skipped (identity) once the largest
    off-diagonal magnitude reaches exactly zero, mirroring the `max <= 0`
    break at m3Matrix.cpp:65 / m9Matrix.cpp:71.
  - `polar_decomposition` computes S^-1 = U diag(lambda<=0 ? 0 : 1/sqrt(lambda)) U^T
    of A^T A and R = A S^-1 (m3Matrix.cpp:73-113). R is NOT re-orthonormalized
    beyond that, exactly like the reference.
  - `pseudo_inverse` inverts via eigendecomposition, zeroing reciprocal of
    exactly-zero eigenvalues (m9Matrix.cpp:80-102).
  - `invert3` is the analytic adjugate inverse that leaves the matrix
    UNCHANGED when det == 0 (m3Matrix.h:293-318 returns false and the caller
    ignores the failure).

Everything is branch-free fori_loop/where code: static shapes, fp32, no host
sync — safe to call inside the jitted simulation step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Full fp32 accumulation: JAX's DEFAULT matmul precision may use bf16 passes
# (TPU-style), which destroys the Jacobi iteration. These matrices are tiny;
# HIGHEST costs nothing.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


@partial(jax.jit, static_argnames=("iterations",))
def jacobi_eigh(A: jax.Array, iterations: int = 20):
    """Jacobi eigendecomposition of a symmetric n x n matrix.

    Returns (eigenvalues (n,), R (n, n)) with A ~= R diag(vals) R^T.
    Matches m3Matrix::eigenDecomposition / m9Matrix::eigenDecomposition:
    fixed `iterations` rotations, always pivoting on the largest |off-diag|.
    """
    n = A.shape[0]
    eye = jnp.eye(n, dtype=A.dtype)
    upper = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)

    def body(_, carry):
        A, R = carry
        absA = jnp.where(upper, jnp.abs(A), -1.0)
        idx = jnp.argmax(absA)           # row-major argmax == reference scan order
        p, q = idx // n, idx % n
        apq = A[p, q]
        live = jnp.abs(apq) > 0.0        # `if (max <= 0) break;`
        diff = A[p, p] - A[q, q]
        # floor the divisor magnitude so |d| stays finite BY CONSTRUCTION
        # (same guard as jacobi_eigh3_cyclic): dividing by a tiny pivot
        # overflows d — and its gradient — to inf, poisoning autodiff even
        # when masked afterwards; beyond |d| ~ 1e6 the rotation angle is
        # below fp32 resolution anyway
        mag = jnp.maximum(jnp.abs(apq),
                          jnp.maximum(jnp.abs(diff) * 5e-7, 1e-30))
        apq_safe = jnp.where(live, jnp.where(apq < 0.0, -mag, mag), 1.0)
        d = diff / (2.0 * apq_safe)
        t = 1.0 / (jnp.abs(d) + jnp.sqrt(d * d + 1.0))
        t = jnp.where(d < 0.0, -t, t)
        c = 1.0 / jnp.sqrt(t * t + 1.0)
        s = t * c
        c = jnp.where(live, c, 1.0)
        s = jnp.where(live, s, 0.0)
        G = (eye.at[p, p].set(c).at[q, q].set(c)
                .at[q, p].set(s).at[p, q].set(-s))
        A2 = _mm(_mm(G.T, A), G)
        # the reference zeroes the pivot pair exactly (m3Matrix.cpp:14)
        A2 = A2.at[p, q].set(0.0).at[q, p].set(0.0)
        return A2, _mm(R, G)

    A, R = jax.lax.fori_loop(0, iterations, body, (A, eye))
    return jnp.diagonal(A), R


def jacobi_eigh3_cyclic(A: jax.Array, sweeps: int = 7):
    """Cyclic-pivot Jacobi eigendecomposition of a symmetric 3x3.

    TPU-fast variant of `jacobi_eigh`: the pivot order is the STATIC cycle
    (0,1), (0,2), (1,2) repeated `sweeps` times (21 rotations ~ the
    reference's 20 max-pivot rotations; both reach fp32 machine precision
    for 3x3), so there is no argmax and no dynamic indexing — the whole
    decomposition is ~400 fusible scalar ops instead of a serial loop of
    dynamic-slice updates (~20x faster on TPU). The eigensystem matches the
    max-pivot version to fp32 roundoff, and the polar factor built from it
    is basis-independent.
    """
    a = {(0, 0): A[0, 0], (1, 1): A[1, 1], (2, 2): A[2, 2],
         (0, 1): A[0, 1], (0, 2): A[0, 2], (1, 2): A[1, 2]}
    r = {(i, j): jnp.asarray(1.0 if i == j else 0.0, A.dtype)
         for i in range(3) for j in range(3)}

    def key(i, j):
        return (i, j) if i <= j else (j, i)

    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            k = 3 - p - q
            apq = a[(p, q)]
            live = jnp.abs(apq) > 0.0
            diff = a[(p, p)] - a[(q, q)]
            # floor the divisor magnitude so |d| <= 1e6 BY CONSTRUCTION:
            # dividing by a tiny pivot overflows d (and its gradient) to
            # inf, which poisons autodiff even when masked afterwards;
            # beyond |d| ~ 1e6 the rotation angle is below fp32 resolution
            # anyway
            mag = jnp.maximum(jnp.abs(apq),
                              jnp.maximum(jnp.abs(diff) * 5e-7, 1e-30))
            d = diff / (2.0 * jnp.where(apq < 0.0, -mag, mag))
            t = 1.0 / (jnp.abs(d) + jnp.sqrt(d * d + 1.0))
            t = jnp.where(d < 0.0, -t, t)
            t = jnp.where(live, t, 0.0)
            c = 1.0 / jnp.sqrt(t * t + 1.0)
            s = t * c
            a[(p, p)] = a[(p, p)] + t * apq
            a[(q, q)] = a[(q, q)] - t * apq
            a[(p, q)] = jnp.zeros_like(apq)
            akp, akq = a[key(k, p)], a[key(k, q)]
            a[key(k, p)] = c * akp + s * akq
            a[key(k, q)] = -s * akp + c * akq
            for kk in range(3):
                rkp, rkq = r[(kk, p)], r[(kk, q)]
                r[(kk, p)] = c * rkp + s * rkq
                r[(kk, q)] = -s * rkp + c * rkq

    lam = jnp.stack([a[(0, 0)], a[(1, 1)], a[(2, 2)]])
    R = jnp.stack([jnp.stack([r[(i, j)] for j in range(3)])
                   for i in range(3)])
    return lam, R


@partial(jax.jit, static_argnames=("iterations",))
def polar_decomposition(A: jax.Array, iterations: int = 20):
    """A = R S with R 'orthonormal' and S symmetric (m3Matrix.cpp:73-113).

    Returns (R, S). Degenerate directions (lambda <= 0) contribute zero,
    exactly like the l0/l1/l2 guards at m3Matrix.cpp:90-92. Uses the
    static-pivot cyclic Jacobi (numerically equivalent to the reference's
    max-pivot iteration at fp32, ~20x faster on TPU).
    """
    ATA = _mm(A.T, A)
    lam, U = jacobi_eigh3_cyclic(ATA, sweeps=max(iterations // 3, 5))
    inv_sqrt = jnp.where(lam <= 0.0, 0.0, 1.0 / jnp.sqrt(jnp.where(lam <= 0.0, 1.0, lam)))
    S1 = _mm(U * inv_sqrt[None, :], U.T)
    R = _mm(A, S1)
    S = _mm(R.T, A)
    return R, S


@partial(jax.jit, static_argnames=("iterations",))
def pseudo_inverse(A: jax.Array, iterations: int = 20):
    """Symmetric pseudo-inverse via Jacobi eigendecomposition
    (m9Matrix::invert, m9Matrix.cpp:80-102). Reciprocal of eigenvalues that
    are exactly 0.0 is taken as 0."""
    lam, R = jacobi_eigh(A, iterations)
    d = jnp.where(lam != 0.0, 1.0 / jnp.where(lam != 0.0, lam, 1.0), 0.0)
    return _mm(R * d[None, :], R.T)


@jax.jit
def det3(A: jax.Array):
    """3x3 determinant (m3Matrix.h:288-291)."""
    return (A[0, 0] * (A[1, 1] * A[2, 2] - A[2, 1] * A[1, 2])
            - A[0, 1] * (A[1, 0] * A[2, 2] - A[2, 0] * A[1, 2])
            + A[0, 2] * (A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0]))


@jax.jit
def invert3(A: jax.Array):
    """Analytic 3x3 inverse; returns A unchanged when det == 0
    (m3Matrix.h:293-318: `invert` returns false and the caller at
    SPH_SM_monodomain.cpp:308 ignores the failure)."""
    d = det3(A)
    ok = d != 0.0
    inv_d = jnp.where(ok, 1.0 / jnp.where(ok, d, 1.0), 0.0)
    adj = jnp.array([
        [A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1],
         -(A[0, 1] * A[2, 2] - A[0, 2] * A[2, 1]),
         A[0, 1] * A[1, 2] - A[0, 2] * A[1, 1]],
        [-(A[1, 0] * A[2, 2] - A[1, 2] * A[2, 0]),
         A[0, 0] * A[2, 2] - A[0, 2] * A[2, 0],
         -(A[0, 0] * A[1, 2] - A[0, 2] * A[1, 0])],
        [A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0],
         -(A[0, 0] * A[2, 1] - A[0, 1] * A[2, 0]),
         A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]],
    ], dtype=A.dtype)
    return jnp.where(ok, adj * inv_d, A)
