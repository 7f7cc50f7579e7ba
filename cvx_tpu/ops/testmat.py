"""Random test-matrix generators with controlled conditioning.

Re-design of the reference's fault-injection generators
(cvx/MatrixUtils.scala:29-127, :573-580): random orthogonal matrices (Haar via
QR of a Gaussian), SPD matrices with a prescribed condition number and an
exponentially decaying spectrum, optionally singular (dim-kernel trailing
zeros), adversarial right-hand sides concentrated on the small singular
directions, and the sign-combination matrices used to expand |x|-constraints
into linear rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def random_orthogonal(key: jax.Array, n: int, dtype=jnp.float64) -> jax.Array:
    """Haar-random orthogonal matrix (MatrixUtils.scala:57-63)."""
    G = jax.random.normal(key, (n, n), dtype=dtype)
    Q, _ = jnp.linalg.qr(G)
    return Q


def decaying_spectrum(n: int, cond: float, dim_kernel: int = 0,
                      dtype=jnp.float64) -> jax.Array:
    """d_j = exp(-j*rho), rho = log(cond)/n, trailing dim_kernel zeros.

    Reference: MatrixUtils.scala:46-52 (``diagonalMatrix``).
    """
    rho = np.log(cond) / n
    d = jnp.exp(-rho * jnp.arange(n, dtype=dtype))
    if dim_kernel > 0:
        d = d.at[n - dim_kernel:].set(0.0)
    return d


def random_spd(key: jax.Array, n: int, cond: float, dim_kernel: int = 0,
               dtype=jnp.float64) -> jax.Array:
    """SPD (or PSD if dim_kernel>0) A = U D U^T with prescribed condition.

    Reference: MatrixUtils.scala:69-74.
    """
    U = random_orthogonal(key, n, dtype)
    d = decaying_spectrum(n, cond, dim_kernel, dtype)
    return (U * d[None, :]) @ U.T


def nasty_rhs(key: jax.Array, d: jax.Array, U: jax.Array) -> jax.Array:
    """Adversarial RHS: uniform-random weight on every nonzero spectral
    direction so the solution of ``A x = b`` (A = U diag(d) U^T) exists but
    exercises the small singular values.  Reference: MatrixUtils.scala:573-580.
    """
    w = 1.0 + 2.0 * jax.random.uniform(key, d.shape, dtype=d.dtype)
    w = jnp.where(jnp.abs(d) > 0, w, 0.0)
    return U @ w


def sign_combination_matrix(m: int) -> np.ndarray:
    """All 2^m sign patterns as rows (MatrixUtils.scala:80-94).

    Used to expand ``sum_j |x_j| <= ub`` into 2^m linear constraints.  Static
    (NumPy) because it determines array SHAPES.
    """
    assert m >= 1
    combos = np.stack(
        np.meshgrid(*([np.array([1.0, -1.0])] * m), indexing="ij"), axis=-1
    ).reshape(-1, m)
    return combos


def sign_combination_matrix_padded(n: int, p: int, q: int) -> np.ndarray:
    """Sign combinations on coordinates [p, q), zeros elsewhere
    (MatrixUtils.scala:108-127)."""
    assert 0 <= p <= q <= n and q > p
    core = sign_combination_matrix(q - p)
    out = np.zeros((core.shape[0], n))
    out[:, p:q] = core
    return out
