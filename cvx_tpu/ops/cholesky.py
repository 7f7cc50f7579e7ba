"""Regularized Cholesky factorization and positive-definite solves.

TPU-native re-design of the reference's dense solve core
(cvx/MatrixUtils.scala:452-516: ``regularizedCholesky`` and
``choleskySolve``).  The reference's exception ladder (factor, catch, retry on
Q + delta*I, residual check, throw) cannot exist under jit/vmap; instead we:

  * ALWAYS solve the shifted system ``Q + delta * s * I`` where ``s`` is a
    scale proxy (mean |diag|), so the factorization never fails structurally;
  * recover accuracy with a fixed number of iterative-refinement steps on the
    ORIGINAL system (each step reuses the factor: O(n^2));
  * return the relative residual as a diagnostic instead of throwing — callers
    escalate via ``lax.cond`` (see cvx_tpu.ops.kkt) or report it.

Everything here is batched: leading batch dimensions broadcast through
``lax.linalg`` primitives, so ``vmap`` costs nothing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .equilibrate import ruiz_equilibrate


def tri_solve(
    L: jax.Array, b: jax.Array, *, lower: bool = True, trans: bool = False
) -> jax.Array:
    """Solve ``L x = b`` (or ``L^T x = b``) for triangular ``L``.

    Replaces the reference's LAPACK ``dtrtrs`` boundary
    (cvx/MatrixUtils.scala:362-376) with the XLA triangular-solve primitive
    (MXU-tiled blocked substitution on TPU).  ``b`` may be a vector or matrix.
    """
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    x = lax.linalg.triangular_solve(
        L, b, left_side=True, lower=lower, transpose_a=trans
    )
    return x[..., 0] if vec else x


def forward_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``L x = b`` with L lower triangular (MatrixUtils.scala:383-402)."""
    return tri_solve(L, b, lower=True, trans=False)


def back_solve(U: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``U x = b`` with U upper triangular (MatrixUtils.scala:409-430)."""
    return tri_solve(U, b, lower=False, trans=False)


def default_delta(dtype) -> float:
    """Regularization floor: ~100x unit roundoff of the compute dtype.

    The reference uses 1e-10 in float64 (MatrixUtils.scala:452-461); we scale
    the idea with precision so the float32 TPU fast path stays stable.
    """
    return 1e-10 if jnp.finfo(dtype).bits >= 64 else 3e-6


def regularized_cholesky(Q: jax.Array, delta: float | jax.Array | None = None):
    """Lower Cholesky factor of ``Q + delta * s * I`` (s = mean |diag(Q)|).

    Reference: MatrixUtils.scala:452-461 (try plain, retry shifted).  Here the
    shift is unconditional — on equilibrated unit-scale matrices it perturbs
    the solution at the level of roundoff, and iterative refinement (below)
    removes even that.  Returns ``(L, shift)``.
    """
    if delta is None:
        delta = default_delta(Q.dtype)
    n = Q.shape[-1]
    # scale-RELATIVE shift: mean |diag| is the magnitude proxy; only fall
    # back to 1.0 when the diagonal is identically zero (e.g. a pure-LP
    # Hessian), otherwise a tiny-magnitude matrix (like the Schur complement
    # A H^-1 A^T at large barrier t) would be swamped by an absolute shift.
    mean_diag = jnp.mean(jnp.abs(jnp.diagonal(Q, axis1=-2, axis2=-1)),
                         axis=-1)
    scale = jnp.where(mean_diag > 0, mean_diag, 1.0)
    shift = delta * scale
    Qd = Q + shift[..., None, None] * jnp.eye(n, dtype=Q.dtype)
    return lax.linalg.cholesky(Qd), shift


def chol_solve_factored(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``L L^T x = b`` given the factor."""
    return tri_solve(L, tri_solve(L, b, lower=True), lower=True, trans=True)


def relative_residual(A: jax.Array, x: jax.Array, b: jax.Array,
                      tol: jax.Array | float) -> jax.Array:
    """Normwise backward error ``||A x - b|| / (tol + ||b|| + ||A x||)``.

    Re-design of MatrixUtils.scala:436-443, which normalizes by
    ``tol + ||b||`` alone — for a (near-)zero right-hand side that divides
    the dtype's rounding noise by ``tol`` and reports a huge "residual"
    for a perfectly good solve (observed: relres 2.2e3 for a true backward
    error of 2e-7 in f32).  ``||A||_F ||x||`` is the magnitude of the
    arithmetic that produced the residual (NOT ``||A x||``, which itself
    cancels to the residual when b = 0).
    """
    Ax = jnp.einsum("...ij,...j->...i", A, x)
    r = jnp.linalg.norm(Ax - b, axis=-1)
    scale = (jnp.linalg.norm(A, axis=(-2, -1))
             * jnp.linalg.norm(x, axis=-1))
    denom = tol + jnp.linalg.norm(b, axis=-1) + scale
    return r / denom


@partial(jax.jit, static_argnames=("refine", "equil_sweeps"))
def cholesky_solve(
    H: jax.Array,
    b: jax.Array,
    *,
    delta: float | None = None,
    refine: int = 2,
    tol: float = 1e-10,
    equil_sweeps: int | None = 4,
):
    """Solve symmetric positive (semi)definite ``H x = b``.

    Pipeline (cvx/MatrixUtils.scala:468-516 re-designed branchless):
    Ruiz-equilibrate (fixed ``equil_sweeps`` rounds by default — see
    ops/kkt._make_block_solver; ``equil_sweeps=None`` restores the
    convergent loop) -> shifted Cholesky -> two triangular solves ->
    ``refine`` rounds of iterative refinement on the original H ->
    relative residual as diagnostic.

    Returns ``(x, relres)``.
    """
    d, Q = ruiz_equilibrate(H, sweeps=equil_sweeps)
    L, _ = regularized_cholesky(Q, delta)

    def q_solve(rhs):
        # H x = rhs  <=>  Q u = d*rhs, x = d*u
        return d * chol_solve_factored(L, d * rhs)

    x = q_solve(b)

    def refine_step(_, x):
        r = b - jnp.einsum("...ij,...j->...i", H, x)
        return x + q_solve(r)

    if refine > 0:
        x = lax.fori_loop(0, refine, refine_step, x)
    return x, relative_residual(H, x, b, tol)
