"""Ruiz equilibration of symmetric matrices.

TPU-native re-design of the reference's preconditioner
(cvx/MatrixUtils.scala:240-268 ``ruizEquilibrate`` and :278-307
``ruizEquilibrate0``): iteratively rescale H -> Q = D H D with a diagonal D so
that every row of Q has (approximately) unit l2 norm.  This bounds the spread
of row norms and typically reduces the condition number dramatically before a
Cholesky factorization.

Differences from the reference (deliberate, for XLA):
  * the convergence loop is a ``lax.while_loop`` with a hard iteration cap, so
    the whole thing jit-compiles and vmaps over instance batches;
  * the row-norm update is fully vectorized (one ``jnp`` expression per sweep)
    instead of a per-row scalar loop;
  * zero rows get scale 1.0 exactly as in the reference (``v = 1 if u == 0``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_iter", "sweeps"))
def ruiz_equilibrate(
    H: jax.Array, *, max_iter: int = 20, tol: float = 1e-6,
    sweeps: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Equilibrate symmetric ``H``; returns ``(d, Q)`` with ``Q = D H D``.

    ``D = diag(d)``.  To solve ``H x = b``: solve ``Q u = d * b`` and set
    ``x = d * u``.

    ``sweeps=k`` runs exactly ``k`` fixed rounds via ``fori_loop`` (no
    convergence test) — the TPU hot-path mode: a data-dependent
    ``while_loop`` serializes against its condition every round and, under
    ``vmap``, couples all lanes to the slowest instance; the reference
    itself uses few-sweep Ruiz in anger (MatrixUtils.scala:240-268
    converges in 2-4 sweeps on barrier Hessians).  ``sweeps=None`` keeps
    the convergent loop (the faithful re-design, used by the generic
    ladder/diagnostic paths)."""
    n = H.shape[-1]
    d0 = jnp.ones((n,), dtype=H.dtype)

    def scaled(d):
        return (d[:, None] * d[None, :]) * H

    def sweep(d):
        Q = scaled(d)
        # u_i = sqrt(||row_i(Q)||_2)
        row_norms = jnp.linalg.norm(Q, axis=1)
        u = jnp.sqrt(row_norms)
        v = jnp.where(u > 0, 1.0 / jnp.where(u > 0, u, 1.0), 1.0)
        return d * v, u

    if sweeps is not None:
        d = jax.lax.fori_loop(0, sweeps, lambda _, d: sweep(d)[0], d0)
        return d, scaled(d)

    def cond(carry):
        d, rho, it = carry
        return jnp.logical_and(it < max_iter, rho > tol)

    def body(carry):
        d, _, it = carry
        d, u = sweep(d)
        rho = jnp.max(jnp.abs(1.0 - u))
        return d, rho, it + 1

    d, _, _ = jax.lax.while_loop(
        cond, body, (d0, jnp.asarray(jnp.inf, H.dtype), jnp.asarray(0))
    )
    return d, scaled(d)


@partial(jax.jit, static_argnames=("l2_rounds",))
def ruiz_equilibrate0(
    H: jax.Array, *, l2_rounds: int = 5
) -> tuple[jax.Array, jax.Array]:
    """The reference's SECOND Ruiz variant (MatrixUtils.scala:278-307
    ``ruizEquilibrate0``): one round of l-infinity-norm equilibration
    followed by ``l2_rounds`` fixed rounds of l2-norm equilibration.

    Kept alongside ``ruiz_equilibrate`` so the two can be COMPARED — the
    claim that the convergent l2 loop subsumes this variant is evidenced
    by the condition-number-ratio study ported from
    MatrixUtilsTests.scala:384-404 (tests/test_round3.py
    ``TestRuizVariants``), not asserted.
    """
    n = H.shape[-1]

    def scaled(d):
        return (d[:, None] * d[None, :]) * H

    # one l-infinity round
    f = jnp.sqrt(jnp.max(jnp.abs(H), axis=1))
    d = jnp.where(f > 0, 1.0 / jnp.where(f > 0, f, 1.0), 1.0)

    # fixed l2 rounds (no convergence test, as in the reference)
    def body(_, d):
        row_norms = jnp.linalg.norm(scaled(d), axis=1)
        u = jnp.sqrt(row_norms)
        return d * jnp.where(u > 0, 1.0 / jnp.where(u > 0, u, 1.0), 1.0)

    d = jax.lax.fori_loop(0, l2_rounds, body, d)
    return d, scaled(d)


def apply_equilibration(d: jax.Array, b: jax.Array) -> jax.Array:
    """Scale a right-hand side (or unscale a solution): ``d * b``."""
    return d * b


def hs_norm(A: jax.Array) -> jax.Array:
    """Hilbert-Schmidt (Frobenius) norm (MatrixUtils.scala:19, 204)."""
    return jnp.sqrt(jnp.sum(A * A))


def check_symmetric(Q: jax.Array, tol: float = 1e-13) -> jax.Array:
    """||Q - Q^T||_F < tol (MatrixUtils.scala:207-211)."""
    return hs_norm(Q - jnp.swapaxes(Q, -1, -2)) < tol


def condition_number(H: jax.Array) -> jax.Array:
    """sigma_max / sigma_min via SVD (MatrixUtils.scala:218-223)."""
    s = jnp.linalg.svd(H, compute_uv=False)
    return jnp.max(s, axis=-1) / jnp.min(s, axis=-1)
