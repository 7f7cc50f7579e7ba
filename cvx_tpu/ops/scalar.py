"""Scalar (1-D) root finding.

Re-design of cvx/MathUtils.scala (:36-71): bisection and 1-D Newton, as
fixed-bound ``lax.while_loop``s so they jit and vmap.  (The GLM score
machinery at MathUtils.scala:99-193 is dead research code per SURVEY.md
section 2.1 #2 and is intentionally not ported.)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def bisect(
    f: Callable, lo: jax.Array, hi: jax.Array, *,
    tol: float = 1e-12, max_iter: int = 200
) -> jax.Array:
    """Root of f on [lo, hi] with f(lo), f(hi) of opposite sign
    (MathUtils.scala:36-52)."""
    lo = jnp.asarray(lo, jnp.result_type(float))
    hi = jnp.asarray(hi, lo.dtype)
    f_lo = f(lo)

    def cond(c):
        lo, hi, it = c
        return jnp.logical_and(hi - lo > tol, it < max_iter)

    def body(c):
        lo, hi, it = c
        mid = 0.5 * (lo + hi)
        same_side = f(mid) * f_lo > 0
        return (jnp.where(same_side, mid, lo),
                jnp.where(same_side, hi, mid), it + 1)

    lo, hi, _ = lax.while_loop(cond, body, (lo, hi, jnp.asarray(0)))
    return 0.5 * (lo + hi)


def newton_1d(
    f: Callable, x0: jax.Array, *,
    tol: float = 1e-12, max_iter: int = 100
) -> jax.Array:
    """1-D Newton iteration x <- x - f(x)/f'(x), derivative by autodiff
    (MathUtils.scala:57-71 hands in f' explicitly; here jax.grad derives it).
    """
    x0 = jnp.asarray(x0, jnp.result_type(float))
    df = jax.grad(f)

    def cond(c):
        x, it = c
        return jnp.logical_and(jnp.abs(f(x)) > tol, it < max_iter)

    def body(c):
        x, it = c
        return x - f(x) / df(x), it + 1

    x, _ = lax.while_loop(cond, body, (x0, jnp.asarray(0)))
    return x
