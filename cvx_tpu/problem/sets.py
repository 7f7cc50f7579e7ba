"""Open convex domains (sets where objectives/constraints are defined).

Re-design of cvx/ConvexSet.scala (:13-109) and cvx/ConvexSets.scala: a domain
is a vectorized membership predicate ``x -> bool`` plus an optional interior
sample point.  The solvers' backtracking line searches call the predicate per
trial point, so it must be a cheap fused expression — exactly the reference's
``isInSet`` contract (ConvexSet.scala:90-92 "called often in line search"),
minus the per-constraint closure fold.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..tree import pytree_dataclass, static_field


def _always_true(params, x):
    return jnp.asarray(True)


@pytree_dataclass
class Domain:
    """Membership predicate for an open convex set."""

    fn: Callable[[Any, jax.Array], jax.Array] = static_field(
        default=_always_true
    )
    params: Any = None

    def contains(self, x: jax.Array) -> jax.Array:
        return self.fn(self.params, x)

    def lift(self, extra: int) -> "Domain":
        """Cartesian product with R^extra: predicate sees only x[:n]
        (ConvexSets.scala:57-86)."""
        fn, n_extra = self.fn, extra

        def lifted(params, xs):
            return fn(params, xs[:-n_extra])

        return Domain(fn=lifted, params=self.params)

    def affine_pullback(self, z, F) -> "Domain":
        """Preimage under x = z + F u (ConvexSets.scala:89-107)."""
        fn = self.fn

        def pulled(params, u):
            inner, z_, F_ = params
            return fn(inner, z_ + F_ @ u)

        return Domain(fn=pulled, params=(self.params, z, F))

    def intersect(self, other: "Domain") -> "Domain":
        f, g = self.fn, other.fn

        def both(params, x):
            pf, pg = params
            return jnp.logical_and(f(pf, x), g(pg, x))

        return Domain(fn=both, params=(self.params, other.params))


def whole_space() -> Domain:
    """R^n (ConvexSets.scala:10-14)."""
    return Domain()


def positive_orthant() -> Domain:
    """{x : x_j > 0} — domain of the KL objective
    (ConvexSets.scala:17-22 firstQuadrant)."""

    def fn(params, x):
        return jnp.all(x > 0)

    return Domain(fn=fn)
