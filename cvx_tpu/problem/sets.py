"""Open convex domains (sets where objectives/constraints are defined).

Re-design of cvx/ConvexSet.scala (:13-109) and cvx/ConvexSets.scala: a domain
is a vectorized membership predicate ``x -> bool`` plus an optional interior
``sample`` point (the reference's ``samplePoint``).  The solvers'
backtracking line searches call the predicate per trial point, so it must be
a cheap fused expression — exactly the reference's ``isInSet`` contract
(ConvexSet.scala:90-92 "called often in line search"), minus the
per-constraint closure fold.

Factories mirror ConvexSets.scala: ``whole_space`` (:10-14),
``positive_orthant`` (:17-22 firstQuadrant), ``strictly_feasible_set``
(:28-53 + ConvexSet.scala:86-109 StrictlyFeasibleSet),
``cartesian_product`` (:57-86) and ``Domain.affine_pullback`` (:89-107
affinePreimage).
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
    """Membership predicate for an open convex set, with an optional
    interior ``sample`` point (None when no natural sample exists —
    ConvexSet.scala samplePoint: Option)."""

    fn: Callable[[Any, jax.Array], jax.Array] = static_field(
        default=_always_true
    )
    params: Any = None
    sample: jax.Array | None = None

    def contains(self, x: jax.Array) -> jax.Array:
        return self.fn(self.params, x)

    def lift(self, extra: int) -> "Domain":
        """Cartesian product with R^extra: predicate sees only x[:n]; the
        sample (if any) is padded with the R^extra origin
        (ConvexSets.scala:57-86)."""
        if extra == 0:
            # identity lift — xs[:-0] would be the EMPTY slice, silently
            # turning the predicate into a constant True
            return self
        fn, n_extra = self.fn, extra

        def lifted(params, xs):
            return fn(params, xs[:-n_extra])

        sample = None
        if self.sample is not None:
            sample = jnp.concatenate(
                [self.sample, jnp.zeros((extra,), self.sample.dtype)])
        return Domain(fn=lifted, params=self.params, sample=sample)

    def affine_pullback(self, z, F) -> "Domain":
        """Preimage under x = z + F u (ConvexSets.scala:89-107
        affinePreimage).  A sample x0 of the image set maps back through
        the least-squares solve F u0 = x0 - z (the reference's svdSolve,
        ConvexSets.scala:96-101) — rank-deficient F is fine, and if x0 is
        not in the range the pulled-back sample may lie outside the set,
        exactly as in the reference (callers re-validate)."""
        fn = self.fn

        def pulled(params, u):
            inner, z_, F_ = params
            return fn(inner, z_ + F_ @ u)

        sample = None
        if self.sample is not None:
            from ..ops.eigsolve import svd_solve

            sample, _ = svd_solve(F, self.sample - z)
        return Domain(fn=pulled, params=(self.params, z, F), sample=sample)

    def intersect(self, other: "Domain") -> "Domain":
        f, g = self.fn, other.fn

        def both(params, x):
            pf, pg = params
            return jnp.logical_and(f(pf, x), g(pg, x))

        # no generally valid sample for an intersection: a factor's sample
        # need not lie in the other factor (checking would force an eager
        # evaluation inside trace)
        return Domain(fn=both, params=(self.params, other.params))


def whole_space(dim: int | None = None) -> Domain:
    """R^n; samples the origin when ``dim`` is given
    (ConvexSets.scala:10-14)."""
    sample = None if dim is None else jnp.zeros((dim,))
    return Domain(sample=sample)


def positive_orthant(dim: int | None = None) -> Domain:
    """{x : x_j > 0} — domain of the KL objective; samples the uniform
    distribution 1/dim when ``dim`` is given (ConvexSets.scala:17-22
    firstQuadrant)."""

    def fn(params, x):
        return jnp.all(x > 0)

    sample = None if dim is None else jnp.full((dim,), 1.0 / dim)
    return Domain(fn=fn, sample=sample)


def cartesian_product(C: Domain, D: Domain, n: int) -> Domain:
    """C x D on R^(n+m): membership checks the first ``n`` coordinates
    against C and the rest against D; the sample is the concatenation when
    BOTH factors carry one, else None (ConvexSets.scala:57-86
    cartesianProduct — the reference's dim lives on the set object, here
    the split point ``n`` = dim(C) is passed explicitly)."""
    fC, fD = C.fn, D.fn

    def fn(params, x):
        pC, pD = params
        return jnp.logical_and(fC(pC, x[:n]), fD(pD, x[n:]))

    sample = None
    if C.sample is not None and D.sample is not None:
        sample = jnp.concatenate([C.sample, D.sample])
    return Domain(fn=fn, params=(C.params, D.params), sample=sample)


def strictly_feasible_set(cnts, feasible_point=None) -> Domain:
    """{x : every constraint in ``cnts`` holds strictly} — the reference's
    StrictlyFeasibleSet (ConvexSet.scala:86-109, ConvexSets.scala:28-53).

    ``cnts`` is a ``ConstraintSet``; membership is its fused
    ``satisfied_strictly`` (one batched evaluation, not the reference's
    per-constraint closure fold flagged "may have to do this more
    efficiently", ConvexSet.scala:91).  A supplied ``feasible_point``
    becomes the sample; it is validated EAGERLY when concrete (the
    reference's factory assert, ConvexSet.scala:101-105) and trusted
    under trace.
    """
    if not hasattr(cnts, "satisfied_strictly"):
        # a bare constraint block: wrap it (ConstraintSet is the fused
        # evaluation surface; import here to avoid a module cycle)
        from .constraint_set import ConstraintSet

        cnts = ConstraintSet(blocks=(cnts,))

    def fn(params, x):
        return params.satisfied_strictly(x)

    sample = None
    if feasible_point is not None:
        # store as an array: a raw list/numpy sample would crash lift()/
        # affine_pullback() (no .dtype) and a list would flatten into many
        # pytree leaves, changing the Domain tree structure
        sample = jnp.asarray(feasible_point)
        if not isinstance(sample, jax.core.Tracer):
            ok = cnts.satisfied_strictly(sample)
            if not isinstance(ok, jax.core.Tracer) and not bool(ok):
                raise ValueError(
                    "strictly_feasible_set: feasible point does not satisfy "
                    "all constraints strictly")
    return Domain(fn=fn, params=cnts, sample=sample)
