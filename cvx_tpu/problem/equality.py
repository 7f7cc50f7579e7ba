"""Linear equality constraints A x = b.

Re-design of cvx/EqualityConstraint.scala (:16-118): stacking, error norms,
phase-I dimension lifts, conversion to +/- inequalities, and the nullspace
solution space x = z0 + F u.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.nullspace import SolutionSpace, solution_space
from ..tree import pytree_dataclass
from .constraints import LinearBlock


@pytree_dataclass
class EqualityConstraint:
    A: jax.Array  # (p, n), p < n, full row rank
    b: jax.Array  # (p,)

    @property
    def p(self) -> int:
        return self.A.shape[0]

    @property
    def dim(self) -> int:
        return self.A.shape[1]

    def error(self, x: jax.Array) -> jax.Array:
        """||A x - b|| (EqualityConstraint.scala:26)."""
        return jnp.linalg.norm(self.A @ x - self.b)

    def stack(self, other: "EqualityConstraint") -> "EqualityConstraint":
        """Vertical concatenation (EqualityConstraint.scala:31-37)."""
        return EqualityConstraint(
            A=jnp.concatenate([self.A, other.A], axis=0),
            b=jnp.concatenate([self.b, other.b]),
        )

    def lift_phase1(self, extra: int = 1) -> "EqualityConstraint":
        """Append ``extra`` zero columns: same equalities on (x, s)
        (EqualityConstraint.scala:41-55)."""
        Z = jnp.zeros((self.p, extra), self.A.dtype)
        return EqualityConstraint(A=jnp.concatenate([self.A, Z], axis=1),
                                  b=self.b)

    def as_inequalities(self, tol: float) -> LinearBlock:
        """A x = b as the 2p rows  Ax <= b + tol, -Ax <= -b + tol
        (EqualityConstraint.scala:84-100, tol = 1e-6 in phase-I use)."""
        G = jnp.concatenate([self.A, -self.A], axis=0)
        ub = jnp.concatenate([self.b + tol, -self.b + tol])
        return LinearBlock(G=G, c=jnp.zeros((2 * self.p,), self.A.dtype),
                           ub=ub)

    def affine_pullback(self, z, F) -> "EqualityConstraint":
        """x = z + F u:  (A F) u = b - A z (EqualityConstraint.scala:72-73)."""
        return EqualityConstraint(A=self.A @ F, b=self.b - self.A @ z)

    def solution_space(self) -> SolutionSpace:
        return solution_space(self.A, self.b)


def sum_to_one(n: int, dtype=jnp.float64) -> EqualityConstraint:
    """sum(x) = 1 (Constraints.scala:75-80)."""
    return EqualityConstraint(A=jnp.ones((1, n), dtype),
                              b=jnp.ones((1,), dtype))


def expectation_eq(w: jax.Array, r: float) -> EqualityConstraint:
    """E[W] = r for discrete W with values w (Constraints.scala:109-117)."""
    return EqualityConstraint(A=w[None, :], b=jnp.asarray([r], w.dtype))
