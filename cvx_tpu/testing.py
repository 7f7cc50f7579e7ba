"""Test oracles and problem fixtures.

Re-design of the reference's test support layer: ``KnownMinimizer``
(cvx/KnownMinimizer.scala:9-74 — attach a closed-form solution to a problem
and accept a solver result when |f(x) - f*| < tol), the probAB constraint
fixture (cvx/ConstraintSets.scala:39-60) and random feasible-by-construction
constraint sets (cvx/ConstraintSets.scala:67-89, Constraints.scala:158-214).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from .problem.constraint_set import ConstraintSet
from .problem.constraints import LinearBlock, QuadBlock, positivity
from .ops.testmat import random_spd


@dataclass(frozen=True)
class KnownMinimizer:
    """Oracle: a known minimizer and the objective it minimizes."""

    x_star: Any
    objective: Any

    @property
    def f_star(self) -> float:
        return float(self.objective.value(jnp.asarray(self.x_star)))

    def is_minimizer(self, x, tol: float = 1e-2) -> bool:
        """|f(x) - f*| < tol (KnownMinimizer.scala:59-63; tol = the
        reference's acceptance tolerance, Runner.scala:30)."""
        return abs(float(self.objective.value(jnp.asarray(x)))
                   - self.f_star) < tol

    def report(self, x, tol: float = 1e-2) -> str:
        """Comparison report (KnownMinimizer.scala:23-46)."""
        f_val = float(self.objective.value(jnp.asarray(x)))
        ok = abs(f_val - self.f_star) < tol
        dist = float(jnp.linalg.norm(jnp.asarray(x)
                                     - jnp.asarray(self.x_star)))
        return (f"f(x) = {f_val:.6e}, f* = {self.f_star:.6e}, "
                f"|f - f*| = {abs(f_val - self.f_star):.2e} "
                f"({'OK' if ok else 'FAIL'} at tol {tol}); "
                f"||x - x*|| = {dist:.2e}")


def prob_ab(n: int, I_A, p_A: float, sgn_A: float, I_B, p_B: float,
            sgn_B: float) -> ConstraintSet:
    """The P(A)/P(B) fixture (ConstraintSets.scala:39-60): constraints
    sgn*P(E) <= sgn*p on two events plus positivity.  With sgn = -1 both and
    disjoint A, B, p_A + p_B > 1 makes it infeasible."""
    I_A = jnp.asarray(I_A, jnp.result_type(float))
    I_B = jnp.asarray(I_B, I_A.dtype)
    G = jnp.stack([sgn_A * I_A, sgn_B * I_B])
    ub = jnp.asarray([sgn_A * p_A, sgn_B * p_B], I_A.dtype)
    return ConstraintSet(blocks=(
        LinearBlock(G=G, c=jnp.zeros(2, I_A.dtype), ub=ub),
        positivity(n, dtype=I_A.dtype),
    ))


def random_feasible_constraints(
    key: jax.Array, n: int, x0: jax.Array,
    num_linear: int = 3, num_quadratic: int = 2, margin: float = 1.0,
) -> ConstraintSet:
    """Random linear + quadratic constraints that hold STRICTLY at x0
    (feasible by construction — ConstraintSets.scala:67-89)."""
    kl, kq1, kq2 = jax.random.split(key, 3)
    dtype = x0.dtype
    # linear: a.x <= a.x0 + margin
    G = jax.random.normal(kl, (num_linear, n), dtype)
    ub = G @ x0 + margin
    lin = LinearBlock(G=G, c=jnp.zeros(num_linear, dtype), ub=ub)
    # quadratic: x'Px/2 + a.x <= value at x0 + margin
    P = jax.vmap(lambda k: random_spd(k, n, cond=10.0, dtype=dtype))(
        jax.random.split(kq1, num_quadratic))
    a = jax.random.normal(kq2, (num_quadratic, n), dtype)
    v0 = (a @ x0 + 0.5 * jnp.einsum("mij,i,j->m", P, x0, x0))
    quad = QuadBlock(P=P, a=a, r=jnp.zeros(num_quadratic, dtype),
                     ub=v0 + margin)
    return ConstraintSet(blocks=(lin, quad))
