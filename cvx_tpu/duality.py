"""Convex duality: solve the primal through its dual.

Re-design of cvx/Duality.scala (:38-135): given the (concave) dual objective
L*(z) of a problem — z = (lambda, nu) with lambda the inequality duals — the
dual problem is

    min -L*(z)   subject to   lambda = z[:num_ineq] >= 0,

solved with the same interior-point machinery from the strictly feasible
start z0 = dual_start * 1 (Duality.scala:107), after which the primal optimum
is recovered via the problem-specific map x* = primal_optimum(z*)
(Duality.scala:119-133).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from .problem.constraint_set import ConstraintSet
from .problem.constraints import first_coordinates_positive
from .solvers.barrier import barrier_solve
from .solvers.primal_dual import primal_dual_solve
from .solvers.types import Solution, SolverParams


def solve_dual(
    neg_dual_objective: Any,
    num_ineq: int,
    dual_dim: int,
    primal_optimum: Callable[[jax.Array], jax.Array],
    *,
    method: str = "BR",
    pars: SolverParams | None = None,
) -> Solution:
    """Solve min -L*(z) s.t. z[:num_ineq] >= 0; map back to the primal.

    ``neg_dual_objective`` exposes value/grad/hess of -L* (already negated,
    i.e. convex).  Returns a Solution whose ``x`` is the PRIMAL optimum and
    whose ``lam``/``nu`` are the dual optimum split as in Duality.scala:128-132.
    """
    pars = pars or SolverParams()
    dtype = jnp.result_type(float)
    z0 = jnp.full((dual_dim,), pars.dual_start, dtype)

    if num_ineq > 0:
        cnts = ConstraintSet(
            blocks=(first_coordinates_positive(dual_dim, num_ineq,
                                               dtype=dtype),)
        )
        if method == "BR":
            sol = barrier_solve(neg_dual_objective, cnts, z0, pars)
        elif method == "PD":
            sol = primal_dual_solve(neg_dual_objective, cnts, z0, pars)
        else:
            raise ValueError(f"unknown solver method: {method!r}")
    else:
        # no inequality duals: unconstrained dual
        from .solvers.newton import newton_minimize

        def fgh(z):
            return (neg_dual_objective.value(z),
                    neg_dual_objective.grad(z),
                    neg_dual_objective.hess(z))

        res = newton_minimize(fgh, lambda z: jnp.asarray(True), z0, pars)
        nan = jnp.asarray(jnp.nan, dtype)
        sol = Solution(x=res.x, lam=jnp.zeros((0,), dtype),
                       nu=jnp.zeros((0,), dtype), newton_decrement=nan,
                       duality_gap=nan, eq_gap=nan, norm_grad=res.norm_grad,
                       norm_dual_residual=nan, iters=res.iters,
                       maxed_out=res.maxed_out)

    z = sol.x
    from .tree import replace

    return replace(
        sol,
        x=primal_optimum(z),
        lam=z[:num_ineq],
        nu=z[num_ineq:],
    )
