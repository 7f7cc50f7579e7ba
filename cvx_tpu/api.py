"""Problem-level API.

Re-design of cvx/OptimizationProblem.scala (:14-199): build a problem from an
objective, inequality ConstraintSet and optional equality constraints; run
phase-I automatically when no strictly feasible point is supplied; choose the
solver with method "BR" (log-barrier) or "PD" (infeasible-start primal-dual).

Construction/orchestration is host-side Python (it decides shapes and may
raise InfeasibleProblemError); every solve it triggers is a single
jit-compiled program.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .problem.constraint_set import ConstraintSet
from .problem.equality import EqualityConstraint
from .solvers.barrier import barrier_solve
from .solvers.newton import newton_minimize, newton_minimize_eq
from .solvers.phase1 import find_feasible_point
from .solvers.types import Solution, SolverParams


def minimize(
    objective: Any,
    constraints: ConstraintSet | None = None,
    equalities: EqualityConstraint | None = None,
    *,
    x0: jax.Array | None = None,
    feasible_point: jax.Array | None = None,
    method: str = "BR",
    pars: SolverParams | None = None,
    phase1_method: str = "auto",
) -> Solution:
    """Solve  min f(x)  s.t.  g_i(x) <= u_i,  A x = b.

    ``x0``: a point where all constraints are DEFINED (used to seed phase-I
    when no ``feasible_point`` is given — OptimizationProblem.scala:174-196).
    ``feasible_point``: a strictly feasible start (skips phase-I —
    OptimizationProblem.scala:133-157).
    """
    pars = pars or SolverParams()
    if method not in ("BR", "PD"):
        raise ValueError(f"unknown solver method: {method!r} (use 'BR'/'PD')")

    if constraints is None:
        # unconstrained (possibly equality-constrained) Newton
        # (OptimizationProblem.scala:101-115)
        assert x0 is not None, "x0 required for unconstrained minimize"

        def fgh(x):
            return objective.value(x), objective.grad(x), objective.hess(x)

        def free(x):
            return jnp.asarray(True)

        if equalities is None:
            res = newton_minimize(fgh, free, x0, pars)
        else:
            res = newton_minimize_eq(fgh, free, x0, equalities.A,
                                     equalities.b, pars)
        nan = jnp.asarray(jnp.nan, x0.dtype)
        p = equalities.p if equalities is not None else 0
        return Solution(
            x=res.x, lam=jnp.zeros((0,), x0.dtype),
            nu=jnp.full((p,), jnp.nan, x0.dtype),
            newton_decrement=res.newton_decrement,
            duality_gap=nan, eq_gap=res.eq_gap, norm_grad=res.norm_grad,
            norm_dual_residual=nan, iters=res.iters, maxed_out=res.maxed_out,
            stalled=res.stalled,
        )

    if feasible_point is None:
        assert x0 is not None, "x0 (or feasible_point) required"
        feasible_point = find_feasible_point(
            constraints, x0, pars, equalities, method=phase1_method
        )

    if method == "BR":
        return barrier_solve(objective, constraints, feasible_point, pars,
                             eqs=equalities)
    # PD
    from .solvers.primal_dual import primal_dual_solve

    return primal_dual_solve(objective, constraints, feasible_point, pars,
                             eqs=equalities)
