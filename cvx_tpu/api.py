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
    if method not in ("BR", "PD", "BR_fast"):
        raise ValueError(f"unknown solver method: {method!r} "
                         "(use 'BR'/'PD'/'BR_fast')")

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

    if method == "BR_fast":
        # structured Woodbury barrier: requires a diagonal-Hessian
        # objective (hess_diag), all-linear constraints, and an explicit
        # positivity block (the structured barrier bakes x > 0 in).  The
        # Newton step then costs O(n (k+p)^2) with no (n, n) intermediates.
        U, ub = _extract_structured_rows(constraints)
        if not hasattr(objective, "hess_diag"):
            raise ValueError(
                "BR_fast needs an objective with hess_diag (diagonal "
                "Hessian); use method='BR' for dense Hessians")
        from .solvers.structured import barrier_solve_structured

        dtype = feasible_point.dtype
        if equalities is not None:
            A_, b_ = equalities.A, equalities.b
        else:
            A_ = jnp.zeros((0, feasible_point.shape[0]), dtype)
            b_ = jnp.zeros((0,), dtype)
        return barrier_solve_structured(objective, U, ub, A_, b_,
                                        feasible_point, pars)
    if method == "BR":
        return barrier_solve(objective, constraints, feasible_point, pars,
                             eqs=equalities)
    # PD
    from .solvers.primal_dual import primal_dual_solve

    return primal_dual_solve(objective, constraints, feasible_point, pars,
                             eqs=equalities)


def _extract_structured_rows(constraints: ConstraintSet):
    """Split a DiagQP-shaped ConstraintSet into (U, ub) dense rows for the
    structured barrier, which handles positivity x > 0 itself.

    Requires: every block linear, and exactly one block that IS the
    positivity block -x <= 0 (as built by ``problem.constraints.positivity``).
    Offsets c are folded into ub (c + Gx <= ub  <=>  Gx <= ub - c).
    Raises ValueError when the set is not structured-solvable — callers
    should fall back to method='BR'.
    """
    import numpy as np

    from .problem.constraints import LinearBlock

    n = constraints.dim
    rows, ubs = [], []
    saw_positivity = False
    for blk in constraints.blocks:
        if not isinstance(blk, LinearBlock):
            raise ValueError(
                "BR_fast needs all-linear constraints; found "
                f"{type(blk).__name__} (use method='BR')")
        if any(isinstance(a, jax.core.Tracer)
               for a in (blk.G, blk.c, blk.ub)):
            raise ValueError(
                "BR_fast dispatch classifies constraint blocks on the host "
                "and cannot inspect traced (jit/vmap) data; call "
                "solvers.structured.barrier_solve_structured directly with "
                "the rows split out, or use method='BR'")
        # recognize the positivity block (-I) x <= 0 without materializing
        # a dense identity: n nonzeros, all on the diagonal and equal -1,
        # IS -eye(n) (O(n^2) read-only scan, no O(n^2) allocation)
        G_np = np.asarray(blk.G)
        if (blk.m == n and np.count_nonzero(G_np) == n
                and bool(np.all(np.diagonal(G_np) == -1.0))
                and not np.any(np.asarray(blk.ub - blk.c))):
            saw_positivity = True
            continue
        rows.append(blk.G)
        ubs.append(blk.ub - blk.c)
    if not saw_positivity:
        raise ValueError(
            "BR_fast's structured barrier bakes in x > 0: the constraint "
            "set must contain the positivity block (-I) x <= 0 "
            "(problem.constraints.positivity); use method='BR' otherwise")
    dtype = constraints.ub.dtype
    if rows:
        return jnp.concatenate(rows, axis=0), jnp.concatenate(ubs)
    return jnp.zeros((0, n), dtype), jnp.zeros((0,), dtype)
