"""Phase-I feasibility analysis.

TPU-native re-design of the reference's phase-I subsystem
(cvx/ConstraintSet.scala:123-575): find a strictly feasible point of
``g_i(x) <= u_i`` (optionally with ``A x = b``), or certify infeasibility.

Three analyses, as in the reference:

  * simple (no equalities): lift to (x, s), minimize s until s < 0
    (ConstraintSet.scala:355-395, [boyd] 11.4.1);
  * with equalities: either convert A x = b to +/- inequalities with a small
    tolerance and recurse (ConstraintSet.scala:326-347, the reference's
    default), or ELIMINATE the equalities via x = z0 + F u and run the
    no-equality analysis in u (ConstraintSet.scala:424-477,
    ``phase_I_Analysis_by_reduction``) — the reduction is this framework's
    default: it is exact (no tolerance hack), lowers the dimension, and jits
    cleanly;
  * sum-of-infeasibilities (SOI): one slack per constraint
    (ConstraintSet.scala:511-545) — localizes which constraints are
    infeasible.

All analyses are jittable and return a ``FeasibilityReport`` pytree (no
exceptions — SURVEY.md section 7.3).  The host-side ``find_feasible_point``
raises ``InfeasibleProblemError`` like the reference's
``ConstraintSet.withFeasiblePoint`` (ConstraintSet.scala:556-575).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..problem.constraint_set import ConstraintSet
from ..problem.equality import EqualityConstraint
from ..problem.objective import LinearObjective
from ..tree import pytree_dataclass
from .barrier import barrier_solve
from .types import SolverParams, phase1_criterion


class InfeasibleProblemError(Exception):
    """Raised by find_feasible_point when phase-I certifies infeasibility
    (cvx/InfeasibleProblemException.scala)."""

    def __init__(self, report):
        self.report = report
        super().__init__(
            f"problem infeasible: max slack {report.s_max}, "
            f"equality error {report.eq_error}"
        )


@pytree_dataclass
class FeasibilityReport:
    """Result of a phase-I analysis (cvx/FeasibilityReport.scala)."""

    x: jax.Array               # feasibility candidate
    s_max: jax.Array           # max slack (< 0 => strictly feasible)
    slacks: jax.Array          # per-constraint slack (SOI) or (1,) scalar
    strictly_feasible: jax.Array  # bool
    eq_error: jax.Array        # ||A x - b|| at the candidate

    def is_feasible(self, tol: float) -> jax.Array:
        """Feasible up to tolerance (FeasibilityReport.scala:35-36)."""
        return jnp.logical_and(self.s_max < tol, self.eq_error < tol)


def _slack_objective(n: int, dtype) -> LinearObjective:
    """f(x, s) = s (ConstraintSet.scala:131-144)."""
    a = jnp.zeros((n + 1,), dtype).at[n].set(1.0)
    return LinearObjective(a=a, r=jnp.zeros((), dtype))


def phase1_simple(
    cnts: ConstraintSet,
    x0: jax.Array,
    pars: SolverParams | None = None,
    early_exit: bool = True,
) -> FeasibilityReport:
    """Basic phase-I without equalities: minimize the shared slack s.

    ``early_exit`` terminates the inner Newton solves as soon as s < 0
    (a strictly feasible point exists; the reference only exits at the outer
    level, ConstraintSet.scala:371-374).  Set False to center the point more.
    """
    pars = pars or SolverParams()
    n = cnts.dim
    lifted = cnts.lift_phase1()
    xs0 = cnts.phase1_feasible_point(x0)
    obj = _slack_objective(n, x0.dtype)

    stop_inner = (lambda xs: xs[n] < -pars.tol_feas) if early_exit else None
    sol = barrier_solve(obj, lifted, xs0, pars,
                        criterion=phase1_criterion(pars),
                        stop_inner=stop_inner)
    x = sol.x[:n]
    s = sol.x[n]
    strictly = cnts.satisfied_strictly(x)
    return FeasibilityReport(
        x=x, s_max=s, slacks=s[None],
        strictly_feasible=strictly,
        eq_error=jnp.zeros((), x.dtype),
    )


def phase1_with_eqs_as_ineqs(
    cnts: ConstraintSet,
    eqs: EqualityConstraint,
    x0: jax.Array,
    pars: SolverParams | None = None,
) -> FeasibilityReport:
    """Equalities as +/- inequalities with tolerance, then simple analysis
    (ConstraintSet.scala:326-347, tol = pars.phase1_eq_tol)."""
    pars = pars or SolverParams()
    ext = cnts.add_blocks(eqs.as_inequalities(pars.phase1_eq_tol))
    rep = phase1_simple(ext, x0, pars)
    eq_err = eqs.error(rep.x)
    return FeasibilityReport(
        x=rep.x, s_max=rep.s_max, slacks=rep.slacks,
        strictly_feasible=jnp.logical_and(
            cnts.satisfied_strictly(rep.x), eq_err < pars.tol
        ),
        eq_error=eq_err,
    )


def phase1_by_reduction(
    cnts: ConstraintSet,
    eqs: EqualityConstraint,
    x0: jax.Array,
    pars: SolverParams | None = None,
) -> FeasibilityReport:
    """Eliminate A x = b via x = z0 + F u, analyze in u
    (ConstraintSet.scala:424-477).  Exact: the candidate satisfies the
    equalities to solver precision by construction."""
    pars = pars or SolverParams()
    ss = eqs.solution_space()
    cnts_u = cnts.affine_pullback(ss.z0, ss.F)
    u0 = ss.parameter(x0)
    rep_u = phase1_simple(cnts_u, u0, pars)
    x = ss.point(rep_u.x)
    eq_err = eqs.error(x)
    return FeasibilityReport(
        x=x, s_max=rep_u.s_max, slacks=rep_u.slacks,
        strictly_feasible=jnp.logical_and(
            cnts.satisfied_strictly(x), eq_err < pars.tol
        ),
        eq_error=eq_err,
    )


def phase1_soi(
    cnts: ConstraintSet,
    x0: jax.Array,
    pars: SolverParams | None = None,
    eqs: EqualityConstraint | None = None,
) -> FeasibilityReport:
    """Sum-of-infeasibilities analysis: minimize sum_i s_i with one slack per
    constraint (ConstraintSet.scala:511-545).  When infeasible, the slack
    vector localizes the violated constraints."""
    pars = pars or SolverParams()
    n = cnts.dim
    p = cnts.m
    lifted = cnts.lift_soi()
    xs0 = cnts.soi_feasible_point(x0)
    dtype = x0.dtype
    a = jnp.concatenate([jnp.zeros((n,), dtype), jnp.ones((p,), dtype)])
    obj = LinearObjective(a=a, r=jnp.zeros((), dtype))
    eqs_l = eqs.lift_phase1(extra=p) if eqs is not None else None
    sol = barrier_solve(obj, lifted, xs0, pars, eqs=eqs_l)
    x = sol.x[:n]
    s = sol.x[n:]
    eq_err = eqs.error(x) if eqs is not None else jnp.zeros((), dtype)
    return FeasibilityReport(
        x=x, s_max=jnp.max(s), slacks=s,
        strictly_feasible=jnp.logical_and(
            cnts.satisfied_strictly(x), eq_err < pars.tol
        ),
        eq_error=eq_err,
    )


def feasibility_analysis(
    cnts: ConstraintSet,
    x0: jax.Array,
    pars: SolverParams | None = None,
    eqs: EqualityConstraint | None = None,
    method: str = "auto",
) -> FeasibilityReport:
    """Dispatch like ConstraintSet.phase_I_Analysis (:404-413).

    method: "auto" (reduction when equalities present, else simple),
    "simple", "eqs_as_ineqs", "reduction", "soi".
    """
    pars = pars or SolverParams()
    if method == "soi":
        return phase1_soi(cnts, x0, pars, eqs)
    if eqs is None:
        return phase1_simple(cnts, x0, pars)
    if method in ("auto", "reduction"):
        return phase1_by_reduction(cnts, eqs, x0, pars)
    if method in ("simple", "eqs_as_ineqs"):
        return phase1_with_eqs_as_ineqs(cnts, eqs, x0, pars)
    raise ValueError(f"unknown phase-I method: {method!r}")


def find_feasible_point(
    cnts: ConstraintSet,
    x0: jax.Array,
    pars: SolverParams | None = None,
    eqs: EqualityConstraint | None = None,
    method: str = "auto",
) -> jax.Array:
    """Host-side gate: return a strictly feasible point or raise
    InfeasibleProblemError (ConstraintSet.scala:556-575)."""
    pars = pars or SolverParams()
    report = feasibility_analysis(cnts, x0, pars, eqs, method)
    if not bool(report.is_feasible(pars.tol)):
        raise InfeasibleProblemError(report)
    return report.x
