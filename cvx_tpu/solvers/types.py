"""Solver configuration and result records.

Re-design of cvx/SolverParams.scala (:24-46), cvx/Solution.scala (:32-60) and
cvx/OptimizationState.scala (:22-39).  All records are pytrees so they flow
through jit/vmap; "missing" diagnostics are NaN instead of Option[...] (a
vmapped batch needs uniform structure).

The reference's hard-coded constants (SURVEY.md section 5.6) are first-class
fields here: barrier multiplier mu (BarrierSolver.scala:73,130), primal-dual
step fraction 0.99 (PrimalDualSolver.scala:339), phase-I equality tolerance
(ConstraintSet.scala:342), dual feasible start (Duality.scala:107).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..tree import pytree_dataclass, static_field


@pytree_dataclass
class SolverParams:
    """Tolerances and line-search parameters.

    Defaults = the reference's standardParams {maxIter 1000, alpha 0.04,
    beta 0.8, tolSolver 1e-8, tolEqSolve 1e-1, tolFeas 1e-7, delta 1e-6}
    (SolverParams.scala:35-46).
    """

    max_iter: int = 1000          # Newton iteration cap per inner solve
    alpha: float = 0.04           # Armijo slope fraction
    beta: float = 0.8             # backtracking factor
    tol: float = 1e-8             # duality-gap / Newton-decrement tolerance
    tol_eq_solve: float = 1e-1    # acceptable KKT relative residual
    tol_feas: float = 1e-7        # inequality feasibility tolerance
    delta: float = 1e-6           # regularization scale (pos-semidef H)
    mu: float = 10.0              # barrier parameter multiplier
    pd_step_frac: float = 0.99    # primal-dual max-step fraction
    phase1_eq_tol: float = 1e-6   # equalities-as-inequalities tolerance
    dual_start: float = 1e-3      # dual problem feasible start value
    # static (affect trace structure)
    ls_max_steps: int = static_field(default=64)    # line-search candidates
    outer_max_iter: int = static_field(default=100) # barrier/PD outer cap
    kkt_method: str = static_field(default="aug")   # see ops.kkt
    phase1_kkt_method: str = static_field(default="aug")  # phase-I solves
    kkt_refine: int = static_field(default=2)
    chol_delta: float | None = static_field(default=None)  # shift override


@pytree_dataclass
class NewtonResult:
    """Result of one inner Newton solve."""

    x: jax.Array
    newton_decrement: jax.Array
    norm_grad: jax.Array
    eq_gap: jax.Array          # ||A x - b|| (NaN when no equalities)
    iters: jax.Array
    maxed_out: jax.Array       # bool: hit max_iter
    stalled: jax.Array         # bool: line search exhausted


@pytree_dataclass
class Solution:
    """Final solver result (Solution.scala:32-60).

    Per-instance failure modes are FLAGS, not exceptions (SURVEY.md
    section 7.3): a vmapped batch carries ``maxed_out``/``stalled`` per
    instance, and ``status`` summarizes them as an integer code.
    """

    x: jax.Array
    lam: jax.Array             # inequality duals (NaN-filled if unused)
    nu: jax.Array              # equality duals (shape (0,) if no equalities)
    newton_decrement: jax.Array
    duality_gap: jax.Array
    eq_gap: jax.Array
    norm_grad: jax.Array
    norm_dual_residual: jax.Array
    iters: jax.Array
    maxed_out: jax.Array
    stalled: jax.Array         # bool: line search exhausted before converging
    # MEASURED max inequality violation max(g(x) - u)_+ of the returned
    # iterate (None where not computed).  Dual routes renormalize x, so a
    # tiny (even negative) duality gap can mask a small constraint
    # violation — this surfaces it, mirroring eq_gap.
    ineq_res: jax.Array | None = None

    # status codes (per instance under vmap)
    STATUS_OK = 0
    STATUS_MAXED_OUT = 1
    STATUS_STALLED = 2

    @property
    def status(self) -> jax.Array:
        """0 = ok, 1 = hit the iteration cap, 2 = line-search stall (the
        reference's LineSearchFailedException, as data)."""
        return jnp.where(self.stalled, self.STATUS_STALLED,
                         jnp.where(self.maxed_out, self.STATUS_MAXED_OUT,
                                   self.STATUS_OK))


@pytree_dataclass
class OptState:
    """Snapshot fed to termination criteria (OptimizationState.scala:22-39)."""

    norm_grad: jax.Array
    newton_decrement: jax.Array
    duality_gap: jax.Array
    eq_gap: jax.Array
    obj_value: jax.Array
    norm_dual_residual: jax.Array


def standard_criterion(pars: SolverParams):
    """Terminate when duality gap and equality gap are below tol
    (CvxUtils.scala:61-70)."""

    def crit(s: OptState):
        return jnp.logical_and(s.duality_gap < pars.tol,
                               s.eq_gap < pars.tol)

    return crit


def phase1_criterion(pars: SolverParams):
    """Terminate as soon as the objective (max slack) is negative and the
    equality gap is small (CvxUtils.scala:78-87)."""

    def crit(s: OptState):
        return jnp.logical_and(s.obj_value < 0.0, s.eq_gap < 1e-6)

    return crit
