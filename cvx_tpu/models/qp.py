"""Quadratic programming model family.

The reference builds QPs ad hoc from QuadraticObjectiveFunction +
constraint lists (e.g. SimpleOptimizationProblems.scala:221-300, joptP2 at
:389-414).  This module packages the pattern as a first-class model like
Dist_KL:

    min  a.x + x' P x / 2    s.t.   G x <= h,   A x = b

with automatic phase-I, both interior-point solvers, and vmap batching over
(P, a, G, h, A, b) pytrees.  For the common structured family — DIAGONAL P,
x > 0, and only a few dense inequality rows — ``solve_structured`` routes to
the O(n (k+p)^2) Woodbury barrier path (solvers/structured.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..problem.constraint_set import ConstraintSet
from ..problem.constraints import rows_leq
from ..problem.equality import EqualityConstraint
from ..problem.objective import QuadraticObjective
from ..solvers.barrier import barrier_solve
from ..solvers.phase1 import find_feasible_point
from ..solvers.primal_dual import primal_dual_solve
from ..solvers.structured import barrier_solve_structured
from ..solvers.types import Solution, SolverParams
from ..tree import pytree_dataclass, static_field


@pytree_dataclass
class QP:
    """Dense QP data.  Use ``QP.create``; empty G/A allowed (shape (0, n))."""

    P: jax.Array   # (n, n) symmetric PSD
    a: jax.Array   # (n,)
    G: jax.Array   # (mI, n)
    h: jax.Array   # (mI,)
    A: jax.Array   # (mE, n)
    b: jax.Array   # (mE,)
    n: int = static_field()

    @classmethod
    def create(cls, P, a, G=None, h=None, A=None, b=None,
               dtype=None) -> "QP":
        # default to the INPUT arrays' joint dtype (f32 data stays f32 even
        # under jax_enable_x64) — a canonical-float default would silently
        # upcast and then clash with a same-precision x0 at trace time
        if dtype is None:
            given = [v for v in (P, a, G, h, A, b) if v is not None]
            dtype = jnp.result_type(*given, float)
        P = jnp.asarray(P, dtype)
        a = jnp.asarray(a, dtype)
        n = a.shape[-1]
        if (G is None) != (h is None) or (A is None) != (b is None):
            raise ValueError("G,h (and A,b) must be given together")
        G = (jnp.zeros((0, n), dtype) if G is None
             else jnp.asarray(G, dtype))
        h = (jnp.zeros((0,), dtype) if h is None else jnp.asarray(h, dtype))
        A = (jnp.zeros((0, n), dtype) if A is None
             else jnp.asarray(A, dtype))
        b = (jnp.zeros((0,), dtype) if b is None else jnp.asarray(b, dtype))
        return cls(P=P, a=a, G=G, h=h, A=A, b=b, n=n)

    @property
    def objective(self) -> QuadraticObjective:
        return QuadraticObjective(P=self.P, a=self.a,
                                  r=jnp.zeros((), self.P.dtype))

    @property
    def inequalities(self) -> ConstraintSet:
        if self.G.shape[0] == 0:
            raise ValueError("QP has no inequality constraints; use the "
                             "equality-constrained Newton solver directly")
        return ConstraintSet(blocks=(rows_leq(self.G, self.h),))

    @property
    def equalities(self) -> EqualityConstraint | None:
        if self.A.shape[0] == 0:
            return None
        return EqualityConstraint(A=self.A, b=self.b)

    def solve(self, method: str = "BR", pars: SolverParams | None = None,
              feasible_point: jax.Array | None = None,
              x0: jax.Array | None = None) -> Solution:
        """Solve with automatic phase-I (host-side gate may raise
        InfeasibleProblemError)."""
        pars = pars or SolverParams()
        cnts = self.inequalities
        eqs = self.equalities
        if feasible_point is None:
            if x0 is None:
                x0 = jnp.zeros((self.n,), self.P.dtype)
            feasible_point = find_feasible_point(cnts, x0, pars, eqs)
        return self.solve_jittable(feasible_point, method, pars)

    def solve_jittable(self, feasible_point: jax.Array,
                       method: str = "BR",
                       pars: SolverParams | None = None) -> Solution:
        """Fully jittable solve from a strictly feasible point (the
        vmap/batch entry point)."""
        pars = pars or SolverParams()
        cnts = self.inequalities
        eqs = self.equalities
        if method == "BR":
            return barrier_solve(self.objective, cnts, feasible_point, pars,
                                 eqs=eqs)
        if method == "PD":
            return primal_dual_solve(self.objective, cnts, feasible_point,
                                     pars, eqs=eqs)
        raise ValueError(f"unknown method: {method!r}")


@pytree_dataclass
class DiagQP:
    """Structured QP family:  min a.x + sum_j c_j x_j^2 / 2
    s.t.  U x <= ub,  x > 0,  A x = b  — diagonal Hessian, few dense rows.

    Solved by the Woodbury barrier path at O(n (k+p)^2) per Newton step
    with no (n, n) intermediates (solvers/structured.py)."""

    c: jax.Array    # (n,) diagonal of P (>= 0)
    a: jax.Array    # (n,)
    U: jax.Array    # (k, n) dense inequality rows
    ub: jax.Array   # (k,)
    A: jax.Array    # (p, n)
    b: jax.Array    # (p,)

    @property
    def n(self) -> int:
        return self.a.shape[-1]

    def value(self, x):
        return self.a @ x + 0.5 * jnp.sum(self.c * x * x)

    def grad(self, x):
        return self.a + self.c * x

    def hess_diag(self, x):
        return self.c

    @property
    def inequalities(self) -> ConstraintSet:
        """U x <= ub plus the positivity rows the structured solver bakes
        into its barrier — as an explicit ConstraintSet for phase-I."""
        from ..problem.constraints import positivity

        dtype = self.a.dtype
        blocks = []
        if self.U.shape[0] > 0:
            blocks.append(rows_leq(self.U, self.ub))
        blocks.append(positivity(self.n, dtype=dtype))
        return ConstraintSet(blocks=tuple(blocks))

    @property
    def equalities(self) -> EqualityConstraint | None:
        if self.A.shape[0] == 0:
            return None
        return EqualityConstraint(A=self.A, b=self.b)

    def solve(self, pars: SolverParams | None = None,
              feasible_point: jax.Array | None = None,
              x0: jax.Array | None = None) -> Solution:
        """Solve with automatic phase-I — the structured family's
        no-feasible-point front door (round-3 verdict item 4; reference:
        the factories at OptimizationProblem.scala:174-196 always offer
        this path).  The all-linear constraint set routes phase-I to the
        exact low-rank Woodbury analysis (solvers/phase1.py) built for
        exactly these shapes; the host-side gate may raise
        InfeasibleProblemError."""
        pars = pars or SolverParams()
        if feasible_point is None:
            if x0 is None:
                # positivity rows are defined everywhere; seed strictly
                # inside the orthant so s0 = 1 + max residual stays modest
                x0 = jnp.full((self.n,), 1.0, self.a.dtype)
            feasible_point = find_feasible_point(
                self.inequalities, x0, pars, self.equalities)
        return self.solve_jittable(feasible_point, pars)

    def solve_jittable(self, feasible_point: jax.Array,
                       pars: SolverParams | None = None) -> Solution:
        return barrier_solve_structured(self, self.U, self.ub, self.A,
                                        self.b, feasible_point, pars)


def LP(a, U=None, ub=None, A=None, b=None, dtype=None) -> DiagQP:
    """Linear program  min a.x  s.t.  U x <= ub,  x > 0,  A x = b  as the
    c = 0 member of the DiagQP structured family: the barrier Hessian is
    diag(1/x^2) + low-rank, so LPs get the same O(n (k+p)^2) Newton steps
    (the reference's zero-Hessian LP escape hatch, KKTSystem.scala:55-59,
    becomes a fast path instead of a fallback)."""
    if dtype is None:  # follow the inputs, not the canonical float (see QP)
        given = [v for v in (a, U, ub, A, b) if v is not None]
        dtype = jnp.result_type(*given, float)
    a = jnp.asarray(a, dtype)
    n = a.shape[-1]
    U = jnp.zeros((0, n), dtype) if U is None else jnp.asarray(U, dtype)
    ub = jnp.zeros((0,), dtype) if ub is None else jnp.asarray(ub, dtype)
    A = jnp.zeros((0, n), dtype) if A is None else jnp.asarray(A, dtype)
    b = jnp.zeros((0,), dtype) if b is None else jnp.asarray(b, dtype)
    return DiagQP(c=jnp.zeros((n,), dtype), a=a, U=U, ub=ub, A=A, b=b)
