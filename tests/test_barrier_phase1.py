"""M3: barrier solver + phase-I — the minimum end-to-end slice.

Flagship case per SURVEY.md section 7.2: minX1_no_FP
(SimpleOptimizationProblems.scala:89-137) — minimize x0 subject to
x1 >= exp(x0) and x1 <= r + k*x0 with r = (e + 1/e)/2, k = (e - 1/e)/2,
no feasible point supplied.  Phase-I must find one; the barrier solver must
reach x* = (-1, 1/e) with |f - f*| < 1e-2 (the reference's acceptance
tolerance, Runner.scala:30).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvx_tpu import minimize
from cvx_tpu import problem as pb
from cvx_tpu import solvers as sv

E = float(np.e)
TOL_SOLUTION = 1e-2  # |f(x) - f*| acceptance (Runner.scala:30)


def minx1_constraints():
    dim = 2

    def exp_cnt(params, x):
        # g(x) = exp(x0) - x1 <= 0
        return jnp.array([jnp.exp(x[0]) - x[1]])

    nl = pb.NonlinearBlock(fn=exp_cnt, params=None, ub=jnp.zeros(1),
                           num=1, in_dim=dim)
    # x1 - k*x0 <= r
    r = 0.5 * (E + 1 / E)
    k = 0.5 * (E - 1 / E)
    lin = pb.LinearBlock(G=jnp.array([[-k, 1.0]]), c=jnp.zeros(1),
                         ub=jnp.array([r]))
    return pb.ConstraintSet(blocks=(nl, lin))


class TestPhase1:
    def test_simple_finds_feasible_point(self):
        cnts = minx1_constraints()
        x0 = jnp.zeros(2)  # infeasible: exp(0) - 0 = 1 > 0
        rep = sv.phase1_simple(cnts, x0)
        assert bool(rep.strictly_feasible)
        assert float(rep.s_max) < 0
        assert bool(cnts.satisfied_strictly(rep.x))

    def test_detects_infeasibility(self):
        # x <= -1 and x >= 1 simultaneously: infeasible
        cnts = pb.ConstraintSet(blocks=(
            pb.LinearBlock(G=jnp.array([[1.0], [-1.0]]), c=jnp.zeros(2),
                           ub=jnp.array([-1.0, -1.0])),
        ))
        rep = sv.phase1_simple(cnts, jnp.zeros(1))
        assert not bool(rep.strictly_feasible)
        assert float(rep.s_max) > 0
        with pytest.raises(sv.InfeasibleProblemError):
            sv.find_feasible_point(cnts, jnp.zeros(1))

    def test_soi_localizes_violation(self):
        # x0 <= -1 & x0 >= 1 (infeasible pair) plus x1 <= 5 (feasible):
        # SOI slacks should blame only the first pair
        cnts = pb.ConstraintSet(blocks=(
            pb.LinearBlock(
                G=jnp.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0]]),
                c=jnp.zeros(3),
                ub=jnp.array([-1.0, -1.0, 5.0]),
            ),
        ))
        rep = sv.phase1_soi(cnts, jnp.zeros(2))
        assert not bool(rep.strictly_feasible)
        s = np.asarray(rep.slacks)
        assert s[0] + s[1] > 0.5  # infeasible pair needs positive slack
        assert s[2] < 1e-4        # feasible constraint needs none

    def test_with_equalities_reduction(self):
        # x >= 0 with sum(x) = 1: the simplex, clearly feasible
        n = 6
        cnts = pb.ConstraintSet(blocks=(pb.positivity(n),))
        eqs = pb.sum_to_one(n)
        x0 = jnp.zeros(n)
        rep = sv.phase1_by_reduction(cnts, eqs, x0)
        assert bool(rep.strictly_feasible)
        assert float(rep.eq_error) < 1e-8

    def test_with_equalities_as_ineqs(self):
        n = 6
        cnts = pb.ConstraintSet(blocks=(pb.positivity(n),))
        eqs = pb.sum_to_one(n)
        rep = sv.phase1_with_eqs_as_ineqs(cnts, eqs, jnp.zeros(n))
        assert float(jnp.min(rep.x)) > 0
        assert float(rep.eq_error) < 1e-4  # tol-limited (1e-6 rows)


class TestBarrierEndToEnd:
    def test_minx1_with_feasible_point(self):
        obj = pb.LinearObjective(a=jnp.array([1.0, 0.0]), r=jnp.zeros(()))
        cnts = minx1_constraints()
        x_feas = jnp.array([0.0, 1.01])
        sol = sv.barrier_solve(obj, cnts, x_feas)
        assert abs(float(sol.x[0]) - (-1.0)) < TOL_SOLUTION
        assert abs(float(sol.x[1]) - 1 / E) < TOL_SOLUTION
        # m/t schedule bound: verifies the continuation reached its target
        # (the ANALYTIC checks above are the real quality gate)
        assert float(sol.duality_gap) < 1e-8

    def test_minx1_no_feasible_point(self):
        """The M0-M3 minimum end-to-end slice (SURVEY.md section 7.2)."""
        obj = pb.LinearObjective(a=jnp.array([1.0, 0.0]), r=jnp.zeros(()))
        cnts = minx1_constraints()
        sol = minimize(obj, cnts, x0=jnp.zeros(2), method="BR")
        f_star = -1.0
        assert abs(float(obj.value(sol.x)) - f_star) < TOL_SOLUTION
        assert abs(float(sol.x[1]) - 1 / E) < TOL_SOLUTION

    def test_simplex_quadratic(self):
        # joptP2 (SimpleOptimizationProblems.scala:347-371): min x'Px on
        # the probability simplex in dim 2, P = [[1,.4],[.4,1]] -> x=(.5,.5)
        P = jnp.array([[1.0, 0.4], [0.4, 1.0]])
        obj = pb.QuadraticObjective(P=2 * P, a=jnp.zeros(2), r=jnp.zeros(()))
        cnts = pb.ConstraintSet(blocks=(pb.positivity(2),))
        eqs = pb.sum_to_one(2)
        sol = minimize(obj, cnts, eqs, x0=jnp.full((2,), 2.0), method="BR")
        assert float(jnp.max(jnp.abs(sol.x - 0.5))) < TOL_SOLUTION

    def test_whole_solve_jits_and_vmaps(self, key):
        """The entire barrier solve is one jittable function of problem
        data — vmap over a batch of shifted upper bounds."""
        obj = pb.LinearObjective(a=jnp.array([1.0, 0.0]), r=jnp.zeros(()))
        x_feas = jnp.array([0.0, 1.01])

        def solve_one(r_shift):
            cnts = minx1_constraints()
            nl, lin = cnts.blocks
            lin = pb.LinearBlock(G=lin.G, c=lin.c, ub=lin.ub + r_shift)
            cs = pb.ConstraintSet(blocks=(nl, lin))
            return sv.barrier_solve(obj, cs, x_feas).x

        shifts = jnp.linspace(0.0, 0.5, 8)
        xs = jax.jit(jax.vmap(solve_one))(shifts)
        assert xs.shape == (8, 2)
        assert bool(jnp.all(jnp.isfinite(xs)))
        # larger ub -> smaller optimal x0
        assert float(xs[-1, 0]) < float(xs[0, 0])
