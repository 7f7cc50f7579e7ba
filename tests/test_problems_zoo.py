"""The standard problem zoo with analytic known minimizers.

Port of SimpleOptimizationProblems.scala (:12-603) per SURVEY.md section 7.1:
each problem fixture attaches its closed-form solution and both solver paths
must reach it within |f(x) - f*| < 1e-2 (MinimizationTests.scala:16-98,
Runner.scala:30).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvx_tpu import minimize
from cvx_tpu import problem as pb
from cvx_tpu.solvers import SolverParams

TOL = 1e-2
METHODS = ["BR", "PD"]


def _check(obj, sol, x_star, f_star=None, tol=TOL):
    f_star = float(obj.value(jnp.asarray(x_star))) if f_star is None else f_star
    f_val = float(obj.value(sol.x))
    assert abs(f_val - f_star) < tol, (np.asarray(sol.x), f_val, f_star)


class TestMinDotProduct:
    """min -a'x s.t. |x_j| <= |a_j|  ->  x* = a
    (SimpleOptimizationProblems.scala:142-169)."""

    @pytest.mark.parametrize("method", METHODS)
    def test_solve(self, method):
        n = 8
        a = jnp.ones(n)
        obj = pb.LinearObjective(a=-a, r=jnp.zeros(()))
        cnts = pb.ConstraintSet(blocks=(pb.abs_bounded(jnp.abs(a)),))
        sol = minimize(obj, cnts, x0=2.0 * a, method=method)
        _check(obj, sol, a)


class TestMinPNorm:
    """min sum|x_j|^p s.t. sum x = 1, x >= 0  ->  x* = 1/n
    (SimpleOptimizationProblems.scala:179-209)."""

    @pytest.mark.parametrize("method", METHODS)
    @pytest.mark.parametrize("p", [2.2, 4.0])
    def test_solve(self, method, p):
        n = 8
        obj = pb.p_norm_p(n, p)
        cnts = pb.ConstraintSet(blocks=(pb.positivity(n),))
        eqs = pb.sum_to_one(n)
        sol = minimize(obj, cnts, eqs, x0=jnp.zeros(n), method=method)
        _check(obj, sol, jnp.full((n,), 1.0 / n))


class TestRankOne:
    """Rank-one Hessian problems (SimpleOptimizationProblems.scala:221-300):
    exactly singular objective Hessians are routine, not edge cases."""

    @pytest.mark.parametrize("method", METHODS)
    def test_simplex(self, method):
        # min (a'x)^2 on the simplex, a = linspace(1,2) -> x* = e_1
        n = 6
        a = jnp.linspace(1.0, 2.0, n)
        obj = pb.QuadraticObjective(P=2.0 * jnp.outer(a, a),
                                    a=jnp.zeros(n), r=jnp.zeros(()))
        cnts = pb.ConstraintSet(blocks=(pb.positivity(n),))
        eqs = pb.sum_to_one(n)
        sol = minimize(obj, cnts, eqs,
                       x0=jnp.full((n,), 1.0 / n), method=method)
        x_star = jnp.zeros(n).at[0].set(1.0)
        _check(obj, sol, x_star)

    @pytest.mark.parametrize("method", METHODS)
    def test_sphere(self, method):
        # min (a'x)^2 s.t. x >= 0, ||x||^2/2 <= 1/2 -> x* = 0
        n = 6
        a = jnp.linspace(1.0, 2.0, n)
        obj = pb.QuadraticObjective(P=2.0 * jnp.outer(a, a),
                                    a=jnp.zeros(n), r=jnp.zeros(()))
        cnts = pb.ConstraintSet(blocks=(
            pb.half_norm2_bounded(n, 0.5),
            pb.positivity(n),
        ))
        sol = minimize(obj, cnts, x0=jnp.full((n,), 1.0 / n), method=method)
        _check(obj, sol, jnp.zeros(n))


class TestFreeVariables:
    """min ||x||^2/2 s.t. x_0 <= -1  ->  x* = (-1, 0, ..., 0); all other
    coordinates are free in phase-I
    (SimpleOptimizationProblems.scala:308-340)."""

    @pytest.mark.parametrize("method", METHODS)
    def test_solve(self, method):
        n = 8
        obj = pb.norm_squared(n)
        G = jnp.zeros((1, n)).at[0, 0].set(1.0)
        cnts = pb.ConstraintSet(blocks=(
            pb.LinearBlock(G=G, c=jnp.zeros(1), ub=jnp.array([-1.0])),
        ))
        sol = minimize(obj, cnts, x0=jnp.ones(n), method=method)
        x_star = jnp.zeros(n).at[0].set(-1.0)
        _check(obj, sol, x_star)


class TestJoptP1:
    """min sum(x) s.t. ||x||^2/2 <= 1/2  ->  x* = -1/sqrt(n)
    (SimpleOptimizationProblems.scala:347-382)."""

    @pytest.mark.parametrize("method", METHODS)
    def test_solve(self, method):
        n = 6
        obj = pb.LinearObjective(a=jnp.ones(n), r=jnp.zeros(()))
        cnts = pb.ConstraintSet(blocks=(pb.half_norm2_bounded(n, 0.5),))
        sol = minimize(obj, cnts, x0=jnp.full((n,), 2.0), method=method)
        _check(obj, sol, jnp.full((n,), -1.0 / jnp.sqrt(n)))


class TestJoptP2:
    """min x'Px on the 2-simplex, P = [[2,.8],[.8,2]]  ->  x* = (.5,.5)
    (SimpleOptimizationProblems.scala:389-414)."""

    @pytest.mark.parametrize("method", METHODS)
    def test_solve(self, method):
        P = jnp.array([[1.0, 0.4], [0.4, 1.0]])
        obj = pb.QuadraticObjective(P=2 * P, a=jnp.zeros(2), r=jnp.zeros(()))
        cnts = pb.ConstraintSet(blocks=(pb.positivity(2),))
        sol = minimize(obj, cnts, pb.sum_to_one(2),
                       x0=jnp.full((2,), 2.0), method=method)
        _check(obj, sol, jnp.array([0.5, 0.5]))


class TestProbabilitySimplex:
    """min (sum x - 1)^2/2 s.t. x >= 0: whole simplex optimal, f* = 0;
    rank-one Hessian (SimpleOptimizationProblems.scala:425-456)."""

    @pytest.mark.parametrize("method", METHODS)
    def test_solve(self, method):
        n = 6
        a = jnp.ones(n)
        obj = pb.QuadraticObjective(P=jnp.outer(a, a), a=-a,
                                    r=jnp.asarray(0.5))
        cnts = pb.ConstraintSet(blocks=(pb.positivity(n),))
        sol = minimize(obj, cnts, x0=jnp.full((n,), 2.0), method=method)
        assert float(obj.value(sol.x)) < TOL
        assert float(jnp.min(sol.x)) > -1e-8


class TestDistanceFromOrigin:
    """min ||x||^2/2 s.t. ||x - 2 e_n||^2/2 <= 1/2  ->  x* = e_n, f* = 1/2
    (SimpleOptimizationProblems.scala:464-510, distanceFromOrigin0)."""

    @pytest.mark.parametrize("method", METHODS)
    def test_solve(self, method):
        n = 5  # dimension n+1 in the reference's phrasing
        dim = n + 1
        e = jnp.zeros(dim).at[n].set(1.0)
        obj = pb.norm_squared(dim)
        # 0.5||x - 2e||^2 <= 0.5  <=>  1.5 - 2 e.x + 0.5 x.x <= 0
        qc = pb.QuadBlock(
            P=jnp.eye(dim)[None],
            a=(-2.0 * e)[None],
            r=jnp.asarray([1.5]),
            ub=jnp.zeros(1),
        )
        cnts = pb.ConstraintSet(blocks=(qc,))
        sol = minimize(obj, cnts, x0=jnp.zeros(dim), method=method)
        _check(obj, sol, e)


class TestCapabilityEnvelope:
    """The reference fails distanceFromOrigin1 at n >= 80
    (docs/ToDo.txt 2018-01-10).  Verify we solve n = 80."""

    def test_distance_from_origin_n80(self):
        n = 80
        dim = n + 1
        e = jnp.zeros(dim).at[n].set(1.0)
        obj = pb.norm_squared(dim)
        qc = pb.QuadBlock(P=jnp.eye(dim)[None], a=(-2.0 * e)[None],
                          r=jnp.asarray([1.5]), ub=jnp.zeros(1))
        # the slicing constraints a.x >= 1 with a = +-e_j + e_{n+1}
        I = jnp.eye(dim)[:n]
        G = jnp.concatenate([-(I + e[None, :]), I - e[None, :]], axis=0)
        lin = pb.LinearBlock(G=G, c=jnp.zeros(2 * n),
                             ub=jnp.full((2 * n,), -1.0))
        cnts = pb.ConstraintSet(blocks=(qc, lin))
        sol = minimize(obj, cnts, x0=jnp.zeros(dim), method="BR")
        assert abs(float(obj.value(sol.x)) - 0.5) < TOL
