"""Scalar root finding, free-variable elimination, test oracles, fixtures,
diagnostics — the auxiliary-subsystem parity layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvx_tpu import diagnostics, ops, testing
from cvx_tpu import problem as pb
from cvx_tpu.ops.reduction import (UnsolvableSystemError, free_coordinates,
                                   pad_solution, reduce_kkt)
from cvx_tpu.ops.scalar import bisect, newton_1d
from cvx_tpu.solvers import SolverParams, phase1_simple


class TestScalar:
    def test_bisect(self):
        root = bisect(lambda x: x * x - 2.0, 0.0, 2.0)
        assert abs(float(root) - np.sqrt(2)) < 1e-10

    def test_newton_1d(self):
        root = newton_1d(lambda x: jnp.cos(x) - x, 1.0)
        assert abs(float(jnp.cos(root) - root)) < 1e-12

    def test_jittable(self):
        f = jax.jit(lambda lo, hi: bisect(lambda x: x ** 3 - 5.0, lo, hi))
        assert abs(float(f(0.0, 3.0)) - 5 ** (1 / 3)) < 1e-10


class TestReduction:
    """Port of the free-variable round-trip (KktTest.scala:52-104)."""

    def test_roundtrip(self, key):
        n, p = 10, 3
        k1, k2, k3 = jax.random.split(key, 3)
        H = ops.random_spd(k1, n, cond=100.0)
        A = jax.random.normal(k2, (p, n))
        # zero out coordinates 2 and 7 everywhere
        dead = np.array([2, 7])
        H = H.at[dead, :].set(0.0).at[:, dead].set(0.0)
        A = A.at[:, dead].set(0.0)
        x0 = jax.random.normal(k3, (n,)).at[dead].set(0.0)
        w0 = jnp.ones(p)
        q = -(H @ x0 + A.T @ w0)
        b = A @ x0

        free = free_coordinates(H, A)
        assert list(np.nonzero(free)[0]) == [2, 7]
        Hr, Ar, qr, keep = reduce_kkt(H, A, q)
        xr, wr, res = ops.kkt_solve(Hr, Ar, qr, b, method="chol")
        assert float(res) < 1e-8
        x = pad_solution(xr, keep, n)
        # padded solution satisfies the ORIGINAL system
        assert float(jnp.linalg.norm(H @ x + A.T @ wr + q)) < 1e-7
        assert float(jnp.linalg.norm(A @ x - b)) < 1e-8

    def test_unsolvable(self, key):
        H = jnp.zeros((3, 3)).at[0, 0].set(1.0)
        A = jnp.zeros((0, 3))
        q = jnp.array([0.0, 1.0, 0.0])  # demands force on a free coordinate
        with pytest.raises(UnsolvableSystemError):
            reduce_kkt(H, A, q)


class TestOraclesAndFixtures:
    def test_known_minimizer(self):
        obj = pb.norm_squared(4)
        km = testing.KnownMinimizer(x_star=jnp.zeros(4), objective=obj)
        assert km.is_minimizer(jnp.full((4,), 1e-3))
        assert not km.is_minimizer(jnp.ones(4))
        assert "OK" in km.report(jnp.zeros(4))

    def test_prob_ab_feasible_iff(self):
        """probAB is feasible iff p_A + p_B <= 1 (for the >= direction on
        disjoint events) — ConstraintSets.scala:39-60."""
        n = 12
        I_A = np.zeros(n); I_A[:3] = 1
        I_B = np.zeros(n); I_B[n // 2:] = 1
        feasible = testing.prob_ab(n, I_A, 0.4, -1.0, I_B, 0.5, -1.0)
        rep = phase1_simple(feasible, jnp.full((n,), 1.0 / n))
        assert bool(rep.strictly_feasible)
        infeasible = testing.prob_ab(n, I_A, 0.6, -1.0, I_B, 0.55, -1.0)
        # note: without sum(x)=1 the set {P(A)>=.6, P(B)>=.55, x>=0} IS
        # feasible (x isn't a probability); add the equality via lift
        from cvx_tpu.problem import sum_to_one
        from cvx_tpu.solvers import phase1_by_reduction
        rep2 = phase1_by_reduction(infeasible, sum_to_one(n),
                                   jnp.full((n,), 1.0 / n))
        assert not bool(rep2.strictly_feasible)

    def test_random_feasible_constraints(self, key):
        n = 8
        x0 = jax.random.normal(key, (n,))
        cs = testing.random_feasible_constraints(key, n, x0)
        assert bool(cs.satisfied_strictly(x0))


class TestDiagnostics:
    def test_solve_stats(self):
        from cvx_tpu.models import DistKL
        n = 12
        I_A = np.zeros(n); I_A[:3] = 1
        prob = DistKL.create(n, H=jnp.asarray(-I_A[None]),
                             u=jnp.asarray([-0.3]))
        x0 = jnp.asarray(np.where(np.arange(n) < 3, 0.35 / 3, 0.65 / 9))
        sol = prob.solve_jittable(x0, method="BR")
        stats = diagnostics.solve_stats(sol)
        assert stats["newton_iters_total"] > 0
        assert stats["gap_max"] < 1e-7

    def test_barrier_history(self):
        obj = pb.norm_squared(4)
        cnts = pb.ConstraintSet(blocks=(pb.half_norm2_bounded(4, 8.0),))
        x0 = jnp.zeros(4) + 0.1
        hist = diagnostics.barrier_history(obj, cnts, x0)
        assert len(hist) >= 2
        gaps = [h["gap"] for h in hist]
        # the recorded gap is the m/t SCHEDULE bound (decreases by
        # construction) — the OBJECTIVE is the real quality check: the
        # unconstrained optimum of ||x||^2 is 0 (the ball is inactive)
        assert gaps[-1] < 1e-8
        assert all(g2 < g1 for g1, g2 in zip(gaps, gaps[1:]))
        assert hist[-1]["obj"] < 1e-8
        objs = [h["obj"] for h in hist]
        assert objs[-1] <= objs[0]
