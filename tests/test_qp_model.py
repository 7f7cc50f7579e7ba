"""QP model family and the sign-combination abs-sum constraint."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvx_tpu import ops
from cvx_tpu import problem as pb
from cvx_tpu.models import QP, DiagQP
from cvx_tpu.solvers import SolverParams


class TestQP:
    def _box_qp(self, key, n=8):
        k1, k2 = jax.random.split(key)
        P = ops.random_spd(k1, n, cond=100.0)
        a = jax.random.normal(k2, (n,))
        I = jnp.eye(n)
        G = jnp.concatenate([I, -I], axis=0)
        h = jnp.ones(2 * n)          # -1 <= x <= 1
        return QP.create(P=P, a=a, G=G, h=h)

    @pytest.mark.parametrize("method", ["BR", "PD"])
    def test_box_qp_kkt(self, key, method):
        qp = self._box_qp(key)
        sol = qp.solve(method=method)
        x = sol.x
        # KKT stationarity with box duals
        g = qp.objective.grad(x)
        lam = sol.lam
        res = g + qp.G.T @ lam
        assert float(jnp.linalg.norm(res)) < 1e-4
        assert float(jnp.max(jnp.abs(x))) <= 1.0 + 1e-8

    def test_with_equalities(self, key):
        n = 6
        qp = self._box_qp(key, n)
        A = jnp.ones((1, n))
        qp = QP.create(P=qp.P, a=qp.a, G=qp.G, h=qp.h, A=A, b=jnp.ones(1))
        sol = qp.solve(method="BR")
        assert abs(float(sol.x.sum()) - 1.0) < 1e-6

    def test_unconstrained_check(self, key):
        # interior solution must match the unconstrained minimizer when the
        # box is large
        n = 5
        k1, k2 = jax.random.split(key)
        P = ops.random_spd(k1, n, cond=10.0)
        a = jax.random.normal(k2, (n,))
        I = jnp.eye(n)
        qp = QP.create(P=P, a=a,
                       G=jnp.concatenate([I, -I], axis=0),
                       h=jnp.full((2 * n,), 100.0))
        sol = qp.solve(method="BR")
        x_star = -jnp.linalg.solve(P, a)
        assert float(jnp.max(jnp.abs(sol.x - x_star))) < 1e-4

    def test_vmap_batch(self, key):
        n, B = 6, 8
        qp = self._box_qp(key, n)
        shifts = jnp.linspace(0.0, 1.0, B)

        def solve_one(s):
            q2 = QP.create(P=qp.P, a=qp.a + s, G=qp.G, h=qp.h)
            return q2.solve_jittable(jnp.zeros(n), method="BR").x

        xs = jax.jit(jax.vmap(solve_one))(shifts)
        assert xs.shape == (B, n)
        assert bool(jnp.all(jnp.isfinite(xs)))
        # value correctness: vmapped == per-instance solves (a vmap-axis
        # bug that mixes instance data would still be finite)
        for i in (0, B // 2, B - 1):
            xi = solve_one(shifts[i])
            assert float(jnp.max(jnp.abs(xs[i] - xi))) < 1e-6, i


class TestDiagQP:
    def test_matches_dense(self, key):
        n = 10
        c = jnp.linspace(1.0, 3.0, n)
        a = -jnp.ones(n)
        U = jnp.ones((1, n)) * jnp.linspace(0, 1, n)[None]
        ub = jnp.asarray([10.0])
        A = jnp.ones((1, n))
        b = jnp.ones(1)
        dq = DiagQP(c=c, a=a, U=U, ub=ub, A=A, b=b)
        x0 = jnp.full((n,), 1.0 / n)
        sol = dq.solve_jittable(x0)
        # dense reference via QP path (positivity as explicit rows)
        G = jnp.concatenate([U, -jnp.eye(n)], axis=0)
        h = jnp.concatenate([ub, jnp.zeros(n)])
        qp = QP.create(P=jnp.diag(c), a=a, G=G, h=h, A=A, b=b)
        ref = qp.solve_jittable(x0, method="BR")
        assert float(jnp.max(jnp.abs(sol.x - ref.x))) < 1e-4


class TestAbsSum:
    def test_rows(self):
        blk = pb.abs_sum_bounded(4, 1, 3, 2.0)
        assert blk.m == 4  # 2^2 sign rows
        x = jnp.array([5.0, 1.0, -0.5, 7.0])
        # |x_1| + |x_2| = 1.5 <= 2 regardless of the other coordinates
        assert bool(jnp.all(blk.value(x) <= blk.ub))
        x_bad = jnp.array([0.0, 1.5, -1.0, 0.0])
        assert not bool(jnp.all(blk.value(x_bad) <= blk.ub))


class TestLP:
    def test_simplex_lp(self):
        # min a.x on the simplex -> all mass on argmin(a)
        from cvx_tpu.models import LP
        n = 8
        a = jnp.linspace(2.0, 1.0, n)  # argmin at last coordinate
        lp = LP(a, A=jnp.ones((1, n)), b=jnp.ones(1))
        x0 = jnp.full((n,), 1.0 / n)
        sol = lp.solve_jittable(x0)
        assert float(sol.x[-1]) > 0.999
        assert abs(float(sol.x.sum()) - 1.0) < 1e-6
        assert float(sol.duality_gap) < 1e-8   # m/t schedule bound

    def test_lp_with_dense_row(self):
        from cvx_tpu.models import LP
        n = 6
        a = jnp.linspace(2.0, 1.0, n)
        # cap the last coordinate's mass: x_{n-1} <= 0.3
        U = jnp.zeros((1, n)).at[0, n - 1].set(1.0)
        lp = LP(a, U=U, ub=jnp.asarray([0.3]),
                A=jnp.ones((1, n)), b=jnp.ones(1))
        sol = lp.solve_jittable(jnp.full((n,), 1.0 / n))
        x = sol.x
        assert abs(float(x[-1]) - 0.3) < 1e-3       # cap active
        assert float(x[-2]) > 0.69                  # rest on next-best
