"""Structure-exploiting barrier solver (diag + low-rank Woodbury path) —
must agree with the dense barrier solver and analytic KL solutions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvx_tpu.models import DistKL
from cvx_tpu.solvers import SolverParams
from cvx_tpu.solvers.structured import barrier_solve_structured


def _kl20():
    n = 20
    I_A = np.zeros(n); I_A[:3] = 1.0
    I_B = np.zeros(n); I_B[n // 2:] = 1.0
    prob = DistKL.create(n, H=jnp.asarray(np.stack([-I_A, I_B])),
                         u=jnp.asarray([-0.36, 0.1]))
    x0 = jnp.asarray(np.where(np.arange(n) < 3, 0.40 / 3,
                              np.where(np.arange(n) >= n // 2, 0.008,
                                       0.52 / 7)))
    xa = np.where(np.arange(n) < 3, 0.12,
                  np.where(np.arange(n) >= n // 2, 0.2 / n, 1.08 / (n - 6)))
    return prob, x0, xa, n


class TestStructuredKL:
    def test_matches_analytic_and_dense(self):
        prob, x0, xa, n = _kl20()
        fa = float(xa @ np.log(n * xa))
        fast = prob.solve_jittable(x0, method="BR_fast")
        dense = prob.solve_jittable(x0, method="BR")
        x_f = np.asarray(fast.x)
        f_fast = float(x_f @ np.log(n * x_f))
        assert abs(f_fast - fa) < 1e-3
        # Solution.duality_gap on barrier routes is the m/t SCHEDULE bound
        # (verifies the continuation ran to target); the MEASURED f64
        # certificate is the honest quality number
        assert float(fast.duality_gap) < 1e-8
        assert float(fast.eq_gap) < 1e-8
        from cvx_tpu.models.dist_kl import kl_dual_gap
        eqs = prob.equalities
        gap_meas, _ = kl_dual_gap(prob.H, prob.u, eqs.A, eqs.b, fast.x)
        assert float(gap_meas) < 1e-7
        x_d = np.asarray(dense.x)
        assert abs(f_fast - float(x_d @ np.log(n * x_d))) < 1e-4

    def test_extra_equalities(self):
        # kl_2 form: equalities only (H empty is not allowed for BR_fast --
        # needs at least the stacked eq rows; use one inequality + one eq)
        n = 20
        I_A = np.zeros(n); I_A[:3] = 1.0
        I_B = np.zeros(n); I_B[n // 2:] = 1.0
        prob = DistKL.create(n, H=jnp.asarray(-I_A[None]),
                             u=jnp.asarray([-0.36]),
                             A=jnp.asarray(I_B[None]),
                             r=jnp.asarray([0.1]))
        x0 = jnp.asarray(np.where(np.arange(n) < 3, 0.40 / 3,
                                  np.where(np.arange(n) >= n // 2, 0.01,
                                           0.50 / 7)))
        sol = prob.solve_jittable(x0, method="BR_fast")
        x = np.asarray(sol.x)
        assert abs(x[n // 2:].sum() - 0.1) < 1e-6
        assert x[:3].sum() >= 0.36 - 1e-6
        assert abs(x.sum() - 1.0) < 1e-6

    def test_vmap_batch(self):
        prob, x0, xa, n = _kl20()

        def solve(shift):
            p = DistKL.create(n, H=prob.H, u=prob.u + shift)
            return p.solve_jittable(x0, method="BR_fast").x

        shifts = jnp.linspace(0.0, 0.02, 8)
        xs = jax.jit(jax.vmap(solve))(shifts)
        assert xs.shape == (8, n)
        assert float(jnp.max(jnp.abs(xs.sum(1) - 1.0))) < 1e-6

    def test_float32(self):
        prob, x0, xa, n = _kl20()
        prob32 = DistKL.create(n, H=prob.H, u=prob.u, dtype=jnp.float32)
        sol = prob32.solve_jittable(x0.astype(jnp.float32),
                                    method="BR_fast")
        x = np.asarray(sol.x)
        fa = float(xa @ np.log(n * xa))
        assert abs(float(x @ np.log(n * x)) - fa) < 1e-2
        assert float(sol.duality_gap) < 1e-8   # m/t schedule bound (f32)
        # measured f64 certificate: the f32 route floors at ~1e-6
        from cvx_tpu.diagnostics import kl_gap_certificate_np
        cert = kl_gap_certificate_np(x[None], np.asarray(prob.H),
                                     np.asarray(prob.u)[None])
        assert float(cert[0]) < 1e-4


class TestStructuredGeneric:
    def test_diagonal_qp(self):
        # min sum(c_j x_j^2)/2 s.t. sum x = 1, x > 0, one dense row
        n = 12
        c = jnp.linspace(1.0, 3.0, n)

        class DiagQP:
            def value(self, x):
                return 0.5 * jnp.sum(c * x * x)

            def grad(self, x):
                return c * x

            def hess_diag(self, x):
                return c

        U = jnp.ones((1, n)) * jnp.linspace(0, 1, n)[None]
        ub = jnp.asarray([10.0])  # inactive
        A = jnp.ones((1, n))
        b = jnp.ones(1)
        x0 = jnp.full((n,), 1.0 / n)
        sol = barrier_solve_structured(DiagQP(), U, ub, A, b, x0)
        # analytic: x_j ∝ 1/c_j (KKT: c_j x_j = nu)
        xa = (1.0 / c) / jnp.sum(1.0 / c)
        assert float(jnp.max(jnp.abs(sol.x - xa))) < 1e-4
