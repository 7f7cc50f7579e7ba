"""M1: problem-modeling layer — objectives, constraint blocks, barrier
assembly.  Checks autodiff-derived quantities against hand formulas and the
fused barrier assembly against a reference fold over constraints."""

import jax
import jax.numpy as jnp
import pytest

from cvx_tpu import problem as pb


class TestObjectives:
    def test_quadratic_matches_custom(self, key):
        n = 7
        k1, k2, k3 = jax.random.split(key, 3)
        P = pb.norm_squared(n).P * 2.0 + 0.5
        P = 0.5 * (P + P.T)
        a = jax.random.normal(k1, (n,))
        x = jax.random.normal(k2, (n,))
        quad = pb.QuadraticObjective(P=P, a=a, r=jnp.asarray(1.5))

        def fn(params, x):
            P, a = params
            return 1.5 + a @ x + 0.5 * x @ (P @ x)

        cust = pb.CustomObjective(fn=fn, params=(P, a))
        assert jnp.allclose(quad.value(x), cust.value(x))
        assert jnp.allclose(quad.grad(x), cust.grad(x))
        assert jnp.allclose(quad.hess(x), cust.hess(x))

    def test_p_norm(self, key):
        obj = pb.p_norm_p(5, 4.0)
        x = jnp.abs(jax.random.normal(key, (5,))) + 0.1
        assert jnp.allclose(obj.value(x), jnp.sum(x ** 4))
        assert jnp.allclose(obj.grad(x), 4 * x ** 3)

    def test_power_objective_known_min(self, key):
        A = jnp.eye(3)
        alpha = jnp.ones(3)
        obj = pb.power_objective(A, alpha, q=2.0)
        assert float(obj.value(jnp.zeros(3))) == 0.0
        x = jnp.array([1.0, -2.0, 0.5])
        assert jnp.allclose(obj.value(x), jnp.sum(x ** 4))

    def test_affine_pullback_structured(self, key):
        n, k = 6, 3
        k1, k2, k3, k4 = jax.random.split(key, 4)
        P = pb.norm_squared(n).P + 0.1
        P = 0.5 * (P + P.T)
        obj = pb.QuadraticObjective(P=P, a=jax.random.normal(k1, (n,)),
                                    r=jnp.asarray(0.7))
        z = jax.random.normal(k2, (n,))
        F = jax.random.normal(k3, (n, k))
        u = jax.random.normal(k4, (k,))
        pulled = pb.affine_pullback(obj, z, F)
        assert isinstance(pulled, pb.QuadraticObjective)
        x = z + F @ u
        assert jnp.allclose(pulled.value(u), obj.value(x), atol=1e-12)
        assert jnp.allclose(pulled.grad(u), F.T @ obj.grad(x), atol=1e-12)


class TestBlocks:
    def _nl_exp_block(self, dim):
        # the minX1 constraint exp(x0) - x1 <= 0
        def fn(params, x):
            return jnp.array([jnp.exp(x[0]) - x[1]])

        return pb.NonlinearBlock(fn=fn, params=None,
                                 ub=jnp.zeros(1), num=1, in_dim=dim)

    def test_linear_block(self, key):
        G = jax.random.normal(key, (4, 6))
        blk = pb.LinearBlock(G=G, c=jnp.arange(4.0), ub=jnp.ones(4))
        x = jnp.ones(6)
        assert jnp.allclose(blk.value(x), jnp.arange(4.0) + G @ x)
        assert jnp.allclose(blk.jac(x), G)
        assert jnp.allclose(blk.whess(x, jnp.ones(4)), 0.0)

    def test_quad_block_jacobian_vs_autodiff(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        m, n = 3, 5
        P = jax.random.normal(k1, (m, n, n))
        P = 0.5 * (P + jnp.swapaxes(P, 1, 2))
        a = jax.random.normal(k2, (m, n))
        blk = pb.QuadBlock(P=P, a=a, r=jnp.zeros(m), ub=jnp.ones(m))
        x = jax.random.normal(k3, (n,))
        jac_ad = jax.jacfwd(blk.value)(x)
        assert jnp.allclose(blk.jac(x), jac_ad, atol=1e-12)
        w = jnp.array([1.0, -2.0, 0.5])
        whess_ad = jax.hessian(lambda x_: w @ blk.value(x_))(x)
        assert jnp.allclose(blk.whess(x, w), whess_ad, atol=1e-12)

    def test_nonlinear_block_autodiff(self):
        blk = self._nl_exp_block(2)
        x = jnp.array([0.3, 2.0])
        assert jnp.allclose(blk.jac(x),
                            jnp.array([[jnp.exp(0.3), -1.0]]))
        w = jnp.array([2.0])
        H = blk.whess(x, w)
        assert jnp.allclose(H, jnp.array([[2 * jnp.exp(0.3), 0.0],
                                          [0.0, 0.0]]))

    def test_phase1_lift(self):
        blk = pb.positivity(3)
        lifted = blk.lift_phase1()
        assert lifted.dim == 4
        xs = jnp.array([-1.0, 2.0, 3.0, 5.0])  # s = 5
        # g(x) - s = -x - s
        assert jnp.allclose(lifted.value(xs),
                            -xs[:3] - 5.0)

    def test_soi_lift(self):
        blk = pb.positivity(2)
        lifted = blk.lift_soi(n_total=2, offset=0)
        xs = jnp.array([-1.0, 2.0, 3.0, 4.0])
        assert jnp.allclose(lifted.value(xs),
                            jnp.array([1.0 - 3.0, -2.0 - 4.0]))


class TestConstraintSet:
    def _set(self, key, n=5):
        k1, k2 = jax.random.split(key)
        lin = pb.LinearBlock(
            G=jax.random.normal(k1, (3, n)),
            c=jnp.zeros(3),
            ub=jnp.ones(3) * 10,
        )
        quad = pb.half_norm2_bounded(n, 50.0)
        return pb.ConstraintSet(blocks=(lin, quad, pb.positivity(n)))

    def test_views(self, key):
        cs = self._set(key)
        assert cs.m == 3 + 1 + 5
        x = jnp.ones(5) * 0.5
        assert cs.value(x).shape == (9,)
        assert cs.jac(x).shape == (9, 5)
        assert bool(cs.satisfied_strictly(x))
        lam = cs.lambda_init(x)
        assert bool(jnp.all(lam > 0))

    def test_barrier_assembly_vs_fold(self, key):
        """Fused barrier must equal the reference's per-constraint fold
        (BarrierSolver.scala:280-316)."""
        cs = self._set(key)
        obj = pb.norm_squared(5)
        x = jnp.ones(5) * 0.5
        t = 3.0
        val, grad, hess = cs.barrier_value_grad_hess(obj, t, x)

        # reference fold, one scalar constraint at a time
        d = cs.margins(x)
        G = cs.jac(x)
        val_ref = t * obj.value(x) - jnp.sum(jnp.log(d))
        grad_ref = t * obj.grad(x)
        hess_ref = t * obj.hess(x)
        for i in range(cs.m):
            grad_ref = grad_ref + G[i] / d[i]
            hess_ref = hess_ref + jnp.outer(G[i], G[i]) / d[i] ** 2
        # second-order terms of the quad block (identity Hessian, index 3)
        hess_ref = hess_ref + jnp.eye(5) / d[3]
        assert jnp.allclose(val, val_ref, atol=1e-12)
        assert jnp.allclose(grad, grad_ref, atol=1e-12)
        assert jnp.allclose(hess, hess_ref, atol=1e-10)

    def test_barrier_grad_hess_vs_autodiff(self, key):
        cs = self._set(key)
        obj = pb.norm_squared(5)
        x = jnp.ones(5) * 0.5
        t = 2.0
        val, grad, hess = cs.barrier_value_grad_hess(obj, t, x)
        f = lambda x_: cs.barrier_value(obj, t, x_)
        assert jnp.allclose(grad, jax.grad(f)(x), atol=1e-10)
        assert jnp.allclose(hess, jax.hessian(f)(x), atol=1e-8)

    def test_phase1_set(self, key):
        cs = self._set(key)
        x0 = jnp.ones(5) * 20.0  # infeasible for quad constraint
        assert not bool(cs.satisfied_strictly(x0))
        lifted = cs.lift_phase1()
        xs = cs.phase1_feasible_point(x0)
        assert xs.shape == (6,)
        assert bool(lifted.satisfied_strictly(xs))

    def test_soi_set(self, key):
        cs = self._set(key)
        x0 = jnp.ones(5) * 20.0
        lifted = cs.lift_soi()
        xs = cs.soi_feasible_point(x0)
        assert xs.shape == (5 + 9,)
        assert bool(lifted.satisfied_strictly(xs))

    def test_vmap_over_instances(self, key):
        """The whole constraint set pytree vmaps over batched data."""
        n = 4
        keys = jax.random.split(key, 8)

        def make_and_eval(k):
            G = jax.random.normal(k, (2, n))
            cs = pb.ConstraintSet(blocks=(
                pb.LinearBlock(G=G, c=jnp.zeros(2), ub=jnp.ones(2)),
                pb.positivity(n),
            ))
            obj = pb.norm_squared(n)
            x = jnp.full((n,), 0.1)
            return cs.barrier_value_grad_hess(obj, 1.0, x)

        val, grad, hess = jax.vmap(make_and_eval)(keys)
        assert val.shape == (8,)
        assert hess.shape == (8, n, n)
        assert bool(jnp.all(jnp.isfinite(hess)))


class TestEquality:
    def test_stack_error_pullback(self, key):
        n = 6
        e1 = pb.sum_to_one(n)
        w = jnp.arange(n, dtype=jnp.float64)
        e2 = pb.expectation_eq(w, 2.0)
        eq = e1.stack(e2)
        assert eq.p == 2
        x = jnp.ones(n) / n
        assert float(eq.error(x)) == pytest.approx(
            float(jnp.abs(w.sum() / n - 2.0)), abs=1e-12
        )
        ss = eq.solution_space()
        assert float(eq.error(ss.z0)) < 1e-12
        ineq = eq.as_inequalities(1e-6)
        assert ineq.m == 4

    def test_lift(self):
        eq = pb.sum_to_one(4)
        lifted = eq.lift_phase1()
        assert lifted.A.shape == (1, 5)
        assert float(lifted.A[0, 4]) == 0.0
