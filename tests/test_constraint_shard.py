"""Constraint-axis (m) sharded barrier solver: sharded == local.

SURVEY.md sections 2.4/5.7(a): the barrier Hessian reduction over m
constraints (BarrierSolver.scala:303-315) sharded over devices with psum'd
partial Hessians/gradients.  A dense problem with m >> n is distributed by
rows; the result must match the single-device barrier solver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvx_tpu.parallel import barrier_solve_msharded, instance_mesh
from cvx_tpu.problem.constraint_set import ConstraintSet
from cvx_tpu.problem.constraints import LinearBlock
from cvx_tpu.problem.equality import EqualityConstraint
from cvx_tpu.problem.objective import QuadraticObjective
from cvx_tpu.solvers.barrier import barrier_solve
from cvx_tpu.solvers.types import SolverParams


def _problem(key, m, n):
    """min 0.5 ||x - z||^2 s.t. G x <= ub; x0 = 0 strictly feasible, z pulled
    outside so a handful of constraints are active at the optimum."""
    k1, k2, k3 = jax.random.split(key, 3)
    G = jax.random.normal(k1, (m, n)) / np.sqrt(n)
    ub = jax.random.uniform(k2, (m,), minval=0.5, maxval=1.5)
    z = 2.0 * jax.random.normal(k3, (n,)) / np.sqrt(n) + 0.4
    obj = QuadraticObjective(P=jnp.eye(n), a=-z,
                             r=jnp.asarray(0.5 * (z @ z)))
    c = jnp.zeros((m,))
    return obj, G, c, ub, z


class TestMSharded:
    def test_sharded_equals_local_m2048(self, key):
        # m=2048 over 8 devices = 256 rows/shard: the same psum'd-reduction
        # coverage as the original m=4096 at ~1/4 the wall clock (round-4
        # suite audit: 21 s; the m-scaling itself is not what this pins —
        # sharded == local equality is)
        m, n = 2048, 128
        obj, G, c, ub, z = _problem(key, m, n)
        x0 = jnp.zeros((n,))
        pars = SolverParams(tol=1e-9, mu=20.0)
        mesh = instance_mesh(8, axis="m")

        sol_sh = barrier_solve_msharded(obj, G, c, ub, x0, pars, mesh=mesh)
        cnts = ConstraintSet(blocks=(LinearBlock(G=G, c=c, ub=ub),))
        sol_lo = barrier_solve(obj, cnts, x0, pars)

        assert not bool(sol_sh.stalled)
        assert float(sol_sh.duality_gap) < 1e-8   # m/t schedule bound
        # same optimum as the single-device path (the real check)
        assert float(jnp.max(jnp.abs(sol_sh.x - sol_lo.x))) < 1e-6
        # duals: sharded lam matches local lam layout (both 1/(t d))
        assert sol_sh.lam.shape == (m,)
        assert bool(jnp.all(jnp.isfinite(sol_sh.lam)))

    def test_sharded_with_equalities(self, key):
        m, n = 1024, 64
        obj, G, c, ub, z = _problem(key, m, n)
        A = jnp.ones((1, n)) / n
        b = jnp.zeros((1,))           # mean(x) = 0; x0 = 0 feasible
        x0 = jnp.zeros((n,))
        pars = SolverParams(tol=1e-9, mu=20.0)
        mesh = instance_mesh(8, axis="m")

        sol_sh = barrier_solve_msharded(obj, G, c, ub, x0, pars, A=A, b=b,
                                        mesh=mesh)
        cnts = ConstraintSet(blocks=(LinearBlock(G=G, c=c, ub=ub),))
        sol_lo = barrier_solve(obj, cnts, x0, pars,
                               eqs=EqualityConstraint(A=A, b=b))

        assert float(sol_sh.eq_gap) < 1e-8
        assert float(jnp.max(jnp.abs(sol_sh.x - sol_lo.x))) < 1e-6

    def test_pd_sharded_equals_local_m4096(self, key):
        """Round-3 item: the PRIMAL-DUAL reduced-Hessian reduction
        (PrimalDualSolver.scala:216-240) sharded over the constraint axis
        must match the single-device PD solver."""
        from cvx_tpu.parallel import primal_dual_solve_msharded
        from cvx_tpu.solvers.primal_dual import primal_dual_solve

        m, n = 4096, 256
        obj, G, c, ub, z = _problem(key, m, n)
        x0 = jnp.zeros((n,))
        pars = SolverParams(tol=1e-8)
        mesh = instance_mesh(8, axis="m")
        cnts = ConstraintSet(blocks=(LinearBlock(G=G, c=c, ub=ub),))

        sol_sh = primal_dual_solve_msharded(obj, cnts, x0, pars, mesh=mesh)
        sol_lo = primal_dual_solve(obj, cnts, x0, pars)

        assert not bool(sol_sh.stalled)
        assert float(sol_sh.duality_gap) < 1e-7
        assert float(jnp.max(jnp.abs(sol_sh.x - sol_lo.x))) < 1e-6
        assert sol_sh.lam.shape == (m,)
        assert float(jnp.max(jnp.abs(sol_sh.lam - sol_lo.lam))) < 1e-6

    def test_pd_sharded_with_equalities(self, key):
        from cvx_tpu.parallel import primal_dual_solve_msharded
        from cvx_tpu.solvers.primal_dual import primal_dual_solve

        m, n = 1024, 64
        obj, G, c, ub, z = _problem(key, m, n)
        A = jnp.ones((1, n)) / n
        b = jnp.zeros((1,))
        x0 = jnp.zeros((n,))
        pars = SolverParams(tol=1e-8)
        mesh = instance_mesh(8, axis="m")
        cnts = ConstraintSet(blocks=(LinearBlock(G=G, c=c, ub=ub),))
        eqs = EqualityConstraint(A=A, b=b)

        sol_sh = primal_dual_solve_msharded(obj, cnts, x0, pars, eqs=eqs,
                                            mesh=mesh)
        sol_lo = primal_dual_solve(obj, cnts, x0, pars, eqs=eqs)
        assert float(sol_sh.eq_gap) < 1e-7
        assert float(jnp.max(jnp.abs(sol_sh.x - sol_lo.x))) < 1e-6

    def test_quad_block_barrier_sharded(self, key):
        """Round-3 item: m-sharding accepts a GENERIC ConstraintSet — a
        quadratic block distributes, not just raw linear rows."""
        from cvx_tpu.parallel import barrier_solve_msharded_cnts
        from cvx_tpu.problem.constraints import QuadBlock

        m, n = 256, 32
        k1, k2, k3 = jax.random.split(key, 3)
        # m ball constraints ||x - c_i||^2/2 <= ub_i, all containing x0=0
        centers = jax.random.normal(k1, (m, n)) / np.sqrt(n)
        ub = 0.5 * jnp.sum(centers * centers, axis=1) + \
            jax.random.uniform(k2, (m,), minval=0.05, maxval=0.3)
        P = jnp.tile(jnp.eye(n)[None], (m, 1, 1))
        quad = QuadBlock(P=P, a=-centers,
                         r=0.5 * jnp.sum(centers * centers, axis=1), ub=ub)
        z = 2.0 * jax.random.normal(k3, (n,)) / np.sqrt(n)
        obj = QuadraticObjective(P=jnp.eye(n), a=-z,
                                 r=jnp.asarray(0.5 * (z @ z)))
        cnts = ConstraintSet(blocks=(quad,))
        x0 = jnp.zeros((n,))
        pars = SolverParams(tol=1e-9, mu=20.0)
        mesh = instance_mesh(8, axis="m")

        sol_sh = barrier_solve_msharded_cnts(obj, cnts, x0, pars, mesh=mesh)
        sol_lo = barrier_solve(obj, cnts, x0, pars)
        assert not bool(sol_sh.stalled)
        assert float(jnp.max(jnp.abs(sol_sh.x - sol_lo.x))) < 1e-6
        # constraints hold
        assert float(jnp.min(cnts.margins(sol_sh.x))) > -1e-9

    def test_msharded_rejects_nonlinear_and_indivisible(self, key):
        from cvx_tpu.parallel import primal_dual_solve_msharded
        from cvx_tpu.problem.constraints import NonlinearBlock

        n = 8
        obj = QuadraticObjective(P=jnp.eye(n), a=jnp.zeros(n),
                                 r=jnp.zeros(()))
        mesh = instance_mesh(8, axis="m")
        nl = NonlinearBlock(fn=lambda p, x: jnp.array([x @ x]),
                            params=None, ub=jnp.ones(1), num=1, in_dim=n)
        with pytest.raises(ValueError, match="Nonlinear"):
            primal_dual_solve_msharded(
                obj, ConstraintSet(blocks=(nl,)), jnp.zeros(n), mesh=mesh)
        lin = LinearBlock(G=jnp.ones((3, n)), c=jnp.zeros(3),
                          ub=jnp.ones(3))
        with pytest.raises(ValueError, match="divisible"):
            primal_dual_solve_msharded(
                obj, ConstraintSet(blocks=(lin,)), jnp.zeros(n), mesh=mesh)

    def test_active_constraints_bind(self, key):
        """The sharded solve must actually respect the constraints (not just
        agree with another solver): active margins ~ 0, and the unconstrained
        optimum z must be cut off."""
        m, n = 512, 32
        obj, G, c, ub, z = _problem(key, m, n)
        x0 = jnp.zeros((n,))
        mesh = instance_mesh(8, axis="m")
        sol = barrier_solve_msharded(obj, G, c, ub, x0,
                                     SolverParams(tol=1e-9, mu=20.0),
                                     mesh=mesh)
        margins = ub - G @ sol.x
        assert float(jnp.min(margins)) > -1e-9          # feasible
        # z itself is infeasible (the problem construction pulls it out)
        assert float(jnp.min(ub - G @ z)) < 0
        # stationarity sanity with the barrier dual estimate lam = 1/(t d)
        grad_lag = (sol.x - z) + G.T @ sol.lam
        assert float(jnp.max(jnp.abs(grad_lag))) < 1e-3
