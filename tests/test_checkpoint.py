"""Checkpoint / resume (SURVEY.md section 5.4): solver state is an explicit
pytree, so stopping and continuing a barrier continuation is pure
serialization + a t0 restart."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvx_tpu.checkpoint import load_pytree, resume_barrier, save_pytree
from cvx_tpu.models import DistKL
from cvx_tpu.solvers.barrier import barrier_solve
from cvx_tpu.solvers.types import SolverParams
from cvx_tpu.tree import replace as tree_replace


def _problem(n=24):
    I_A = np.zeros(n); I_A[:3] = 1.0
    I_B = np.zeros(n); I_B[n // 2:] = 1.0
    H = jnp.asarray(np.stack([-I_A, I_B]))
    u = jnp.asarray([-0.3, 0.7])
    prob = DistKL.create(n, H=H, u=u)
    w = 0.35
    x0 = jnp.asarray((w / 3) * I_A + ((1 - w) / (n - 3)) * (1 - I_A))
    return prob, x0


class TestPytreeRoundTrip:
    def test_solution_round_trip(self, tmp_path):
        prob, x0 = _problem()
        sol = prob.solve_jittable(x0, method="BR_fast",
                                  pars=SolverParams(tol=1e-9))
        path = str(tmp_path / "sol.npz")
        n_leaves = save_pytree(path, sol)
        assert n_leaves > 5
        # template with garbage values, same structure
        like = jax.tree_util.tree_map(jnp.zeros_like, sol)
        back = load_pytree(path, like)
        for a, b in zip(jax.tree_util.tree_leaves(sol),
                        jax.tree_util.tree_leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_structure_mismatch_raises(self, tmp_path):
        path = str(tmp_path / "x.npz")
        save_pytree(path, {"a": jnp.ones(3)})
        with pytest.raises(ValueError, match="structure changed"):
            load_pytree(path, {"a": jnp.ones(3), "b": jnp.ones(2)})


class TestResumeBarrier:
    def test_resume_matches_straight_through(self, tmp_path):
        """Stop a barrier continuation after 3 stages, checkpoint, reload,
        resume — the final objective must match the uninterrupted solve."""
        prob, x0 = _problem()
        obj, cnts, eqs = prob.objective, prob.inequalities, prob.equalities
        pars = SolverParams(tol=1e-9, mu=10.0)

        full = barrier_solve(obj, cnts, x0, pars, eqs=eqs)

        partial_pars = tree_replace(pars, outer_max_iter=3)
        partial = barrier_solve(obj, cnts, x0, partial_pars, eqs=eqs)
        assert float(partial.duality_gap) > float(full.duality_gap)

        path = str(tmp_path / "ckpt.npz")
        save_pytree(path, partial)
        restored = load_pytree(
            path, jax.tree_util.tree_map(jnp.zeros_like, partial))

        resumed = resume_barrier(obj, cnts, restored, pars, eqs=eqs)
        assert float(resumed.duality_gap) <= float(full.duality_gap) * 1.01
        f_full = float(obj.value(full.x))
        f_res = float(obj.value(resumed.x))
        assert abs(f_full - f_res) < 1e-8

    def test_resume_refuses_unhealthy_checkpoint(self):
        prob, x0 = _problem()
        sol = prob.solve_jittable(x0, method="BR_fast",
                                  pars=SolverParams(tol=1e-9))
        bad = tree_replace(sol, duality_gap=jnp.asarray(jnp.nan))
        with pytest.raises(ValueError, match="unhealthy"):
            resume_barrier(prob.objective, prob.inequalities, bad,
                           SolverParams(), eqs=prob.equalities)
