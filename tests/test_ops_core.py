"""M0 numerics battery — port of the reference's test strategy for L1/L2.

Mirrors cvx/MatrixUtilsTests.scala and cvx/KktTest.scala: construct systems
with KNOWN solutions (b := A x0), solve, check relative forward/backward
error; deliberately exercise ill-conditioning (cond up to 1e14) with
adversarial right-hand sides (nastyRHS); round-trip random KKT systems.
"""

import jax
import jax.numpy as jnp
import pytest

from cvx_tpu import ops


def _rel_err(x, x0):
    return float(jnp.linalg.norm(x - x0) / (1.0 + jnp.linalg.norm(x0)))


class TestRuiz:
    def test_identity_on_unit_rows(self):
        H = jnp.eye(5)
        d, Q = ops.ruiz_equilibrate(H)
        assert jnp.allclose(Q, H, atol=1e-12)

    def test_zero_row_survives(self):
        # MatrixUtilsTests.scala:16-26: Ruiz on a matrix with a zero row
        H = jnp.diag(jnp.array([1.0, 0.0, 3.0]))
        d, Q = ops.ruiz_equilibrate(H)
        assert bool(jnp.all(jnp.isfinite(d)))
        assert bool(jnp.all(jnp.isfinite(Q)))

    def test_reduces_condition_number(self, key):
        H = ops.random_spd(key, 40, cond=1e10)
        # badly scale it
        s = 10.0 ** jnp.linspace(-4, 4, 40)
        Hs = (s[:, None] * H) * s[None, :]
        d, Q = ops.ruiz_equilibrate(Hs)
        cond_before = float(jnp.linalg.cond(Hs))
        cond_after = float(jnp.linalg.cond(Q))
        assert cond_after < cond_before / 100.0
        # row norms near 1
        rn = jnp.linalg.norm(Q, axis=1)
        assert float(jnp.max(jnp.abs(rn - 1.0))) < 1e-3


class TestTriangular:
    # MatrixUtilsTests.scala:36-158
    def test_forward_back_roundtrip(self, key):
        k1, k2 = jax.random.split(key)
        n = 30
        L = jnp.tril(jax.random.normal(k1, (n, n))) + 3.0 * jnp.eye(n)
        x0 = jax.random.normal(k2, (n,))
        x = ops.forward_solve(L, L @ x0)
        assert _rel_err(x, x0) < 1e-10
        U = L.T
        x = ops.back_solve(U, U @ x0)
        assert _rel_err(x, x0) < 1e-10


class TestCholeskySolve:
    # MatrixUtilsTests.scala:165-198 + the cond=1e14 torture test :264-320
    @pytest.mark.parametrize("cond", [1e2, 1e8, 1e12])
    def test_known_solution(self, key, cond):
        k1, k2 = jax.random.split(key)
        n = 50
        H = ops.random_spd(k1, n, cond=cond)
        x0 = jax.random.normal(k2, (n,))
        b = H @ x0
        x, relres = ops.cholesky_solve(H, b)
        assert float(relres) < 1e-8  # backward error: always small
        # forward error is bounded by ~cond * eps (with safety margin);
        # capped at 0.2 so the assert never goes vacuous (_rel_err < 1
        # holds even for x = 0, which scores ~0.9 here) — at cond=1e12 the
        # genuine forward error is ~6e-2 and the BACKWARD error above is
        # the binding accuracy check
        assert _rel_err(x, x0) < min(0.2, max(1e-8, cond * 1e-16 * 1e4))

    def test_nasty_rhs_cond_1e8(self, key):
        # backward error must stay small at cond 1e8 with a RHS loaded on
        # the small singular directions (regularization floor 1e-10 is well
        # below the smallest eigenvalue, refinement recovers full accuracy)
        k1, k2 = jax.random.split(key)
        n = 60
        U = ops.random_orthogonal(k1, n)
        d = ops.decaying_spectrum(n, 1e8)
        H = (U * d[None, :]) @ U.T
        H = 0.5 * (H + H.T)
        b = ops.nasty_rhs(k2, d, U)
        x, relres = ops.cholesky_solve(H, b)
        assert float(relres) < 1e-8  # backward error

    def test_nasty_rhs_cond_1e14_ladder(self, key):
        # the cond=1e14 torture test (MatrixUtilsTests.scala:264-320):
        # the spectral ladder must keep the backward error near the
        # theoretical floor eps*cond ~ 1e-2 (solution norm is ~cond*||b||,
        # so this is eps-level backward error relative to ||A||*||x||)
        k1, k2 = jax.random.split(key)
        n = 60
        U = ops.random_orthogonal(k1, n)
        d = ops.decaying_spectrum(n, 1e14)
        H = (U * d[None, :]) @ U.T
        H = 0.5 * (H + H.T)
        b = ops.nasty_rhs(k2, d, U)
        x, relres = ops.sym_solve(H, b, method="ladder", tol=1e-10)
        assert float(relres) < 3e-2

    def test_singular_escalates_to_eig(self, key):
        k1, k2 = jax.random.split(key)
        n = 40
        H = ops.random_spd(k1, n, cond=1e6, dim_kernel=5)
        H = 0.5 * (H + H.T)
        U, d, _ = jnp.linalg.svd(H)
        b = ops.nasty_rhs(k2, jnp.where(d > 1e-10 * d[0], d, 0.0), U)
        x, relres = ops.sym_solve(H, b, method="ladder", tol=1e-8)
        assert float(relres) < 1e-7


class TestEigSolve:
    def test_spd_exact(self, key):
        k1, k2 = jax.random.split(key)
        n = 30
        H = ops.random_spd(k1, n, cond=1e4)
        x0 = jax.random.normal(k2, (n,))
        x, relres = ops.sym_solve_eig(H, H @ x0)
        assert _rel_err(x, x0) < 1e-8
        assert float(relres) < 1e-10

    def test_indefinite(self, key):
        k1, k2 = jax.random.split(key)
        n = 30
        U = ops.random_orthogonal(k1, n)
        d = jnp.linspace(-2.0, 3.0, n)
        d = jnp.where(jnp.abs(d) < 0.1, 0.5, d)  # keep away from 0
        H = (U * d[None, :]) @ U.T
        x0 = jax.random.normal(k2, (n,))
        x, relres = ops.sym_solve_eig(H, H @ x0)
        assert _rel_err(x, x0) < 1e-8


class TestKKT:
    # KktTest.scala:117-272: generate (x, w), derive (q, b), solve, compare
    def _roundtrip(self, key, n, p, cond, method, hess_kernel=0):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        H = ops.random_spd(k1, n, cond=cond, dim_kernel=hess_kernel)
        H = 0.5 * (H + H.T)
        A = jax.random.normal(k2, (p, n))
        x0 = jax.random.normal(k3, (n,))
        w0 = jax.random.normal(k4, (p,))
        q = -(H @ x0 + A.T @ w0)
        b = A @ x0
        x, w, relres = ops.kkt_solve(H, A, q, b, method=method)
        return x, w, relres, x0, w0

    @pytest.mark.parametrize("method", ["chol", "aug", "ladder"])
    def test_pd_roundtrip(self, key, method):
        x, w, relres, x0, w0 = self._roundtrip(key, 40, 8, 1e6, method)
        assert float(relres) < 1e-8
        assert _rel_err(x, x0) < 1e-6
        assert _rel_err(w, w0) < 1e-6

    @pytest.mark.parametrize("method", ["aug", "ladder"])
    def test_singular_h(self, key, method):
        # LP/phase-I style: H has a nontrivial kernel; only the aug transform
        # or the ladder can solve it (SURVEY.md section 7.3 'singular-H
        # problems are routine')
        x, w, relres, x0, w0 = self._roundtrip(
            key, 40, 8, 1e4, method, hess_kernel=6
        )
        assert float(relres) < 1e-7

    def test_zero_hessian_lp(self, key):
        # pure LP KKT: H = 0 entirely; [0 A^T; A 0] is solvable iff q in im(A^T)
        n, p = 10, 4
        k1, k2, k3 = jax.random.split(key, 3)
        A = jax.random.normal(k1, (p, n))
        x0 = jax.random.normal(k2, (n,))
        w0 = jax.random.normal(k3, (p,))
        H = jnp.zeros((n, n))
        q = -(A.T @ w0)
        b = A @ x0
        x, w, relres = ops.kkt_solve(H, A, q, b, method="aug")
        assert float(relres) < 1e-7

    def test_ill_conditioned_1e12(self, key):
        x, w, relres, x0, w0 = self._roundtrip(key, 60, 12, 1e12, "aug")
        assert float(relres) < 1e-6

    def test_batched_vmap(self, key):
        keys = jax.random.split(key, 16)

        def make(k):
            k1, k2, k3, k4 = jax.random.split(k, 4)
            H = ops.random_spd(k1, 20, cond=1e5)
            A = jax.random.normal(k2, (4, 20))
            x0 = jax.random.normal(k3, (20,))
            w0 = jax.random.normal(k4, (4,))
            return H, A, -(H @ x0 + A.T @ w0), A @ x0, x0, w0

        H, A, q, b, x0, w0 = jax.vmap(make)(keys)
        solve = jax.vmap(lambda H, A, q, b: ops.kkt_solve(H, A, q, b,
                                                          method="aug"))
        x, w, relres = solve(H, A, q, b)
        assert float(jnp.max(relres)) < 1e-7
        assert float(jnp.max(jnp.abs(x - x0))) < 1e-5


class TestNullspace:
    # MatrixUtilsTests.scala:206-234 (underdetermined solve)
    def test_solution_space(self, key):
        k1, k2 = jax.random.split(key)
        p, n = 4, 12
        A = jax.random.normal(k1, (p, n))
        b = jax.random.normal(k2, (p,))
        ss = ops.solution_space(A, b)
        assert float(jnp.linalg.norm(A @ ss.z0 - b)) < 1e-10
        assert float(jnp.linalg.norm(A @ ss.F)) < 1e-10
        # F orthonormal
        assert jnp.allclose(ss.F.T @ ss.F, jnp.eye(n - p), atol=1e-10)
        # parameter() round-trips points in the affine space
        u = jax.random.normal(k2, (n - p,))
        x = ss.point(u)
        assert float(jnp.linalg.norm(ss.parameter(x) - u)) < 1e-10


class TestSignCombinations:
    def test_counts(self):
        M = ops.sign_combination_matrix(3)
        assert M.shape == (8, 3)
        assert len({tuple(r) for r in M.tolist()}) == 8


class TestMiscHelpers:
    def test_hs_norm_and_symmetry(self, key):
        A = jax.random.normal(key, (5, 5))
        assert abs(float(ops.hs_norm(A))
                   - float(jnp.linalg.norm(A))) < 1e-12
        S = A + A.T
        assert bool(ops.check_symmetric(S))
        assert not bool(ops.check_symmetric(A))

    def test_condition_number(self, key):
        H = ops.random_spd(key, 20, cond=1e6)
        c = float(ops.condition_number(H))
        assert 1e5 < c < 1e7
