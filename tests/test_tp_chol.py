"""Tensor-parallel sharded Cholesky / KKT: sharded == jnp.linalg.

SURVEY.md section 2.4 (TP row): a 2-D-sharded Hessian/KKT factorization for
one large dense instance, correctness-tested on the 8-device CPU mesh
against the single-device reference at n = 2048.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cvx_tpu.parallel import instance_mesh
from cvx_tpu.parallel.tp_chol import (make_sharded_cholesky,
                                      make_sharded_chol_solve,
                                      make_tp_kkt_solver)


def _spd(key, n, dtype=jnp.float64):
    M = jax.random.normal(key, (n, n), dtype) / np.sqrt(n)
    return M @ M.T + 2.0 * jnp.eye(n, dtype=dtype)


class TestShardedCholesky:
    def test_matches_local_n2048(self, key):
        n = 2048
        H = _spd(key, n)
        mesh = instance_mesh(8, axis="tp")
        chol = make_sharded_cholesky(mesh, n, block=128)
        L = chol(H)
        L_ref = jnp.linalg.cholesky(H)
        err = float(jnp.max(jnp.abs(L - L_ref)))
        assert err < 1e-9, err

    def test_solve_matches_n1024(self, key):
        n, nrhs = 1024, 3
        k1, k2 = jax.random.split(key)
        H = _spd(k1, n)
        B = jax.random.normal(k2, (n, nrhs))
        mesh = instance_mesh(8, axis="tp")
        L = make_sharded_cholesky(mesh, n, block=64)(H)
        X = make_sharded_chol_solve(mesh, n, block=64)(L, B)
        X_ref = jnp.linalg.solve(H, B)
        assert float(jnp.max(jnp.abs(X - X_ref))) < 1e-8

    def test_shape_validation(self):
        mesh = instance_mesh(8, axis="tp")
        try:
            make_sharded_cholesky(mesh, 1000, block=128)
        except ValueError as e:
            assert "divisible" in str(e)
        else:
            raise AssertionError("expected ValueError")


class TestTpKkt:
    def test_kkt_round_trip_n1024(self, key):
        """Generate (x, w), derive (q, b), solve distributed, compare —
        the KktTest.scala:117-147 round-trip at mesh scale."""
        n, p = 1024, 4
        ks = jax.random.split(key, 4)
        H = _spd(ks[0], n)
        A = jax.random.normal(ks[1], (p, n)) / np.sqrt(n)
        x_true = jax.random.normal(ks[2], (n,))
        w_true = jax.random.normal(ks[3], (p,))
        q = -(H @ x_true + A.T @ w_true)
        b = A @ x_true

        mesh = instance_mesh(8, axis="tp")
        kkt = make_tp_kkt_solver(mesh, n, p, block=64)
        x, w = kkt(H, A, q, b)
        assert float(jnp.max(jnp.abs(x - x_true))) < 1e-7
        assert float(jnp.max(jnp.abs(w - w_true))) < 1e-7
