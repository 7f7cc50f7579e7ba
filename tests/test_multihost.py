"""REAL multi-host path: 2 processes x 4 virtual CPU devices, wired by
``jax.distributed.initialize`` through ``parallel.mesh.init_distributed``.

Round-3 verdict item 5: every other parallel test uses the single-process
8-device mesh, so the coordinator/process_id code path (and the cross-
process collectives of shard_solve / the sharded Schur solver) had never
executed.  Here two spawned workers build the global mesh, solve, allgather,
and the result must match the single-process computation bit-for-bit-ish.
"""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(600)
def test_two_process_distributed_matches_single(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    out = str(tmp_path / "multihost.npz")

    env = dict(os.environ)
    # the workers set their own XLA_FLAGS/platform; scrub the test
    # process's 8-device flag so each worker gets exactly 4
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, "2", str(pid), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]
    assert os.path.exists(out)
    data = np.load(out)

    # single-process reference on this process's own 8 virtual devices
    from cvx_tpu import parallel
    from cvx_tpu.models import DistKL
    from cvx_tpu.parallel.schur import schur_kkt_solve
    from cvx_tpu.solvers import SolverParams

    n, batch = 16, 8
    nA = 3
    I_A = np.zeros(n); I_A[:nA] = 1.0
    I_B = np.zeros(n); I_B[n // 2:] = 1.0
    H = jnp.asarray(np.stack([-I_A, I_B]))
    pA = jnp.linspace(0.5 * nA / n, 0.9 * nA / n, batch)
    pB = jnp.full((batch,), 0.7)
    pars = SolverParams(max_iter=20, tol=1e-6, kkt_method="chol",
                        kkt_refine=1)

    def solve_one(pA_i, pB_i):
        u = jnp.stack([-pA_i, pB_i])
        prob = DistKL.create(n, H=H, u=u)
        x0 = jnp.full((n,), 1.0 / n)
        return prob.solve_jittable(x0, method="BR", pars=pars).x

    xs_ref = jax.jit(jax.vmap(solve_one))(pA, pB)
    assert np.allclose(data["xs"], np.asarray(xs_ref), atol=1e-10), (
        np.max(np.abs(data["xs"] - np.asarray(xs_ref))))

    K, nb, p = 8, 6, 2
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    M = jax.random.normal(ks[0], (K, nb, nb)) / np.sqrt(nb)
    Hb = jnp.einsum("kij,klj->kil", M, M) + 2.0 * jnp.eye(nb)[None]
    C = jax.random.normal(ks[1], (K, p, nb)) / np.sqrt(nb)
    q = jax.random.normal(ks[2], (K, nb))
    dx_ref, w_ref = schur_kkt_solve(Hb, C, q, jnp.zeros((p,)))
    assert np.allclose(data["dx"], np.asarray(dx_ref), atol=1e-10)
    assert np.allclose(data["w"], np.asarray(w_ref), atol=1e-10)
