"""Worker process for the REAL multi-host test (tests/test_multihost.py).

Each of two processes owns 4 virtual CPU devices; jax.distributed wires
them into one 8-device world through ``parallel.mesh.init_distributed`` —
the coordinator/process_id code path that single-process mesh tests never
execute (SURVEY.md section 4: "multi-host tests on a CPU mesh via
jax.distributed").

Usage:  python tests/_multihost_worker.py <coordinator> <n_procs> <pid> <out>
Process 0 writes an .npz with the sharded-solve results gathered globally.
"""

import os
import sys

# strip any inherited device-count flag first: duplicate conflicting
# flags would make the 4-local-device assert depend on XLA's resolution
# order (the parent test scrubs XLA_FLAGS, standalone runs may not)
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    _flags + ["--xla_force_host_platform_device_count=4"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    coordinator, n_procs, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    from cvx_tpu.parallel.mesh import init_distributed

    n_seen = init_distributed(coordinator, num_processes=n_procs,
                              process_id=pid)
    assert n_seen == n_procs, (n_seen, n_procs)
    assert len(jax.devices()) == 4 * n_procs, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from cvx_tpu import parallel
    from cvx_tpu.models import DistKL
    from cvx_tpu.parallel.schur import make_sharded_schur_solver
    from cvx_tpu.solvers import SolverParams

    # ---- dp: instance-sharded KL solve over the GLOBAL 8-device mesh ----
    n, batch = 16, 8
    nA = 3
    I_A = np.zeros(n); I_A[:nA] = 1.0
    I_B = np.zeros(n); I_B[n // 2:] = 1.0
    H = jnp.asarray(np.stack([-I_A, I_B]))
    pA = jnp.linspace(0.5 * nA / n, 0.9 * nA / n, batch)
    pB = jnp.full((batch,), 0.7)
    pars = SolverParams(max_iter=20, tol=1e-6, kkt_method="chol",
                        kkt_refine=1)
    mesh = parallel.instance_mesh(axis="dp")       # all 8 global devices

    def solve_one(pA_i, pB_i):
        u = jnp.stack([-pA_i, pB_i])
        prob = DistKL.create(n, H=H, u=u)
        x0 = jnp.full((n,), 1.0 / n)
        return prob.solve_jittable(x0, method="BR", pars=pars).x

    sharded = parallel.shard_solve(solve_one, mesh, axis="dp")
    xs = sharded(pA, pB)                           # (batch, n), P("dp")
    xs_global = multihost_utils.process_allgather(xs, tiled=True)

    # ---- blocks: sharded Schur KKT solve over the global mesh ----
    K, nb, p = 8, 6, 2
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    M = jax.random.normal(ks[0], (K, nb, nb)) / np.sqrt(nb)
    Hb = jnp.einsum("kij,klj->kil", M, M) + 2.0 * jnp.eye(nb)[None]
    C = jax.random.normal(ks[1], (K, p, nb)) / np.sqrt(nb)
    q = jax.random.normal(ks[2], (K, nb))
    rhs = jnp.zeros((p,))
    bmesh = parallel.block_mesh(axis="blocks")
    solver = make_sharded_schur_solver(bmesh, axis="blocks")
    dx, w = solver(Hb, C, q, rhs)
    dx_global = multihost_utils.process_allgather(dx, tiled=True)
    # w is replicated but check_vma=False leaves it non-fully-addressable;
    # tiled gather returns identical copies — keep the first p entries
    w_global = np.asarray(
        multihost_utils.process_allgather(w, tiled=True)).reshape(-1)[:p]

    if pid == 0:
        np.savez(out_path, xs=np.asarray(xs_global),
                 dx=np.asarray(dx_global), w=w_global)
    multihost_utils.sync_global_devices("done")
    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
