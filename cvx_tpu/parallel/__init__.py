"""Parallel/distributed layer (SURVEY.md sections 2.4, 5.7, 5.8): vmap
instance batching, mesh sharding via shard_map, and Schur-complement
consensus for block-separable programs.  The reference has no parallelism at
all; this layer is new capability mandated by the north star."""

from .batch import shard_solve, vmap_solve
from .constraint_shard import (barrier_solve_msharded,
                               barrier_solve_msharded_cnts,
                               primal_dual_solve_msharded)
from .mesh import (block_mesh, init_distributed, instance_mesh,
                   shard_batch)
from .schur import (SeparableProblem, make_sharded_schur_solver,
                    schur_kkt_solve, separable_barrier_solve)
from .tp_chol import (make_sharded_cholesky, make_sharded_chol_solve,
                      make_tp_kkt_solver)

__all__ = [
    "shard_solve", "vmap_solve", "barrier_solve_msharded",
    "barrier_solve_msharded_cnts", "primal_dual_solve_msharded",
    "block_mesh", "init_distributed", "instance_mesh",
    "shard_batch", "SeparableProblem", "make_sharded_schur_solver",
    "schur_kkt_solve", "separable_barrier_solve",
    "make_sharded_cholesky", "make_sharded_chol_solve",
    "make_tp_kkt_solver",
]
