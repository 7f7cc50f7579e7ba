"""Instance-batch parallel solving: vmap on one chip, shard_map across chips.

The reference solves one problem at a time (SURVEY.md section 2.4 'DP');
here the whole interior-point solve is a pure function of the problem-data
pytree, so:

  * ``vmap_solve``  — thousands of same-shape instances on ONE chip
    (north-star config 4),
  * ``shard_solve`` — the same batch split over a mesh axis with shard_map;
    each device runs the vmapped solver on its shard, no cross-device
    communication during the solve (embarrassingly parallel; collectives
    only appear in the Schur-consensus solver, see schur.py).
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def vmap_solve(solve_fn: Callable) -> Callable:
    """jit(vmap(solve_fn)) over the leading axis of every argument."""
    return jax.jit(jax.vmap(solve_fn))


def shard_solve(solve_fn: Callable, mesh: Mesh, axis: str = "dp") -> Callable:
    """Shard the batch axis over ``mesh`` and run the vmapped solver
    per-device.  Batch size must be divisible by the mesh axis size."""
    vsolve = jax.vmap(solve_fn)
    spec = P(axis)
    sharded = shard_map(vsolve, mesh=mesh, in_specs=spec, out_specs=spec,
                        check_vma=False)
    return jax.jit(sharded)
