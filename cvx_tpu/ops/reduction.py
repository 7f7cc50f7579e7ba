"""Free-variable elimination for KKT systems.

Re-design of cvx/KKTData.scala (:32-135): a coordinate j is FREE when column
(and row) j of H is zero, column j of A is zero, and q_j = 0 — then the KKT
system puts no condition on x_j and the reduced system (those rows/columns
dropped) is solved instead, with zeros re-inserted afterwards
(``paddVector``, KKTData.scala:113-127).

Shapes are static under XLA, so the free set is detected HOST-SIDE from
concrete arrays (this is a construction-time transformation, exactly like
the reference which only exercises it from tests / problem setup; the main
solvers handle zero rows through regularization instead — docs/README.txt:
35-50).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class UnsolvableSystemError(Exception):
    """q has a nonzero entry at a free coordinate: Hx + A^T w = -q is
    unsolvable (cvx/UnsolvableSystemException.scala)."""


def free_coordinates(H, A, tol: float = 0.0) -> np.ndarray:
    """Boolean mask of free coordinates (KKTData.scala:68-93).  Host-side."""
    H = np.asarray(H)
    A = np.asarray(A)
    col_zero = np.all(np.abs(H) <= tol, axis=0)
    row_zero = np.all(np.abs(H) <= tol, axis=1)
    a_zero = (np.all(np.abs(A) <= tol, axis=0)
              if A.shape[0] > 0 else np.ones(H.shape[1], bool))
    return col_zero & row_zero & a_zero


def reduce_kkt(H, A, q, tol: float = 0.0):
    """Drop free rows/columns.  Returns (H_r, A_r, q_r, keep_idx).

    Raises UnsolvableSystemError when q is nonzero on a free coordinate.
    """
    free = free_coordinates(H, A, tol)
    qn = np.asarray(q)
    if np.any(np.abs(qn[free]) > tol):
        raise UnsolvableSystemError(
            "q nonzero at free coordinates " +
            str(np.nonzero(free & (np.abs(qn) > tol))[0].tolist())
        )
    keep = np.nonzero(~free)[0]
    H = jnp.asarray(H)
    A = jnp.asarray(A)
    q = jnp.asarray(q)
    return (H[jnp.ix_(keep, keep)],
            A[:, keep] if A.shape[0] > 0 else A,
            q[keep], keep)


def pad_solution(x_reduced, keep_idx, n: int) -> jax.Array:
    """Re-insert zeros at the eliminated coordinates
    (KKTData.scala:113-127)."""
    x = jnp.zeros((n,), x_reduced.dtype)
    return x.at[jnp.asarray(keep_idx)].set(x_reduced)
