"""Pallas batched blocked Cholesky factorization for TPU.

The north-star hot kernel (BASELINE.json): batched KKT factorization for
thousands of moderate-size (n ~ 100, padded to 128) instances.  This is the
TPU-native analogue of the reference's LAPACK ``dpotrf`` boundary
(cvx/MatrixUtils.scala:452-461 via Breeze ``cholesky``).

Design: one grid program factors a TILE of ``bt`` instances held in VMEM.
Within the tile, a right-looking blocked algorithm:

  for each column block kb (width BK):
    1. factor the diagonal block with BK vectorized-over-instances scalar
       steps (VPU; work bt*BK^2 per step — negligible),
    2. panel update of the columns below via the same recurrence (VPU),
    3. trailing-submatrix update  M -= L_panel @ L_panel^T  as one batched
       matmul over the full (padded) width with masking (MXU).

All shapes are static and aligned to the 128-lane requirement; the input is
zero-padded to a multiple of (128, 128) with identity on the padded diagonal
so the factorization is well defined.

``cholesky_batched(x, method=...)`` dispatches between this kernel and the
XLA built-in (``lax.linalg.cholesky``), which is also the CPU/interpret
fallback — the bench picks the faster path on real hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _chol_tile_kernel(m_ref, l_ref, *, n: int, bk: int):
    """Factor a (bt, n, n) tile in VMEM.  n multiple of bk; bk <= 128."""
    M = m_ref[...]  # (bt, n, n)
    bt = M.shape[0]
    dtype = M.dtype
    nblocks = n // bk

    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)

    def col_step(j, M):
        """One scalar column step of right-looking Cholesky, vectorized over
        the instance axis; operates on columns [j] and uses masking so the
        shapes stay static."""
        dj = jnp.sqrt(M[:, j, j])[:, None]              # (bt, 1)
        col = M[:, :, j] / dj                            # (bt, n)
        rr = lax.broadcasted_iota(jnp.int32, (n,), 0)
        col = jnp.where(rr >= j, col, 0.0)               # zero above diag
        # write the j-th column of L and subtract the rank-1 update from the
        # trailing submatrix (mask to r > j, c > j)
        upd = col[:, :, None] * col[:, None, :]          # (bt, n, n)
        keep = jnp.logical_and(rows > j, cols > j)
        M = M - jnp.where(keep[None], upd, 0.0)
        # store column j (set row j..n-1 of column j to col)
        M = M.at[:, :, j].set(col)
        return M

    def block_step(kb, M):
        j0 = kb * bk

        # 1+2: bk scalar steps handle the diagonal block AND the panel below
        # in one pass (the column recurrence is exact for the whole column);
        # the trailing update inside col_step is restricted to this block's
        # span to keep the O(n^2 bk) work on the VPU small, then the full
        # trailing update is done as a single MXU matmul.
        def inner(i, M):
            j = j0 + i
            dj = jnp.sqrt(M[:, j, j])[:, None]
            col = M[:, :, j] / dj
            rr = lax.broadcasted_iota(jnp.int32, (n,), 0)
            col = jnp.where(rr >= j, col, 0.0)
            # rank-1 update only within the current column block's columns
            upd = col[:, :, None] * col[:, None, :]
            keep = jnp.logical_and(
                jnp.logical_and(rows > j, cols > j), cols < j0 + bk
            )
            M = M - jnp.where(keep[None], upd, 0.0)
            M = M.at[:, :, j].set(col)
            return M

        M = lax.fori_loop(0, bk, inner, M)

        # 3: trailing update  M[:, r>j1, c>j1] -= P @ P^T  with the panel
        # P = L[:, :, j0:j0+bk] masked to rows > j1 (static slice: bk cols)
        j1 = j0 + bk

        def trailing(M):
            P = lax.dynamic_slice(
                M, (0, 0, j0), (bt, n, bk)
            )  # (bt, n, bk) — columns j0..j1-1 of L
            rr = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
            P = jnp.where(rr >= j1, P, 0.0)
            upd = lax.dot_general(
                P, P,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=dtype,
            )  # (bt, n, n)
            keep = jnp.logical_and(rows >= j1, cols >= j1)
            return M - jnp.where(keep[None], upd, 0.0)

        M = lax.cond(kb + 1 < nblocks, trailing, lambda M: M, M)
        return M

    M = lax.fori_loop(0, nblocks, block_step, M)
    # zero the strict upper triangle
    l_ref[...] = jnp.where((rows >= cols)[None], M, jnp.zeros_like(M))


@functools.partial(jax.jit, static_argnames=("bk", "bt", "interpret"))
def cholesky_batched_pallas(
    x: jax.Array, *, bk: int = 32, bt: int = 8, interpret: bool = False
) -> jax.Array:
    """Batched lower-Cholesky of ``x`` (B, n, n) SPD; returns (B, n, n).

    Pads n up to a multiple of 128 (identity on the pad diagonal) and the
    batch up to a multiple of ``bt``.
    """
    B, n, _ = x.shape
    dtype = x.dtype
    npad = _round_up(max(n, bk), 128 if not interpret else bk)
    bpad = _round_up(B, bt)

    xp = jnp.zeros((bpad, npad, npad), dtype)
    xp = xp.at[:, jnp.arange(npad), jnp.arange(npad)].set(1.0)
    xp = xp.at[:B, :n, :n].set(x)

    grid = (bpad // bt,)
    out = pl.pallas_call(
        functools.partial(_chol_tile_kernel, n=npad, bk=bk),
        out_shape=jax.ShapeDtypeStruct((bpad, npad, npad), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, npad, npad), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, npad, npad), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(xp)
    return out[:B, :n, :n]


def cholesky_batched(x: jax.Array, method: str = "xla", **kw) -> jax.Array:
    """Batched Cholesky dispatch: "xla" (lax.linalg) or "pallas"."""
    if method == "xla":
        return lax.linalg.cholesky(x)
    if method == "pallas":
        return cholesky_batched_pallas(x, **kw)
    raise ValueError(f"unknown cholesky method: {method!r}")
