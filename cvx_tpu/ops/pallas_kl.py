"""Pallas-fused structured KL barrier solve: the WHOLE solver in one kernel.

The structured barrier path (solvers/structured.py) reduced the flagship
batch solve to ~5200 small XLA kernel launches — launch overhead, not FLOPs,
is the bottleneck (measured: 194 ms for 10k instances where the arithmetic
is ~10 GFLOP).  This kernel runs the ENTIRE solve — barrier continuation,
structured (Woodbury + Schur) Newton steps, vectorized line search — inside
one ``pallas_call``: each grid program holds a tile of ``bt`` instances in
VMEM and executes a fixed schedule of ``n_outer x n_inner`` Newton steps
with the barrier parameter t = t0 * mu^stage.  Converged instances simply
take ~zero-length steps (fixed-cost, branch-free schedule).

Problem form (the Dist_KL primal, k scenario rows, p equality rows):

    min  x . log(n x)   s.t.  Hs x <= u,  x > 0,  A x = b.

Restrictions (flagship shapes): k <= 2 and p == 1 — the (k,k) Woodbury and
(p,p) Schur inverses are closed-form (adjugate), which Mosaic lowers
trivially.  n is padded to a lane multiple with inert coordinates.

Reference parity: this is the fused TPU materialization of the barrier
recipe in cvx/BarrierSolver.scala + cvx/KKTSystem.scala specialized by the
structure argument of KKTSystem.scala:17-21.

MEASURED (TPU v5e, 10k instances, n=100, f32, best-of-3 chained execution;
closed-form feasible-step bound, n_ls = 12 candidates, mu = 55 with 3
Newton steps/stage — see docs/SCALING.md for the single table of record;
the 66 ms figure below carries the pre-round-3 timing methodology — see
README "Measured headline"; the structured row is the round-3 honest
re-measurement):

    XLA structured path (solvers/structured.py):   138 ms / batch solve
    this fused kernel:                              66 ms / batch solve

The TPU bench DEFAULT is the fused DUAL kernel (ops/pallas_kl_dual.py,
bench.py BENCH_METHOD=dual_fused), which beats this primal kernel ~10x;
this kernel remains the fastest PRIMAL route (BENCH_METHOD=fused).  Two
earlier kernel formulations were killed by Mosaic behavior worth recording:
(a) tiny-dimension tensors ((bt,k,k) matrices, 4-D broadcast-reduces) get
scalarized, ~1000x slower; the current version unrolls the k<=2/p=1 algebra
into (bt, n) rows and (bt, 1) scalars; (b) jnp.stack/scalar-extraction on
small tensors and reductions over both trailing dims fail to lower.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from .cholesky import default_delta
from ._pad import round_up as _round_up


def fused_n_outer(m_total: int, *, t0: float = 1.0, mu: float = 30.0,
                  tol: float = 1e-8) -> int:
    """Number of continuation stages so the terminal central-path bound
    m/t = m_total / (t0 * mu^(n_outer-1)) is below ``tol``.  Shared by the
    kernel and by callers that need the terminal t for the measured
    duality-gap certificate (models/dist_kl.py::kl_dual_gap)."""
    import math

    return max(2, math.ceil(
        math.log(m_total / (tol * t0)) / math.log(mu)) + 1)


def fused_final_t(m_total: int, *, t0: float = 1.0, mu: float = 30.0,
                  tol: float = 1e-8, n_outer: int | None = None) -> float:
    """Terminal barrier parameter of the fixed fused schedule."""
    if n_outer is None:
        n_outer = fused_n_outer(m_total, t0=t0, mu=mu, tol=tol)
    return t0 * mu ** (n_outer - 1)


def _kl_fused_kernel(hs_ref, u_ref, a_ref, b_ref, x0_ref, x_ref, *,
                     n: int, k: int, p: int, n_valid: int, t0: float,
                     mu: float, n_outer: int, n_inner: int, alpha: float,
                     n_ls: int, beta: float, eps_mach: float):
    """Fully unrolled over the k scenario rows and p equality rows.

    Mosaic lowers tiny-dimension tensors ((bt, k, k) matrices, 4-D
    broadcast-reduces) to scalar code — measured ~1000x slower than the
    same math as (bt, n) row vectors and (bt, 1) scalars.  So the k <= 2,
    p = 1 algebra is written out row by row: every array in the body is
    (bt, n), (bt, 1) or (bt, n_ls, n) — natively tileable layouts.
    """
    assert p == 1, "fused kernel: exactly one equality row (sum-to-one)"
    Hs = hs_ref[...]          # (bt, k, n)
    u = u_ref[...]            # (bt, k)
    A = a_ref[...]            # (bt, 1, n)
    bb = b_ref[...]           # (bt, 1)
    x = x0_ref[...]           # (bt, n)
    dtype = x.dtype

    rows = [Hs[:, j, :] for j in range(k)]          # k x (bt, n)
    ubs = [u[:, j:j + 1] for j in range(k)]         # k x (bt, 1)
    a0 = A[:, 0, :]                                 # (bt, n)

    valid = (lax.broadcasted_iota(jnp.int32, (1, n), 1) < n_valid
             ).astype(dtype)                        # (1, n)
    nv = jnp.asarray(float(n_valid), dtype)
    lognv = jnp.log(nv)
    kk = jnp.arange(n_ls)
    expo = jnp.where(kk < 32, kk, 32 + 3 * (kk - 32)).astype(dtype)
    ls_ts = beta ** expo                            # (n_ls,)
    delta = default_delta(dtype)

    def rdot(a, b):
        """row-wise dot: (bt, n) x (bt, n) -> (bt, 1)"""
        return jnp.sum(a * b, axis=1, keepdims=True)

    def step(i, x):
        stage = (i // n_inner).astype(dtype)
        t = t0 * jnp.exp(stage * jnp.log(jnp.asarray(mu, dtype)))

        ds = [ubs[j] - rdot(rows[j], x) for j in range(k)]   # (bt,1) each
        inv_ds = [1.0 / dj for dj in ds]
        logx = jnp.log(x)
        g = t * (1.0 + lognv + logx) - 1.0 / x
        for j in range(k):
            g = g + rows[j] * inv_ds[j]
        g = g * valid
        h = (t / x + 1.0 / (x * x)) * valid + (1.0 - valid)
        inv_h = 1.0 / h

        # Woodbury (k x k) with explicit scalars:
        # M_jl = d_j^2 [j==l] + sum_i rows_j rows_l / h
        uds = [rows[j] * inv_h for j in range(k)]            # (bt, n)
        if k == 2:
            m00 = rdot(uds[0], rows[0]) + ds[0] * ds[0]
            m11 = rdot(uds[1], rows[1]) + ds[1] * ds[1]
            m01 = rdot(uds[0], rows[1])
            sc = 0.5 * (jnp.abs(m00) + jnp.abs(m11))
            m00 = m00 + delta * sc
            m11 = m11 + delta * sc
            det = m00 * m11 - m01 * m01
            i00, i01, i11 = m11 / det, -m01 / det, m00 / det

            def solveH(r):
                # H^-1 r = D^-1 r - D^-1 Hs^T M^-1 Hs D^-1 r
                s0 = rdot(uds[0], r)
                s1 = rdot(uds[1], r)
                y0 = i00 * s0 + i01 * s1
                y1 = i01 * s0 + i11 * s1
                return r * inv_h - uds[0] * y0 - uds[1] * y1
        else:  # k == 1
            m00 = rdot(uds[0], rows[0]) + ds[0] * ds[0]
            m00 = m00 * (1.0 + delta)
            i00 = 1.0 / m00

            def solveH(r):
                y0 = i00 * rdot(uds[0], r)
                return r * inv_h - uds[0] * y0

        Hig = solveH(g)
        Hia = solveH(a0)
        # no shift on S: a consistent Schur solve preserves the equality
        # exactly; shifting injects drift ~ delta * |A H^-1 g|
        S = rdot(a0, Hia)                       # (bt, 1), p = 1
        rhs_eq = bb - rdot(a0, x)
        wv = -(rhs_eq + rdot(a0, Hig)) / S
        dx = -(Hig + Hia * wv) * valid

        q = rdot(dx, g)                                       # (bt, 1)
        udxs = [rdot(rows[j], dx) for j in range(k)]          # (bt, 1)
        # closed-form max feasible step (constraints linear in s)
        sx = jnp.min(jnp.where(dx < 0, -x / dx, jnp.inf), axis=1,
                     keepdims=True)                           # (bt, 1)
        s_max = jnp.minimum(1.0 / 0.99, sx)
        for j in range(k):
            sj = jnp.where(udxs[j] > 0, ds[j] / udxs[j], jnp.inf)
            s_max = jnp.minimum(s_max, sj)
        s_max = 0.99 * s_max
        f0 = t * rdot(x, (lognv + logx) * valid) - rdot(logx, valid * jnp.ones_like(logx))
        for j in range(k):
            f0 = f0 - jnp.log(ds[j])

        # vectorized line-search candidates below s_max: (bt, n_ls, n)
        ss = s_max * ls_ts[None, :]                           # (bt, n_ls)
        xs = x[:, None, :] + ss[:, :, None] * dx[:, None, :]
        ok_x = jnp.all(jnp.logical_or(xs > 0, valid[None] == 0), axis=2)
        xs_safe = jnp.where(xs > 0, xs, 1.0)
        log_xs = jnp.log(xs_safe)
        fs = (t * jnp.sum(xs * (lognv + log_xs) * valid[None], axis=2)
              - jnp.sum(log_xs * valid[None], axis=2))        # (bt, n_ls)
        ok = ok_x
        for j in range(k):
            dsj = ds[j] - ss * udxs[j]                        # (bt, n_ls)
            ok = jnp.logical_and(ok, dsj > 0)
            fs = fs - jnp.log(jnp.where(dsj > 0, dsj, 1.0))
        armijo = fs <= f0 + alpha * ss * q
        acc = jnp.logical_and(ok, armijo)
        s_cand = jnp.where(acc, ss, 0.0)
        s_best = jnp.max(s_cand, axis=1, keepdims=True)
        s_best = jnp.where(q < -eps_mach, s_best, 0.0)
        # guard the no-step case: dx may be non-finite once an instance's
        # margins drop below this dtype's resolution; 0 * NaN = NaN
        return jnp.where(s_best > 0, x + s_best * dx, x)

    # int32 loop bounds: with jax_enable_x64 the Python ints would trace
    # as i64 counters, which Mosaic fails to legalize on TPU
    x = lax.fori_loop(jnp.int32(0), jnp.int32(n_outer * n_inner), step, x)
    x_ref[...] = x * valid


@functools.partial(
    jax.jit,
    static_argnames=("t0", "mu", "tol", "n_outer", "n_inner", "alpha",
                     "beta", "n_ls", "bt", "interpret"))
def kl_barrier_fused(
    Hs: jax.Array,   # (B, k, n)
    u: jax.Array,    # (B, k)
    A: jax.Array,    # (B, p, n)
    b: jax.Array,    # (B, p)
    x0: jax.Array,   # (B, n)
    *,
    t0: float = 1.0,
    mu: float = 30.0,
    tol: float = 1e-8,
    n_outer: int | None = None,
    n_inner: int = 8,
    alpha: float = 0.04,
    beta: float = 0.8,
    n_ls: int = 12,
    bt: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Solve a batch of KL problems entirely inside one Pallas kernel.

    Returns x (B, n).  The continuation schedule is fixed: n_outer stages
    (derived from ``tol`` unless given) with n_inner Newton steps each; the
    terminal duality gap is (k + n) / (t0 * mu^(n_outer-1)).  Over-annealing
    past the target is avoided deliberately — at extreme t the active-
    constraint margins (~1/t) underflow the closed-form 2x2 algebra.
    """
    B, k, n = Hs.shape
    p = A.shape[1]
    if n_outer is None:
        n_outer = fused_n_outer(k + n, t0=t0, mu=mu, tol=tol)
    if not (1 <= k <= 2) or p != 1:
        raise ValueError(
            f"fused kernel supports 1 <= k <= 2 scenario rows (got k={k}) "
            f"and exactly p = 1 equality row (got p={p}); use "
            "DistKL.solve(method='fused') which falls back to the "
            "structured XLA path for other shapes")
    # trace the f32 (TPU) path in x32: under jax_enable_x64 weak Python
    # ints become i64 scalars, which Mosaic fails to legalize; f64 inputs
    # (CPU interpret tests) keep x64 tracing (see ops/pallas_kl_dual.py)
    if Hs.dtype == jnp.float32:
        with jax.enable_x64(False):
            return _kl_barrier_fused_x32(
                Hs, u, A, b, x0, t0=t0, mu=mu, n_outer=n_outer,
                n_inner=n_inner, alpha=alpha, beta=beta, n_ls=n_ls, bt=bt,
                interpret=interpret)
    return _kl_barrier_fused_x32(
        Hs, u, A, b, x0, t0=t0, mu=mu, n_outer=n_outer,
        n_inner=n_inner, alpha=alpha, beta=beta, n_ls=n_ls, bt=bt,
        interpret=interpret)


def _kl_barrier_fused_x32(Hs, u, A, b, x0, *, t0, mu, n_outer, n_inner,
                          alpha, beta, n_ls, bt, interpret):
    B, k, n = Hs.shape
    p = A.shape[1]
    dtype = Hs.dtype
    lane = 128 if not interpret else 8
    npad = _round_up(n, lane)
    bpad = _round_up(B, bt)

    def pad(arr, fill=0.0):
        out = jnp.full((bpad,) + arr.shape[1:-1] + (npad,), fill, dtype)
        out = out.at[:B, ..., :n].set(arr)
        return out

    Hs_p = pad(Hs)
    A_p = pad(A)
    x0_p = pad(x0, fill=1.0)
    u_p = jnp.zeros((bpad, k), dtype).at[:B].set(u)
    b_p = jnp.zeros((bpad, p), dtype).at[:B].set(b)
    # pad instances beyond B with benign data (uniform problem)
    if bpad > B:
        # benign filler instances: uniform distribution problem
        u_p = u_p.at[B:].set(1.0)
        b_p = b_p.at[B:, :].set(1.0)
        A_p = A_p.at[B:, :, :n].set(1.0)

    grid = (bpad // bt,)
    kern = functools.partial(
        _kl_fused_kernel, n=npad, k=k, p=p, n_valid=n, t0=t0, mu=mu,
        n_outer=n_outer, n_inner=n_inner, alpha=alpha, n_ls=n_ls, beta=beta,
        eps_mach=float(jnp.finfo(dtype).eps))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bpad, npad), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, k, npad), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, k), lambda i: (i, 0)),
            pl.BlockSpec((bt, p, npad), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, p), lambda i: (i, 0)),
            pl.BlockSpec((bt, npad), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bt, npad), lambda i: (i, 0)),
        interpret=interpret,
    )(Hs_p, u_p, A_p, b_p, x0_p)
    return out[:B, :n]
