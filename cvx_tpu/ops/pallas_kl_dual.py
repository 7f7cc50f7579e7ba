"""Pallas-fused KL DUAL solve: the whole projected-Newton dual in one kernel.

The XLA dual_fast route (models/dist_kl.py::solve_dual_newton) runs ~40
small kernels per Newton step — at 10k instances the batch solve is ~90%
launch overhead (measured 25 ms where the arithmetic is ~3 ms).  This
kernel executes the ENTIRE fixed-schedule active-set projected-Newton dual
solve inside one ``pallas_call``: each grid program holds a (bt, n) tile of
instances in VMEM and iterates

    y      = p exp(-(B'z) - 1)   (uniform p: 1/(n e))  (bt, n)
    grad   = w - B y                                   dim x (bt, 1)
    hess   = B diag(y) B'  (unrolled scalar Cholesky)  dim(dim+1)/2 x (bt,1)
    dz     = -Hf^-1 gf       (bound-active coords frozen)
    line search over halvings of the fraction-to-boundary step (one exp
    + cheap sqrts), value acceptance with a guarded exact quadratic-model
    fallback below the value-resolution floor

then recovers x = y / sum(y) and the measured in-kernel gap f(x) - g(z).

MEASURED (TPU v5e, 10k instances, n=100, f32, best-of-3 chained timing
with completion forced via the small gap leaf, table of record
docs/SCALING.md): **6.2 ms** per batch solve (1.61M instances/s, 161x the
north star) at certificate gap max ~3.8e-6 — vs the XLA dual_fast route
(launch-bound) and the fused primal barrier kernel (~10x slower;
compute-bound on barrier stages).  The CERTIFIED variant
(``kl_dual_fused_cert``: + double-single polish and in-kernel measured
certificate) does 10k in 9.95 ms at gap ~5e-14.

Shapes: B = [H; 1'; A] with k inequality rows, the sum-to-one equality and
mE extra equality rows; dual dim = k + 1 + mE <= 16 (the closed-form
2x2/3x3 adjugate handles dim <= 3; an unrolled scalar Cholesky handles
4-16 — straight-line code in scalar registers; beyond 8 the batch tile is
quartered to hold the dim x (bt, n) row-product working set in VMEM).
Round 5 widened the envelope from 8 to 16 — the reference's dual is
dimension-generic (Dist_KL.scala:59-65,114-165) and dim 9+ previously fell
off onto the launch-bound XLA route unmeasured.
Mosaic notes (same as ops/pallas_kl.py): all quantities are (bt, n) rows or
(bt, 1) scalars — tiny-dimension tensors ((bt, dim, dim) Newton systems)
would be scalarized ~1000x, so the small-system algebra is unrolled into
scalar registers.

Reference parity: Dist_KL.scala:59-65 (the dual is the preferred route),
:114-171 (closed forms, dim-generic); the active-set Newton replaces the
reference's barrier-on-the-dual with a direct bound-constrained solve.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from ._pad import round_up as _round_up

# widest dual dimension k + 1 + mE the fused kernels unroll in scalar
# registers; beyond this models/dist_kl.py falls back to the XLA
# dual_fast route
_FUSED_MAX_DIM = 16


def _tile_for_dim(bt: int, dim: int) -> int:
    """Batch-tile schedule by dual dimension (VMEM guard): the kernels'
    working set grows ~linearly with dim (the yh row-product cache and the
    ds epilogue's hi/lo products are dim x (bt, n) tiles) — bt=256 at
    dim 6 measured 18.6-20.4 MB against the 16 MB scoped-VMEM limit on
    v5e, and dim 16 at bt=64 measured 16.8 MB once the round-5 projected
    candidate's extra row landed.  Halve beyond dim 5, 8 and 12."""
    if dim > 5:
        bt = max(8, bt // 2)
    if dim > 8:
        bt = max(8, bt // 2)
    if dim > 12:
        bt = max(8, bt // 2)
    return bt


def _solve_small(m, gf, dim, dtype):
    """dz = -M^-1 gf for the scalar-register Newton system, plus a
    per-lane ``sick`` flag for (near-)singular free subspaces.

    ``m`` maps (i, j), i <= j, to the (bt, 1) entries of the symmetric
    positive-definite M (frozen coordinates carry a unit diagonal).
    dim <= 3 uses the measured-fast closed-form adjugate; dim 4-16 an
    unrolled Cholesky (straight-line code, ~dim^3/3 scalar ops on (bt, 1)
    registers — tiny-dim tensor ops would scalarize under Mosaic, see the
    module docstring).

    ``sick`` (bt, 1) bool: the free-set Hessian lost (almost) all of a
    pivot to cancellation — e.g. EXACTLY ANTI-PARALLEL constraint rows
    whose lams are transiently both free (found by a round-5 mixed-fleet
    family: P(A) >= pA and P(A) <= qA rows are +/-I_A; an overshoot past
    qA releases the second lam, M goes singular, and the adjugate emits a
    garbage direction every step — the solve jammed permanently at gap
    0.47).  Callers substitute a Jacobi-preconditioned gradient step for
    sick lanes (a guaranteed descent direction through the same
    value-checked line search).  Detection: pivot <= 10 eps * its
    pre-elimination diagonal (dim >= 4) / det <= 10 eps * the Hadamard
    diagonal product (dim <= 3).  Returns ``(dz, sick)``.
    """
    eps10 = 10.0 * jnp.asarray(jnp.finfo(dtype).eps, dtype)
    if dim == 1:
        return [-gf[0] / m[(0, 0)]], jnp.zeros_like(gf[0], jnp.bool_)
    if dim == 2:
        det = m[(0, 0)] * m[(1, 1)] - m[(0, 1)] * m[(0, 1)]
        sick = det <= eps10 * (m[(0, 0)] * m[(1, 1)])
        return [
            -(m[(1, 1)] * gf[0] - m[(0, 1)] * gf[1]) / det,
            -(m[(0, 0)] * gf[1] - m[(0, 1)] * gf[0]) / det,
        ], sick
    if dim > _FUSED_MAX_DIM:
        raise ValueError(f"_solve_small: dim {dim} > {_FUSED_MAX_DIM}")
    if dim == 3:
        c00 = m[(1, 1)] * m[(2, 2)] - m[(1, 2)] * m[(1, 2)]
        c01 = m[(1, 2)] * m[(0, 2)] - m[(0, 1)] * m[(2, 2)]
        c02 = m[(0, 1)] * m[(1, 2)] - m[(1, 1)] * m[(0, 2)]
        det = m[(0, 0)] * c00 + m[(0, 1)] * c01 + m[(0, 2)] * c02
        sick = det <= eps10 * (m[(0, 0)] * m[(1, 1)] * m[(2, 2)])
        return [
            -(c00 * gf[0] + c01 * gf[1] + c02 * gf[2]) / det,
            -(c01 * gf[0] + (m[(0, 0)] * m[(2, 2)]
                             - m[(0, 2)] * m[(0, 2)]) * gf[1]
              + (m[(0, 1)] * m[(0, 2)]
                 - m[(0, 0)] * m[(1, 2)]) * gf[2]) / det,
            -(c02 * gf[0] + (m[(0, 1)] * m[(0, 2)]
                             - m[(0, 0)] * m[(1, 2)]) * gf[1]
              + (m[(0, 0)] * m[(1, 1)]
                 - m[(0, 1)] * m[(0, 1)]) * gf[2]) / det,
        ], sick
    # dim 4-16: unrolled Cholesky M = L L', forward+back substitution.
    # max(.., tiny) keeps batch-padded instances (all-zero rows) finite —
    # their garbage steps reject on value and never leave the pad lanes.
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    L = {}
    sick = None
    for j in range(dim):
        d = m[(j, j)]
        for p in range(j):
            d = d - L[(j, p)] * L[(j, p)]
        bad_j = d <= eps10 * m[(j, j)]
        sick = bad_j if sick is None else jnp.logical_or(sick, bad_j)
        L[(j, j)] = jnp.sqrt(jnp.maximum(d, tiny))
        for i in range(j + 1, dim):
            off = m[(j, i)]
            for p in range(j):
                off = off - L[(i, p)] * L[(j, p)]
            L[(i, j)] = off / L[(j, j)]
    yv = []
    for i in range(dim):
        s = -gf[i]
        for p in range(i):
            s = s - L[(i, p)] * yv[p]
        yv.append(s / L[(i, i)])
    dz = [None] * dim
    for i in range(dim - 1, -1, -1):
        s = yv[i]
        for p in range(i + 1, dim):
            s = s - L[(p, i)] * dz[p]
        dz[i] = s / L[(i, i)]
    return dz, sick


def _make_ctx(bs, wu, logp, *, k: int, m_eq: int, n_valid: int):
    """Shared closures over one (bt, dim-1, n) instance tile: the dual's
    row accessors, masked reductions and value/gradient forms — used by
    BOTH the f32 solve kernel and the ds-certified kernel's epilogue."""
    import types

    dtype = bs.dtype
    bt = bs.shape[0]
    n = bs.shape[2]
    dim = k + 1 + m_eq

    # B = [H; 1'; A] row layout; w = (u, 1, r)
    def hrow(i):
        if i < k:
            return bs[:, i, :]
        if i == k:
            return jnp.ones((bt, 1), dtype)          # broadcasting row of 1s
        return bs[:, i - 1, :]

    ws = ([wu[:, j:j + 1] for j in range(k)]
          + [jnp.ones((bt, 1), dtype)]
          + [wu[:, k + j:k + j + 1] for j in range(m_eq)])
    valid = (lax.broadcasted_iota(jnp.int32, (1, n), 1) < n_valid
             ).astype(dtype)                         # (1, n)

    def rsum(a):
        return jnp.sum(a * valid, axis=1, keepdims=True)     # (bt, 1)

    def btz_of(z):
        # B'z: (bt, n); the ones-row contributes a broadcast scalar
        out = z[k] * jnp.ones((bt, 1), dtype)
        for j in range(dim):
            if j != k:
                out = out + z[j] * hrow(j)
        return out

    def y_of(z):
        # y = p exp(-(B'z) - 1), masked to valid lanes; logp is the
        # shared log-prior row (uniform: the constant -log n)
        return jnp.exp(-(btz_of(z)) - 1.0 + logp) * valid

    def val_of(z, y):
        v = rsum(y)
        for i in range(dim):
            v = v + ws[i] * z[i]
        return v                                             # (bt, 1)

    def grad_of(z, y):
        g = []
        for j in range(dim):
            if j == k:
                g.append(ws[j] - rsum(y))
            else:
                g.append(ws[j] - rsum(hrow(j) * y))
        return g                                             # dim x (bt, 1)

    def pgnorm(z, g):
        # projected-gradient norm^2: lam coords at 0 wanting to decrease
        # are optimal, drop them
        s = jnp.zeros((bt, 1), dtype)
        for j in range(dim):
            if j < k:
                at_b = jnp.logical_and(z[j] <= 0.0, g[j] > 0.0)
                gj = jnp.where(at_b, 0.0, g[j])
                s = s + gj * gj
            else:
                s = s + g[j] * g[j]
        return s                                             # (bt, 1)

    def project(z):
        return [jnp.maximum(z[j], 0.0) if j < k else z[j]
                for j in range(dim)]

    return types.SimpleNamespace(
        dtype=dtype, bt=bt, n=n, dim=dim, k=k, m_eq=m_eq, hrow=hrow,
        ws=ws, valid=valid, rsum=rsum, btz_of=btz_of, y_of=y_of,
        val_of=val_of, grad_of=grad_of, pgnorm=pgnorm, project=project)


def _newton_z(ctx, *, n_steps: int, z0: float, n_ls: int, eps: float):
    """The fixed-schedule f32 active-set projected-Newton loop (the body
    of the original fused kernel), on a ctx from ``_make_ctx``."""
    dtype, bt, dim, k = ctx.dtype, ctx.bt, ctx.dim, ctx.k
    hrow, ws, valid, rsum = ctx.hrow, ctx.ws, ctx.valid, ctx.rsum
    y_of, val_of, grad_of = ctx.y_of, ctx.val_of, ctx.grad_of
    pgnorm, project = ctx.pgnorm, ctx.project

    def step(_, zs):
        z = list(zs)
        y = y_of(z)
        # shared (bt, n) products y * B_j and their row sums: the gradient
        # AND the Hessian's k-column both consume rsum(y * B_j), and the
        # remaining Hessian entries consume (y * B_i) * B_j — computing
        # yh[] once removes ~dim redundant full-width multiply passes per
        # Newton step (round-4 kernel diet, with the squared line-search
        # chain below)
        yh = {}
        ryh = {}
        for j in range(dim):
            if j != k:
                yh[j] = y * hrow(j)
                ryh[j] = rsum(yh[j])
        ry = rsum(y)
        f0 = ry
        for i in range(dim):
            f0 = f0 + ws[i] * z[i]
        g = [ws[j] - (ry if j == k else ryh[j]) for j in range(dim)]

        # active-set mask: frozen coordinates get a unit row/col
        frees = []
        gf = []
        for j in range(dim):
            if j < k:
                at_b = jnp.logical_and(z[j] <= 0.0, g[j] > 0.0)
                fr = jnp.where(at_b, 0.0, jnp.ones_like(g[j]))
            else:
                fr = jnp.ones_like(g[j])
            frees.append(fr)
            gf.append(g[j] * fr)

        # Hessian entries m_ij = sum y B_i B_j, masked + unit diagonal
        m = {}
        for i in range(dim):
            for j in range(i, dim):
                if i == k and j == k:
                    mij = ry
                elif i == k:
                    mij = ryh[j]
                elif j == k:
                    mij = ryh[i]
                else:
                    mij = rsum(yh[i] * hrow(j))
                mij = mij * frees[i] * frees[j]
                if i == j:
                    mij = mij + (1.0 - frees[i])
                    mij = mij * (1.0 + 10.0 * eps)
                m[(i, j)] = mij

        dz, sick = _solve_small(m, gf, dim, dtype)
        # sick (near-singular free set, e.g. transiently-free ANTI-PARALLEL
        # rows): the Newton direction is garbage and every candidate
        # rejects — the round-5 jam (see _solve_small).  Substitute a
        # Jacobi-preconditioned gradient direction: guaranteed descent,
        # same value-checked line search, no extra exp passes; once the
        # overshoot unwinds the redundant lam refreezes and Newton resumes.
        for j in range(dim):
            dz[j] = jnp.where(sick, -gf[j] / m[(j, j)], dz[j])

        # a lam ALREADY at its bound cannot move down: zero that component
        # of the direction (otherwise t_bd = 0 freezes the whole step; the
        # active-set mask above catches the g > 0 case, this catches the
        # rarer coupled g < 0, dz < 0 case)
        for j in range(k):
            dz[j] = jnp.where(jnp.logical_and(z[j] <= 0.0, dz[j] < 0.0),
                              0.0, dz[j])
        # fraction-to-boundary: cap the full step at the first lam boundary
        # so NO candidate needs projection (z + t dz keeps lam >= 0 for
        # t <= t_bd; the t_bd candidate lands exactly ON the boundary and
        # the next step freezes that coordinate).  No artificial floor —
        # a floor above t_bd would score candidates at unprojected
        # (lam < 0) points and break the monotone-bound property.
        t_bd = jnp.full((bt, 1), jnp.inf, dtype)
        for j in range(k):
            tj = jnp.where(dz[j] < 0, -z[j] / jnp.where(dz[j] < 0, dz[j],
                                                        -1.0), jnp.inf)
            t_bd = jnp.minimum(t_bd, tj)
        # far-field trust cap: on a COLD start (z ~ 0, optimum at
        # lam* = O(log n)) the exp-linear dual is locally near-linear in a
        # climbing lam, so the Newton step is O(grad/hess) = O(100+) —
        # and the n_ls halvings of such a step are ALL oversized (the
        # deepest candidate is t_full/2^(n_ls-1)), so the iterate crawls.
        # Capping the step at L_TRUST per coordinate turns the far phase
        # into log-scale progress of up to L_TRUST per step (the optimum
        # moves multiplicatively in y = exp(-B'z)); near the optimum
        # ||dz|| << L_TRUST and the cap is inactive, so quadratic
        # convergence is untouched.  Fixes the n >= 1000 extreme-
        # concentration instances (lam* ~ 8) that 16 steps previously
        # could not reach from z0 = 1e-3.
        dz_inf = jnp.zeros((bt, 1), dtype)
        for j in range(dim):
            dz_inf = jnp.maximum(dz_inf, jnp.abs(dz[j]))
        l_trust = jnp.asarray(8.0, dtype)
        t_trust = l_trust / jnp.maximum(dz_inf, l_trust)  # min(1, L/||dz||)
        t_full = jnp.minimum(jnp.clip(t_bd, 0.0, 1.0), t_trust)

        # candidates are halvings of t_full along the ray:
        #   y(z + t dz) = y(z) * exp(-t (B'dz)).  Evaluated DEEPEST-FIRST
        #   with ONE exp at the deepest exponent and a squaring per level
        #   (exp(e/2^i)^2 = exp(e/2^(i-1))): n_ls exps -> 1 exp +
        #   (n_ls - 1) multiplies per step (round-4 kernel diet).  The
        #   squared chain is sound where the old caveat about a CLIPPED
        #   sqrt chain was not: squaring a clipped/overflowed factor only
        #   OVERSTATES the deeper candidates' exp (inf/huge), which
        #   disqualifies them via the isfinite test — it can never make a
        #   truly-huge step look acceptable.  Squaring relative error
        #   (~2^i eps at level i) lands only in candidate SCORING, far
        #   below the value-resolution acceptance band; the accepted z
        #   update z + t dz is exact either way.
        wdir = dz[k] * jnp.ones((bt, 1), dtype)
        for j in range(dim):
            if j != k:
                wdir = wdir + dz[j] * hrow(j)
        max_e = 0.9 * jnp.log(jnp.finfo(dtype).max)
        scale_deep = 1.0 / float(2 ** (n_ls - 1))
        e_deep = -(t_full * scale_deep) * wdir
        # a lane whose DEEPEST exponent already clips would score every
        # candidate on a distorted factor: disqualify the whole chain
        chain_bad = jnp.max(e_deep * valid, axis=1,
                            keepdims=True) > max_e
        efac = jnp.exp(jnp.clip(e_deep, -max_e, max_e))
        best_f = f0
        tf = jnp.zeros((bt, 1), dtype)
        t = t_full * scale_deep
        for lev in range(n_ls):
            sy = rsum(y * efac)
            ft = sy
            for i in range(dim):
                ft = ft + ws[i] * (z[i] + t * dz[i])
            ft = jnp.where(jnp.logical_or(jnp.logical_not(jnp.isfinite(ft)),
                                          chain_bad), jnp.inf, ft)
            # accept only strict improvements over f0; among equal-valued
            # improvements the LARGER t wins (the <= replaces as t grows),
            # matching the old large-to-small strict-< scan
            bf = jnp.logical_and(ft < f0, ft <= best_f)
            best_f = jnp.where(bf, ft, best_f)
            tf = jnp.where(bf, t, tf)
            if lev < n_ls - 1:
                efac = efac * efac
                t = 2.0 * t

        finite = jnp.ones((bt, 1), jnp.bool_)
        for j in range(dim):
            finite = jnp.logical_and(finite, jnp.isfinite(dz[j]))
        f_ok = jnp.logical_and(best_f < f0, finite)
        # no candidate beats f0 once improvements drop below the value's
        # rounding resolution — evaluate ONE fallback candidate at
        # t* = clip(-g.dz / dz'M dz, 0, t_full), accepted only if it
        # strictly shrinks the projected-gradient norm without leaving the
        # f0 noise band (the gradient resolves far below the value's
        # cancellation floor).  For an UNMODIFIED Newton direction
        # q = -dz'M dz so t* == t_full — i.e. this re-tests the full
        # capped step under the gradient criterion; t* differs only when
        # the coupled (z<=0, dz<0) zeroing above altered dz.
        q = g[0] * dz[0]
        for j in range(1, dim):
            q = q + g[j] * dz[j]
        curv = jnp.zeros((bt, 1), dtype)
        for i in range(dim):
            for j in range(dim):
                mij = m[(i, j)] if i <= j else m[(j, i)]
                curv = curv + mij * dz[i] * dz[j]
        t_star = jnp.clip(-q / jnp.maximum(curv, jnp.finfo(dtype).tiny),
                          0.0, t_full)
        zs_ = [z[j] + t_star * dz[j] for j in range(dim)]
        ys_ = y * jnp.exp(jnp.clip(-t_star * wdir, -max_e, max_e))
        fs_ = val_of(zs_, ys_)
        gs_ = grad_of(zs_, ys_)
        noise = 32.0 * eps * (1.0 + jnp.abs(f0))
        gn0 = pgnorm(z, g)
        g_ok = jnp.logical_and(
            jnp.logical_and(pgnorm(zs_, gs_) < 0.81 * gn0,  # (0.9|g|)^2
                            fs_ <= f0 + noise),
            finite)
        t_take = jnp.where(f_ok, tf, t_star)
        take = jnp.logical_or(f_ok, g_ok)
        z_new = project([jnp.where(take, z[j] + t_take * dz[j], z[j])
                         for j in range(dim)])
        if dim > 8:
            # PROJECTED full-step candidate (wide dims only — statically
            # gated so the dim <= 8 program is bit-unchanged): the
            # fraction-to-boundary cap above retires at most ONE slack lam
            # per step, so a cold start with many slack constraints spends
            # ~k steps just freezing lams (measured: a (k=13, mE=2) family
            # needed 32 steps where dim <= 8 families need ~10).  The
            # classic projected-Newton move max(z + t dz, 0) crosses ALL
            # descending boundaries at once; it costs one extra exp pass
            # (the squared-chain trick only works along the unprojected
            # ray) and is accepted on strict value improvement over both
            # f0 and the ray winner — monotonicity is preserved.
            t_pr = jnp.minimum(jnp.asarray(1.0, dtype), t_trust)
            z_pr = project([z[j] + t_pr * dz[j] for j in range(dim)])
            y_pr = y_of(z_pr)
            f_pr = val_of(z_pr, y_pr)
            pr_ok = jnp.logical_and(
                jnp.logical_and(jnp.isfinite(f_pr), f_pr < best_f),
                finite)
            z_new = [jnp.where(pr_ok, z_pr[j], z_new[j])
                     for j in range(dim)]
        # SNAP to the bound: the step-to-boundary candidate leaves an
        # O(eps*z) positive residual in the landing lam, which then never
        # freezes and the coupled direction jams.  8 eps |z| catches the
        # <= ~4 eps |z| landing residual without zeroing a deliberately
        # computed small positive lam (see duality._polish_dual).
        # BOUNDARY-JAM PURGE (found by the dim-8 widening stress family):
        # when several SLACK lams must creep to 0, the fraction-to-boundary
        # cap shrinks t_bd until the available value improvement
        # (~t_bd * |g.dz|) falls below f32 value resolution — every
        # candidate "ties" f0, the gradient fallback can't shrink the norm
        # by 10% either, and the solve stalls with |g_free| = O(1)
        # (measured: 4/10000 instances of a random 5-row family, gap
        # stuck at 0.37).  A lam below ~32 eps scale whose gradient says
        # "decrease" (g_j > 0) is KKT-identified inactive: zero it
        # directly.  A wrongly purged weakly-active lam costs only
        # ~M_jj lam^2 = O(1e-12) in value and is self-healing (g_j < 0 at
        # 0 unfreezes it next step / in the ds polish).
        zinf = jnp.zeros((bt, 1), dtype)
        for j in range(dim):
            zinf = jnp.maximum(zinf, jnp.abs(z[j]))
        purge_th = 32.0 * eps * (1.0 + zinf)
        for j in range(k):
            z_new[j] = jnp.where(
                jnp.logical_or(
                    z_new[j] <= 8.0 * eps * jnp.abs(z[j]),
                    jnp.logical_and(g[j] > 0.0, z_new[j] <= purge_th)),
                0.0, z_new[j])
        return tuple(z_new)

    z0s = tuple(jnp.full((bt, 1), z0, dtype) for _ in range(dim))
    # int32 loop bounds: with jax_enable_x64 the Python ints would trace
    # as i64 counters, which Mosaic fails to legalize on TPU
    return list(lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), step, z0s))


def _kl_dual_kernel(hs_ref, u_ref, logp_ref, x_ref, gap_ref, z_ref, *,
                    n: int, k: int, m_eq: int, n_valid: int, n_steps: int,
                    z0: float, n_ls: int, eps: float):
    ctx = _make_ctx(hs_ref[...], u_ref[...], logp_ref[...],
                    k=k, m_eq=m_eq, n_valid=n_valid)
    dtype, valid, rsum, val_of = ctx.dtype, ctx.valid, ctx.rsum, ctx.val_of
    logp = logp_ref[...]
    z = _newton_z(ctx, n_steps=n_steps, z0=z0, n_ls=n_ls, eps=eps)

    y = ctx.y_of(z)
    sy = rsum(y)
    # sum(y) can underflow to exactly 0 (primal-infeasible instance whose
    # dual climbs without bound): guard the renormalization and force the
    # gap to +inf instead of NaN-poisoning downstream max() metrics
    dead = sy <= 0.0
    x = y / jnp.where(dead, 1.0, sy)
    x_ref[...] = x * valid
    # measured gap f(x) - g(z) = x.(log x - log p) + (w.z + sum y)
    logx = jnp.log(jnp.where(valid > 0, jnp.where(x > 0, x, 1.0), 1.0))
    f_primal = rsum(x * (logx - logp))
    gap_ref[...] = jnp.where(dead, jnp.asarray(jnp.inf, dtype),
                             f_primal + val_of(z, y))
    # the dual iterate itself: the f64 finishing pass (models/dist_kl.py
    # kl_certify) warm-starts from it with the active set already settled
    z_ref[...] = jnp.concatenate(z, axis=1)


def _ds_yval(ctx, logp_ds, zd, max_e: float = 80.0):
    """y = p exp(-(B'z) - 1) and B'z, both in double-single, masked."""
    from . import ds as D

    k, dim = ctx.k, ctx.dim
    btz = zd[k]                            # the ones-row term, (bt, 1) ds
    for j in range(dim):
        if j != k:
            btz = D.ds_add(btz, D.ds_mul_f(zd[j], ctx.hrow(j)))
    arg = D.ds_add(D.ds_neg(btz), logp_ds)
    arg = D.ds_add_f(arg, -1.0)
    yh, yl = D.ds_exp(arg, max_e=max_e)
    return (yh * ctx.valid, yl * ctx.valid), btz


def _ds_polish(ctx, logp_ds, z32, steps: int, eps: float):
    """Warm projected-Newton polish in double-single arithmetic, fused
    into the kernel epilogue — the in-VMEM equivalent of
    models/dist_kl.py::_kl_warm_polish (same active-set algebra).

    The GRADIENT is computed in ds (~1e-13 relative: cancellation in
    w - B y is what kills plain f32); the Newton SYSTEM and step length
    stay f32 — an inexact direction only slows convergence (rate ~f32 eps
    per step), it cannot bias the measured certificate, and from the f32
    kernel's ~1e-6 start one ds step lands ~1e-12.  Statically unrolled
    (2-3 steps); each step costs ONE ds_exp pass over the (bt, n) tile.
    """
    from . import ds as D

    k, dim, dtype, bt = ctx.k, ctx.dim, ctx.dtype, ctx.bt
    hrow, ws, rsum = ctx.hrow, ctx.ws, ctx.rsum
    zd = [D.ds(z32[j]) for j in range(dim)]
    for _ in range(steps):
        y, _ = _ds_yval(ctx, logp_ds, zd)
        ry = D.ds_sum(y)
        g = []
        for j in range(dim):
            s = ry if j == k else D.ds_sum(D.ds_mul_f(y, hrow(j)))
            g.append(D.ds_sub(D.ds(ws[j]), s))
        # active-set mask on the (correctly rounded) hi parts
        frees, gf = [], []
        for j in range(dim):
            if j < k:
                at_b = jnp.logical_and(zd[j][0] <= 0.0, g[j][0] > 0.0)
                fr = jnp.where(at_b, 0.0, jnp.ones_like(g[j][0]))
            else:
                fr = jnp.ones_like(g[j][0])
            frees.append(fr)
            gf.append(g[j][0] * fr)
        # f32 Hessian from the hi part of y (see docstring: direction
        # accuracy does not limit the certificate)
        yh = y[0]
        yhh, ryh = {}, {}
        for j in range(dim):
            if j != k:
                yhh[j] = yh * hrow(j)
                ryh[j] = rsum(yhh[j])
        ryf = rsum(yh)
        m = {}
        for i in range(dim):
            for j in range(i, dim):
                if i == k and j == k:
                    mij = ryf
                elif i == k:
                    mij = ryh[j]
                elif j == k:
                    mij = ryh[i]
                else:
                    mij = rsum(yhh[i] * hrow(j))
                mij = mij * frees[i] * frees[j]
                if i == j:
                    mij = mij + (1.0 - frees[i])
                    mij = mij * (1.0 + 10.0 * eps)
                m[(i, j)] = mij
        dz, sick = _solve_small(m, gf, dim, dtype)
        # bound-locked lam cannot move down (same two guards as the f32
        # step and _kl_warm_polish)
        for j in range(k):
            dz[j] = jnp.where(
                jnp.logical_and(zd[j][0] <= 0.0, dz[j] < 0.0), 0.0, dz[j])
        t_bd = jnp.full((bt, 1), jnp.inf, dtype)
        for j in range(k):
            tj = jnp.where(dz[j] < 0,
                           -zd[j][0] / jnp.where(dz[j] < 0, dz[j], -1.0),
                           jnp.inf)
            t_bd = jnp.minimum(t_bd, tj)
        t = jnp.minimum(jnp.asarray(1.0, dtype), t_bd)
        fin = jnp.ones((bt, 1), jnp.bool_)
        dz_inf = jnp.zeros((bt, 1), dtype)
        for j in range(dim):
            fin = jnp.logical_and(fin, jnp.isfinite(dz[j]))
            dz_inf = jnp.maximum(dz_inf, jnp.abs(dz[j]))
        # WARM-START contract guard: the polish has no line search (full
        # Newton from a warm start), so a sick free-set Hessian or an
        # ABSURD direction (a broken/singular system emits ||dz|| ~ 1e7;
        # legit refinement steps are ~1e-6, rough-but-sane warm starts
        # ~O(1)) must take NO step — the certificate is then honestly
        # measured at the f32 iterate instead of a corrupted one
        fin = jnp.logical_and(fin, jnp.logical_and(
            jnp.logical_not(sick), dz_inf <= 1e3))
        z_new = []
        for j in range(dim):
            nj = D.ds_add(zd[j], D.ds_prod_ff(t, dz[j]))
            if j < k:
                # project + snap boundary landings (t is f32, so the
                # landing residue is O(f32 eps * |z|)) to exactly 0
                zero = jnp.logical_or(
                    nj[0] < 0.0,
                    nj[0] <= 8.0 * eps * jnp.abs(zd[j][0]))
                nj = (jnp.where(zero, 0.0, nj[0]),
                      jnp.where(zero, 0.0, nj[1]))
            nj = (jnp.where(fin, nj[0], zd[j][0]),
                  jnp.where(fin, nj[1], zd[j][1]))
            z_new.append(nj)
        zd = z_new
    return zd


def _kl_dual_cert_kernel(hs_ref, u_ref, logph_ref, logpl_ref,
                         xh_ref, xl_ref, zhl_ref, stats_ref, *,
                         n: int, k: int, m_eq: int, n_valid: int,
                         n_steps: int, z0: float, n_ls: int, eps: float,
                         polish_steps: int, interpret: bool):
    """The CERTIFIED whole-solve kernel: f32 projected-Newton dual solve +
    double-single (float32x2) warm polish + in-kernel ds certificate —
    gap, inequality and equality residuals measured to ~1e-12 absolute
    WITHOUT any XLA-emulated-f64 pass outside the kernel.  Outputs: the
    refined primal as a ds pair (x_hi, x_lo), the polished dual as
    [z_hi | z_lo] (bt, 2 dim), and stats = [gap_hi, gap_lo, ineq_res,
    eq_res] (bt, 4).

    The body traces under ``ds.inside_mosaic``: the ds library's
    XLA-simplifier guards are dropped for the Mosaic lowering (which
    neither needs nor implements them) but KEPT in interpret mode, where
    the body runs as ordinary XLA ops and the simplifier would otherwise
    destroy the error-free transformations (ds.py COMPILER HAZARD)."""
    from . import ds as D

    with contextlib.ExitStack() as stack:
        stack.enter_context(D.inside_mosaic(not interpret))
        _kl_dual_cert_body(hs_ref, u_ref, logph_ref, logpl_ref, xh_ref,
                           xl_ref, zhl_ref, stats_ref, n=n, k=k, m_eq=m_eq,
                           n_valid=n_valid, n_steps=n_steps, z0=z0,
                           n_ls=n_ls, eps=eps, polish_steps=polish_steps)


def _kl_dual_cert_body(hs_ref, u_ref, logph_ref, logpl_ref,
                       xh_ref, xl_ref, zhl_ref, stats_ref, *,
                       n, k, m_eq, n_valid, n_steps, z0, n_ls, eps,
                       polish_steps):
    from . import ds as D

    ctx = _make_ctx(hs_ref[...], u_ref[...], logph_ref[...],
                    k=k, m_eq=m_eq, n_valid=n_valid)
    dtype, bt, dim, valid = ctx.dtype, ctx.bt, ctx.dim, ctx.valid
    z32 = _newton_z(ctx, n_steps=n_steps, z0=z0, n_ls=n_ls, eps=eps)
    logp_ds = (logph_ref[...], logpl_ref[...])
    zd = _ds_polish(ctx, logp_ds, z32, polish_steps, eps)

    # final ds evaluation pass: ONE ds_exp serves the refined primal, both
    # gap terms, and every residual (cf. kl_certify's shared-pass note)
    y, btz = _ds_yval(ctx, logp_ds, zd)
    sy = D.ds_sum(y)
    dead = sy[0] <= 0.0            # divergent dual of an infeasible lane
    sy_g = (jnp.where(dead, 1.0, sy[0]), jnp.where(dead, 0.0, sy[1]))
    x = D.ds_mul(y, D.ds_recip(sy_g))                    # (bt, n) ds
    wz = D.ds_mul_f(zd[0], ctx.ws[0])
    for j in range(1, dim):
        wz = D.ds_add(wz, D.ds_mul_f(zd[j], ctx.ws[j]))
    # f(x) = sum x (log x - log p) with log x - log p = -B'z - 1 - log sy:
    # the (n,)-log collapses to one scalar ds_log; sum x (computed, ~1 to
    # ds rounding) multiplies the scalar term so no sum-to-one assumption
    # enters the certificate
    xbtz = D.ds_sum(D.ds_mul(x, btz), valid=valid)
    sumx = D.ds_sum(x, valid=valid)
    lsy = D.ds_log(sy_g)
    t1 = D.ds_mul(D.ds_add_f(lsy, 1.0), sumx)
    gap = D.ds_add(D.ds_sub(D.ds_neg(xbtz), t1), D.ds_add(wz, sy_g))
    gap_h = jnp.where(dead, jnp.asarray(jnp.inf, dtype), gap[0])
    gap_l = jnp.where(dead, jnp.zeros_like(gap[1]), gap[1])
    # residuals: max(-x, Hx - u)_+ and the FULL equality system
    viol = jnp.max(jnp.maximum(-x[0], 0.0) * valid, axis=1, keepdims=True)
    for i in range(k):
        ri = D.ds_sub(D.ds_sum(D.ds_mul_f(x, ctx.hrow(i)), valid=valid),
                      D.ds(ctx.ws[i]))
        viol = jnp.maximum(viol, jnp.maximum(ri[0], 0.0))
    eq = jnp.abs(D.ds_add_f(sumx, -1.0)[0])
    for j in range(k + 1, dim):
        ej = D.ds_sub(D.ds_sum(D.ds_mul_f(x, ctx.hrow(j)), valid=valid),
                      D.ds(ctx.ws[j]))
        eq = jnp.maximum(eq, jnp.abs(ej[0]))

    xh_ref[...] = x[0] * valid
    xl_ref[...] = x[1] * valid
    zhl_ref[...] = jnp.concatenate([zd[j][0] for j in range(dim)]
                                   + [zd[j][1] for j in range(dim)], axis=1)
    stats_ref[...] = jnp.concatenate([gap_h, gap_l, viol, eq], axis=1)


def _next_pow2(v: int) -> int:
    p = 1
    while p < v:
        p *= 2
    return p


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "polish_steps", "z0", "n_ls", "bt",
                     "interpret"))
def kl_dual_fused_cert(
    Hs: jax.Array,   # (B, k, n) scenario inequality rows, f32
    u: jax.Array,    # (B, k)
    A: jax.Array | None = None,   # (B, m_eq, n) extra equality rows
    r: jax.Array | None = None,   # (B, m_eq)
    log_prior: jax.Array | None = None,   # (n,) f64 log p, None = uniform
    *,
    n_steps: int = 16,
    polish_steps: int = 2,
    z0: float = 1e-3,
    n_ls: int = 5,
    bt: int = 256,
    interpret: bool = False,
):
    """Certified whole-solve: f32 dual Newton + fused double-single polish
    and certificate, all inside ONE Pallas kernel.

    Defaults (n_steps=16, polish_steps=2) match the model layer's ONE
    configuration of record (``DistKL.solve_certified_batch``) — direct
    kernel callers get the same schedule every doc/table describes.

    Returns ``(x_hi, x_lo, z_hi, z_lo, gap_hi, gap_lo, ineq_res, eq_res)``
    — combine hi + lo in f64 OUTSIDE the kernel (``hi.astype(f64) +
    lo.astype(f64)``, exact) for the certified leaves.  The measured gap
    is honest to ~1e-12 absolute (ds arithmetic; validated against a host
    f64 recompute in tests/test_round4.py) — far below the reference's
    1e-8 contract (SolverParams.scala:41).  ``log_prior`` should carry
    full f64 precision when given (it is split hi/lo on the host side of
    the kernel); data rows/rhs are exact f32 problem data.

    The row width is padded to the next POWER OF TWO (ds_sum's
    contiguous-halves tree) — at n = 10000 that is 16384 lanes (~1.6x the
    f32 kernel's 10112), the price of error-free reductions.
    """
    B, k, n = Hs.shape
    if (A is None) != (r is None):
        raise ValueError("kl_dual_fused_cert: A and r must be given "
                         "together (extra equality rows A x = r)")
    if A is None:
        A = jnp.zeros((B, 0, n), Hs.dtype)
        r = jnp.zeros((B, 0), Hs.dtype)
    m_eq = A.shape[1]
    dim = k + 1 + m_eq
    if not (k + m_eq >= 1 and dim <= _FUSED_MAX_DIM):
        raise ValueError(
            f"kl_dual_fused_cert supports 1 <= k + m_eq and "
            f"k + 1 + m_eq <= {_FUSED_MAX_DIM}, got k={k}, m_eq={m_eq}")
    # VMEM guard (bt is a static arg, so this is trace-time Python).  The
    # ds epilogue carries hi/lo pairs, so its footprint is ~2x the f32
    # kernel's: one extra halving beyond dim 8 (measured on v5e against
    # the 16 MB scoped limit: dim 16 at bt=64 hit 24.8 MB; dim 12 at
    # bt=64 was 16.26 MB — over by 268 KB once the round-5 sick/trust
    # guards' registers landed).
    bt = _tile_for_dim(bt, dim)
    if dim > 8:
        bt = max(8, bt // 2)
    # hi/lo split of the log prior BEFORE the x32 trace: the lo row is the
    # f64 remainder and is the only place full precision enters (rows/rhs
    # are exact f32 data; the uniform -log n is split in host floats)
    import numpy as _np
    if log_prior is None:
        lp = -_np.log(_np.float64(n))
        lp_hi = jnp.full((n,), float(_np.float32(lp)), jnp.float32)
        lp_lo = jnp.full((n,), float(lp - _np.float64(_np.float32(lp))),
                         jnp.float32)
    else:
        lp_hi = log_prior.astype(jnp.float32)
        lp_lo = (log_prior - lp_hi.astype(log_prior.dtype)).astype(
            jnp.float32)
    if Hs.dtype == jnp.float32:
        with jax.enable_x64(False):
            return _kl_dual_cert_x32(Hs, u, A, r, lp_hi, lp_lo,
                                     n_steps=n_steps,
                                     polish_steps=polish_steps, z0=z0,
                                     n_ls=n_ls, bt=bt, interpret=interpret)
    return _kl_dual_cert_x32(Hs, u, A, r, lp_hi, lp_lo, n_steps=n_steps,
                             polish_steps=polish_steps, z0=z0, n_ls=n_ls,
                             bt=bt, interpret=interpret)


def _kl_dual_cert_x32(Hs, u, A, r, lp_hi, lp_lo, *, n_steps, polish_steps,
                      z0, n_ls, bt, interpret):
    B, k, n = Hs.shape
    m_eq = A.shape[1]
    dtype = jnp.float32
    Hs = Hs.astype(dtype)
    u = u.astype(dtype)
    A = A.astype(dtype)
    r = r.astype(dtype)
    lane = 128 if not interpret else 8
    npad = _next_pow2(_round_up(n, lane))
    bpad = _round_up(B, bt)

    rows = jnp.concatenate([Hs, A], axis=1)
    rhs_pad = jnp.concatenate([jnp.ones((bpad, k), dtype),
                               jnp.zeros((bpad, m_eq), dtype)], axis=1)
    rows_p = jnp.zeros((bpad, k + m_eq, npad), dtype).at[:B, :, :n].set(rows)
    rhs_p = rhs_pad.at[:B, :k].set(u)
    if m_eq > 0:
        rhs_p = rhs_p.at[:B, k:].set(r)
    lph = jnp.zeros((1, npad), dtype).at[0, :n].set(lp_hi)
    lpl = jnp.zeros((1, npad), dtype).at[0, :n].set(lp_lo)

    grid = (bpad // bt,)
    dim = k + 1 + m_eq
    kern = functools.partial(
        _kl_dual_cert_kernel, n=npad, k=k, m_eq=m_eq, n_valid=n,
        n_steps=n_steps, z0=z0, n_ls=n_ls,
        eps=float(jnp.finfo(dtype).eps), polish_steps=polish_steps,
        interpret=interpret)
    xh, xl, zhl, stats = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((bpad, npad), dtype),
                   jax.ShapeDtypeStruct((bpad, npad), dtype),
                   jax.ShapeDtypeStruct((bpad, 2 * dim), dtype),
                   jax.ShapeDtypeStruct((bpad, 4), dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, k + m_eq, npad), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, k + m_eq), lambda i: (i, 0)),
            pl.BlockSpec((1, npad), lambda i: (0, 0)),
            pl.BlockSpec((1, npad), lambda i: (0, 0)),
        ],
        out_specs=(pl.BlockSpec((bt, npad), lambda i: (i, 0)),
                   pl.BlockSpec((bt, npad), lambda i: (i, 0)),
                   pl.BlockSpec((bt, 2 * dim), lambda i: (i, 0)),
                   pl.BlockSpec((bt, 4), lambda i: (i, 0))),
        interpret=interpret,
    )(rows_p, rhs_p, lph, lpl)
    return (xh[:B, :n], xl[:B, :n], zhl[:B, :dim], zhl[:B, dim:],
            stats[:B, 0], stats[:B, 1], stats[:B, 2], stats[:B, 3])


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "z0", "n_ls", "bt", "interpret"))
def kl_dual_fused(
    Hs: jax.Array,   # (B, k, n) scenario inequality rows
    u: jax.Array,    # (B, k)
    A: jax.Array | None = None,   # (B, m_eq, n) extra equality rows
    r: jax.Array | None = None,   # (B, m_eq)
    log_prior: jax.Array | None = None,   # (n,) shared log p, None=uniform
    *,
    n_steps: int = 16,
    z0: float = 1e-3,
    n_ls: int = 5,
    bt: int = 256,
    interpret: bool = False,
):
    """Solve a batch of KL duals entirely inside one Pallas kernel.

    Returns ``(x, gap, z)``: the recovered primal distributions (B, n),
    the MEASURED per-instance duality-gap certificate f(x) - g(z) (g(z)
    is a true lower bound on p* for the dual-feasible z the kernel ends
    at; note x = y/sum(y) restores the simplex but may violate an active
    H row by O(f32 eps), so the gap bounds suboptimality only up to that
    primal residual — pair it with DistKL._ineq_res / Solution.ineq_res,
    and it can be slightly NEGATIVE for a near-optimal infeasible x), and
    the dual iterate z (B, k + 1 + m_eq) itself — the f64 finishing pass
    warm-starts from it.
    Constraint set: Hs x <= u (k >= 0 rows), sum-to-one, and A x = r
    (m_eq >= 0 extra equality rows); dual dim = k + 1 + m_eq <= 16.  Use
    DistKL.solve(method='dual_fast') for larger shapes.
    ``log_prior`` generalizes the objective to d_KL(x, p) for a SHARED
    (n,) prior p (beyond the reference, whose Dist_KL fixes p uniform —
    Dist_KL.scala:218): the dual closed form only changes through
    R = p/e, i.e. one extra broadcast row in VMEM.
    """
    B, k, n = Hs.shape
    if (A is None) != (r is None):
        raise ValueError("kl_dual_fused: A and r must be given together "
                         "(extra equality rows A x = r)")
    if A is None:
        A = jnp.zeros((B, 0, n), Hs.dtype)
        r = jnp.zeros((B, 0), Hs.dtype)
    if log_prior is None:
        log_prior = jnp.full((n,), -jnp.log(float(n)), Hs.dtype)
    m_eq = A.shape[1]
    dim = k + 1 + m_eq
    if not (k + m_eq >= 1 and dim <= _FUSED_MAX_DIM):
        raise ValueError(
            f"kl_dual_fused supports 1 <= k + m_eq and k + 1 + m_eq <= "
            f"{_FUSED_MAX_DIM}, got k={k}, m_eq={m_eq}")
    # VMEM guard (see _tile_for_dim)
    bt = _tile_for_dim(bt, dim)
    # trace the f32 (TPU) path in x32: under jax_enable_x64 (the certified
    # finishing pass enables it) weak Python ints become i64 scalars, which
    # Mosaic fails to legalize ("failed to legalize operation
    # 'func.return'").  f64 inputs (CPU interpret tests) keep x64 tracing —
    # x32 mode would silently downcast their constants.
    if Hs.dtype == jnp.float32:
        with jax.enable_x64(False):
            return _kl_dual_fused_x32(Hs, u, A, r, log_prior,
                                      n_steps=n_steps, z0=z0,
                                      n_ls=n_ls, bt=bt, interpret=interpret)
    return _kl_dual_fused_x32(Hs, u, A, r, log_prior, n_steps=n_steps,
                              z0=z0, n_ls=n_ls, bt=bt, interpret=interpret)


def _kl_dual_fused_x32(Hs, u, A, r, log_prior, *, n_steps, z0, n_ls, bt,
                       interpret):
    B, k, n = Hs.shape
    m_eq = A.shape[1]
    dtype = Hs.dtype
    lane = 128 if not interpret else 8
    npad = _round_up(n, lane)
    bpad = _round_up(B, bt)

    # one stacked (B, k + m_eq, n) row tensor and (B, k + m_eq) rhs keep the
    # kernel signature fixed.  Batch padding: inequality rows 0 with u = 1
    # (inactive); equality rows 0 with r = 0 (zero gradient, inert).
    rows = jnp.concatenate([Hs, A], axis=1)
    rhs_pad = jnp.concatenate([jnp.ones((bpad, k), dtype),
                               jnp.zeros((bpad, m_eq), dtype)], axis=1)
    rows_p = jnp.zeros((bpad, k + m_eq, npad), dtype).at[:B, :, :n].set(rows)
    rhs_p = rhs_pad.at[:B, :k].set(u)
    if m_eq > 0:
        rhs_p = rhs_p.at[:B, k:].set(r)
    # shared (1, npad) log-prior row, zero on pad lanes (masked in-kernel)
    logp_p = jnp.zeros((1, npad), dtype).at[0, :n].set(
        jnp.asarray(log_prior, dtype))

    grid = (bpad // bt,)
    dim = k + 1 + m_eq
    kern = functools.partial(
        _kl_dual_kernel, n=npad, k=k, m_eq=m_eq, n_valid=n, n_steps=n_steps,
        z0=z0, n_ls=n_ls, eps=float(jnp.finfo(dtype).eps))
    x, gap, z = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((bpad, npad), dtype),
                   jax.ShapeDtypeStruct((bpad, 1), dtype),
                   jax.ShapeDtypeStruct((bpad, dim), dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, k + m_eq, npad), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, k + m_eq), lambda i: (i, 0)),
            pl.BlockSpec((1, npad), lambda i: (0, 0)),
        ],
        out_specs=(pl.BlockSpec((bt, npad), lambda i: (i, 0)),
                   pl.BlockSpec((bt, 1), lambda i: (i, 0)),
                   pl.BlockSpec((bt, dim), lambda i: (i, 0))),
        interpret=interpret,
    )(rows_p, rhs_p, logp_p)
    return x[:B, :n], gap[:B, 0], z[:B]
