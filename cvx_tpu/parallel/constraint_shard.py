"""Constraint-axis sharded barrier solver (the SP/CP analogue).

SURVEY.md sections 2.4/5.7(a): a convex solver has no sequence axis — its
structural analogue is the CONSTRAINT axis m.  The barrier Hessian/gradient
are reductions over constraints (cvx/BarrierSolver.scala:303-315):

    grad = t g0 + sum_i  G_i / d_i
    hess = t H0 + sum_i [G_i G_i^T / d_i^2]          (linear constraints)

For m >> n (scenario row-expansions, sign-combination blowups, massive
row-wise bounds) the constraint DATA dominates memory and the reduction
dominates FLOPs — so the rows (G, c, ub) are sharded over a mesh axis and
each Newton iteration:

  1. computes its partial margins / gradient / Hessian on the local shard,
  2. ``psum``s the (n,) gradient and (n, n) Hessian over ICI,
  3. solves the replicated (n + p) KKT system identically on every device,
  4. line-searches with one psum'd (n_ls,) barrier-value vector and a
     psum-AND feasibility mask.

The whole continuation runs inside ONE ``shard_map``-ped jitted program;
the only collectives are the psums above (ring-reduce over ICI).  This is
the m-sharded counterpart of solvers/barrier.py, which it matches exactly
(sharded == local, tests/test_constraint_shard.py).

Three entry points:

  * ``barrier_solve_msharded``       — raw linear rows (G, c, ub), margins
                                       updated incrementally (linear fast
                                       path);
  * ``barrier_solve_msharded_cnts``  — GENERIC ConstraintSet (linear +
                                       quadratic blocks), every block row-
                                       sharded;
  * ``primal_dual_solve_msharded``   — the PD half: the reduced-Hessian
                                       reduction sum_i [lam_i hess g_i -
                                       (grad g_i)(grad g_i)' lam_i / f_i]
                                       (PrimalDualSolver.scala:216-240)
                                       psum'd over the constraint axis with
                                       lambda sharded alongside the rows.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.kkt import kkt_solve, sym_solve
from ..solvers.types import Solution, SolverParams
from ..tree import mxu_exact


def _run_msharded_barrier(obj, pars, x0, t0, *, axis, m, has_eqs, A_, b_,
                          fgh, ls_margins, exit_margins, exit_scale):
    """The m-sharded barrier continuation scaffold, shared by the raw-rows
    and generic-ConstraintSet front ends (their only difference is HOW
    margins are evaluated; everything else — Newton acceptance, the
    inner/outer loops, stall/health accounting, dual recovery — is
    identical, and hardening fixes must land once, not per copy).

    Runs INSIDE a shard_map body.  Callbacks, all over the LOCAL shard:
      * ``fgh(t, x) -> (val, grad, hess)``  — psum'd barrier pieces;
      * ``ls_margins(x, dx, ls_ts) -> (n_ls, m_loc)`` candidate margins;
      * ``exit_margins(x) -> (m_loc,)`` margins at the exit iterate;
      * ``exit_scale``  — (m_loc,) scale (|ub|) for the exit health band.
    Returns the raw per-device output tuple
    ``(x, lam, gap, eq_gap, n_newton, maxed, stalled)``.
    """
    dtype = x0.dtype
    eps = jnp.finfo(dtype).eps
    tol = jnp.maximum(jnp.asarray(pars.tol, dtype), 50.0 * eps)
    eq_tol = jnp.maximum(jnp.asarray(pars.tol, dtype), 100.0 * eps)
    t_max = 10.0 * pars.mu * m / pars.tol
    kk = jnp.arange(pars.ls_max_steps)
    expo = jnp.where(kk < 32, kk, 32 + 3 * (kk - 32)).astype(dtype)
    ls_ts = jnp.asarray(pars.beta, dtype) ** expo
    hard_stall_gap = jnp.sqrt(tol)

    def newton_step(t, x):
        val, g, H = fgh(t, x)
        if has_eqs:
            dx, _, _ = kkt_solve(H, A_, g, b_ - A_ @ x,
                                 method=pars.kkt_method,
                                 refine=pars.kkt_refine,
                                 delta=pars.chol_delta,
                                 tol=pars.tol_eq_solve)
        else:
            dx, _ = sym_solve(H, -g, method=pars.kkt_method,
                              refine=pars.kkt_refine,
                              delta=pars.chol_delta,
                              tol=pars.tol_eq_solve)
        q = dx @ g
        dec = -q / 2.0

        # vectorized line search: one (n_ls,) psum for the log sums and
        # one for the feasibility mask
        ds = ls_margins(x, dx, ls_ts)              # (n_ls, m_loc)
        ok_loc = jnp.all(ds > 0, axis=1)
        bad = lax.psum((~ok_loc).astype(dtype), axis)
        ok = bad == 0
        logs_loc = jnp.sum(jnp.log(jnp.where(ds > 0, ds, 1.0)), axis=1)
        logs = lax.psum(logs_loc, axis)
        fs = jax.vmap(lambda s: t * obj.value(x + s * dx))(ls_ts) - logs
        fs = jnp.where(ok, fs, jnp.inf)
        armijo = fs <= val + pars.alpha * ls_ts * q
        acc = jnp.logical_and(ok, armijo)
        any_acc = jnp.any(acc)
        s = jnp.where(any_acc, ls_ts[jnp.argmax(acc)], 0.0)
        take = jnp.logical_and(jnp.logical_and(dec > tol, any_acc),
                               jnp.all(jnp.isfinite(dx)))
        x_new = jnp.where(take, x + s * dx, x)
        stalled = jnp.logical_and(dec > tol, jnp.logical_not(take))
        return x_new, dec, stalled

    def inner(t, x):
        def cond(carry):
            x, dec, it, stalled, _ = carry
            go = jnp.logical_and(dec > tol, it < pars.max_iter)
            return jnp.logical_and(go, jnp.logical_not(stalled))

        def body(carry):
            x, _, it, _, hard = carry
            x, dec, stalled = newton_step(t, x)
            hard = jnp.logical_or(
                hard, jnp.logical_and(stalled, m / t > hard_stall_gap))
            return x, dec, it + 1, stalled, hard

        big = jnp.asarray(jnp.inf, dtype)
        x, dec, it, _, hard = lax.while_loop(
            cond, body, (x, big, jnp.asarray(0), jnp.asarray(False),
                         jnp.asarray(False)))
        return x, it, hard

    def outer_cond(carry):
        x, t, it, n_newton, hard, t_active = carry
        gap = m / (t / pars.mu)
        eq_ok = (jnp.linalg.norm(b_ - A_ @ x) < eq_tol if has_eqs
                 else jnp.asarray(True))
        go = jnp.logical_not(jnp.logical_and(gap < pars.tol, eq_ok))
        go = jnp.logical_and(go, it < pars.outer_max_iter)
        return jnp.logical_and(go, t <= t_max)

    def outer_body(carry):
        x, t, it, n_newton, hard, t_active = carry
        x_new, inner_it, hard_i = inner(t, x)
        # track the last t the iterate actually moved at: once Newton
        # drops below roundoff the continuation keeps annealing but x
        # freezes — the dual estimate must use the t x tracks (same
        # rationale as solvers/barrier.py t_active)
        moved = jnp.any(x_new != x)
        t_active = jnp.where(moved, t, t_active)
        # .astype: traced pars.mu loses its weak type through the
        # shard_map closure — without the pin the f32 t carry promotes
        return (x_new, (pars.mu * t).astype(t.dtype), it + 1,
                n_newton + inner_it, jnp.logical_or(hard, hard_i),
                t_active)

    x, t, outer_it, n_newton, hard, t_active = lax.while_loop(
        outer_cond, outer_body,
        (x0, jnp.asarray(t0, dtype), jnp.asarray(0), jnp.asarray(0),
         jnp.asarray(False), jnp.asarray(t0, dtype)))

    t_solved = t / pars.mu
    d_exit = exit_margins(x)
    lam = 1.0 / (t_active * d_exit)           # local shard of the duals
    bad_exit = lax.psum(
        jnp.logical_not(jnp.logical_and(
            jnp.all(jnp.isfinite(d_exit)),
            jnp.all(d_exit > -100.0 * eps * (1.0 + jnp.abs(exit_scale)))
        )).astype(dtype), axis)
    healthy = jnp.logical_and(jnp.all(jnp.isfinite(x)), bad_exit == 0)
    gap = jnp.where(healthy, m / t_solved, jnp.asarray(jnp.nan, dtype))
    eq_gap = (jnp.linalg.norm(b_ - A_ @ x) if has_eqs
              else jnp.asarray(0.0, dtype))
    stalled = jnp.logical_or(hard, jnp.logical_not(healthy))
    maxed = outer_it >= pars.outer_max_iter
    return x, lam, gap, eq_gap, n_newton, maxed, stalled


def _msharded_solution(out, p, dtype):
    x, lam, gap, eq_gap, iters, maxed, stalled = out
    nan = jnp.asarray(jnp.nan, dtype)
    return Solution(
        x=x, lam=lam, nu=jnp.full((p,), jnp.nan, dtype),
        newton_decrement=nan, duality_gap=gap, eq_gap=eq_gap,
        norm_grad=nan, norm_dual_residual=nan, iters=iters,
        maxed_out=maxed, stalled=stalled,
    )


@mxu_exact
def barrier_solve_msharded(
    obj: Any,
    G: jax.Array,
    c: jax.Array,
    ub: jax.Array,
    x0: jax.Array,
    pars: SolverParams | None = None,
    A: jax.Array | None = None,
    b: jax.Array | None = None,
    *,
    mesh: Mesh,
    axis: str = "m",
    t0: float = 1.0,
) -> Solution:
    """Barrier method for  min f(x)  s.t.  c + G x <= ub  (+ A x = b), with
    the m constraint rows SHARDED over ``mesh`` axis ``axis``.

    ``x0`` must be strictly feasible and is replicated; m must be divisible
    by the mesh axis size.  Returns a Solution whose ``lam`` is sharded over
    the constraint axis like the inputs.
    """
    pars = pars or SolverParams()
    m = G.shape[0]
    dtype = x0.dtype
    has_eqs = A is not None
    p = A.shape[0] if has_eqs else 0
    if has_eqs:
        A_ = A
        b_ = b
    else:  # zero-row equality block keeps one code path
        A_ = jnp.zeros((0, x0.shape[0]), dtype)
        b_ = jnp.zeros((0,), dtype)

    def local(G, cc, ub, x0):
        """Per-device body: G/cc/ub are the LOCAL row shard; x replicated."""

        def margins(x):
            return ub - cc - G @ x

        def fgh(t, x):
            d = margins(x)
            inv_d = 1.0 / d
            # partial barrier pieces on the local shard, psum'd over ICI —
            # the m-sharded materialization of BarrierSolver.scala:303-315
            val = t * obj.value(x) - lax.psum(jnp.sum(jnp.log(d)), axis)
            grad = t * obj.grad(x) + lax.psum(G.T @ inv_d, axis)
            hess = t * obj.hess(x) + lax.psum(
                jnp.einsum("mi,m,mj->ij", G, inv_d * inv_d, G), axis)
            return val, grad, hess

        def ls_margins(x, dx, ls_ts):
            # linear rows: incremental d - s G dx (no re-evaluation)
            d = margins(x)
            Gdx = G @ dx                      # local rows only
            return d[None, :] - ls_ts[:, None] * Gdx[None, :]

        return _run_msharded_barrier(
            obj, pars, x0, t0, axis=axis, m=m, has_eqs=has_eqs,
            A_=A_, b_=b_, fgh=fgh, ls_margins=ls_margins,
            exit_margins=margins, exit_scale=ub)

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(axis), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return _msharded_solution(jax.jit(sharded)(G, c, ub, x0), p, dtype)


def _check_shardable(cnts, n_dev: int):
    """Every block's rows must divide over the mesh axis; Nonlinear blocks
    (one traced callable returning ALL m values) cannot row-shard."""
    from ..problem.constraints import NonlinearBlock

    for b in cnts.blocks:
        if isinstance(b, NonlinearBlock):
            raise ValueError(
                "m-sharding needs array-backed blocks (Linear/Quad); a "
                "NonlinearBlock's callable produces all rows at once")
        if b.m % n_dev != 0:
            raise ValueError(
                f"block with m={b.m} rows not divisible by mesh axis size "
                f"{n_dev}")
    from ..problem.sets import _always_true

    if cnts.domain.fn is not _always_true:
        # the sharded line searches test only the local-row margins; a
        # nontrivial domain.contains would be silently skipped (breaking
        # sharded == local parity), so reject by PREDICATE — a leaf count
        # would both miss parameter-free predicates (positive_orthant) and
        # spuriously reject whole_space(dim), whose interior sample is an
        # array leaf with no constraint axis
        raise ValueError(
            "m-sharding supports only the trivial whole-space domain: the "
            "sharded line searches check constraint margins only, so a "
            "nontrivial domain membership test cannot be enforced")


def _cnts_specs(cnts, axis: str):
    """PartitionSpec pytree sharding every BLOCK array on its leading
    (constraint) axis — all Linear/Quad block leaves carry m first —
    while any domain leaves (whole_space(dim)'s interior sample has no
    constraint axis) are replicated with P()."""
    from ..tree import replace

    return replace(
        cnts,
        blocks=jax.tree_util.tree_map(lambda _: P(axis), cnts.blocks),
        domain=jax.tree_util.tree_map(lambda _: P(), cnts.domain))


@mxu_exact
def barrier_solve_msharded_cnts(
    obj: Any,
    cnts,
    x0: jax.Array,
    pars: SolverParams | None = None,
    eqs=None,
    *,
    mesh: Mesh,
    axis: str = "m",
    t0: float = 1.0,
) -> Solution:
    """Constraint-axis sharded barrier for a GENERIC ``ConstraintSet``
    (linear and quadratic blocks), SURVEY.md section 5.7(a) lifted beyond raw
    linear rows: each device holds a row shard of every block; the barrier
    value/gradient/Hessian reductions over constraints
    (BarrierSolver.scala:303-315) are psum'd, the replicated KKT system is
    solved identically everywhere, and the line search re-evaluates the
    LOCAL margins per candidate (quadratic rows are not linear in the step,
    so no incremental G dx shortcut).

    ``x0`` must be strictly feasible and replicated; every block's row count
    must divide the mesh axis size.  Returns ``lam`` sharded like the rows.
    """
    pars = pars or SolverParams()
    n_dev = mesh.shape[axis]
    _check_shardable(cnts, n_dev)
    m = cnts.m
    dtype = x0.dtype
    has_eqs = eqs is not None
    p = eqs.p if has_eqs else 0
    if has_eqs:
        A_, b_ = eqs.A, eqs.b
    else:
        A_ = jnp.zeros((0, x0.shape[0]), dtype)
        b_ = jnp.zeros((0,), dtype)

    def local(cl, x0):
        """``cl`` is the LOCAL row shard of the ConstraintSet."""

        def fgh(t, x):
            d = cl.margins(x)
            inv_d = 1.0 / d
            G = cl.jac(x)
            val = t * obj.value(x) - lax.psum(jnp.sum(jnp.log(d)), axis)
            grad = t * obj.grad(x) + lax.psum(G.T @ inv_d, axis)
            hess = t * obj.hess(x) + lax.psum(
                jnp.einsum("mi,m,mj->ij", G, inv_d * inv_d, G)
                + cl.whess(x, inv_d), axis)
            return val, grad, hess

        def ls_margins(x, dx, ls_ts):
            # generic blocks: quadratic rows are not linear in the step,
            # so the candidates re-evaluate the LOCAL margins
            return jax.vmap(lambda s: cl.margins(x + s * dx))(ls_ts)

        return _run_msharded_barrier(
            obj, pars, x0, t0, axis=axis, m=m, has_eqs=has_eqs,
            A_=A_, b_=b_, fgh=fgh, ls_margins=ls_margins,
            exit_margins=cl.margins, exit_scale=cl.ub)

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(_cnts_specs(cnts, axis), P()),
        out_specs=(P(), P(axis), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return _msharded_solution(jax.jit(sharded)(cnts, x0), p, dtype)


@mxu_exact
def primal_dual_solve_msharded(
    obj: Any,
    cnts,
    x0: jax.Array,
    pars: SolverParams | None = None,
    eqs=None,
    *,
    mesh: Mesh,
    axis: str = "m",
) -> Solution:
    """Constraint-axis sharded infeasible-start primal-dual IPM — the PD
    half of SURVEY.md section 5.7(a) (round-2 verdict missing item 2).

    The reduced-Hessian reduction over constraints
    H_pd = hess f + sum_i [lam_i hess g_i - (grad g_i grad g_i') lam_i/f_i]
    (PrimalDualSolver.scala:216-240) is sharded exactly like the barrier's:
    each device holds a row shard of every block AND the matching shard of
    lambda; per iteration it psums the (n, n) partial Hessian, the (n,)
    dual-residual and rhs contributions, the surrogate gap -f.lam, the
    line-search feasibility mask and the residual-norm decrease test.  The
    replicated KKT system is solved identically on every device.

    Matches ``solvers.primal_dual.primal_dual_solve`` exactly on the same
    problem (sharded == local, tests/test_constraint_shard.py).
    """
    pars = pars or SolverParams()
    n_dev = mesh.shape[axis]
    _check_shardable(cnts, n_dev)
    m = cnts.m
    dtype = x0.dtype
    nan = jnp.asarray(jnp.nan, dtype)
    has_eqs = eqs is not None
    p = eqs.p if has_eqs else 0
    # same traced-pars fallback as the local solver (primal_dual.py): when
    # pars cross a jit boundary beta is a tracer and cannot shape the trace
    try:
        ls_max = int(-30.0 / float(jnp.log(pars.beta))) + 1
    except jax.errors.ConcretizationTypeError:
        ls_max = pars.ls_max_steps
    eps = jnp.finfo(dtype).eps
    gap_tol = jnp.maximum(jnp.asarray(pars.tol, dtype), 50.0 * eps)
    res_tol = jnp.maximum(jnp.asarray(pars.tol, dtype), 1e3 * eps)

    if has_eqs:
        A_, b_ = eqs.A, eqs.b
    else:
        A_ = jnp.zeros((0, x0.shape[0]), dtype)
        b_ = jnp.zeros((0,), dtype)

    def local(cl, x0):
        def res_norm2_parts(t, x, lam, nu):
            """||r_t||^2 = ||r_dual||^2 + psum||r_cent_loc||^2 + ||r_pri||^2."""
            f = cl.residual(x)
            G = cl.jac(x)
            r_dual = obj.grad(x) + lax.psum(G.T @ lam, axis)
            if has_eqs:
                r_dual = r_dual + A_.T @ nu
            r_cent = -lam * f - 1.0 / t
            n2 = (jnp.sum(r_dual * r_dual)
                  + lax.psum(jnp.sum(r_cent * r_cent), axis))
            if has_eqs:
                r_pri = A_ @ x - b_
                n2 = n2 + jnp.sum(r_pri * r_pri)
            return n2

        def surrogate_gap(x, lam):
            return -lax.psum(cl.residual(x) @ lam, axis)

        def body(carry):
            x, lam, nu, _, _, _, it, _ = carry
            eta = surrogate_gap(x, lam)
            # pin: a traced pars.mu loses its weak type through the
            # shard_map closure, so without astype t goes strong-f64 and
            # promotes dlam/lam/gap out of the f32 carry
            t = (pars.mu * m / eta).astype(dtype)

            f = cl.residual(x)
            G = cl.jac(x)
            inv_f = 1.0 / f
            H_pd = obj.hess(x) + lax.psum(
                cl.whess(x, lam)
                + jnp.einsum("mi,m,mj->ij", G, -lam * inv_f, G), axis)
            rhs_top = -obj.grad(x) + (1.0 / t) * lax.psum(G.T @ inv_f, axis)
            if has_eqs:
                rhs_top = rhs_top - A_.T @ nu
                r_pri = A_ @ x - b_
                dx, dnu, _ = kkt_solve(H_pd, A_, -rhs_top, -r_pri,
                                       method=pars.kkt_method,
                                       refine=pars.kkt_refine,
                                       delta=pars.chol_delta,
                                       tol=pars.tol_eq_solve)
            else:
                dx, _ = sym_solve(H_pd, rhs_top, method=pars.kkt_method,
                                  refine=pars.kkt_refine,
                                  delta=pars.chol_delta,
                                  tol=pars.tol_eq_solve)
                dnu = jnp.zeros((0,), dtype)
            # f64 pars leaves (chol_delta under jax_enable_x64) must not
            # promote the carry through the step (same as the local PD)
            dx = dx.astype(dtype)
            dnu = dnu.astype(dtype)

            r_cent = -lam * f - 1.0 / t
            w = G @ dx
            dlam = (-lam * w + r_cent) * inv_f

            ratios = jnp.where(dlam < 0, -lam / dlam, jnp.inf)
            s_loc = jnp.min(ratios)
            s0 = pars.pd_step_frac * jnp.minimum(
                1.0, lax.pmin(s_loc, axis))
            norm2_rt = res_norm2_parts(t, x, lam, nu)

            def trial(s):
                xs = x + s * dx
                lams = lam + s * dlam
                nus = nu + s * dnu
                feas_loc = jnp.all(cl.margins(xs) > 0.0)
                n2 = res_norm2_parts(t, xs, lams, nus)
                return feas_loc, n2

            _kk = jnp.arange(ls_max)
            _expo = jnp.where(_kk < 32, _kk,
                              32 + 3 * (_kk - 32)).astype(dtype)
            # .astype: f64 beta leaves under x64 must not promote the trial
            # iterates out of the carry dtype (same as the local PD)
            ss = (s0 * pars.beta ** _expo).astype(dtype)
            feas_loc, n2s = jax.vmap(trial)(ss)
            feas = lax.psum((~feas_loc).astype(dtype), axis) == 0
            dec = jnp.sqrt(n2s) <= (1.0 - pars.alpha * ss) * \
                jnp.sqrt(norm2_rt)
            accepts = jnp.logical_and(feas, dec)
            ok = jnp.logical_and(
                jnp.any(accepts),
                jnp.all(jnp.isfinite(dx)) & jnp.all(jnp.isfinite(dlam)))
            stalled = jnp.logical_not(ok)
            s = jnp.where(ok, ss[jnp.argmax(accepts)], 0.0)

            x_n = jnp.where(ok, x + s * dx, x)
            lam_n = jnp.where(ok, lam + s * dlam, lam)
            nu_n = jnp.where(ok, nu + s * dnu, nu)

            gap = surrogate_gap(x_n, lam_n)
            Gn = cl.jac(x_n)
            r_dual = obj.grad(x_n) + lax.psum(Gn.T @ lam_n, axis)
            if has_eqs:
                r_dual = r_dual + A_.T @ nu_n
                eq_gap = jnp.linalg.norm(A_ @ x_n - b_)
            else:
                eq_gap = jnp.asarray(0.0, dtype)
            return (x_n, lam_n, nu_n, gap, jnp.linalg.norm(r_dual),
                    eq_gap, it + 1, stalled)

        def cond(carry):
            x, lam, nu, gap, ndr, eq_gap, it, stalled = carry
            ok = jnp.logical_and(gap < gap_tol, ndr < res_tol)
            if has_eqs:
                ok = jnp.logical_and(ok, eq_gap < jnp.sqrt(gap_tol))
            go = jnp.logical_not(ok)
            go = jnp.logical_and(go, it < 2 * pars.outer_max_iter)
            return jnp.logical_and(go, jnp.logical_not(stalled))

        lam0 = cl.lambda_init(x0)      # local shard
        nu0 = jnp.zeros((p,), dtype)
        inf = jnp.asarray(jnp.inf, dtype)
        init = (x0, lam0, nu0, surrogate_gap(x0, lam0), inf, inf,
                jnp.asarray(0), jnp.asarray(False))
        x, lam, nu, gap, ndr, eq_gap, it, stalled = lax.while_loop(
            cond, body, init)
        return x, lam, nu, gap, ndr, eq_gap, it, stalled

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(_cnts_specs(cnts, axis), P()),
        out_specs=(P(), P(axis), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    x, lam, nu, gap, ndr, eq_gap, it, stalled = jax.jit(sharded)(cnts, x0)
    return Solution(
        x=x, lam=lam, nu=nu, newton_decrement=nan, duality_gap=gap,
        eq_gap=eq_gap, norm_grad=nan, norm_dual_residual=ndr, iters=it,
        maxed_out=it >= 2 * pars.outer_max_iter, stalled=stalled,
    )
