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
    eps = jnp.finfo(dtype).eps
    tol = jnp.maximum(jnp.asarray(pars.tol, dtype), 50.0 * eps)
    eq_tol = jnp.maximum(jnp.asarray(pars.tol, dtype), 100.0 * eps)
    t_max = 10.0 * pars.mu * m / pars.tol
    n_ls = pars.ls_max_steps
    kk = jnp.arange(n_ls)
    expo = jnp.where(kk < 32, kk, 32 + 3 * (kk - 32)).astype(dtype)
    ls_ts = jnp.asarray(pars.beta, dtype) ** expo
    hard_stall_gap = jnp.sqrt(tol)

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
            return val, grad, hess, d

        def newton_step(t, x):
            val, g, H, d = fgh(t, x)
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
            Gdx = G @ dx                        # local rows only

            # vectorized line search: one (n_ls,) psum for the values and
            # one for the feasibility mask
            ds = d[None, :] - ls_ts[:, None] * Gdx[None, :]   # (n_ls, m_loc)
            ok_loc = jnp.all(ds > 0, axis=1)
            bad = lax.psum((~ok_loc).astype(dtype), axis)
            ok = bad == 0
            logs_loc = jnp.sum(jnp.log(jnp.where(ds > 0, ds, 1.0)), axis=1)
            logs = lax.psum(logs_loc, axis)

            def obj_at(s):
                return t * obj.value(x + s * dx)

            fs = jax.vmap(obj_at)(ls_ts) - logs
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
            return (x_new, pars.mu * t, it + 1, n_newton + inner_it,
                    jnp.logical_or(hard, hard_i), t_active)

        x, t, outer_it, n_newton, hard, t_active = lax.while_loop(
            outer_cond, outer_body,
            (x0, jnp.asarray(t0, dtype), jnp.asarray(0), jnp.asarray(0),
             jnp.asarray(False), jnp.asarray(t0, dtype)))

        t_solved = t / pars.mu
        d_exit = margins(x)
        lam = 1.0 / (t_active * d_exit)           # local shard of the duals
        bad_exit = lax.psum(
            jnp.logical_not(jnp.logical_and(
                jnp.all(jnp.isfinite(d_exit)),
                jnp.all(d_exit > -100.0 * eps * (1.0 + jnp.abs(ub)))
            )).astype(dtype), axis)
        healthy = jnp.logical_and(jnp.all(jnp.isfinite(x)), bad_exit == 0)
        gap = jnp.where(healthy, m / t_solved, jnp.asarray(jnp.nan, dtype))
        eq_gap = (jnp.linalg.norm(b_ - A_ @ x) if has_eqs
                  else jnp.asarray(0.0, dtype))
        stalled = jnp.logical_or(hard, jnp.logical_not(healthy))
        maxed = outer_it >= pars.outer_max_iter
        return x, lam, gap, eq_gap, n_newton, maxed, stalled

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(axis), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    x, lam, gap, eq_gap, iters, maxed, stalled = jax.jit(sharded)(
        G, c, ub, x0)
    nan = jnp.asarray(jnp.nan, dtype)
    return Solution(
        x=x, lam=lam, nu=jnp.full((p,), jnp.nan, dtype),
        newton_decrement=nan, duality_gap=gap, eq_gap=eq_gap,
        norm_grad=nan, norm_dual_residual=nan, iters=iters,
        maxed_out=maxed, stalled=stalled,
    )
