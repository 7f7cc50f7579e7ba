"""Convex duality: solve the primal through its dual.

Re-design of cvx/Duality.scala (:38-135): given the (concave) dual objective
L*(z) of a problem — z = (lambda, nu) with lambda the inequality duals — the
dual problem is

    min -L*(z)   subject to   lambda = z[:num_ineq] >= 0,

solved with the same interior-point machinery from the strictly feasible
start z0 = dual_start * 1 (Duality.scala:107), after which the primal optimum
is recovered via the problem-specific map x* = primal_optimum(z*)
(Duality.scala:119-133).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from .problem.constraint_set import ConstraintSet
from .problem.constraints import first_coordinates_positive
from .solvers.barrier import barrier_solve
from .solvers.primal_dual import primal_dual_solve
from .solvers.types import Solution, SolverParams


def _polish_dual(obj: Any, z: jax.Array, num_ineq: int, steps: int,
                 pars: SolverParams | None = None) -> jax.Array:
    """Active-set projected-Newton polish of the dual optimum.

    The barrier solve stops at duality gap ~ m/t; the PRIMAL recovery
    x = R exp(-B'z) amplifies the remaining dual error by |B'| through the
    exponential — in f32 tail instances lose ~1e-2 of probability mass.
    Moreover the dual value is LINEARLY sensitive to multipliers of
    inactive constraints (d(-L*)/dlam_i = slack_i > 0), so tiny positive
    lam_i on inactive rows cost real gap.

    Per step: multipliers sitting AT the bound with inward gradient are
    frozen (their row/col masked out of the Newton system — a naively
    projected coupled step jams: the clamped coordinate's compensation
    moves the free ones the wrong way); the free-subspace Newton step is
    tried at backtracking fractions PLUS the exact step-to-boundary, and
    the best strictly-decreasing candidate wins.  Monotone (each accepted
    step improves a valid bound), O(dual_dim^3) per step — negligible next
    to the solve."""
    dtype = z.dtype
    dim = z.shape[0]
    mask = (jnp.arange(dim) < num_ineq)
    ts = 0.5 ** jnp.arange(8, dtype=dtype)  # 1, 1/2, ..., 1/128
    eps = jnp.finfo(dtype).eps
    eye = jnp.eye(dim, dtype=dtype)

    def project(z_):
        return jnp.where(mask, jnp.maximum(z_, 0.0), z_)

    def step(_, z):
        f0 = obj.value(z)
        g = obj.grad(z)
        H = obj.hess(z)
        at_bound = jnp.logical_and(mask,
                                   jnp.logical_and(z <= 0.0, g > 0.0))
        free = jnp.logical_not(at_bound)
        freef = free.astype(dtype)
        gf = jnp.where(free, g, 0.0)
        Hf = H * (freef[:, None] * freef[None, :]) + jnp.diag(1.0 - freef)
        Hf = Hf + (10.0 * eps * jnp.mean(jnp.abs(jnp.diag(Hf)))) * eye
        d = -jnp.linalg.solve(Hf, gf)
        # exact step to the first lam_i >= 0 boundary crossed (the next
        # iteration freezes it and Newton continues in the rest)
        neg = jnp.logical_and(mask, d < 0)
        t_bd = jnp.min(jnp.where(neg, -z / jnp.where(neg, d, -1.0), jnp.inf))
        cand = jnp.concatenate([ts, jnp.clip(t_bd, 0.0, 1.0)[None]])

        def trial(t):
            ft = obj.value(project(z + t * d))
            return jnp.where(jnp.isfinite(ft), ft, jnp.inf)

        fs = jax.vmap(trial)(cand)
        best = jnp.argmin(fs)
        improved = jnp.logical_and(fs[best] < f0,
                                   jnp.all(jnp.isfinite(d)))
        return jnp.where(improved, project(z + cand[best] * d), z)

    return jax.lax.fori_loop(0, steps, step, z)


def solve_dual(
    neg_dual_objective: Any,
    num_ineq: int,
    dual_dim: int,
    primal_optimum: Callable[[jax.Array], jax.Array],
    *,
    method: str = "BR",
    pars: SolverParams | None = None,
    polish_steps: int = 3,
) -> Solution:
    """Solve min -L*(z) s.t. z[:num_ineq] >= 0; map back to the primal.

    ``neg_dual_objective`` exposes value/grad/hess of -L* (already negated,
    i.e. convex).  Returns a Solution whose ``x`` is the PRIMAL optimum and
    whose ``lam``/``nu`` are the dual optimum split as in Duality.scala:128-132.
    """
    pars = pars or SolverParams()
    dtype = jnp.result_type(float)
    z0 = jnp.full((dual_dim,), pars.dual_start, dtype)

    if num_ineq > 0:
        cnts = ConstraintSet(
            blocks=(first_coordinates_positive(dual_dim, num_ineq,
                                               dtype=dtype),)
        )
        if method == "BR":
            sol = barrier_solve(neg_dual_objective, cnts, z0, pars)
        elif method == "PD":
            sol = primal_dual_solve(neg_dual_objective, cnts, z0, pars)
        else:
            raise ValueError(f"unknown solver method: {method!r}")
    else:
        # no inequality duals: unconstrained dual
        from .solvers.newton import newton_minimize

        def fgh(z):
            return (neg_dual_objective.value(z),
                    neg_dual_objective.grad(z),
                    neg_dual_objective.hess(z))

        res = newton_minimize(fgh, lambda z: jnp.asarray(True), z0, pars)
        nan = jnp.asarray(jnp.nan, dtype)
        sol = Solution(x=res.x, lam=jnp.zeros((0,), dtype),
                       nu=jnp.zeros((0,), dtype), newton_decrement=nan,
                       duality_gap=nan, eq_gap=nan, norm_grad=res.norm_grad,
                       norm_dual_residual=nan, iters=res.iters,
                       maxed_out=res.maxed_out, stalled=res.stalled)

    z = sol.x
    if polish_steps > 0:
        # f32 repair (and free f64 sharpening): see _polish_dual
        z = _polish_dual(neg_dual_objective, z, num_ineq, polish_steps, pars)
    from .tree import replace

    return replace(
        sol,
        x=primal_optimum(z),
        lam=z[:num_ineq],
        nu=z[num_ineq:],
    )
