"""Observability: profiling, counters, and per-stage solve history.

Replaces the reference's observability story (SURVEY.md sections 5.1/5.5):
``Logger`` (file prints, cvx/Logger.scala), integer ``debugLevel`` gates, and
per-iteration console dumps.  On TPU the equivalents are:

  * ``trace(...)``: a jax.profiler trace context (view in TensorBoard /
    Perfetto) around a solve — replaces debugLevel>2 eigen-dumps with real
    hardware profiles;
  * solver counters: every Solution already carries the Newton-iteration
    count; ``solve_stats`` summarizes a (possibly batched) Solution;
  * ``barrier_history``: a host-driven stage-by-stage barrier run that
    records the OptState after every continuation stage (the debugLevel>3
    per-iteration dump, as data instead of prints).
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import numpy as np

from .problem.constraint_set import ConstraintSet
from .solvers.barrier import barrier_solve
from .solvers.types import SolverParams


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/cvx_tpu_trace"):
    """Profile everything inside the context with jax.profiler."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def solve_stats(sol) -> dict:
    """Summary counters for a Solution (batched or single).

    ``stalled_frac``/``maxed_out_frac`` surface the per-instance failure
    flags (Solution.status) so a batch with poisoned instances reports them
    instead of silently returning non-converged iterates."""
    iters = np.asarray(sol.iters)
    gap = np.asarray(sol.duality_gap)
    stalled = np.asarray(sol.stalled)
    return {
        "num_instances": int(iters.size),
        "newton_iters_total": int(iters.sum()),
        "newton_iters_mean": float(iters.mean()),
        "newton_iters_max": int(iters.max()),
        "gap_max": float(np.max(gap)),
        "gap_median": float(np.median(gap)),
        "maxed_out_frac": float(np.mean(np.asarray(sol.maxed_out))),
        "stalled_frac": float(np.mean(stalled)),
        "stalled_instances": np.flatnonzero(
            np.atleast_1d(stalled)).tolist()[:32],
    }


def kl_gap_certificate_np(X, H, u, steps: int = 10, prior=None):
    """Batched HOST-side (numpy f64) duality-gap certificate for KL
    instances — the benchmark's honesty check, outside any timed region.

    ``X`` (batch, n) returned iterates; ``H`` (k, n) shared scenario rows;
    ``u`` (batch, k) per-instance bounds.  The sum-to-one equality row is
    implied.  Mirrors ``cvx_tpu.models.dist_kl.kl_dual_gap``: least-squares
    dual fit + active-set projected-Newton polish on the closed-form dual
    -g(z) (each accepted step improves a valid bound), then
    gap_i = f(x_i) - g(z_i) <= f(x_i) - p*_i.  Returns (batch,) gaps.
    """
    X = np.asarray(X, np.float64)
    # coordinates that underflowed to exactly 0 would give log(0) = -inf
    # and NaN-poison the whole instance; x log(n x) -> 0 as x -> 0+, so
    # clamping to a tiny positive value changes f(x) by < 1e-28
    X = np.maximum(X, 1e-30)
    Hf = np.asarray(H, np.float64)
    batch, n = X.shape
    # general prior (None = the reference's uniform): R = p/e and
    # log(n x) becomes log x - log p throughout
    if prior is None:
        logp = np.full(n, -np.log(n))
        R = np.full(n, 1.0 / n) / np.e
    else:
        p = np.asarray(prior, np.float64)
        logp = np.log(p)
        R = p / np.e
    k = Hf.shape[0]
    dim = k + 1
    B = np.vstack([Hf, np.ones((1, n))])           # (k+1, n)
    W = np.column_stack([np.asarray(u, np.float64),
                         np.ones(batch)])          # (batch, k+1)
    C = -(1.0 + np.log(X) - logp[None, :])
    Z = C @ np.linalg.pinv(B.T).T                  # lstsq fit
    Z[:, :k] = np.clip(Z[:, :k], 0.0, None)

    def neg_g(Z_):
        return (np.sum(W * Z_, axis=1)
                + np.sum(np.exp(-(Z_ @ B)) * R[None, :], axis=1))

    def project(Z_):
        out = Z_.copy()
        out[:, :k] = np.clip(out[:, :k], 0.0, None)
        return out

    f0 = neg_g(Z)
    eye = np.eye(dim)
    eps = np.finfo(np.float64).eps
    for _ in range(steps):
        # pre-snap positive-but-below-rounding lam to exactly 0 so the
        # active-set freeze can see it (see duality._polish_dual)
        tiny = 64.0 * eps * (1.0 + np.max(np.abs(Z), axis=1, keepdims=True))
        Z[:, :k] = np.where(Z[:, :k] <= tiny, 0.0, Z[:, :k])
        Y = np.exp(-(Z @ B)) * R[None, :]
        grad = W - Y @ B.T
        at_bound = np.zeros((batch, dim), bool)
        at_bound[:, :k] = (Z[:, :k] <= 0.0) & (grad[:, :k] > 0.0)
        freef = (~at_bound).astype(np.float64)
        gf = np.where(at_bound, 0.0, grad)
        Hd = np.einsum("bn,in,jn->bij", Y, B, B)
        Hd = (Hd * freef[:, :, None] * freef[:, None, :]
              + np.einsum("bi,ij->bij", 1.0 - freef, eye))
        Hd += (1e-12 * np.trace(Hd, axis1=1, axis2=2)[:, None, None] / dim
               + 1e-300) * eye
        dZ = -np.linalg.solve(Hd, gf[..., None])[..., 0]
        neg = np.zeros((batch, dim), bool)
        neg[:, :k] = dZ[:, :k] < 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            t_bd = np.min(np.where(neg, -Z / np.where(neg, dZ, -1.0),
                                   np.inf), axis=1)
        t_bd = np.clip(np.nan_to_num(t_bd, nan=1.0, posinf=1.0), 0.0, 1.0)
        took = np.zeros(batch, bool)
        for tc in [None, 1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125]:
            t_arr = t_bd[:, None] if tc is None else tc
            Zt = project(Z + t_arr * dZ)
            ft = neg_g(Zt)
            acc = ~took & np.isfinite(ft) & (ft < f0)
            Z[acc] = Zt[acc]
            f0[acc] = ft[acc]
            took |= acc
    primal = np.sum(X * (np.log(X) - logp[None, :]), axis=1)
    return primal - (-f0)


def barrier_history(
    obj: Any,
    cnts: ConstraintSet,
    x0: jax.Array,
    pars: SolverParams | None = None,
    eqs=None,
    max_stages: int = 20,
) -> list[dict]:
    """Run the barrier continuation stage by stage (host loop over t),
    recording gap / objective / equality error / Newton iterations after
    each stage.  A debugging tool — the production solver is the fully
    jitted ``barrier_solve``."""
    pars = pars or SolverParams()
    history = []
    x = x0
    t = 1.0
    m = cnts.m
    from .tree import replace

    one_stage = replace(pars, outer_max_iter=1)
    for stage in range(max_stages):
        sol = barrier_solve(obj, cnts, x, one_stage, eqs=eqs, t0=t)
        x = sol.x
        rec = {
            "stage": stage,
            "t": t,
            "gap": float(sol.duality_gap),
            "obj": float(obj.value(x)),
            "eq_gap": float(sol.eq_gap),
            "newton_iters": int(sol.iters),
        }
        history.append(rec)
        if rec["gap"] < float(pars.tol):
            break
        t *= float(pars.mu)
    return history
