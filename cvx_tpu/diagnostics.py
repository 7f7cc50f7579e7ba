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
    one_stage = SolverParams(**{**_as_dict(pars), "outer_max_iter": 1})
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


def _as_dict(pars: SolverParams) -> dict:
    import dataclasses

    return {f.name: getattr(pars, f.name)
            for f in dataclasses.fields(pars)}
