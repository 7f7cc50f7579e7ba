"""Double-single (float32x2) arithmetic for Pallas TPU kernels.

TPU Mosaic kernels cannot hold f64 values, but the certified-1e-8 KL route
(models/dist_kl.py::kl_certify — the reference's written accuracy contract,
SolverParams.scala:41) needs ~1e-12-accurate residual arithmetic.  XLA's own
f64-on-TPU emulation delivers that OUTSIDE kernels at ~6 ms per (10k, 100)
transcendental pass (measured round 3) — the entire certified-route budget.
This module provides the same double-single representation as explicit
(hi, lo) f32 pairs usable INSIDE a Pallas kernel, so the whole finishing
pass fuses into the solve kernel's epilogue.

Representation: x ≈ hi + lo with |lo| <= ulp(hi)/2 — ~48 bits of mantissa,
relative accuracy ~3.6e-15 per operation (f32 pair); the f32 EXPONENT range
(the same limit XLA's float32x2 emulation has — see CLAUDE.md).

Classic error-free transformations (Dekker 1971, Knuth TAOCP 4.2.2):
``two_sum``/``two_prod`` are exact; the ds_* combinators renormalize with a
``fast_two_sum``.  No FMA is assumed: ``two_prod`` uses Dekker splitting
(correct with IEEE f32 multiply; an FMA contraction by the compiler only
makes the error term MORE exact).  All functions are plain jnp expressions —
they work identically under Pallas/Mosaic, XLA jit, and NumPy-style eager,
which is how the unit tests validate them against real f64 on CPU.

COMPILER HAZARD (measured, round 4): when one operand of ``two_sum`` is a
materialized CONSTANT (e.g. a broadcast Taylor coefficient), XLA's algebraic
simplifier applies the FP-unsound rewrite ``(b + c) - c -> b``, collapsing
the EFT's error term to a first-order estimate (``ds_exp`` lost 5 decimal
digits under jit while exact in eager; optimized-HLO dump shows the
rewritten ``b - b`` term).  Both EFT sums therefore route the leading sum
through ``lax.optimization_barrier`` — an identity that blocks pattern
matching across it.  Mosaic (the Pallas TPU compiler) does NOT perform the
rewrite (measured: a minimal two_sum-with-constant kernel is exact) and
does not implement ``optimization_barrier`` either, so kernels disable the
guard while TRACING their body via ``inside_mosaic()``; Pallas interpret
mode executes the body as ordinary XLA ops and must KEEP the guard.

Scalars below (LN2 etc.) are split on the HOST in f64 — never materialize
f64 constants on a TPU device (CLAUDE.md float32x2 range note).
"""

from __future__ import annotations

import contextlib
import threading

import numpy as np

import jax
import jax.numpy as jnp

# --- the XLA-simplifier guard (module-docstring COMPILER HAZARD note) ---

_tls = threading.local()


@contextlib.contextmanager
def inside_mosaic(active: bool = True):
    """Trace-time switch: drop the optimization_barrier guards while a
    Pallas TPU kernel body is being traced (Mosaic cannot lower the
    primitive and, measured, does not need it).  Pallas kernels wrap
    their body in ``with ds.inside_mosaic(not interpret):`` — interpret
    mode runs the body as ordinary XLA ops and must keep the guard."""
    prev = getattr(_tls, "in_mosaic", False)
    _tls.in_mosaic = bool(active)
    try:
        yield
    finally:
        _tls.in_mosaic = prev


def _guard(x):
    if getattr(_tls, "in_mosaic", False):
        return x
    return jax.lax.optimization_barrier(x)


# --- error-free transformations ---------------------------------------


def two_sum(a, b):
    """s + err == a + b exactly (Knuth).

    The barrier hides ``s``'s provenance from the algebraic simplifier —
    see the module-docstring COMPILER HAZARD note.
    """
    s = _guard(a + b)
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def fast_two_sum(a, b):
    """s + err == a + b exactly, REQUIRES |a| >= |b| (or a == 0).

    Same guard as ``two_sum``: without it, ``b - (s - a)`` collapses to
    ``b - b`` when ``a`` is a constant.
    """
    s = _guard(a + b)
    err = b - (s - a)
    return s, err


_SPLIT = 4097.0   # 2^ceil(24/2) + 1 for f32's 24-bit mantissa


def _split(a):
    # hi = c - (c - a) is the same FP-unsound-rewrite shape as two_sum's
    # (b + c) - c (ADVICE round 4): a future simplifier pass folding it to
    # ``a`` would zero the split's low part and silently degrade every
    # two_prod.  Same guard discipline as two_sum/fast_two_sum.
    c = _SPLIT * a
    hi = c - _guard(c - a)
    return hi, a - hi


def two_prod(a, b):
    """p + err == a * b exactly (Dekker split; FMA-free)."""
    p = a * b
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, err


# --- double-single combinators (operands are (hi, lo) tuples) ----------


def ds(a):
    """Lift an f32 array to ds."""
    return a, jnp.zeros_like(a)


def ds_neg(x):
    return -x[0], -x[1]


def ds_add(x, y):
    s, e = two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return fast_two_sum(s, e)


def ds_add_f(x, f):
    s, e = two_sum(x[0], f)
    e = e + x[1]
    return fast_two_sum(s, e)


def ds_sub(x, y):
    return ds_add(x, ds_neg(y))


def ds_mul(x, y):
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return fast_two_sum(p, e)


def ds_mul_f(x, f):
    """ds * plain f32."""
    p, e = two_prod(x[0], f)
    e = e + x[1] * f
    return fast_two_sum(p, e)


def ds_prod_ff(a, b):
    """exact product of two plain f32 arrays, as ds."""
    return two_prod(a, b)


def ds_div(x, y):
    """x / y to ~ds accuracy (one Newton-corrected quotient)."""
    q1 = x[0] / y[0]
    r = ds_add(x, ds_neg(ds_mul_f(y, q1)))   # x - q1*y, exact-ish
    q2 = (r[0] + r[1]) / y[0]
    return fast_two_sum(q1, q2)


def ds_recip(y):
    """1 / y to ~ds accuracy."""
    q1 = 1.0 / y[0]
    # r = 1 - q1*y
    p = ds_mul_f(y, q1)
    r0, r1 = ds_add_f(ds_neg(p), 1.0)
    q2 = (r0 + r1) * q1
    return fast_two_sum(q1, q2)


def ds_sum(x, valid=None):
    """Reduce a ds (bt, n) row pair over axis 1 -> (bt, 1) ds.

    Contiguous-halves tree reduction (log2 n levels of ds_add) — Mosaic
    only needs static contiguous slices, no gathers.  n must be a power
    of two (kernels pad to the 128-lane multiple anyway); ``valid`` masks
    pad lanes.
    """
    hi, lo = x
    if valid is not None:
        hi = hi * valid
        lo = lo * valid
    n = hi.shape[-1]
    assert n & (n - 1) == 0, f"ds_sum needs a power-of-two width, got {n}"
    while n > 1:
        h = n // 2
        hi, lo = ds_add((hi[..., :h], lo[..., :h]),
                        (hi[..., h:], lo[..., h:]))
        n = h
    return hi, lo


# --- transcendentals ----------------------------------------------------

_LN2 = float(np.log(np.float64(2.0)))
_LN2_HI = float(np.float32(_LN2))
_LN2_LO = float(np.float64(_LN2) - np.float64(np.float32(_LN2)))
_INV_LN2 = float(1.0 / np.log(np.float64(2.0)))
# exp(r) Taylor coefficients 1/k!: k = 0..5 in ds (hi, lo), 6..12 in f32 —
# for |r| <= 0.347 the degree >= 6 tail contributes <= 2.7e-6 relatively,
# so f32 evaluation keeps its error below ~2e-13; the ds head carries the
# rest.  All split on the host.
_C_DS = [(float(np.float32(1.0 / np.float64(_f))),
          float(np.float64(1.0 / np.float64(_f))
                - np.float64(np.float32(1.0 / np.float64(_f)))))
         for _f in [1, 1, 2, 6, 24, 120]]
_C_F32 = [float(1.0 / np.float64(_f))
          for _f in [720, 5040, 40320, 362880, 3628800, 39916800,
                     479001600]]


def ds_exp(x, max_e: float = 80.0):
    """exp(x) for ds ``x``, ~5e-13 relative accuracy over |x| <= max_e.

    Range reduction by whole powers of two (exact ``exp2`` of the integer
    k), degree-12 Taylor on |r| <= ln2/2: degrees 0-5 evaluated in ds,
    the 6-12 tail in plain f32 (see coefficient note above).  Inputs are
    clipped to ±max_e — exp(80) ≈ 5.5e34 stays inside f32 range; callers
    guard the semantics of clipped lanes (cf. pallas_kl_dual's line
    search).
    """
    xh = jnp.clip(x[0], -max_e, max_e)
    xl = jnp.where(jnp.abs(x[0]) >= max_e, 0.0, x[1])
    k = jnp.round(xh * _INV_LN2)
    # r = x - k*ln2 exactly-ish: k*ln2 in ds via the split constant
    kl2 = ds_mul_f((jnp.full_like(xh, _LN2_HI),
                    jnp.full_like(xh, _LN2_LO)), k)
    r = ds_add((xh, xl), ds_neg(kl2))
    # f32 tail: Horner over degrees 6..12 evaluated at r_hi
    rh = r[0]
    tail = jnp.full_like(rh, _C_F32[-1])
    for c in _C_F32[-2::-1]:
        tail = tail * rh + c
    # ds head: Horner degrees 5..0 with the f32 tail folded in at degree 5
    c5 = (jnp.full_like(rh, _C_DS[5][0]), jnp.full_like(rh, _C_DS[5][1]))
    acc = ds_add(c5, ds_mul(r, ds(tail)))
    for kk in range(4, -1, -1):
        ck = (jnp.full_like(rh, _C_DS[kk][0]),
              jnp.full_like(rh, _C_DS[kk][1]))
        acc = ds_add(ck, ds_mul(r, acc))
    # 2^k EXACTLY, by assembling the f32 exponent field: jnp.exp2 in f32
    # is ~4e-7 off even at integer arguments (measured on the XLA CPU
    # backend) — that error would dominate the whole ds computation.
    # |k| <= max_e/ln2 ~ 116 < 126 keeps the result normal.
    ki = k.astype(jnp.int32)
    s = jax.lax.bitcast_convert_type((ki + 127) << 23, jnp.float32)
    return ds_mul_f(acc, s)


def ds_log(x):
    """log(x) for ds ``x`` with x > 0, ~1e-13 relative accuracy.

    One Newton/Halley-style correction of the f32 log: with
    l0 = log_f32(x_hi) and u = x * exp(-l0) = 1 + d (|d| ~ 1e-7),
    log x = l0 + d - d^2/2 + O(d^3), d^3 ~ 1e-21 — far below ds rounding.
    Cost: one ds_exp; intended for (bt, 1) scalars in the kernel epilogue,
    not full rows.
    """
    l0 = jnp.log(x[0])
    e = ds_exp(ds_neg(ds(l0)))
    u = ds_mul(x, e)
    d = ds_add_f(u, -1.0)
    corr = ds_add(d, ds_neg(ds_mul_f(ds_mul(d, d), 0.5)))
    return ds_add_f(corr, l0)


def ds_to_f64(x):
    """Combine a ds pair into f64 (host/XLA side, outside kernels)."""
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)
