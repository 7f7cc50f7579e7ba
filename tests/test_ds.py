"""Double-single (float32x2) arithmetic library (ops/ds.py) vs real f64.

These primitives carry the fused certified finish inside the Pallas dual
kernel; each must hold ~1e-13 relative accuracy on f32 pairs (test on the
CPU backend where jnp f64 is native ground truth).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvx_tpu.ops import ds as D


def _pair(x64):
    hi = jnp.asarray(x64, jnp.float32)
    lo = jnp.asarray(x64 - np.asarray(hi, np.float64), jnp.float32)
    return hi, lo


def _val(x):
    return np.asarray(x[0], np.float64) + np.asarray(x[1], np.float64)


def _relerr(x_ds, ref):
    return np.max(np.abs(_val(x_ds) - ref)
                  / np.maximum(np.abs(ref), 1e-300))


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


class TestDsCore:
    def test_add_mul_exact(self, rng):
        a64 = rng.uniform(-5, 5, 4096)
        b64 = rng.uniform(-5, 5, 4096)
        A, B = _pair(a64), _pair(b64)
        a_, b_ = _val(A), _val(B)
        # additive cancellation makes RELATIVE error unbounded by design;
        # the ds guarantee is absolute error ~eps^2 * operand scale
        add_abs = np.max(np.abs(_val(D.ds_add(A, B)) - (a_ + b_)))
        assert add_abs < 1e-13 * np.max(np.abs(a_) + np.abs(b_))
        assert _relerr(D.ds_mul(A, B), a_ * b_) < 1e-13
        assert _relerr(D.ds_prod_ff(A[0], B[0]),
                       np.asarray(A[0], np.float64)
                       * np.asarray(B[0], np.float64)) == 0.0

    def test_div_recip(self, rng):
        a64 = rng.uniform(-5, 5, 4096)
        b64 = rng.uniform(0.5, 5, 4096)
        A, B = _pair(a64), _pair(b64)
        assert _relerr(D.ds_div(A, B), _val(A) / _val(B)) < 2e-14
        assert _relerr(D.ds_recip(B), 1.0 / _val(B)) < 2e-14

    def test_sum_tree(self, rng):
        y64 = rng.uniform(0, 1, (8, 128))
        Y = _pair(y64)
        S = D.ds_sum(Y)
        ref = _val(Y).sum(axis=1, keepdims=True)
        assert _relerr(S, ref) < 1e-14

    def test_sum_masked(self, rng):
        y64 = rng.uniform(0, 1, (4, 128))
        Y = _pair(y64)
        valid = (jnp.arange(128) < 100).astype(jnp.float32)[None, :]
        S = D.ds_sum(Y, valid=valid)
        ref = (_val(Y) * np.asarray(valid, np.float64)).sum(
            axis=1, keepdims=True)
        assert _relerr(S, ref) < 1e-14


class TestDsTranscendental:
    @pytest.mark.parametrize("lo,hi,tol", [(-0.34, 0.34, 5e-13),
                                           (-30, 3, 5e-13),
                                           (2, 12, 5e-13)])
    def test_exp(self, rng, lo, hi, tol):
        e64 = rng.uniform(lo, hi, 8192)
        v = D.ds_exp(_pair(e64))
        assert _relerr(v, np.exp(_val(_pair(e64)))) < tol

    def test_exp_deep_negative_absolute(self, rng):
        # below ~1e-30 the lo limb underflows: relative accuracy degrades
        # to f32 eps, but the ABSOLUTE error (what sums of y see) stays
        # far below any gap tolerance
        e64 = rng.uniform(-80, -30, 4096)
        v = D.ds_exp(_pair(e64))
        ref = np.exp(_val(_pair(e64)))
        assert np.max(np.abs(_val(v) - ref)) < 1e-19

    def test_exp_clips(self):
        v = D.ds_exp(_pair(np.array([200.0, -200.0])), max_e=80.0)
        out = _val(v)
        assert np.isfinite(out).all()
        assert out[0] == pytest.approx(np.exp(80.0), rel=1e-6)

    def test_log(self, rng):
        s64 = rng.uniform(0.01, 100.0, 8192)
        v = D.ds_log(_pair(s64))
        assert _relerr(v, np.log(_val(_pair(s64)))) < 1e-12

    def test_exp2_integer_exact(self):
        # jnp.exp2 in f32 is ~4e-7 off at integer args (the bug this
        # library's bitcast-exponent construction avoids): exp(k ln2)
        # must hit the exact power of two
        for k in (-100, -7, 0, 9, 88):
            v = D.ds_exp(_pair(np.array([k * np.log(2.0)])))
            assert _val(v)[0] == pytest.approx(2.0 ** k, rel=3e-13)


class TestDsUnderJit:
    """Round-4 regression: XLA's algebraic simplifier applies the
    FP-unsound rewrite ``(b + c) - c -> b`` when one two_sum operand is a
    materialized constant, collapsing the EFT error term — ds_exp lost
    5 digits under jit while exact in eager (see ds.py COMPILER HAZARD).
    The optimization_barrier guard must hold the accuracy under jit."""

    def test_two_sum_with_constant_operand(self, rng):
        b = jnp.asarray(rng.standard_normal(4096) * 0.3, jnp.float32)

        def f(b):
            a = jnp.full_like(b, 0.008333334)   # broadcast constant
            return D.two_sum(a, b)

        s, e = jax.jit(f)(b)
        ref = (np.float64(np.float32(0.008333334))
               + np.asarray(b, np.float64))
        got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
        assert np.array_equal(got, ref)

    def test_fast_two_sum_with_constant_operand(self, rng):
        b = jnp.asarray(rng.standard_normal(4096) * 0.3, jnp.float32)

        def f(b):
            a = jnp.full_like(b, 2.0)           # |a| >= |b| holds
            return D.fast_two_sum(a, b)

        s, e = jax.jit(f)(b)
        ref = 2.0 + np.asarray(b, np.float64)
        got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
        assert np.array_equal(got, ref)

    def test_exp_jit_matches_eager(self, rng):
        e64 = rng.uniform(-30, 30, 8192)
        pair = _pair(e64)
        ref = np.exp(_val(pair))
        jit_v = jax.jit(D.ds_exp)(pair)
        assert _relerr(jit_v, ref) < 5e-13

    def test_inside_mosaic_drops_guard_and_restores(self):
        x = jnp.ones(8, jnp.float32)
        with D.inside_mosaic():
            jaxpr = jax.make_jaxpr(lambda a: D.two_sum(a, a * 0.5))(x)
            assert "optimization_barrier" not in str(jaxpr)
        jaxpr = jax.make_jaxpr(lambda a: D.two_sum(a, a * 0.5))(x)
        assert "optimization_barrier" in str(jaxpr)
