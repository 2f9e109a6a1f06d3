"""Compensated (double-word) f32 time accumulation.

The reference keeps timelike values in float64 (rk_common.py:180-195).  On
TPU x64 is unavailable, so the adaptive driver carries time as a double-word
f32 sum (ops/doubleword.py).  These tests pin the contract on CPU by forcing
``options=dict(dtype=jnp.float32)``: step counts must match the f64
reference to ~1% and accuracy must reach the f32-state floor even when the
integration interval sits at a large time offset (where plain f32 time
drifts by ~ulp(t)/2 per step).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdiffeq_tpu as tde
from torchdiffeq_tpu.ops import doubleword as dw

LAM = 0.3


def _field(t, y):
    return -LAM * y


def _solve_f32(T0, comp, rtol=1e-7, atol=1e-9, n_out=9, span=8.0):
    t = jnp.linspace(T0, T0 + span, n_out, dtype=jnp.float32)
    y0 = jnp.array([1.0], dtype=jnp.float32)
    ys, st = tde.odeint_with_stats(
        _field, y0, t, rtol=rtol, atol=atol,
        options=dict(dtype=jnp.float32, compensated_time=comp))
    exact = np.exp(-LAM * (np.asarray(t, np.float64) - T0))
    err = float(np.max(np.abs(np.asarray(ys[:, 0], np.float64) - exact)))
    return err, st


class TestTwoSum:
    def test_two_sum_exact(self):
        s, e = jax.jit(dw.two_sum)(jnp.float32(16384.0), jnp.float32(0.1))
        # the error word recovers exactly what fl(a+b) lost
        assert float(s) + float(e) == pytest.approx(
            16384.0 + float(jnp.float32(0.1)), abs=1e-12)
        assert float(e) != 0.0

    def test_dw_accumulation_driftless(self):
        @jax.jit
        def accum(n):
            def body(i, c):
                hi, lo, plain = c
                hi, lo = dw.dw_add(hi, lo, jnp.float32(0.047))
                return hi, lo, plain + jnp.float32(0.047)
            z = jnp.float32(0.0)
            return jax.lax.fori_loop(
                0, n, body, (jnp.float32(16384.0), z, jnp.float32(16384.0)))

        hi, lo, plain = accum(1000)
        true = 16384.0 + 1000 * float(jnp.float32(0.047))
        assert abs(float(hi) + float(lo) - true) < 1e-6
        assert abs(float(plain) - true) > 1e-2  # plain f32 drifts


class TestCompensatedSolve:
    def test_step_count_matches_f64_at_large_offset(self):
        """VERDICT item 3 'done' criterion: f32-time step counts within ~1%
        of the f64 reference at rtol=1e-7, including at time offsets where
        ulp(t) is a few percent of dt."""
        for T0 in (0.0, 16384.0, 131072.0):
            t64 = jnp.linspace(T0, T0 + 8.0, 9, dtype=jnp.float64)
            _, st64 = tde.odeint_with_stats(
                _field, jnp.array([1.0], jnp.float64), t64,
                rtol=1e-7, atol=1e-9)
            err32, st32 = _solve_f32(T0, comp=True)
            n64, n32 = int(st64.n_steps), int(st32.n_steps)
            assert int(st32.error_code) == 0
            assert abs(n32 - n64) <= max(1, round(0.01 * n64)), \
                f"T0={T0}: f32 steps {n32} vs f64 {n64}"
            assert err32 < 1e-5, f"T0={T0}: err {err32}"

    def test_compensation_beats_plain_f32(self):
        err_comp, _ = _solve_f32(16384.0, comp=True)
        err_plain, _ = _solve_f32(16384.0, comp=False)
        assert err_comp < 1e-5
        assert err_plain > 20 * err_comp  # plain f32 time visibly drifts

    def test_f64_trace_untouched_by_option(self):
        """With f64 time, compensated_time must not change the arithmetic
        (DETEST NFE parity depends on the exact x64 trace)."""
        t = jnp.linspace(0.0, 8.0, 9, dtype=jnp.float64)
        y0 = jnp.array([1.0], jnp.float64)
        ys_a, st_a = tde.odeint_with_stats(_field, y0, t, rtol=1e-7,
                                           atol=1e-9)
        ys_b, st_b = tde.odeint_with_stats(
            _field, y0, t, rtol=1e-7, atol=1e-9,
            options=dict(compensated_time=True))
        assert int(st_a.n_steps) == int(st_b.n_steps)
        np.testing.assert_array_equal(np.asarray(ys_a), np.asarray(ys_b))

    def test_event_solve_at_offset(self):
        T0 = 16384.0
        y0 = jnp.array([1.0], dtype=jnp.float32)
        ev_t, sol = tde.odeint_event(
            _field, y0, jnp.float32(T0),
            event_fn=lambda t, y: y[0] - 0.5,
            rtol=1e-7, atol=1e-9, options=dict(dtype=jnp.float32))
        t_true = T0 + np.log(2.0) / LAM
        # event time resolution is bounded by f32 ulp(t) ~ 2e-3 at 16384
        assert abs(float(ev_t) - t_true) < 1e-2
        assert abs(float(sol[-1, 0]) - 0.5) < 1e-3

    def test_jump_t_truncation_at_offset(self):
        """step_t/jump_t window tests run in double-word time: the
        truncation must land exactly on the requested time."""
        T0 = 16384.0
        t = jnp.linspace(T0, T0 + 8.0, 5, dtype=jnp.float32)
        jump = jnp.array([T0 + 3.1416], dtype=jnp.float32)
        y0 = jnp.array([1.0], dtype=jnp.float32)
        ys, st = tde.odeint_with_stats(
            _field, y0, t, rtol=1e-6, atol=1e-9,
            options=dict(dtype=jnp.float32, jump_t=jump))
        exact = np.exp(-LAM * (np.asarray(t, np.float64) - T0))
        err = float(np.max(np.abs(np.asarray(ys[:, 0], np.float64) - exact)))
        assert int(st.error_code) == 0
        assert err < 1e-5
