"""Replay-mode gradients for adaptive solvers: exact discretise-then-optimise.

The adaptive `lax.while_loop` cannot be reverse-differentiated, so plain
`odeint`'s default gradient is the continuous adjoint (adjoint.py).  Replay
mode instead recovers the reference's *backprop-through-the-solver*
semantics exactly:

1. a raw (non-differentiated) adaptive pass records the accepted-step
   boundary times into a static-capacity buffer (`max_segments`);
2. the solution is then recomputed by a differentiable `lax.scan` over
   those segments — identical arithmetic, no accept/reject control flow —
   with outputs emitted through the quartic interpolant.

Gradients of the scan are the exact derivatives of the discrete solver map
(step boundaries held fixed, the standard discretise-then-optimise
convention).  Because no `custom_vjp` is involved, the solve also composes
with `jax.jvp` (forward mode) and higher-order differentiation — neither of
which the reference nor the adjoint path supports.

Enable with ``options=dict(replay_grad=True)`` on any adaptive method.  The
step-count capacity `max_segments` is auto-sized with a probe recording when
the inputs are concrete (doubling retry on overflow, then trimmed to the
exact count); pass ``max_segments=N`` explicitly to skip the probe (required
when the solve is traced inside an outer `jit`).  The scan always executes
its full capacity in (masked) steps in the compiled program.

`step_t`/`jump_t` are supported: the recording pass truncates steps onto
them exactly as the main driver, and the replayed scan mirrors the
discontinuity handling (Perturb.PREV at the final stage comes from the
shared RK kernel; the jump-side FSAL re-evaluation is reproduced for
segments ending on a `jump_t`).

Event solves are supported via `integrate_replay_event`: the recording pass
steps until the sign change, the bracketing segment is replayed
differentiably, and the event time is a stop-gradient bisection plus one
differentiable Newton correction — an exact implicit-function gradient of
the *discrete* interpolant with no 1e-12 regulariser (cf. events.py's
continuous-IFT reroute, reference odeint.py:197-231).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..misc import Perturb
from ..ops.interp import interp_fit
from ..ops.rk_step import runge_kutta_step, weighted_sum
from .adaptive_rk import (AdaptiveConfig, _Carry, _adaptive_step, _setup,
                          _prep_tvals, _step_kernel)
from .solution import Stats, OK, ERR_SEGMENT_OVERFLOW


def _prep_cfg_tvals(cfg: AdaptiveConfig, t0, t_dtype):
    """Sorted step_t/jump_t arrays + starting indices (as in
    adaptive_rk.integrate)."""
    step_t = jump_t = None
    step_idx = jump_idx = jnp.int32(0)
    if cfg.step_t is not None:
        step_t, step_idx = _prep_tvals(cfg.step_t, t0, t_dtype)
    if cfg.jump_t is not None:
        jump_t, jump_idx = _prep_tvals(cfg.jump_t, t0, t_dtype)
    return step_t, step_idx, jump_t, jump_idx


def record_segments(func, y0, ts, cfg: AdaptiveConfig, max_segments):
    """Raw adaptive pass recording accepted-step boundaries.

    Returns (times (S+1,) padded with +inf, count, Stats)."""
    ts = jnp.asarray(ts)
    t_dtype = ts.dtype
    n = y0.shape[0]
    t_end = ts[-1]
    # match the main driver's time arithmetic (adaptive_rk.integrate):
    # compensated double-word stepping on f32 time avoids the spurious
    # dt-underflow/drifted boundaries the plain-f32 recording had
    use_dw = bool(cfg.compensated_time) and t_dtype == jnp.float32
    # max_num_steps is a PER-OUTPUT-INTERVAL budget in the main driver
    # (steps_in_interval resets at each emission); the recording loop
    # never emits, so scale the budget to the whole span
    n_iv = max(int(ts.shape[0]) - 1, 1)
    if cfg.max_num_steps < 2 ** 31 - 1:
        cfg = cfg._replace(
            max_num_steps=min(cfg.max_num_steps * n_iv, 2 ** 31 - 1))

    f0, dt0, nfe0 = _setup(func, y0, ts[0], cfg, t_dtype)
    times = jnp.full((max_segments + 1,), jnp.inf, dtype=t_dtype)
    times = times.at[0].set(ts[0])

    step_t, step_idx, jump_t, jump_idx = _prep_cfg_tvals(cfg, ts[0], t_dtype)

    zeros_coeff = jnp.zeros((5, n), dtype=y0.dtype).at[0].set(y0)
    carry0 = _Carry(
        y1=y0, f1=f0, t0=ts[0], t1=ts[0], dt=dt0, coeff=zeros_coeff,
        i_out=jnp.int32(0), out=jnp.zeros((1, n), dtype=y0.dtype),
        step_idx=step_idx, jump_idx=jump_idx,
        nfe=jnp.int32(nfe0), n_steps=jnp.int32(0), n_acc=jnp.int32(0),
        n_rej=jnp.int32(0), steps_in_interval=jnp.int32(0),
        err=jnp.int32(OK), prev_ratio=jnp.ones((), dtype=ts.dtype),
        prev_ratio2=jnp.ones((), dtype=ts.dtype),
        t0_lo=jnp.zeros((), dtype=t_dtype), t1_lo=jnp.zeros((), dtype=t_dtype))

    def cond(state):
        c, _ = state
        return (c.t1 < t_end) & (c.err == OK) & (c.n_acc < max_segments)

    def body(state):
        c, times = state
        c2 = _adaptive_step(c, func, cfg, step_t, jump_t, t_dtype,
                            use_dw=use_dw)
        # acceptance via the counter, NOT the hi time word: under dw
        # stepping an accepted sub-ULP step can advance only t1_lo,
        # and a t1-based test would skip the times write (an inf hole
        # mid-buffer that silently corrupts the replay)
        accepted = c2.n_acc != c.n_acc
        times = jnp.where(accepted, times.at[c2.n_acc].set(c2.t1), times)
        return (c2, times)

    carry, times = jax.lax.while_loop(cond, body, (carry0, times))
    err = jnp.where((carry.t1 < t_end) & (carry.err == OK),
                    ERR_SEGMENT_OVERFLOW, carry.err).astype(jnp.int32)
    stats = Stats.make(nfe=carry.nfe, n_steps=carry.n_steps,
                       n_accepted=carry.n_acc, n_rejected=carry.n_rej,
                       error_code=err)
    return times, carry.n_acc, stats


def _interp_eval_many(coeff, t0, t1, ts):
    """Evaluate the (5, n) interpolant at a vector of times (delegates to
    the driver's evaluator so replay and main-path output interpolation
    stay numerically identical; inactive replay segments have t1 == t0,
    which its zero-width guard handles)."""
    from .adaptive_rk import _interp_eval_vec
    return _interp_eval_vec(coeff, t0, t1, ts)


def _jump_reeval(func, f1, y1, t1, active, jump_t):
    """Mirror the driver's jump_t discontinuity handling
    (adaptive_rk._adaptive_step): a segment ending exactly ON a jump time
    re-evaluates the FSAL derivative on the far side (Perturb.NEXT).  The
    recorded boundary is bit-identical to the jump time (the driver sets
    t1 to it), so exact equality is the correct membership test."""
    if jump_t is None or jump_t.shape[0] == 0:
        return f1
    on_jump = active & jnp.any(t1 == jump_t)
    return jax.lax.cond(
        on_jump,
        lambda: func(t1, y1, perturb=Perturb.NEXT),
        lambda: f1)


def replay_integrate(func, y0, ts, cfg: AdaptiveConfig, times, count,
                     jump_t=None):
    """Differentiable re-execution of the recorded step sequence.

    `times`/`count` are treated as constants (stop_gradient); everything
    else — y0, closed-over parameters, the requested output times `ts` —
    receives exact discrete gradients through the scan.
    """
    tab = cfg.tableau
    ts = jnp.asarray(ts)
    T = ts.shape[0]
    n = y0.shape[0]
    S = times.shape[0] - 1

    times = jax.lax.stop_gradient(times)
    count = jax.lax.stop_gradient(count)

    # segment owning each output time: times[i] < ts[j] <= times[i+1]
    j_seg = jnp.clip(jnp.searchsorted(times, ts, side='left') - 1, 0, S - 1)
    out_idx = jnp.arange(T)

    f0 = func(ts[0], y0, perturb=Perturb.NONE)
    out0 = jnp.zeros((T, n), dtype=y0.dtype).at[0].set(y0)

    def body(carry, i):
        y, f, out = carry
        active = i < count
        t0 = jnp.where(jnp.isfinite(times[i]), times[i], ts[0])
        # inactive segments take a zero-width step: stages evaluate at
        # (t0, y), y1 == y, and nothing NaN-producing ever enters a where.
        t1 = jnp.where(active, times[i + 1], t0)
        dt = t1 - t0
        y1, f1, _, k = _step_kernel(cfg)(func, y, f, t0, dt, t1, tab)
        f1 = _jump_reeval(func, f1, y1, t1, active, jump_t)
        dt_y = jnp.asarray(dt).astype(y.dtype)
        y_mid = y + weighted_sum(tab.c_mid, list(k), dt_y)
        coeff = interp_fit(y, y1, y_mid, k[0], k[-1], dt_y)
        vals = _interp_eval_many(coeff, t0, t1, ts)
        emit = active & (j_seg == i) & (out_idx > 0)
        out = jnp.where(emit[:, None], vals, out)
        y = jnp.where(active, y1, y)
        f = jnp.where(active, f1, f)
        return (y, f, out), None

    (_, _, out), _ = jax.lax.scan(body, (y0, f0, out0), jnp.arange(S))
    return out


# Capacity defaults for auto-sized replay: the concrete probe starts at
# _AUTO_START and doubles on ERR_SEGMENT_OVERFLOW up to _AUTO_LIMIT; traced
# solves (no probe possible) fall back to _AUTO_START and flag overflow via
# the error code.
_AUTO_START = 512
_AUTO_LIMIT = 1 << 20


def _tangent_free(func):
    """Sever every gradient path into the recording pass (a while_loop
    cannot be reverse-differentiated, and under higher-order AD even
    downstream stop_gradient is not enough)."""
    sg = jax.lax.stop_gradient

    def func_sg(tt, yy, perturb=Perturb.NONE):
        return sg(func(sg(tt), sg(yy), perturb=perturb))

    return func_sg


def _probe_record(record_fn, *concrete_args):
    """Run `record_fn(capacity, *args)` with concrete inputs outside any
    trace, doubling the capacity on segment overflow.  Returns the
    concrete (numpy) results with the times buffer trimmed to the exact
    count, or None when any input is traced (probe impossible)."""
    import numpy as np
    tracer_errs = (jax.errors.ConcretizationTypeError,
                   jax.errors.TracerArrayConversionError,
                   jax.errors.TracerIntegerConversionError,
                   jax.errors.UnexpectedTracerError)
    cap = _AUTO_START
    while True:
        try:
            out = jax.jit(lambda *a: record_fn(cap, *a))(*concrete_args)
            out = jax.tree_util.tree_map(np.asarray, out)
        except tracer_errs:
            return None
        stats = out[-1]
        if int(stats.error_code) == ERR_SEGMENT_OVERFLOW and cap < _AUTO_LIMIT:
            cap *= 2
            continue
        times, count = out[0], int(out[1])
        return (times[:count + 1],) + (count,) + tuple(out[2:])


def integrate_replay(func, y0, ts, cfg: AdaptiveConfig, max_segments=None):
    """Full replay-mode solve: record + differentiable re-execution.

    `max_segments=None` auto-sizes the capacity: a probe recording with the
    concrete inputs (re-used directly — no duplicate work), falling back to
    a fixed default when the solve is traced inside an outer `jit`.

    Cost note: the probe cannot reuse jax's jit cache across EAGER calls
    (the recording closure bakes in `func`/`cfg`), so an eager loop of
    auto-sized replay solves retraces the recording program every call.
    Inside `jit` the fallback capacity applies (no probe); for eager
    loops pass `max_segments` explicitly to skip the probe entirely."""
    func_sg = _tangent_free(func)
    sg = jax.lax.stop_gradient
    t_dtype = jnp.asarray(ts).dtype
    jump_t = (None if cfg.jump_t is None
              else _prep_tvals(cfg.jump_t, jnp.asarray(ts)[0], t_dtype)[0])

    if max_segments is None:
        probe = _probe_record(
            lambda cap, y0_, ts_: record_segments(func_sg, y0_, ts_, cfg, cap),
            y0, ts)
        if probe is not None:
            times, count, stats = probe
            ys = replay_integrate(func, y0, ts, cfg, jnp.asarray(times),
                                  count, jump_t)
            bad = stats.error_code != OK
            ys = jnp.where(bad, jnp.nan, ys)
            return ys, stats
        max_segments = _AUTO_START

    times, count, stats = record_segments(func_sg, sg(y0), sg(ts), cfg,
                                          max_segments)
    ys = replay_integrate(func, y0, ts, cfg, times, count, jump_t)
    bad = stats.error_code != OK
    ys = jnp.where(bad, jnp.nan, ys)
    return ys, stats


# ---------------------------------------------------------------------------
# Event solves (replay mode): exact discrete event-time gradients.
# ---------------------------------------------------------------------------


def record_segments_until_event(func, y0, t0, event_fn, cfg: AdaptiveConfig,
                                max_segments):
    """Adaptive pass stepping until `event_fn` changes sign, recording the
    accepted-step boundaries (cf. adaptive_rk.integrate_until_event).

    Returns (times, count, sign0, at_event_already, Stats); the bracketing
    step is [times[count-1], times[count]]."""
    t0 = jnp.asarray(t0)
    t_dtype = t0.dtype
    n = y0.shape[0]
    # dw-matched stepping, as in record_segments
    use_dw = bool(cfg.compensated_time) and t_dtype == jnp.float32

    f0, dt0, nfe0 = _setup(func, y0, t0, cfg, t_dtype)
    step_t, step_idx, jump_t, jump_idx = _prep_cfg_tvals(cfg, t0, t_dtype)

    ev0 = event_fn(t0, y0)
    sign0 = jnp.sign(ev0)
    at_event_already = ev0 == 0

    times = jnp.full((max_segments + 1,), jnp.inf, dtype=t_dtype)
    times = times.at[0].set(t0)

    zeros_coeff = jnp.zeros((5, n), dtype=y0.dtype).at[0].set(y0)
    carry0 = _Carry(
        y1=y0, f1=f0, t0=t0, t1=t0, dt=dt0, coeff=zeros_coeff,
        i_out=jnp.int32(0), out=jnp.zeros((1, n), dtype=y0.dtype),
        step_idx=step_idx, jump_idx=jump_idx,
        nfe=jnp.int32(nfe0), n_steps=jnp.int32(0), n_acc=jnp.int32(0),
        n_rej=jnp.int32(0), steps_in_interval=jnp.int32(0),
        err=jnp.int32(OK), prev_ratio=jnp.ones((), dtype=t_dtype),
        prev_ratio2=jnp.ones((), dtype=t_dtype),
        t0_lo=jnp.zeros((), dtype=t_dtype), t1_lo=jnp.zeros((), dtype=t_dtype))

    def cond(state):
        c, _ = state
        same_sign = jnp.sign(event_fn(c.t1, c.y1)) == sign0
        return (same_sign & (c.err == OK) & ~at_event_already
                & (c.n_acc < max_segments))

    def body(state):
        c, times = state
        c2 = _adaptive_step(c, func, cfg, step_t, jump_t, t_dtype,
                            use_dw=use_dw)
        # acceptance via the counter, NOT the hi time word: under dw
        # stepping an accepted sub-ULP step can advance only t1_lo,
        # and a t1-based test would skip the times write (an inf hole
        # mid-buffer that silently corrupts the replay)
        accepted = c2.n_acc != c.n_acc
        times = jnp.where(accepted, times.at[c2.n_acc].set(c2.t1), times)
        return (c2, times)

    carry, times = jax.lax.while_loop(cond, body, (carry0, times))
    still_same = jnp.sign(event_fn(carry.t1, carry.y1)) == sign0
    err = jnp.where(still_same & (carry.err == OK) & ~at_event_already,
                    ERR_SEGMENT_OVERFLOW, carry.err).astype(jnp.int32)
    stats = Stats.make(nfe=carry.nfe, n_steps=carry.n_steps,
                       n_accepted=carry.n_acc, n_rejected=carry.n_rej,
                       error_code=err)
    return times, carry.n_acc, sign0, at_event_already, stats


def _replay_to_event(func, y0, t0, event_fn, cfg, times, count, sign0,
                     jump_t, atol):
    """Differentiable scan over the recorded segments; the event time is a
    stop-gradient bisection on the bracketing segment's interpolant plus one
    differentiable Newton correction, i.e. an exact implicit-function
    gradient of the discrete solution with no regulariser."""
    from ..events import find_event
    from ..ops.interp import interp_evaluate

    tab = cfg.tableau
    t0 = jnp.asarray(t0)
    n = y0.shape[0]
    S = times.shape[0] - 1

    times = jax.lax.stop_gradient(times)
    count = jax.lax.stop_gradient(count)

    f0 = func(t0, y0, perturb=Perturb.NONE)
    coeff0 = jnp.zeros((5, n), dtype=y0.dtype).at[0].set(y0)

    def body(carry, i):
        y, f, coeff, tb0, tb1 = carry
        active = i < count
        is_last = active & (i == count - 1)
        s0 = jnp.where(jnp.isfinite(times[i]), times[i], t0)
        s1 = jnp.where(active, times[i + 1], s0)
        dt = s1 - s0
        y1, f1, _, k = _step_kernel(cfg)(func, y, f, s0, dt, s1, tab)
        f1 = _jump_reeval(func, f1, y1, s1, active, jump_t)
        dt_y = jnp.asarray(dt).astype(y.dtype)
        y_mid = y + weighted_sum(tab.c_mid, list(k), dt_y)
        c_new = interp_fit(y, y1, y_mid, k[0], k[-1], dt_y)
        coeff = jnp.where(is_last, c_new, coeff)
        tb0 = jnp.where(is_last, s0, tb0)
        tb1 = jnp.where(is_last, s1, tb1)
        y = jnp.where(active, y1, y)
        f = jnp.where(active, f1, f)
        return (y, f, coeff, tb0, tb1), None

    (_, _, coeff, tb0, tb1), _ = jax.lax.scan(
        body, (y0, f0, coeff0, t0, t0), jnp.arange(S))

    interp_fn = lambda tt: interp_evaluate(coeff, tb0, tb1, tt)
    t_bis, _ = find_event(interp_fn, sign0, tb0, tb1, event_fn,
                          jnp.max(jnp.asarray(atol)))
    t_b = jax.lax.stop_gradient(t_bis)

    # One Newton correction: t* = t_b - g(t_b)/g'(t_b) with g'(t_b) held
    # constant gives d(t*)/dtheta = -(dg/dtheta)(t_b) / g'(t_b) — the exact
    # implicit-function derivative of g(t) = event_fn(t, interp(t)) = 0 on
    # the replayed (discrete) solution.
    g = lambda tt: jnp.asarray(event_fn(tt, interp_fn(tt))).reshape(())
    gprime = jax.lax.stop_gradient(jax.grad(g)(t_b))
    safe = jnp.where(jnp.abs(gprime) > 0, gprime, jnp.ones_like(gprime))
    event_t = t_b - g(t_b) / safe
    # keep the refined time inside the bracket (Newton from a ~atol-accurate
    # bisection start cannot legitimately leave it)
    event_t = jnp.clip(event_t, jax.lax.stop_gradient(tb0),
                       jax.lax.stop_gradient(tb1))
    return event_t, interp_fn(event_t)


def integrate_replay_event(func, y0, t0, event_fn, cfg: AdaptiveConfig,
                           max_segments=None):
    """Replay-mode event solve.  Returns (event_t, y_event, Stats) with
    exact discretise-then-optimise gradients for the event time and state
    (cf. the continuous-adjoint + IFT-reroute default path, events.py)."""
    func_sg = _tangent_free(func)
    sg = jax.lax.stop_gradient
    event_fn_sg = lambda tt, yy: sg(event_fn(sg(tt), sg(yy)))
    t_dtype = jnp.asarray(t0).dtype
    jump_t = (None if cfg.jump_t is None
              else _prep_tvals(cfg.jump_t, jnp.asarray(t0), t_dtype)[0])

    record_fn = lambda cap, y0_, t0_: record_segments_until_event(
        func_sg, y0_, t0_, event_fn_sg, cfg, cap)

    if max_segments is None:
        probe = _probe_record(record_fn, y0, t0)
        if probe is not None:
            times, count, sign0, at_event, stats = probe
            times, sign0 = jnp.asarray(times), jnp.asarray(sign0)
        else:
            times, count, sign0, at_event, stats = record_fn(
                _AUTO_START, sg(y0), sg(t0))
    else:
        times, count, sign0, at_event, stats = record_fn(
            max_segments, sg(y0), sg(t0))

    event_t, y_event = _replay_to_event(func, y0, t0, event_fn, cfg, times,
                                        count, sign0, jump_t, cfg.atol)
    event_t = jnp.where(at_event, jnp.asarray(t0), event_t)
    y_event = jnp.where(at_event, y0, y_event)
    bad = stats.error_code != OK
    event_t = jnp.where(bad, jnp.nan, event_t)
    y_event = jnp.where(bad, jnp.nan, y_event)
    return event_t, y_event, stats
