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

Enable with ``options=dict(replay_grad=True, max_segments=...)`` on any
adaptive method.  The scan always executes `max_segments` (masked) steps in
the compiled program, so choose a budget close to the expected step count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..misc import Perturb
from ..ops.interp import interp_fit
from ..ops.rk_step import runge_kutta_step, weighted_sum
from .adaptive_rk import AdaptiveConfig, _Carry, _adaptive_step, _setup
from .solution import Stats, OK, ERR_SEGMENT_OVERFLOW


def record_segments(func, y0, ts, cfg: AdaptiveConfig, max_segments):
    """Raw adaptive pass recording accepted-step boundaries.

    Returns (times (S+1,) padded with +inf, count, Stats)."""
    ts = jnp.asarray(ts)
    t_dtype = ts.dtype
    n = y0.shape[0]
    t_end = ts[-1]

    f0, dt0, nfe0 = _setup(func, y0, ts[0], cfg, t_dtype)
    times = jnp.full((max_segments + 1,), jnp.inf, dtype=t_dtype)
    times = times.at[0].set(ts[0])

    zeros_coeff = jnp.zeros((5, n), dtype=y0.dtype).at[0].set(y0)
    carry0 = _Carry(
        y1=y0, f1=f0, t0=ts[0], t1=ts[0], dt=dt0, coeff=zeros_coeff,
        i_out=jnp.int32(0), out=jnp.zeros((1, n), dtype=y0.dtype),
        step_idx=jnp.int32(0), jump_idx=jnp.int32(0),
        nfe=jnp.int32(nfe0), n_steps=jnp.int32(0), n_acc=jnp.int32(0),
        n_rej=jnp.int32(0), steps_in_interval=jnp.int32(0),
        err=jnp.int32(OK), prev_ratio=jnp.ones((), dtype=ts.dtype),
        t0_lo=jnp.zeros((), dtype=t_dtype), t1_lo=jnp.zeros((), dtype=t_dtype))

    def cond(state):
        c, _ = state
        return (c.t1 < t_end) & (c.err == OK) & (c.n_acc < max_segments)

    def body(state):
        c, times = state
        c2 = _adaptive_step(c, func, cfg, None, None, t_dtype)
        accepted = c2.t1 != c.t1
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
    """Evaluate the (5, n) interpolant at a vector of times with a
    zero-width-interval guard (inactive replay segments have t1 == t0)."""
    denom = jnp.where(t1 > t0, t1 - t0, jnp.ones_like(t1))
    x = ((ts - t0) / denom).astype(coeff.dtype)   # (T,)
    total = coeff[0][None] + x[:, None] * coeff[1][None]
    x_power = x
    for i in range(2, coeff.shape[0]):
        x_power = x_power * x
        total = total + x_power[:, None] * coeff[i][None]
    return total  # (T, n)


def replay_integrate(func, y0, ts, cfg: AdaptiveConfig, times, count):
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
        y1, f1, _, k = runge_kutta_step(func, y, f, t0, dt, t1, tab)
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


def integrate_replay(func, y0, ts, cfg: AdaptiveConfig, max_segments):
    """Full replay-mode solve: record + differentiable re-execution."""
    if cfg.step_t is not None or cfg.jump_t is not None:
        raise NotImplementedError(
            "replay_grad does not support step_t/jump_t yet")
    # The recording pass must be fully tangent-free (a while_loop cannot be
    # reverse-differentiated, and under higher-order AD even downstream
    # stop_gradient is not enough) — sever every gradient path into it.
    sg = jax.lax.stop_gradient

    def func_sg(tt, yy, perturb=Perturb.NONE):
        return sg(func(sg(tt), sg(yy), perturb=perturb))

    times, count, stats = record_segments(func_sg, sg(y0), sg(ts), cfg,
                                          max_segments)
    ys = replay_integrate(func, y0, ts, cfg, times, count)
    bad = stats.error_code != OK
    ys = jnp.where(bad, jnp.nan, ys)
    return ys, stats
