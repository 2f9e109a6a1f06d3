"""Adaptive Runge-Kutta driver as a single `lax.while_loop`.

TPU-native redesign of ``RKAdaptiveStepsizeODESolver`` (reference
torchdiffeq/_impl/rk_common.py:161-369).  The reference interleaves a Python
``while`` per output time with host-side branching; XLA punishes that, so
here the *entire* solve — stepping, accept/reject, ``step_t``/``jump_t``
truncation, and output emission via the 4th-order interpolant — is one
compiled ``while_loop`` over a fixed-shape carry.  The loop body is
branch-free: each iteration takes one adaptive step and scatter-emits every
requested output time the step covered (see `integrate`), so the trip count
equals the number of solver steps.

Numerical semantics (controller constants, FSAL, perturbation rules, the
mixed time/state precision contract) exactly mirror the reference; the
reference's data-dependent asserts become error codes in the carry
(see solution.py).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..misc import Perturb
from ..ops import doubleword as dw
from ..ops.interp import interp_fit_step, interp_evaluate, coeff_dtype
from ..ops.rk_step import runge_kutta_step, weighted_sum
from ..ops.step_control import (select_initial_step, compute_error_ratio,
                                optimal_step_size, optimal_step_size_pi,
                                optimal_step_size_pid)
from ..ops.tableaus import ButcherTableau
from ..ops.treemath import (tmap, twhere, tall_finite, zeros_buffer,
                            state_size, bmask)
from .solution import (Stats, OK, ERR_DT_UNDERFLOW, ERR_NONFINITE_STATE,
                       ERR_MAX_NUM_STEPS)


class _Carry(NamedTuple):
    # Mirror of `_RungeKuttaState` (reference rk_common.py:18).  State
    # fields are pytrees whose leaves keep their native shapes (a flat
    # ``(n,)`` vector for raveled problems) — see ops/treemath.py for why
    # native shapes matter for sharding on TPU ...
    y1: Any                # state at the end of the last accepted step
    f1: Any                # derivative there
    t0: jnp.ndarray        # scalar, start of the last step
    t1: jnp.ndarray        # scalar, end of the last step
    dt: jnp.ndarray        # scalar, proposed size of the next step
    coeff: Any             # per-leaf (5, ...) dense-output coeffs on [t0, t1]
    # ... plus the output buffer and telemetry that the reference keeps on
    # the Python side:
    i_out: jnp.ndarray     # next output index to emit
    out: Any               # per-leaf (T, ...) solution buffer
    step_idx: jnp.ndarray  # next step_t index
    jump_idx: jnp.ndarray  # next jump_t index
    nfe: jnp.ndarray
    n_steps: jnp.ndarray
    n_acc: jnp.ndarray
    n_rej: jnp.ndarray
    steps_in_interval: jnp.ndarray  # reset at each emission (reference
                                    # counts max_num_steps per `_advance`)
    err: jnp.ndarray
    prev_ratio: jnp.ndarray         # last accepted error ratio (PI/PID)
    prev_ratio2: jnp.ndarray        # second-to-last accepted ratio (PID)
    # Compensation words for f32-time runs (ops/doubleword.py): the true
    # step boundaries are t0 + t0_lo and t1 + t1_lo.  Zero (and untouched)
    # when time is f64 or compensation is disabled, preserving the exact
    # x64 arithmetic for reference parity.
    t0_lo: Any = 0.0
    t1_lo: Any = 0.0


class AdaptiveConfig(NamedTuple):
    tableau: ButcherTableau
    rtol: Any
    atol: Any
    norm: Any
    first_step: Any = None
    step_t: Any = None           # sorted 1-D array or None
    jump_t: Any = None
    safety: float = 0.9
    ifactor: float = 10.0
    dfactor: float = 0.2
    min_step: float = 0.0
    max_step: float = float('inf')
    max_num_steps: int = 2 ** 31 - 1
    controller: str = 'i'    # 'i' (reference parity), 'pi', or 'pid'
    pcoeff: float = 0.4
    icoeff: float = 0.7
    dcoeff: float = 0.0
    # Double-word time accumulation when the time dtype is f32 (i.e. x64 is
    # unavailable — the TPU default).  Matches the reference's f64-timelike
    # contract (rk_common.py:180-195) to ~49 mantissa bits.  No effect on
    # f64-time solves.
    compensated_time: bool = True
    # Step kernel override: same contract as ops.rk_step.runge_kutta_step
    # (used by the ESDIRK adaptive-implicit tier, adaptive_implicit.py).
    step_fn: Any = None
    # Interface/state-jump transform applied when an accepted step ends on
    # jump_t[k]: ``jump_state_fn(k, t1, y1) -> y1'`` runs before the
    # far-side FSAL re-evaluation.  Used by the fused single-sweep adjoint
    # backward (adjoint.py) to inject output cotangents at interior output
    # times without restarting the while_loop per interval.
    jump_state_fn: Any = None
    # Evaluate the jump transform + far-side f UNCONDITIONALLY every step
    # and select, instead of a lax.cond.  Set only by the fused adjoint
    # (via the internal '_jump_branch_free' option): its injection is a few
    # cheap gathers/adds and the cond's pass-through copies + fusion
    # barrier cost ~0.12 ms/step on the big augmented state
    # (dev/budget_probe5.py).  A USER-supplied jump_state_fn keeps the
    # lazy cond: an arbitrary user transform may be expensive, and
    # debug.callback-based eval counting must not see per-step phantom
    # evals (stats.nfe is correct either way).
    jump_branch_free: bool = False
    # Land steps exactly ON every output time (forced step_t boundaries)
    # instead of stepping past and interpolating.  Emission then copies the
    # step state directly, and the per-step quartic interpolation fit (and
    # its (5, n) carry) is skipped entirely — the TPU-idiomatic mode for
    # endpoint-only solves (T=2 training objectives, the fused adjoint
    # backward): less HBM traffic per step at the price of a slightly
    # different step sequence than the reference (hence opt-in).
    step_to_end: bool = False
    # Compute the embedded error estimate, its tolerance ratio, and the
    # norm in this dtype while stages/state stay in the state dtype.  The
    # TPU mixed-precision mode: bfloat16 state at f32 error control keeps
    # the reference's tolerance semantics (misc.py:80-95) without the
    # catastrophic-cancellation noise a bf16 error difference has below
    # rtol ~1e-3.  None = state dtype (reference behavior).
    error_dtype: Any = None


def _step_kernel(cfg: AdaptiveConfig):
    return cfg.step_fn if cfg.step_fn is not None else runge_kutta_step


def _setup(func, y0, t0, cfg: AdaptiveConfig, t_dtype):
    """Initial f0 / dt selection (reference `_before_integrate`,
    rk_common.py:213-241).  Returns (f0, dt0, nfe0)."""
    f0 = func(t0, y0, perturb=Perturb.NONE)
    if cfg.first_step is None:
        dt0 = select_initial_step(func, t0, y0, cfg.tableau.order - 1,
                                  cfg.rtol, cfg.atol, cfg.norm, f0)
        nfe0 = 2
    else:
        dt0 = jnp.asarray(cfg.first_step, dtype=t_dtype)
        nfe0 = 1
    return f0, dt0.astype(t_dtype), nfe0


def _prep_tvals(tvals, t0, t_dtype):
    """Sort the step_t/jump_t array and locate the first entry past t0
    (reference `_sort_tvals` + bisect, rk_common.py:224-241).  The array
    keeps its static length; exhaustion is handled by the `t0 < tv < t1`
    window test exactly as in the reference."""
    tvals = jnp.sort(jnp.asarray(tvals, dtype=t_dtype))
    idx = jnp.clip(jnp.searchsorted(tvals, t0, side='right'),
                   0, tvals.shape[0] - 1).astype(jnp.int32)
    return tvals, idx


def _coeff_buffer(y0, rows):
    """Zero dense-output coefficient buffer: per-leaf ``(rows, *shape)``
    in `coeff_dtype` (f32 for bfloat16/float16 leaves — the fit runs and
    stores in f32 there, see ops/interp.py `interp_fit_step`)."""
    return tmap(lambda l: jnp.zeros((rows,) + jnp.shape(l),
                                    coeff_dtype(l.dtype)), y0)


def _adaptive_step(c: _Carry, func, cfg: AdaptiveConfig, step_t, jump_t,
                   t_dtype, use_dw=False):
    """One accept-or-reject adaptive step (reference `_adaptive_step`,
    rk_common.py:266-361), fully branch-free.

    With ``use_dw`` (f32 time + compensated_time), step boundaries carry a
    compensation word (`t0_lo`/`t1_lo`) and every time accumulation /
    window comparison runs in double-word arithmetic; the f64-time trace is
    untouched (exact reference parity).
    """
    tab = cfg.tableau
    y0, f0, t0 = c.y1, c.f1, c.t1
    t0_lo = c.t1_lo
    dt = c.dt
    dt = jnp.where(jnp.isfinite(dt), dt, cfg.min_step)
    dt = jnp.clip(dt, cfg.min_step, cfg.max_step)

    if getattr(func, 'callback_step', None) is not None:
        func.callback_step(t0, y0, dt)  # reference rk_common.py:272

    # --- guards (reference asserts, rk_common.py:286-287 + solvers max) ----
    err = jnp.where(c.steps_in_interval >= cfg.max_num_steps,
                    ERR_MAX_NUM_STEPS, OK).astype(jnp.int32)
    if use_dw:
        t1, t1_lo = dw.dw_add(t0, t0_lo, dt)
        underflow = ~dw.dw_advanced(t1, t1_lo, t0, t0_lo)
    else:
        t1, t1_lo = t0 + dt, c.t1_lo
        underflow = ~(t0 + dt > t0)
    err = jnp.where((err == OK) & underflow, ERR_DT_UNDERFLOW,
                    err).astype(jnp.int32)
    err = jnp.where((err == OK) & ~tall_finite(y0),
                    ERR_NONFINITE_STATE, err).astype(jnp.int32)
    # A tripped guard freezes the carry by forcing `accept = False` below
    # (every state/coeff/index update is already gated on accept) plus
    # per-scalar gates on dt/t0/counters — the loop cond then exits on
    # `err != OK`.  This replaces a whole-carry select between the stepped
    # and frozen trees (jnp.where over y/f/coeff/out per step), which cost
    # several state-passes of HBM traffic per step on large states for a
    # path that fires at most once per solve.
    ok = err == OK

    # --- step_t / jump_t truncation (rk_common.py:293-311) ----------------
    false = jnp.asarray(False)

    def in_window(v):
        if use_dw:
            return (dw.dw_diff(v, t0, t0_lo) > 0) & (dw.dw_diff(v, t1, t1_lo) < 0)
        return (t0 < v) & (v < t1)

    on_step_t = false
    if step_t is not None and step_t.shape[0] > 0:
        next_step_t = step_t[c.step_idx]
        on_step_t = in_window(next_step_t)
        t1 = jnp.where(on_step_t, next_step_t, t1)
        if use_dw:
            t1_lo = jnp.where(on_step_t, jnp.zeros_like(t1_lo), t1_lo)
    on_jump_t = false
    if jump_t is not None and jump_t.shape[0] > 0:
        next_jump_t = jump_t[c.jump_idx]
        on_jump_t = in_window(next_jump_t)
        if cfg.jump_state_fn is not None:
            # Fused-adjoint interface points: gradient correctness requires
            # the state-jump hook to fire even when a proposed step lands
            # BITWISE-EXACTLY on the jump time (the strict reference window
            # would skip it and stall jump_idx, silently dropping every
            # remaining cotangent injection).  Including equality makes the
            # truncation a no-op (t1 <- v == t1) while still firing the
            # hook + far-side re-eval.  Only active with jump_state_fn, so
            # plain step_t/jump_t NFE parity with the reference is kept.
            if use_dw:
                at_end = dw.dw_diff(next_jump_t, t1, t1_lo) == 0
                past_t0 = dw.dw_diff(next_jump_t, t0, t0_lo) > 0
            else:
                at_end = next_jump_t == t1
                past_t0 = t0 < next_jump_t
            on_jump_t = on_jump_t | (past_t0 & at_end)
        on_step_t = on_step_t & ~on_jump_t
        t1 = jnp.where(on_jump_t, next_jump_t, t1)
        if use_dw:
            t1_lo = jnp.where(on_jump_t, jnp.zeros_like(t1_lo), t1_lo)
    # Only recompute dt when a truncation fired (reference rk_common.py:299,
    # 307): the unconditional `t1 - t0` roundtrip can exceed max_step by one
    # ULP and force-reject every step.
    truncated = on_step_t | on_jump_t
    if use_dw:
        dt = jnp.where(truncated, (t1 - t0) + (t1_lo - t0_lo), dt)
    else:
        dt = jnp.where(truncated, t1 - t0, dt)

    # --- the RK step -------------------------------------------------------
    if cfg.error_dtype is not None and cfg.step_fn is None:
        y1, f1, y1_err, k = runge_kutta_step(func, y0, f0, t0, dt, t1, tab,
                                             error_dtype=cfg.error_dtype)
    else:
        y1, f1, y1_err, k = _step_kernel(cfg)(func, y0, f0, t0, dt, t1, tab)
    # implicit steppers report one explicit eval per step (the FSAL carry);
    # stage-solve residual evaluations are not user-visible NFE, matching
    # the fixed-grid implicit convention (fixed_grid_implicit.py:239-242)
    nfe = 1 if tab.implicit else len(tab.alpha)

    if cfg.error_dtype is not None:
        # mixed-precision error control: tolerance scale, ratio, and norm
        # in error_dtype (f32) while state/stages stay e.g. bfloat16
        up = lambda tr: tmap(lambda l: l.astype(cfg.error_dtype), tr)
        error_ratio = compute_error_ratio(y1_err, cfg.rtol, cfg.atol,
                                          up(y0), up(y1), cfg.norm)
    else:
        error_ratio = compute_error_ratio(y1_err, cfg.rtol, cfg.atol, y0,
                                          y1, cfg.norm)
    accept = error_ratio <= 1
    accept = jnp.where(dt > cfg.max_step, False, accept)
    accept = jnp.where(dt <= cfg.min_step, True, accept)
    accept = accept & ok  # guard trip: freeze (see `ok` above)

    # --- jump_t: re-evaluate f on the far side of the discontinuity --------
    jump_reeval = false
    y1_prejump = y1  # dense output interpolates the pre-jump trajectory
    if jump_t is not None and jump_t.shape[0] > 0:
        jump_reeval = accept & on_jump_t
        if cfg.jump_state_fn is not None and cfg.jump_branch_free:
            # Interface condition: transform the state at the jump time
            # (the dense-output coeff above keeps the pre-jump trajectory,
            # which is the correct interpolant inside (t0, t1]).
            #
            # BRANCH-FREE on purpose: this path is the fused adjoint's
            # per-step hot loop over the large augmented state, and a
            # lax.cond here copies every pass-through operand (the full
            # aug tree) each iteration while putting a fusion barrier in
            # the body — measured at ~0.12 ms/step of the backward's
            # driver overhead (dev/budget_probe5.py).  Evaluating the
            # injection + far-side f unconditionally and selecting costs
            # one discarded VF eval on non-jump steps (~0.02 ms for the
            # probe shape) and fuses.  stats.nfe still counts only real
            # far-side re-evals (`jump_reeval` below), preserving
            # reference NFE accounting; this variant is INTERNAL — only
            # the fused adjoint sets jump_branch_free (a user-supplied
            # jump_state_fn takes the lazy cond below, so user transforms
            # run once per actual jump and debug.callback eval counting
            # sees no phantom per-step evals).
            y1 = twhere(jump_reeval,
                        cfg.jump_state_fn(c.jump_idx, t1, y1), y1)
            f1 = twhere(jump_reeval,
                        func(t1, y1, perturb=Perturb.NEXT), f1)
        elif cfg.jump_state_fn is not None:
            def _jumped():
                y1j = cfg.jump_state_fn(c.jump_idx, t1, y1)
                return y1j, func(t1, y1j, perturb=Perturb.NEXT)

            y1, f1 = jax.lax.cond(jump_reeval, _jumped, lambda: (y1, f1))
        else:
            f1 = jax.lax.cond(
                jump_reeval,
                lambda: func(t1, y1, perturb=Perturb.NEXT),
                lambda: f1)

    # branch-free select (a lax.cond here would constrain shard_map's
    # varying-axes typing; the fit is ~10 fused vector ops).  In
    # step_to_end mode no output is ever interpolated, so the fit (and its
    # carry traffic) is skipped entirely.
    if cfg.step_to_end:
        coeff = c.coeff
    else:
        coeff = twhere(accept, interp_fit_step(y0, y1_prejump, k, dt, tab),
                       c.coeff)

    cb_acc = getattr(func, 'callback_accept_step', None)
    cb_rej = getattr(func, 'callback_reject_step', None)
    if cb_acc is not None or cb_rej is not None:
        # fire exactly one of accept/reject per step (rk_common.py:339,354)
        jax.lax.cond(
            accept,
            lambda: (cb_acc or (lambda *a: None))(t0, y0, dt),
            lambda: (cb_rej or (lambda *a: None))(t0, y0, dt))

    t_next = jnp.where(accept, t1, t0)
    t_lo_next = jnp.where(accept, t1_lo, t0_lo) if use_dw else c.t1_lo
    y_next = twhere(accept, y1, y0)
    f_next = twhere(accept, f1, f0)
    if cfg.controller == 'pid':
        dt_next = optimal_step_size_pid(dt, error_ratio, c.prev_ratio,
                                        c.prev_ratio2, cfg.safety,
                                        cfg.ifactor, cfg.dfactor, tab.order,
                                        cfg.pcoeff, cfg.icoeff, cfg.dcoeff)
        prev_ratio = jnp.where(accept,
                               jnp.asarray(error_ratio).astype(c.prev_ratio.dtype),
                               c.prev_ratio)
        prev_ratio2 = jnp.where(accept, c.prev_ratio, c.prev_ratio2)
    elif cfg.controller == 'pi':
        dt_next = optimal_step_size_pi(dt, error_ratio, c.prev_ratio,
                                       cfg.safety, cfg.ifactor, cfg.dfactor,
                                       tab.order, cfg.pcoeff, cfg.icoeff)
        prev_ratio = jnp.where(accept,
                               jnp.asarray(error_ratio).astype(c.prev_ratio.dtype),
                               c.prev_ratio)
        prev_ratio2 = c.prev_ratio2
    else:
        dt_next = optimal_step_size(dt, error_ratio, cfg.safety, cfg.ifactor,
                                    cfg.dfactor, tab.order)
        prev_ratio = c.prev_ratio
        prev_ratio2 = c.prev_ratio2
    dt_next = jnp.clip(dt_next, cfg.min_step, cfg.max_step)

    step_idx, jump_idx = c.step_idx, c.jump_idx
    if step_t is not None and step_t.shape[0] > 0:
        step_idx = jnp.where(accept & on_step_t & (step_idx != step_t.shape[0] - 1),
                             step_idx + 1, step_idx)
    if jump_t is not None and jump_t.shape[0] > 0:
        jump_idx = jnp.where(accept & on_jump_t & (jump_idx != jump_t.shape[0] - 1),
                             jump_idx + 1, jump_idx)

    # Guard-trip freeze: every tree-valued update above is gated on
    # `accept` (forced False on a trip); the remaining scalar fields are
    # gated here individually — free selects, no whole-carry pass.
    one = jnp.int32(1)
    zero_i = jnp.int32(0)
    ok_i = jnp.where(ok, one, zero_i)
    return c._replace(
        y1=y_next, f1=f_next,
        t0=jnp.where(ok, t0, c.t0), t1=t_next,
        dt=jnp.where(ok, dt_next, c.dt), coeff=coeff,
        t0_lo=(jnp.where(ok, t0_lo, c.t0_lo) if use_dw else c.t0_lo),
        t1_lo=t_lo_next,
        prev_ratio=prev_ratio, prev_ratio2=prev_ratio2,
        step_idx=step_idx, jump_idx=jump_idx,
        nfe=c.nfe + jnp.where(ok, jnp.int32(nfe), zero_i)
            + jump_reeval.astype(jnp.int32),
        n_steps=c.n_steps + ok_i,
        n_acc=c.n_acc + accept.astype(jnp.int32),
        n_rej=c.n_rej + (ok & ~accept).astype(jnp.int32),
        steps_in_interval=c.steps_in_interval + ok_i,
        err=err)


# Above this output-buffer size (T * n elements), the per-step vectorised
# emission would dominate; fall back to one-output-per-iteration emission.
_SCATTER_EMIT_MAX_ELEMENTS = 1 << 22
# The cond-based fallback body looks cheaper for big (T, state) output
# buffers, but its compiled HLO COPIES the full buffer through the step
# branch every iteration (XLA conditionals cannot alias pass-through
# operands), so its per-step emission traffic equals the scatter body's
# masked write — while also paying branch copies for y/f, one extra
# loop iteration per output time, and a fusion barrier between the step
# and the accept/emit machinery.  Measured on a v5e (dev/budget_probe7.py,
# bf16, 2.6-2.7M-element states): scatter 2.1x faster end-to-end on a
# T=2 big-state solve and 2.2x on a T=10 (B, 256) forward solve.  The
# scatter body is therefore used for any moderate T regardless of state
# size; the cond body remains only for very long output grids, where
# "T state-equivalents of traffic per step" is unaffordable no matter
# which body runs and the extra iterations are the lesser evil.
_SCATTER_EMIT_MAX_T = 64


def integrate(func, y0, ts, cfg: AdaptiveConfig):
    """Integrate to every time in `ts` (increasing, shape (T,)).

    Returns (ys (T, n), Stats).  The equivalent of
    `AdaptiveStepsizeODESolver.integrate` (reference solvers.py:28-35) +
    `_advance` (rk_common.py:243-250), fused into one while_loop.

    TPU-native emission: after every accepted step, ALL requested output
    times falling inside (t0, t1] are written via a masked vectorised
    interpolation — the loop trip count is exactly the number of solver
    steps, with no emit iterations and no branch in the body (each loop
    iteration costs ~tens of microseconds of dispatch on TPU, so trading
    T iterations for O(T*n) fused vector work is a large win for dense
    output grids).  For huge output buffers a per-output emission loop is
    used instead.
    """
    ts = jnp.asarray(ts)
    t_dtype = ts.dtype
    T = ts.shape[0]
    use_dw = bool(cfg.compensated_time) and t_dtype == jnp.float32

    f0, dt0, nfe0 = _setup(func, y0, ts[0], cfg, t_dtype)

    _check_no_duplicates(cfg.step_t, cfg.jump_t)
    if cfg.step_to_end:
        # Force a step boundary ON every output time; emission then copies
        # the step state directly (no quartic fit/eval, no (5, n) carry).
        extra = ts[1:]
        merged = (extra if cfg.step_t is None
                  else jnp.concatenate([jnp.asarray(cfg.step_t,
                                                    dtype=t_dtype), extra]))
        # Two collision classes must be masked out of the merged array
        # (times may be traced, so dedup by +inf substitution — an inf
        # entry keeps the array sorted/static-shape and can never satisfy
        # the strict t0 < v < t1 window):
        # 1. a user step_t equal to an output time: the duplicate would
        #    stall step_idx on the second copy forever, silently skipping
        #    every later forced boundary;
        # 2. an output time equal to a jump_t: step truncation would land
        #    on it FIRST (shadowing the strict jump window), skipping the
        #    far-side re-evaluation and stalling jump_idx.  Dropping the
        #    step_t copy lets the jump truncation provide the boundary,
        #    so step_to_end emission still copies the step state there.
        merged = jnp.sort(merged)
        drop = jnp.concatenate([jnp.zeros((1,), bool),
                                merged[1:] == merged[:-1]])
        if cfg.jump_t is not None:
            jt = jnp.asarray(cfg.jump_t, dtype=t_dtype)
            if jt.ndim == 0:
                jt = jt[None]
            drop = drop | jnp.any(merged[:, None] == jt[None, :], axis=1)
        merged = jnp.sort(jnp.where(drop, jnp.inf, merged))
        cfg = cfg._replace(step_t=merged)

    step_t = jump_t = None
    step_idx = jump_idx = jnp.int32(0)
    if cfg.step_t is not None:
        step_t, step_idx = _prep_tvals(cfg.step_t, ts[0], t_dtype)
    if cfg.jump_t is not None:
        jump_t, jump_idx = _prep_tvals(cfg.jump_t, ts[0], t_dtype)

    # Endpoint fast path: with step_to_end and a two-point grid (the fused
    # adjoint backward's and endpoint-training's exact shape) the only
    # requested value is ts[-1], and step_to_end forces the final step to
    # land ON it — so the answer is simply the final carry state.  Keeping
    # a (2, state) output buffer in the while carry costs ~8 state-passes
    # of HBM traffic per step (masked scatter + the guard-freeze select
    # over the carry), measured at most of the backward driver overhead
    # for big augmented states (dev/budget_probe6.py).  Drop the buffer
    # from the carry entirely and assemble [y0, y_end] after the loop.
    endpoint_only = cfg.step_to_end and T == 2
    out = zeros_buffer(y0, 0, set0=False) if endpoint_only \
        else zeros_buffer(y0, T)
    # one dead row in step_to_end mode (the interpolant is never fit/read)
    zeros_coeff = _coeff_buffer(y0, 1 if cfg.step_to_end else 5)
    zero_t = jnp.zeros((), dtype=t_dtype)
    carry = _Carry(
        y1=y0, f1=f0, t0=ts[0], t1=ts[0], dt=dt0, coeff=zeros_coeff,
        i_out=jnp.int32(1), out=out, step_idx=step_idx, jump_idx=jump_idx,
        nfe=jnp.int32(nfe0), n_steps=jnp.int32(0), n_acc=jnp.int32(0),
        n_rej=jnp.int32(0), steps_in_interval=jnp.int32(0),
        err=jnp.int32(OK), prev_ratio=jnp.ones((), dtype=t_dtype),
        prev_ratio2=jnp.ones((), dtype=t_dtype),
        t0_lo=zero_t, t1_lo=zero_t)

    def past_t1(c, t):
        """t > (c.t1 + c.t1_lo)."""
        if use_dw:
            return dw.dw_diff(t, c.t1, c.t1_lo) > 0
        return t > c.t1

    if (T <= _SCATTER_EMIT_MAX_T
            or T * state_size(y0) <= _SCATTER_EMIT_MAX_ELEMENTS):
        t_end = ts[-1]

        def cond(c):
            return past_t1(c, t_end) & (c.err == OK)

        def body(c):
            c2 = _adaptive_step(c, func, cfg, step_t, jump_t, t_dtype,
                                use_dw)
            if endpoint_only:
                # single output interval, value read from the final carry
                # after the loop: no emission work, and steps_in_interval
                # need never reset (the only boundary ends the loop).
                return c2
            # emit every output time first covered by this step; nothing on
            # a guard-trip iteration (the frozen carry keeps the LAST
            # accepted step's window — re-emitting it would advance i_out
            # past the truly-written rows and under-poison the tail)
            if use_dw:
                emit_mask = ((dw.dw_diff(ts, c2.t0, c2.t0_lo) > 0)
                             & (dw.dw_diff(ts, c2.t1, c2.t1_lo) <= 0))
            else:
                emit_mask = (ts > c2.t0) & (ts <= c2.t1)
            emit_mask = emit_mask & (c2.err == OK)
            if cfg.step_to_end:
                # steps land exactly ON output times: the window holds at
                # most the boundary itself — copy the step state directly
                vals = tmap(
                    lambda yl: jnp.broadcast_to(yl[None],
                                                (T,) + jnp.shape(yl)),
                    c2.y1)
            elif use_dw:
                vals = _interp_eval_vec(c2.coeff, c2.t0, c2.t1, ts,
                                        c2.t0_lo, c2.t1_lo)
            else:
                vals = _interp_eval_vec(c2.coeff, c2.t0, c2.t1, ts)
            # cast back to the state dtype (interp coeffs/values are f32
            # for sub-f32 states; a no-op otherwise)
            out = tmap(lambda v, o: jnp.where(bmask(emit_mask, o),
                                              v.astype(o.dtype), o),
                       vals, c2.out)
            emitted_any = jnp.any(emit_mask)
            return c2._replace(
                out=out,
                i_out=c2.i_out + jnp.sum(emit_mask).astype(jnp.int32),
                # max_num_steps bounds steps per output interval
                # (reference `_advance`, rk_common.py:243-247)
                steps_in_interval=jnp.where(emitted_any, 0,
                                            c2.steps_in_interval))

        carry = jax.lax.while_loop(cond, body, carry)
    else:
        def cond(c):
            return (c.i_out < T) & (c.err == OK)

        def emit(c):
            next_t = ts[c.i_out]
            if cfg.step_to_end:
                y = c.y1           # the step landed exactly on next_t
            elif use_dw:
                y = tmap(lambda v: v[0],
                         _interp_eval_vec(c.coeff, c.t0, c.t1, next_t[None],
                                          c.t0_lo, c.t1_lo))
            else:
                y = interp_evaluate(c.coeff, c.t0, c.t1, next_t)
            return c._replace(out=tmap(lambda o, yl:
                                       o.at[c.i_out].set(yl.astype(o.dtype)),
                                       c.out, y),
                              i_out=c.i_out + 1,
                              steps_in_interval=jnp.int32(0))

        def body(c):
            next_t = ts[c.i_out]
            return jax.lax.cond(
                past_t1(c, next_t),
                lambda cc: _adaptive_step(cc, func, cfg, step_t, jump_t,
                                          t_dtype, use_dw),
                emit,
                c)

        carry = jax.lax.while_loop(cond, body, carry)

    # On failure, poison the unwritten tail of the buffer so downstream
    # consumers can't silently use stale zeros.
    bad = carry.err != OK
    if endpoint_only:
        ys = tmap(lambda l0, l1: jnp.stack([l0, jnp.where(bad, jnp.nan, l1)]),
                  y0, carry.y1)
    else:
        row_ids = jnp.arange(T)
        ys = tmap(
            lambda o: jnp.where(bad & bmask(row_ids >= carry.i_out, o),
                                jnp.nan, o),
            carry.out)

    stats = Stats.make(nfe=carry.nfe, n_steps=carry.n_steps,
                       n_accepted=carry.n_acc, n_rejected=carry.n_rej,
                       error_code=carry.err, final_dt=carry.dt)
    return ys, stats


def _interp_eval_vec(coeff, t0, t1, ts, t0_lo=None, t1_lo=None):
    """Vectorised interpolant evaluation at all output times with a
    zero-width guard (rejected steps have t1 == t0).  With compensation
    words, the normalised coordinate is computed in double-word time."""
    if t0_lo is not None:
        den = (t1 - t0) + (t1_lo - t0_lo)
        denom = jnp.where(den > 0, den, jnp.ones_like(den))
        x = ((ts - t0) - t0_lo) / denom
    else:
        denom = jnp.where(t1 > t0, t1 - t0, jnp.ones_like(t1))
        x = (ts - t0) / denom

    def leaf(cl):
        xl = x.astype(cl.dtype)
        xb = xl.reshape(xl.shape + (1,) * (cl.ndim - 1))
        total = cl[0][None] + xb * cl[1][None]
        x_power = xb
        for i in range(2, cl.shape[0]):
            x_power = x_power * xb
            total = total + x_power * cl[i][None]
        return total

    return tmap(leaf, coeff)


def integrate_until_event(func, y0, t0, event_fn, cfg: AdaptiveConfig):
    """Step until `event_fn(t, y)` changes sign, then bisect on the dense
    interpolant (reference `_advance_until_event`, rk_common.py:252-264 +
    `integrate_until_event`, solvers.py:44-49).

    Returns (event_t, y_event, Stats).
    """
    from ..events import find_event

    # event localisation bisects the dense interpolant — the step_to_end
    # fast path (which skips the interpolant) does not apply here
    cfg = cfg._replace(step_to_end=False)

    t0 = jnp.asarray(t0)
    t_dtype = t0.dtype
    use_dw = bool(cfg.compensated_time) and t_dtype == jnp.float32

    f0, dt0, nfe0 = _setup(func, y0, t0, cfg, t_dtype)

    step_t = jump_t = None
    step_idx = jump_idx = jnp.int32(0)
    if cfg.step_t is not None:
        step_t, step_idx = _prep_tvals(cfg.step_t, t0, t_dtype)
    if cfg.jump_t is not None:
        jump_t, jump_idx = _prep_tvals(cfg.jump_t, t0, t_dtype)

    ev0 = event_fn(t0, y0)
    sign0 = jnp.sign(ev0)
    at_event_already = ev0 == 0

    zeros_coeff = _coeff_buffer(y0, 5)
    zero_t = jnp.zeros((), dtype=t_dtype)
    carry = _Carry(
        y1=y0, f1=f0, t0=t0, t1=t0, dt=dt0, coeff=zeros_coeff,
        i_out=jnp.int32(0), out=zeros_buffer(y0, 1, set0=False),
        step_idx=step_idx, jump_idx=jump_idx,
        nfe=jnp.int32(nfe0), n_steps=jnp.int32(0), n_acc=jnp.int32(0),
        n_rej=jnp.int32(0), steps_in_interval=jnp.int32(0),
        err=jnp.int32(OK), prev_ratio=jnp.ones((), dtype=t_dtype),
        prev_ratio2=jnp.ones((), dtype=t_dtype),
        t0_lo=zero_t, t1_lo=zero_t)

    def cond(c):
        same_sign = jnp.sign(event_fn(c.t1, c.y1)) == sign0
        return same_sign & (c.err == OK) & ~at_event_already

    def body(c):
        return _adaptive_step(c, func, cfg, step_t, jump_t, t_dtype, use_dw)

    carry = jax.lax.while_loop(cond, body, carry)

    def interp_fn(t):
        # interp coeffs/values are f32 for sub-f32 states: cast back so
        # event bisection and `y_event` keep the state dtype (lax.cond
        # branches must agree; a no-op for f32/f64 states)
        y = interp_evaluate(carry.coeff, carry.t0, carry.t1, t)
        return tmap(lambda v, l: v.astype(l.dtype), y, y0)

    def _found():
        return find_event(interp_fn, sign0, carry.t0, carry.t1, event_fn,
                          cfg.atol)

    def _already():
        return t0, y0

    event_t, y_event = jax.lax.cond(at_event_already, _already, _found)
    stats = Stats.make(nfe=carry.nfe, n_steps=carry.n_steps,
                       n_accepted=carry.n_acc, n_rejected=carry.n_rej,
                       error_code=carry.err, final_dt=carry.dt)
    return event_t, y_event, stats


def _check_no_duplicates(step_t, jump_t):
    """`step_t` and `jump_t` must not share elements (reference
    rk_common.py:229-231).  Only checkable with concrete values."""
    if step_t is None or jump_t is None:
        return
    try:
        s = np.asarray(step_t).ravel()
        j = np.asarray(jump_t).ravel()
    except Exception:
        return
    combined = np.concatenate([s, j])
    if len(np.unique(combined)) != len(combined):
        raise ValueError(
            "`step_t` and `jump_t` must not have any repeated elements "
            "between them.")
