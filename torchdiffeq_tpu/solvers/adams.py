"""Adams-Bashforth(-Moulton) multistep solvers.

Rebuild of torchdiffeq/_impl/fixed_adams.py:164-228 with a TPU-native design:
the f-history deque becomes a fixed-shape newest-first ring buffer carried
through `lax.scan`, the order ramp-up (4 -> max_order as history accumulates,
with an RK4 bootstrap below order 4) becomes a dynamic row-gather into the
padded coefficient tables, and the implicit Adams-Moulton corrector runs a
static `max_iters`-iteration loop with convergence masking (the reference
breaks early; both produce the converged value).

NFE accounting: `Stats.nfe` reports the reference's eval count — one
predictor eval per step plus only the PRE-convergence corrector iterations
(reference fixed_adams.py:208-222 breaks out of the corrector on
convergence) and the RK4 bootstrap's 3 extra stage evals — carried as a
data-dependent counter in the stepper state.  The masked loop still
EXECUTES `max_iters` corrector evaluations per step (a compute-only
deviation, documented in COVERAGE.md): host-side counting via
`jax.debug.callback` therefore sees more calls than `Stats.nfe` reports.

The whole sweep is reverse-differentiable, matching the reference's
backprop-through-the-solver gradients.
"""
from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp

from ..misc import Perturb
from ..ops import rk_step
from ..ops.adams_coeffs import (BASHFORTH, MOULTON, MIN_ORDER, MAX_ORDER,
                                MAX_ITERS)
from ..ops.step_control import compute_error_ratio
from ..misc import linf_norm
from .fixed_grid import (FixedStepMethod, construct_grid, integrate_fixed_grid)


def make_adams_method(*, implicit, rtol, atol, max_iters=MAX_ITERS,
                      max_order=MAX_ORDER):
    """Build an Adams `FixedStepMethod` (stateful: the history ring buffer
    lives in the stepper state so the same scan / event-loop drivers apply)."""
    max_order = int(max_order)
    if max_order > MAX_ORDER:
        raise ValueError(f"max_order must be at most {MAX_ORDER}")
    if max_order < MIN_ORDER:
        warnings.warn(
            f"max_order is below {MIN_ORDER}, so the solver reduces to `rk4`.")
    hist_size = max(max_order - 1, 1)

    bashforth = jnp.asarray(BASHFORTH[:, :hist_size])
    moulton = jnp.asarray(MOULTON[:, :hist_size + 1])

    def init_state(func, y0, t0):
        hist = jnp.zeros((hist_size,) + y0.shape, dtype=y0.dtype)
        # prev_t lives in the (real) time dtype, NOT the state dtype: for f32
        # state on a fine f64 grid, casting times to the state dtype can make
        # adjacent grid points collide so history updates are silently
        # skipped; for complex state it would store complex times.  The
        # reference keeps history timestamps in the time dtype
        # (fixed_adams.py:175-178).
        t_dtype = jnp.asarray(t0).real.dtype
        return dict(hist=hist,
                    hist_len=jnp.int32(0),
                    prev_t=jnp.zeros((), dtype=t_dtype),
                    have_prev=jnp.asarray(False),
                    nfe=jnp.int32(0))

    def _update_history(state, t, f):
        # reference `_update_history` (fixed_adams.py:175-178): prepend only
        # when the time advanced.
        do = (~state['have_prev']) | (state['prev_t'] != t)
        hist = jnp.where(do, jnp.roll(state['hist'], 1, axis=0).at[0].set(f),
                         state['hist'])
        hist_len = jnp.where(do,
                             jnp.minimum(state['hist_len'] + 1, hist_size),
                             state['hist_len'])
        prev_t = jnp.where(do, t, state['prev_t'])
        return dict(state, hist=hist, hist_len=hist_len, prev_t=prev_t,
                    have_prev=jnp.asarray(True))

    def _has_converged(dy0, dy1):
        # reference fixed_adams.py:181-184: per-element Linf error ratio.
        err = jnp.abs(dy0 - dy1)
        return compute_error_ratio(err, rtol, atol, dy0, dy1, linf_norm) < 1

    def step(func, t0, dt, t1, y0, perturb, state):
        f0 = func(t0, y0, perturb=Perturb.NEXT if perturb else Perturb.NONE)
        state = _update_history(
            state, jnp.asarray(t0).real.astype(state['prev_t'].dtype), f0)
        order = jnp.minimum(state['hist_len'], max_order - 1)
        dt_y = jnp.asarray(dt).astype(y0.dtype)

        def rk4_branch(state):
            dy = rk_step.rk4_alt_step_func(func, t0, dt, t1, y0,
                                           f0=state['hist'][0],
                                           perturb=perturb)
            # f64 grid times must not promote an f32/complex state increment
            # (reference casts the increment with `.type_as(y0)`).
            # 3 extra stage evals beyond the shared f0 (3/8-rule bootstrap).
            state = dict(state, nfe=state['nfe'] + 3)
            return dy.astype(y0.dtype), state

        def adams_branch(state):
            hist = state['hist']  # (hist_size, n), newest first
            bash = bashforth[order]                         # (hist_size,)
            # coefficients are f64; cast the increment back to the state
            # dtype (reference fixed_adams.py:205 `.type_as(y0)`).
            dy = (dt_y * jnp.tensordot(bash, hist, axes=1)).astype(y0.dtype)
            if implicit:
                moult = moulton[order + 1]                   # (hist_size+1,)
                delta = (dt_y * jnp.tensordot(moult[1:], hist,
                                              axes=1)).astype(y0.dtype)

                def corrector(carry, _):
                    dy, converged, f_last, n_ev = carry
                    # reference NFE convention: an eval counts only when the
                    # reference would still be iterating (it breaks on
                    # convergence, fixed_adams.py:217-218); the masked eval
                    # below still executes but is not user-visible NFE.
                    n_ev = n_ev + (~converged).astype(jnp.int32)
                    f = func(t1, y0 + dy,
                             perturb=Perturb.PREV if perturb else Perturb.NONE)
                    dy_new = (dt_y * moult[0] * f).astype(y0.dtype) + delta
                    conv_now = _has_converged(dy, dy_new)
                    dy = jnp.where(converged, dy, dy_new)
                    f_last = jnp.where(converged, f_last, f)
                    converged = converged | conv_now
                    return (dy, converged, f_last, n_ev), None

                (dy, converged, f_last, n_ev), _ = jax.lax.scan(
                    corrector, (dy, jnp.asarray(False), f0, jnp.int32(0)),
                    None, length=max_iters)
                # reference fixed_adams.py:219-221: on non-convergence, drop
                # the oldest history entry.
                state = dict(state,
                             nfe=state['nfe'] + n_ev,
                             hist_len=jnp.where(converged, state['hist_len'],
                                                jnp.maximum(state['hist_len'] - 1, 0)))
            return dy, state

        use_rk4 = order < MIN_ORDER - 1
        dy, state = jax.lax.cond(use_rk4, rk4_branch, adams_branch, state)
        return dy, f0, state

    return FixedStepMethod(step, order=MIN_ORDER, nfe_per_step=1,
                           init_state=init_state,
                           nfe_from_state=lambda st: st['nfe'])


def make_fixed_step_method(prob, implicit):
    opts = dict(prob.options)
    return make_adams_method(
        implicit=opts.get('implicit', implicit),
        rtol=prob.rtol, atol=prob.atol,
        max_iters=opts.get('max_iters', MAX_ITERS),
        max_order=opts.get('max_order', MAX_ORDER))


def integrate_adams(prob, implicit):
    from ..odeint import _warn_unused
    opts = dict(prob.options)
    _warn_unused('Adams solver', opts,
                 {'step_size', 'grid_constructor', 'num_steps', 'perturb',
                  'interp', 'implicit', 'max_iters', 'max_order', 'dtype'})
    method = make_fixed_step_method(prob, implicit)
    grid = construct_grid(prob.func, prob.y0, prob.t, opts.get('step_size'),
                          opts.get('grid_constructor'),
                          opts.get('num_steps'))
    return integrate_fixed_grid(method, prob.func, prob.y0, prob.t, grid,
                                interp=opts.get('interp', 'linear'),
                                perturb=opts.get('perturb', False))
