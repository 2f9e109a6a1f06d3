"""`odeint_dense`: continuous dense-output solution.

Rebuild of torchdiffeq/_impl/odeint.py:111-157: run the adaptive loop
over [t0, t1], record the accepted-step times and quartic interpolation
coefficients, and return a callable evaluating the solution anywhere in the
interval via `searchsorted`.

TPU twist: the number of accepted steps is data-dependent, so the recording
buffers have a static capacity `max_segments` (a solve exceeding it reports
`ERR_MAX_NUM_STEPS` in its stats and the interpolant covers the integrated
prefix).  Extensions over the reference (odeint.py:111-157):

* pytree state is supported (reference is tensor-only, odeint.py:113);
* any adaptive method works — all six explicit tableaus plus the
  kvaerno3/5 ESDIRK stiff tier (reference hardcodes dopri5, odeint.py:119);
* `sol.derivative(t)` evaluates d/dt of the interpolant;
* `sol.find_event(event_fn)` bisects the interpolant for an event
  crossing without re-integrating (same bisection contract as
  `odeint_event`, events.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .misc import check_inputs
from .ops.interp import interp_evaluate
from .solvers import SOLVERS
from .solvers import adaptive_rk
from .solvers.solution import OK, ERR_MAX_NUM_STEPS, Stats


@jax.tree_util.register_pytree_node_class
class DenseSolution:
    """Callable dense solution: `sol(t)` for scalar or batched `t`."""

    def __init__(self, times, coeffs, count, t_lo, t_hi, unravel,
                 t_sign, error_code):
        self.times = times      # (M + 1,) accepted-step boundary times
        self.coeffs = coeffs    # (M, 5, n)
        self.count = count      # number of valid segments
        self.t_lo = t_lo
        self.t_hi = t_hi
        self.unravel = unravel
        self.t_sign = t_sign    # internal time = t_sign * user time
        self.error_code = error_code

    def tree_flatten(self):
        children = (self.times, self.coeffs, self.count, self.t_lo, self.t_hi,
                    self.t_sign, self.error_code)
        return children, (self.unravel,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (unravel,) = aux
        times, coeffs, count, t_lo, t_hi, t_sign, error_code = children
        return cls(times, coeffs, count, t_lo, t_hi, unravel, t_sign,
                   error_code)

    def _segment(self, t_eval):
        """Locate the segment containing internal time `t_sign * t_eval`."""
        tt = self.t_sign * t_eval
        tt = jnp.clip(tt, self.t_lo, self.t_hi)
        idx = jnp.clip(jnp.searchsorted(self.times, tt, side="right"),
                       1, jnp.maximum(self.count, 1))
        return tt, self.times[idx - 1], self.times[idx], self.coeffs[idx - 1]

    def _eval_scalar(self, t_eval):
        tt, t0, t1, coeff = self._segment(t_eval)
        return self.unravel(interp_evaluate(coeff, t0, t1, tt))

    def _deriv_scalar(self, t_eval):
        tt, t0, t1, coeff = self._segment(t_eval)
        # p(x) with x = (tt - t0)/(t1 - t0): dp/dx via the power rule on the
        # ascending coefficients, then chain rule through x and the
        # user-time negation (internal time = t_sign * user time).
        k = jnp.arange(1, coeff.shape[0], dtype=coeff.dtype)
        dcoeff = coeff[1:] * k[:, None]
        x = ((tt - t0) / (t1 - t0)).astype(coeff.dtype)
        dy_dx = jnp.polyval(dcoeff[::-1], x)
        scale = (self.t_sign / (t1 - t0)).astype(coeff.real.dtype)
        return self.unravel(dy_dx * scale)

    def __call__(self, t_eval):
        t_eval = jnp.asarray(t_eval)
        if t_eval.ndim == 0:
            return self._eval_scalar(t_eval)
        return jax.vmap(self._eval_scalar)(t_eval)

    def derivative(self, t_eval):
        """d(sol)/dt at `t_eval` (scalar or batched): the exact derivative
        of the quartic interpolant.  Extension over the reference."""
        t_eval = jnp.asarray(t_eval)
        if t_eval.ndim == 0:
            return self._deriv_scalar(t_eval)
        return jax.vmap(self._deriv_scalar)(t_eval)

    def find_event(self, event_fn, tol=1e-6):
        """Locate the first zero of `event_fn(t, y(t))` on the solution
        WITHOUT re-integrating (extension over the reference; `odeint_event`
        re-solves the ODE).  Scans accepted-step boundaries for the first
        sign change relative to t0, then bisects the quartic interpolant
        inside the bracketing segment (the `odeint_event` bisection
        contract, events.py:14-43).

        Returns ``(event_t, y_event)``; `event_t` is NaN when the event
        function does not change sign on the integrated span.
        """
        from .events import combine_event_functions, find_event as _bisect

        n = jnp.arange(self.times.shape[0])
        # clamp the inf-filled padding boundaries to t0 so the user event
        # function is never evaluated at t=inf (NaN under jax_debug_nans)
        times = jnp.where(n <= self.count, self.times, self.times[0])
        user_t = self.t_sign * times             # user-facing times

        # multi-output event functions: the odeint_event sign-combination
        # (initially positive, min over outputs; events.py:46-56)
        combined = combine_event_functions(event_fn, user_t[0],
                                           self._eval_scalar(user_t[0]))

        vals = jax.vmap(lambda tu: combined(tu, self._eval_scalar(tu)))(user_t)
        changed = (jnp.sign(vals) != 1.0) & (n <= self.count)
        j = jnp.argmax(changed)                  # first boundary past the root
        found = changed[j]
        j = jnp.maximum(j, 1)

        # bracket with the CLAMPED times: on a not-found/zero-segment
        # solve the padding is t0, giving a [t0, t0] bracket (0 bisection
        # iterations) instead of an infinite span
        t_lo_u = self.t_sign * times[j - 1]
        t_hi_u = self.t_sign * times[j]
        # bisect in user time; the interpolant handles the sign internally
        event_t, _ = _bisect(self._eval_scalar, jnp.asarray(1.0),
                             t_lo_u, t_hi_u, combined, tol)
        event_t = jnp.where(found, event_t, jnp.nan)
        return event_t, self._eval_scalar(event_t)


def odeint_dense(func, y0, t0, t1, *, rtol=1e-7, atol=1e-9, method=None,
                 options=None, args=(), max_segments=4096,
                 _return_stats=False):
    """Integrate over [t0, t1] and return a `DenseSolution` callable.

    With ``_return_stats`` (internal; used by the interpolated adjoint's
    forward recording) returns ``(sol, Stats)`` instead.
    """
    from .odeint import _adaptive_config

    t0 = jnp.asarray(t0).reshape(())
    t1 = jnp.asarray(t1).reshape(())
    t = jnp.stack([t0, t1])

    prob = check_inputs(func, y0, t, rtol, atol, method, options, None,
                        SOLVERS, args=args)
    spec = SOLVERS[prob.method]
    if spec.get("kind") != "adaptive":
        raise ValueError(
            f"odeint_dense requires an adaptive method (the reference "
            f"allows only dopri5, odeint.py:119; this build accepts any "
            f"adaptive tableau), got method={prob.method!r}")
    cfg = _adaptive_config(prob, spec["tableau"])
    # dense output IS the interpolant — the interp-free fast path is
    # meaningless here
    cfg = cfg._replace(step_to_end=False)

    ts = prob.t
    n = prob.y0.shape[0]
    t_end = ts[1]

    f0, dt0, _nfe0 = adaptive_rk._setup(prob.func, prob.y0, ts[0], cfg,
                                        ts.dtype)

    # honor forced/discontinuity times exactly as the main driver does
    # (check_inputs already mapped them into the internal frame)
    adaptive_rk._check_no_duplicates(cfg.step_t, cfg.jump_t)
    step_t = jump_t = None
    step_idx = jump_idx = jnp.int32(0)
    if cfg.step_t is not None:
        step_t, step_idx = adaptive_rk._prep_tvals(cfg.step_t, ts[0],
                                                   ts.dtype)
    if cfg.jump_t is not None:
        jump_t, jump_idx = adaptive_rk._prep_tvals(cfg.jump_t, ts[0],
                                                   ts.dtype)

    times = jnp.full((max_segments + 1,), jnp.inf, dtype=ts.dtype).at[0].set(ts[0])
    coeffs = jnp.zeros((max_segments, 5, n), dtype=prob.y0.dtype)

    zeros_coeff = jnp.zeros((5, n), dtype=prob.y0.dtype).at[0].set(prob.y0)
    carry0 = adaptive_rk._Carry(
        y1=prob.y0, f1=f0, t0=ts[0], t1=ts[0], dt=dt0, coeff=zeros_coeff,
        i_out=jnp.int32(0), out=jnp.zeros((1, n), dtype=prob.y0.dtype),
        step_idx=step_idx, jump_idx=jump_idx,
        nfe=jnp.int32(2), n_steps=jnp.int32(0), n_acc=jnp.int32(0),
        n_rej=jnp.int32(0), steps_in_interval=jnp.int32(0),
        err=jnp.int32(OK), prev_ratio=jnp.ones((), dtype=ts.dtype),
        prev_ratio2=jnp.ones((), dtype=ts.dtype),
        t0_lo=jnp.zeros((), dtype=ts.dtype), t1_lo=jnp.zeros((), dtype=ts.dtype))

    def cond(state):
        c, times, coeffs = state
        return (c.t1 < t_end) & (c.err == OK) & (c.n_acc < max_segments)

    def body(state):
        c, times, coeffs = state
        c2 = adaptive_rk._adaptive_step(c, prob.func, cfg, step_t, jump_t,
                                        ts.dtype)
        accepted = c2.t1 != c.t1
        seg = c2.n_acc - 1
        times = jnp.where(accepted, times.at[c2.n_acc].set(c2.t1), times)
        coeffs = jnp.where(accepted, coeffs.at[seg].set(c2.coeff), coeffs)
        return (c2, times, coeffs)

    carry, times, coeffs = jax.lax.while_loop(cond, body,
                                              (carry0, times, coeffs))
    err = jnp.where((carry.t1 < t_end) & (carry.err == OK),
                    ERR_MAX_NUM_STEPS, carry.err)

    sol = DenseSolution(times, coeffs, carry.n_acc, ts[0], carry.t1,
                        prob.unravel, prob.t_sign, err)
    if _return_stats:
        stats = Stats.make(nfe=carry.nfe, n_steps=carry.n_steps,
                           n_accepted=carry.n_acc, n_rejected=carry.n_rej,
                           error_code=err, final_dt=carry.dt)
        return sol, stats
    return sol
