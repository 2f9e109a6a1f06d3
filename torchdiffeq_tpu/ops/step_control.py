"""Step-size control: initial-step heuristic, error ratio, optimal step.

Branch-free (``jnp.where``) re-design of the reference's step controller
(torchdiffeq/_impl/misc.py:36-95) so it runs inside ``lax.while_loop`` on
TPU without host synchronisation.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..misc import Perturb
from .treemath import tmap, tol_like, cast_time, state_real_dtype


def error_scale(rtol, atol, y0, y1=None):
    """Per-leaf ``atol + rtol * |y0|`` (or ``max(|y0|, |y1|)``), the
    tolerance scale of reference misc.py:80-82.  Tolerances may be scalars,
    flat vectors (flat state) or per-leaf trees (tree state)."""
    rtol = tol_like(rtol, y0)
    atol = tol_like(atol, y0)
    if y1 is None:
        return tmap(lambda a, r, l: a + jnp.abs(l) * r, atol, rtol, y0)
    return tmap(
        lambda a, r, l0, l1: a + r * jnp.maximum(jnp.abs(l0), jnp.abs(l1)),
        atol, rtol, y0, y1)


def select_initial_step(func, t0, y0, order, rtol, atol, norm, f0):
    """Empirically select a good initial step (Hairer, Norsett & Wanner,
    "Solving ODEs I", Sec. II.4; reference misc.py:36-77).

    `order` here is `solver_order - 1`, matching the reference call site
    (rk_common.py:219).  Costs one extra vector-field evaluation.
    """
    dtype = state_real_dtype(y0)
    t_dtype = jnp.asarray(t0).dtype

    scale = error_scale(rtol, atol, y0)

    d0 = jnp.abs(norm(tmap(lambda l, s: l / s, y0, scale)))
    d1 = jnp.abs(norm(tmap(lambda l, s: l / s, f0, scale)))

    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5),
                   jnp.asarray(1e-6, dtype=dtype),
                   0.01 * d0 / jnp.maximum(d1, jnp.finfo(dtype).tiny))
    h0 = jnp.abs(h0)

    y1 = tmap(lambda l, fl: l + cast_time(h0, l) * fl, y0, f0)
    f1 = func(jnp.asarray(t0).astype(dtype) + h0.astype(dtype), y1,
              perturb=Perturb.NONE)

    d2 = jnp.abs(norm(tmap(lambda a, b, s: (a - b) / s, f1, f0, scale)) / h0)

    d_max = jnp.maximum(d1, d2)
    h1 = jnp.where(
        (d1 <= 1e-15) & (d2 <= 1e-15),
        jnp.maximum(jnp.asarray(1e-6, dtype=dtype), h0 * 1e-3),
        (0.01 / jnp.maximum(d_max, jnp.finfo(dtype).tiny)) ** (1.0 / float(order + 1)))
    h1 = jnp.abs(h1)

    return jnp.minimum(100 * h0, h1).astype(t_dtype)


def compute_error_ratio(error_estimate, rtol, atol, y0, y1, norm):
    """norm(err / (atol + rtol * max(|y0|, |y1|))) (reference misc.py:80-82)."""
    error_tol = error_scale(rtol, atol, y0, y1)
    return jnp.abs(norm(tmap(lambda e, s: e / s, error_estimate, error_tol)))


def optimal_step_size(last_step, error_ratio, safety, ifactor, dfactor, order):
    """I-controller step update (reference misc.py:85-95):

        factor = min(ifactor, max(safety * ratio^(-1/order), dfactor))

    with dfactor ignored (set to 1) on accepted steps, and a full `ifactor`
    increase when the error is exactly zero.
    """
    t_dtype = jnp.asarray(last_step).dtype
    error_ratio = jnp.asarray(error_ratio).astype(t_dtype)
    zero_err = error_ratio == 0
    dfactor = jnp.where(error_ratio < 1, jnp.ones((), dtype=t_dtype), dfactor)
    safe_ratio = jnp.maximum(error_ratio, jnp.finfo(t_dtype).tiny)
    exponent = jnp.asarray(1.0 / order, dtype=t_dtype)
    factor = jnp.minimum(ifactor,
                         jnp.maximum(safety / safe_ratio ** exponent, dfactor))
    factor = jnp.where(zero_err, ifactor, factor)
    return last_step * factor


def optimal_step_size_pi(last_step, error_ratio, prev_error_ratio, safety,
                         ifactor, dfactor, order, pcoeff=0.4, icoeff=0.7):
    """Proportional-integral step update (Gustafsson / Söderlind; the
    standard PI.4.2-style controller used by modern solver suites; the
    reference only implements the I-controller above):

        factor = safety * ratio^(-icoeff/order) * prev_ratio^(pcoeff/order)

    clamped to [dfactor, ifactor].  Damps the accept/reject oscillation of
    the I-controller on mildly stiff problems — typically fewer rejected
    steps at the same accuracy.
    """
    t_dtype = jnp.asarray(last_step).dtype
    err = jnp.maximum(jnp.asarray(error_ratio).astype(t_dtype),
                      jnp.finfo(t_dtype).tiny)
    prev = jnp.maximum(jnp.asarray(prev_error_ratio).astype(t_dtype),
                       jnp.finfo(t_dtype).tiny)
    ki = jnp.asarray(icoeff / order, dtype=t_dtype)
    kp = jnp.asarray(pcoeff / order, dtype=t_dtype)
    factor = safety * err ** (-ki) * prev ** kp
    factor = jnp.clip(factor, dfactor, ifactor)
    zero_err = jnp.asarray(error_ratio) == 0
    factor = jnp.where(zero_err, ifactor, factor)
    return last_step * factor


def optimal_step_size_pid(last_step, error_ratio, prev_error_ratio,
                          prev2_error_ratio, safety, ifactor, dfactor, order,
                          pcoeff=0.4, icoeff=0.7, dcoeff=0.0):
    """Full proportional-integral-derivative step update (Söderlind,
    "Digital filters in adaptive time-stepping"; the H211b/PID family used
    by diffrax/OrdinaryDiffEq — neither PI nor PID exists in the
    reference):

        factor = safety * ratio^(-icoeff/order) * prev^(pcoeff/order)
                        * prev2^(-dcoeff/order)

    clamped to [dfactor, ifactor].  `dcoeff=0` reduces exactly to the PI
    controller; a small positive `dcoeff` (e.g. 0.2) further damps step
    oscillation on problems whose stiffness varies along the trajectory.
    """
    t_dtype = jnp.asarray(last_step).dtype
    tiny = jnp.finfo(t_dtype).tiny
    err = jnp.maximum(jnp.asarray(error_ratio).astype(t_dtype), tiny)
    prev = jnp.maximum(jnp.asarray(prev_error_ratio).astype(t_dtype), tiny)
    prev2 = jnp.maximum(jnp.asarray(prev2_error_ratio).astype(t_dtype), tiny)
    ki = jnp.asarray(icoeff / order, dtype=t_dtype)
    kp = jnp.asarray(pcoeff / order, dtype=t_dtype)
    kd = jnp.asarray(dcoeff / order, dtype=t_dtype)
    factor = safety * err ** (-ki) * prev ** kp * prev2 ** (-kd)
    factor = jnp.clip(factor, dfactor, ifactor)
    zero_err = jnp.asarray(error_ratio) == 0
    factor = jnp.where(zero_err, ifactor, factor)
    return last_step * factor
