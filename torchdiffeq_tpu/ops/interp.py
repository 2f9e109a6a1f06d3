"""Dense-output interpolation.

* Quartic (4th-order) polynomial fit/evaluate used by the adaptive RK
  solvers between accepted steps (reference torchdiffeq/_impl/interp.py).
* Linear and cubic-Hermite interpolation used by fixed-grid solvers
  (reference torchdiffeq/_impl/solvers.py:166-181).

Coefficients are stored per state leaf as a ``(5, *leaf.shape)`` array
``[e, d, c, b, a]`` (ascending powers of the normalised time x in [0, 1])
so that the adaptive while-loop carry is a fixed-shape pytree; for the
classic flat ``(n,)`` state this is the single ``(5, n)`` array.
"""
from __future__ import annotations

import jax.numpy as jnp

from .treemath import tmap, cast_time


def interp_fit(y0, y1, y_mid, f0, f1, dt):
    """Fit coefficients for 4th-order polynomial interpolation.

    Returns per-leaf (5, ...) stacked coefficients [e, d, c, b, a] with
    ``p(x) = a x^4 + b x^3 + c x^2 + d x + e`` for x in [0, 1]
    (reference interp.py:1-22).
    """
    def leaf(y0l, y1l, yml, f0l, f1l):
        dtl = cast_time(dt, y0l)
        a = 2 * dtl * (f1l - f0l) - 8 * (y1l + y0l) + 16 * yml
        b = dtl * (5 * f0l - 3 * f1l) + 18 * y0l + 14 * y1l - 32 * yml
        c = dtl * (f1l - 4 * f0l) - 11 * y0l - 5 * y1l + 16 * yml
        d = dtl * f0l
        e = y0l
        return jnp.stack([e, d, c, b, a])

    return tmap(leaf, y0, y1, y_mid, f0, f1)


def interp_evaluate(coefficients, t0, t1, t):
    """Evaluate the fitted polynomial at time `t` in [t0, t1].

    `coefficients` is the per-leaf (5, ...) pytree from `interp_fit`
    (reference interp.py:25-48; the reference's data-dependent assert
    becomes a clamp — the adaptive driver guarantees t0 <= t <= t1 up to
    roundoff).
    """
    x = (t - t0) / (t1 - t0)

    def leaf(cl):
        # Horner-style evaluation in ascending powers, matching the
        # reference's accumulation order for bitwise-comparable results.
        xl = jnp.asarray(x).astype(cl.dtype)
        total = cl[0] + xl * cl[1]
        x_power = xl
        for i in range(2, cl.shape[0]):
            x_power = x_power * xl
            total = total + x_power * cl[i]
        return total

    return tmap(leaf, coefficients)


def linear_interp(t0, t1, y0, y1, t):
    """Linear interpolation with exact endpoint reproduction (reference
    solvers.py:175-181)."""
    def leaf(y0l, y1l):
        slope = cast_time((t - t0) / (t1 - t0), y0l)
        y = y0l + slope * (y1l - y0l)
        y = jnp.where(t == t0, y0l, y)
        y = jnp.where(t == t1, y1l, y)
        return y

    return tmap(leaf, y0, y1)


def cubic_hermite_interp(t0, y0, f0, t1, y1, f1, t):
    """Cubic Hermite interpolation (reference solvers.py:166-173)."""
    def leaf(y0l, f0l, y1l, f1l):
        h = cast_time((t - t0) / (t1 - t0), y0l)
        dt = cast_time(t1 - t0, y0l)
        h00 = (1 + 2 * h) * (1 - h) * (1 - h)
        h10 = h * (1 - h) * (1 - h)
        h01 = h * h * (3 - 2 * h)
        h11 = h * h * (h - 1)
        return h00 * y0l + h10 * dt * f0l + h01 * y1l + h11 * dt * f1l

    return tmap(leaf, y0, f0, y1, f1)
