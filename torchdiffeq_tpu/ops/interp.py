"""Dense-output interpolation.

* Quartic (4th-order) polynomial fit/evaluate used by the adaptive RK
  solvers between accepted steps (reference torchdiffeq/_impl/interp.py).
* Linear and cubic-Hermite interpolation used by fixed-grid solvers
  (reference torchdiffeq/_impl/solvers.py:166-181).

Coefficients are stored stacked as a ``(5, n)`` array ``[e, d, c, b, a]``
(ascending powers of the normalised time x in [0, 1]) so that the adaptive
while-loop carry is a single fixed-shape array.
"""
from __future__ import annotations

import jax.numpy as jnp


def interp_fit(y0, y1, y_mid, f0, f1, dt):
    """Fit coefficients for 4th-order polynomial interpolation.

    Returns (5, n) stacked coefficients [e, d, c, b, a] with
    ``p(x) = a x^4 + b x^3 + c x^2 + d x + e`` for x in [0, 1]
    (reference interp.py:1-22).
    """
    dt = jnp.asarray(dt).astype(y0.dtype)
    a = 2 * dt * (f1 - f0) - 8 * (y1 + y0) + 16 * y_mid
    b = dt * (5 * f0 - 3 * f1) + 18 * y0 + 14 * y1 - 32 * y_mid
    c = dt * (f1 - 4 * f0) - 11 * y0 - 5 * y1 + 16 * y_mid
    d = dt * f0
    e = y0
    return jnp.stack([e, d, c, b, a])


def interp_evaluate(coefficients, t0, t1, t):
    """Evaluate the fitted polynomial at time `t` in [t0, t1].

    `coefficients` is the (5, n) array from `interp_fit` (reference
    interp.py:25-48; the reference's data-dependent assert becomes a clamp —
    the adaptive driver guarantees t0 <= t <= t1 up to roundoff).
    """
    x = (t - t0) / (t1 - t0)
    x = jnp.asarray(x).astype(coefficients.dtype)
    # Horner-style evaluation in ascending powers, matching the reference's
    # accumulation order for bitwise-comparable results.
    total = coefficients[0] + x * coefficients[1]
    x_power = x
    for i in range(2, coefficients.shape[0]):
        x_power = x_power * x
        total = total + x_power * coefficients[i]
    return total


def linear_interp(t0, t1, y0, y1, t):
    """Linear interpolation with exact endpoint reproduction (reference
    solvers.py:175-181)."""
    slope = (t - t0) / (t1 - t0)
    slope = jnp.asarray(slope).astype(y0.dtype)
    y = y0 + slope * (y1 - y0)
    y = jnp.where(t == t0, y0, y)
    y = jnp.where(t == t1, y1, y)
    return y


def cubic_hermite_interp(t0, y0, f0, t1, y1, f1, t):
    """Cubic Hermite interpolation (reference solvers.py:166-173)."""
    h = (t - t0) / (t1 - t0)
    h = jnp.asarray(h).astype(y0.dtype)
    dt = jnp.asarray(t1 - t0).astype(y0.dtype)
    h00 = (1 + 2 * h) * (1 - h) * (1 - h)
    h10 = h * (1 - h) * (1 - h)
    h01 = h * h * (3 - 2 * h)
    h11 = h * h * (h - 1)
    return h00 * y0 + h10 * dt * f0 + h01 * y1 + h11 * dt * f1
