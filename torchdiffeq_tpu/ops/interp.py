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

from .rk_step import _weighted_sum_leaf as _wsum_leaf
from .treemath import tmap, cast_time


def coeff_dtype(dtype):
    """Storage dtype for the quartic coefficients of a state leaf:
    sub-32-bit real leaves (bfloat16/float16) promote to float32 — see
    `interp_fit_step` — everything else keeps the leaf dtype."""
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.floating) and dtype.itemsize < 4:
        return jnp.dtype(jnp.float32)
    return dtype


def interp_fit_step(y0, y1, k, dt, tableau):
    """Quartic dense-output fit from one accepted step's stage slopes
    (the driver-facing entry; reference rk_common.py:363-369 computes
    y_mid from `c_mid` then calls `_interp_fit`).

    Per-leaf dtype dispatch:

    * 32-bit-and-wider leaves: the reference's y-form fit in the state
      dtype with the reference's accumulation order — bitwise identical
      to `interp_fit(y0, y1, y_mid, f0, f1, dt)` with
      ``y_mid = y0 + dt*sum(c_mid*k)``.
    * sub-32-bit real leaves (bfloat16/float16): the y-form fit is
      catastrophically ill-conditioned — e.g. its cubic coefficient is
      ``18*y0 + 14*y1 - 32*y_mid``, O(|y|)-magnitude terms cancelling
      analytically to O(|increment|), so each bf16 leaf rounding leaves
      ~32*eps_bf16*|y| ~ 12% of |y| of noise in the interpolant (measured
      12-21% trajectory error on exp decay).  Rewriting on the step
      INCREMENTS ``d1 = dt*sum(c_sol*k)``, ``dmid = dt*sum(c_mid*k)``
      cancels y0 exactly:

          a = 2*(dt*f1 - dt*f0)   -  8*d1 + 16*dmid
          b = (5*dt*f0 - 3*dt*f1) + 14*d1 - 32*dmid
          c = (dt*f1 - 4*dt*f0)   -  5*d1 + 16*dmid

      so computing the fit in f32 from upcast stage slopes leaves only
      the irreducible eps_bf16*|k| noise of the bf16-evaluated vector
      field (~0.5% of the increment instead of ~12% of the state).
      Coefficients are stored in f32 (`coeff_dtype`); the driver casts
      back to the state dtype at emission.
    """
    c_sol, c_mid = tableau.c_sol, tableau.c_mid

    def leaf(y0l, y1l, *kl):
        if coeff_dtype(y0l.dtype) != jnp.dtype(y0l.dtype):
            f32 = jnp.float32
            dtl = jnp.asarray(dt).astype(f32)
            kf = [x.astype(f32) for x in kl]
            d1 = _wsum_leaf(c_sol, kf, dtl)
            dmid = _wsum_leaf(c_mid, kf, dtl)
            dtf0 = dtl * kf[0]
            dtf1 = dtl * kf[-1]
            a = 2 * (dtf1 - dtf0) - 8 * d1 + 16 * dmid
            b = (5 * dtf0 - 3 * dtf1) + 14 * d1 - 32 * dmid
            c = (dtf1 - 4 * dtf0) - 5 * d1 + 16 * dmid
            return jnp.stack([y0l.astype(f32), dtf0, c, b, a])
        dtl = cast_time(dt, y0l)
        yml = _wsum_leaf(c_mid, kl, dtl, base=y0l)
        f0l, f1l = kl[0], kl[-1]
        a = 2 * dtl * (f1l - f0l) - 8 * (y1l + y0l) + 16 * yml
        b = dtl * (5 * f0l - 3 * f1l) + 18 * y0l + 14 * y1l - 32 * yml
        c = dtl * (f1l - 4 * f0l) - 11 * y0l - 5 * y1l + 16 * yml
        return jnp.stack([y0l, dtl * f0l, c, b, a])

    return tmap(leaf, y0, y1, *list(k))


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
