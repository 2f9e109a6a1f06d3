"""Generic explicit Runge-Kutta step kernels on pytree state.

TPU-native design: the stage recursion is unrolled at trace time (stage count
is static per tableau), every stage combination is a small weighted vector sum
that XLA fuses into the surrounding vector-field computation.  State is any
pytree of arrays with native shapes (a bare ``(n,)`` vector included) — see
`ops/treemath.py` for why native shapes matter on TPU; stage slopes are
returned as a tuple of state trees for the dense-output fit.

Behavioral contract mirrors ``_runge_kutta_step`` (reference
torchdiffeq/_impl/rk_common.py:43-90): FSAL shortcut, `Perturb.PREV` at
stages with alpha == 1, and timelike values cast to the state dtype inside
the kernel.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..misc import Perturb
from .tableaus import ButcherTableau
from .treemath import tmap, cast_time, state_real_dtype


def _weighted_sum_leaf(coeffs, leaves, dt, base=None):
    # The reference scales each tableau coefficient by dt BEFORE the
    # stage multiply-accumulate — ``sum(k * (beta_i * dt))``, rk_common.py:79
    # (likewise for c_sol/c_error/c_mid and the FIRK stage combinations,
    # rk_common.py:89-90,455,464,366).  Matching that rounding order makes
    # single steps bitwise-identical, which DETEST NFE parity depends on:
    # the post-scaled ``dt * sum(beta_i * k)`` variant drifts by one ULP in
    # the error estimate and flips accept/reject decisions on problems that
    # ride the boundary (DETEST C2).
    dt_l = None if dt is None else cast_time(dt, leaves[0])
    total = None
    for c, v in zip(coeffs, leaves):
        if c == 0.0:
            continue
        # python-float coefficients are weakly typed: they preserve the
        # state dtype (a numpy float64 scalar would promote f32 state).
        term = (float(c) * v) if dt_l is None else (float(c) * dt_l) * v
        total = term if total is None else total + term
    if total is None:
        total = jnp.zeros_like(leaves[0])
    if base is not None:
        total = base + total
    return total


def weighted_sum(coeffs, vecs, dt=None, base=None):
    """Per-leaf ``base + dt * sum_i coeffs[i] * vecs[i]`` (skipping
    statically-zero coefficients) over a list of state pytrees.  `coeffs`
    is a host numpy vector; `dt`/`base` are optional."""
    vecs = list(vecs)
    if base is None:
        return tmap(lambda *ls: _weighted_sum_leaf(coeffs, ls, dt), *vecs)
    return tmap(lambda b, *ls: _weighted_sum_leaf(coeffs, ls, dt, b),
                base, *vecs)


def runge_kutta_step(func, y0, f0, t0, dt, t1, tableau: ButcherTableau,
                     error_dtype=None):
    """Take one explicit RK step and estimate the local error.

    Args:
        func: perturb-aware vector field ``func(t, y, perturb=...)`` on
            state pytrees.
        y0: state pytree at t0.
        f0: derivative there (same structure).
        t0, dt, t1: scalars (time dtype); t1 == t0 + dt.
        tableau: ButcherTableau.
        error_dtype: optional dtype for the embedded-error accumulation.
            The error estimate is a near-cancelling weighted sum of the
            stage slopes; accumulating it in f32 while the stages stay
            bfloat16 removes the cancellation noise that otherwise drowns
            the estimate below rtol ~1e-3 (the TPU mixed-precision mode).

    Returns:
        (y1, f1, y1_error, k) where k is a tuple of per-stage slope trees.
    """
    t_dtype = state_real_dtype(y0)
    t0 = jnp.asarray(t0).astype(t_dtype)
    dt = jnp.asarray(dt).astype(t_dtype)
    t1 = jnp.asarray(t1).astype(t_dtype)

    k = [f0]
    yi = y0
    for i in range(len(tableau.alpha)):
        alpha_i = float(tableau.alpha[i])
        if alpha_i == 1.0:
            # Step to just before the end time in case of discontinuities.
            ti = t1
            perturb = Perturb.PREV
        else:
            ti = t0 + alpha_i * dt
            perturb = Perturb.NONE
        yi = weighted_sum(tableau.beta[i, :i + 1], k[:i + 1], dt, base=y0)
        k.append(func(ti, yi, perturb=perturb))

    if tableau.is_fsal:
        # The last stage already evaluated f at (t1, y1): `yi` IS y1.
        y1 = yi
    else:
        y1 = weighted_sum(tableau.c_sol, k, dt, base=y0)
    f1 = k[-1]
    if error_dtype is None:
        y1_error = weighted_sum(tableau.c_error, k, dt)
    else:
        k_up = [tmap(lambda l: l.astype(error_dtype), ki) for ki in k]
        y1_error = weighted_sum(tableau.c_error, k_up, dt)
    return y1, f1, y1_error, tuple(k)


# ---------------------------------------------------------------------------
# Standalone fixed-step functions (reference rk_common.py:99-158).
# ---------------------------------------------------------------------------

_ONE_THIRD = 1 / 3
_TWO_THIRDS = 2 / 3
_ONE_SIXTH = 1 / 6


def rk4_step_func(func, t0, dt, t1, y0, f0=None, perturb=False):
    """Classic RK4 (reference rk_common.py:99-107)."""
    k1 = f0
    if k1 is None:
        k1 = func(t0, y0, perturb=Perturb.NEXT if perturb else Perturb.NONE)
    half_dt = dt * 0.5
    k2 = func(t0 + half_dt, y0 + half_dt * k1)
    k3 = func(t0 + half_dt, y0 + half_dt * k2)
    k4 = func(t1, y0 + dt * k3, perturb=Perturb.PREV if perturb else Perturb.NONE)
    return (k1 + 2 * (k2 + k3) + k4) * dt * _ONE_SIXTH


def rk4_alt_step_func(func, t0, dt, t1, y0, f0=None, perturb=False):
    """RK4 3/8-rule: smaller error, slightly more compute (reference
    rk_common.py:110-118).  Tree-polymorphic: `y0` may be any pytree of
    arrays — each leaf sees exactly the arithmetic the reference applies
    to its flat tensor (a bare ndarray state is bitwise-unchanged)."""
    k1 = f0
    if k1 is None:
        k1 = func(t0, y0, perturb=Perturb.NEXT if perturb else Perturb.NONE)
    k2 = func(t0 + dt * _ONE_THIRD,
              tmap(lambda y, a: y + dt * a * _ONE_THIRD, y0, k1))
    k3 = func(t0 + dt * _TWO_THIRDS,
              tmap(lambda y, a, b: y + dt * (b - a * _ONE_THIRD), y0, k1, k2))
    k4 = func(t1,
              tmap(lambda y, a, b, c: y + dt * (a - b + c), y0, k1, k2, k3),
              perturb=Perturb.PREV if perturb else Perturb.NONE)
    return tmap(lambda a, b, c, d: (a + 3 * (b + c) + d) * dt * 0.125,
                k1, k2, k3, k4)


def rk3_step_func(func, t0, dt, t1, y0, butcher_tableu, f0=None, perturb=False):
    """Generic 3-stage RK step from a [[0,...],[c2,a21,...],...] table
    (reference rk_common.py:121-139).  Tree-polymorphic like
    `rk4_alt_step_func`."""
    bt = butcher_tableu
    k1 = f0
    if k1 is None:
        k1 = func(t0, y0, perturb=Perturb.NEXT if perturb else Perturb.NONE)
    k2 = func(t0 + dt * bt[1][0],
              tmap(lambda y, a: y + dt * a * bt[1][1], y0, k1))
    k3 = func(t0 + dt * bt[2][0],
              tmap(lambda y, a, b: y + dt * (a * bt[2][1] + b * bt[2][2]),
                   y0, k1, k2))
    return tmap(lambda a, b, c: dt * (a * bt[3][1] + b * bt[3][2]
                                      + c * bt[3][3]), k1, k2, k3)


def rk2_step_func(func, t0, dt, t1, y0, butcher_tableu, f0=None, perturb=False):
    """Generic 2-stage RK step (reference rk_common.py:142-158).
    Tree-polymorphic like `rk4_alt_step_func`."""
    bt = butcher_tableu
    k1 = f0
    if k1 is None:
        k1 = func(t0, y0, perturb=Perturb.NEXT if perturb else Perturb.NONE)
    k2 = func(t0 + dt * bt[1][0],
              tmap(lambda y, a: y + dt * a * bt[1][1], y0, k1),
              perturb=Perturb.PREV if perturb else Perturb.NONE)
    return tmap(lambda a, b: dt * (a * bt[2][1] + b * bt[2][2]), k1, k2)
