"""Adaptive implicit (stiff) tier: ESDIRK step kernel for the adaptive driver.

A capability EXTENSION over the reference, which only offers fixed-grid
implicit methods (torchdiffeq/_impl/rk_common.py:378-558): here the Kvaerno
3(2) and 5(4) ESDIRK tableaus (ops/tableaus.py) run under the same
`lax.while_loop` adaptive driver as dopri5 — embedded error estimate,
I/PI step-size controller, step_t/jump_t, dense output, events, continuous
adjoint, and replay-mode gradients all included.

Design:

* The driver is parameterised by `AdaptiveConfig.step_fn`; this module
  provides `make_esdirk_step_fn`, a drop-in for `runge_kutta_step` with the
  same (y1, f1, y1_error, k) contract.  Both Kvaerno tableaus are stiffly
  accurate with an explicit first stage, so f1 = k[-1] carries FSAL-style
  and the first stage reuses it — one explicit VF evaluation per step, the
  reference's NFE convention for implicit steppers
  (fixed_grid_implicit.py:239-242).
* Each diagonal stage solves  k = f(t_i, base + dt*gamma*k)  with Newton
  (exact `jax.jacfwd` Jacobian) wrapped in `jax.lax.custom_root`, so the
  converged stage is differentiable in BOTH modes (vjp for replay-mode /
  direct gradients, jvp for forward-mode) via the implicit function theorem
  — no backprop through Newton iterations.
* A non-converged stage inflates the embedded error estimate instead of
  erroring: the controller rejects the step and shrinks dt, which is the
  correct stiff-solver response (smaller dt contracts the stage fixed
  point).  This replaces the reference's try/except on singular factors
  (rk_common.py:449-451) with branch-free compiled control flow.

TPU notes: the n-wide `jacfwd` per Newton iteration is batched MXU work
(cheap) while extra *iterations* are sequential (expensive) — the exact-
Jacobian/few-iterations trade is the right one here, as in
fixed_grid_implicit._newton.  The TPU has no f64 LU, but f64 elementwise/
matmul ARE native: all linear solves go through `ops.linsolve.solve`,
which keeps f64 stage solves TPU-RESIDENT via f32 LU + iterative
refinement with f64 residuals (reaching the reference's 1e-8-class stage
tolerance, rk_common.py:425-429, on-chip).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..misc import Perturb, real_dtype
from ..ops import linsolve
from ..ops.rk_step import weighted_sum


def _solve_tol(dtype):
    # same convention as the fixed-grid implicit tier (reference
    # rk_common.py:425-429)
    return 1e-8 if jnp.dtype(dtype) == jnp.float64 else 1e-6


def _newton(res_fn, x0, tol, max_iters):
    """Newton with exact jacfwd Jacobian and a non-finite bailout —
    delegates to the fixed-grid implicit tier's kernel so the two stay in
    lockstep.  Returns (x, converged-as-float)."""
    from .fixed_grid_implicit import _newton as _newton_aux
    x, conv = _newton_aux(lambda xx, aux: res_fn(xx), x0, None, tol,
                          max_iters)
    # convergence flag as a float: custom_root(has_aux=True) differentiates
    # the aux structurally, and bool primals reject the junk tangent
    return x, jax.lax.stop_gradient(conv.astype(x.real.dtype))


def _stage_root(func, ti, base, dt_gamma, k_guess, tol, max_iters, perturb):
    """Solve k = f(ti, base + dt_gamma*k); IFT-differentiable both modes.

    Complex state solves on the stacked real view (jacfwd — Newton's
    Jacobian and custom_root's tangent materialisation — requires real
    inputs; packing with real/imag outside custom_root keeps JAX's native
    complex-autodiff conventions).  Returns (k, converged)."""
    complex_state = jnp.iscomplexobj(k_guess)
    if complex_state:
        m = k_guess.shape[0]
        pack = lambda z: jnp.concatenate([jnp.real(z), jnp.imag(z)])
        unpack = lambda xr: (xr[:m] + 1j * xr[m:]).astype(k_guess.dtype)
    else:
        pack = unpack = lambda v: v

    def residual(kr):
        kk = unpack(kr)
        return pack(kk - func(ti, base + dt_gamma * kk, perturb=perturb))

    def solve(res_fn, x0):
        return _newton(res_fn, x0, tol, max_iters)

    def tangent_solve(g, y):
        # g is linear (the IFT linearisation); materialise its matrix at
        # zero so the solve is *linear in y* — required for reverse-mode
        # transposition of custom_root (a jacfwd at y itself silently
        # breaks the transpose)
        J = jax.jacfwd(g)(jnp.zeros_like(y))
        return linsolve.solve(J, y)

    kr, conv = jax.lax.custom_root(residual, pack(k_guess), solve,
                                   tangent_solve, has_aux=True)
    return unpack(kr), conv


def _error_sum(tab, k, dtc, error_dtype):
    """Embedded-error weighted sum, optionally accumulated in
    `error_dtype` while the stages stay in the state dtype — the same
    mixed-precision contract as the explicit kernel
    (ops/rk_step.py `runge_kutta_step(error_dtype=...)`)."""
    if error_dtype is None:
        return weighted_sum(tab.c_error, k, dtc)
    return weighted_sum(tab.c_error, [ki.astype(error_dtype) for ki in k],
                        dtc)


def make_esdirk_step_fn(stage_tol=None, max_iters=100, error_dtype=None):
    """Build a `step_fn` for `AdaptiveConfig` from an ESDIRK tableau
    (implicit=True, explicit first stage, stiffly accurate)."""

    def step_fn(func, y0, f0, t0, dt, t1, tab):
        t_dtype = real_dtype(y0.dtype)
        t0c = jnp.asarray(t0).astype(t_dtype)
        dtc = jnp.asarray(dt).astype(t_dtype)
        t1c = jnp.asarray(t1).astype(t_dtype)
        tol = _solve_tol(y0.dtype) if stage_tol is None else stage_tol

        s = tab.n_stages
        alpha = np.asarray(tab.alpha)
        beta = np.asarray(tab.beta)
        assert tab.implicit and float(alpha[0]) == 0.0 \
            and not np.any(beta[0]), "step_fn requires an ESDIRK tableau"

        k = [f0]
        all_conv = jnp.ones((), dtype=real_dtype(y0.dtype))
        for i in range(1, s):
            gamma = float(beta[i, i])
            base = y0 + weighted_sum(beta[i, :i], k, dtc)
            if float(alpha[i]) == 1.0:
                ti, perturb = t1c, Perturb.PREV
            else:
                ti = t0c + float(alpha[i]) * dtc
                perturb = Perturb.NONE
            dt_gamma = (dtc * gamma).astype(y0.dtype)
            # previous stage slope is the standard ESDIRK predictor
            k_i, conv = _stage_root(func, ti, base, dt_gamma, k[i - 1],
                                    tol, max_iters, perturb)
            k.append(k_i)
            all_conv = all_conv * conv

        y1 = y0 + weighted_sum(tab.c_sol, k, dtc)
        f1 = k[-1]  # stiffly accurate: the last stage IS f(t1, y1)
        y1_error = _error_sum(tab, k, dtc, error_dtype)
        # Non-convergence => force rejection via the error estimate (see
        # module docstring); the magnitude just needs error_ratio > 1.
        big = jnp.asarray(1e10, dtype=y1_error.dtype)
        y1_error = jnp.where(all_conv > 0.5, y1_error,
                             y1_error + big * jnp.ones_like(y1_error))
        return y1, f1, y1_error, tuple(k)

    return step_fn


def make_firk_step_fn(stage_tol=None, max_iters=100, error_dtype=None):
    """Build a `step_fn` for fully-coupled implicit (FIRK) tableaus under
    the adaptive driver — the adaptive Radau IIA 5(3) tier (RADAU5A,
    ops/tableaus.py).  All collocation stages are solved as ONE stacked
    Newton system wrapped in `jax.lax.custom_root` (IFT gradients both
    modes, like `_stage_root`); stage 0 is the carried derivative f(t0,y0)
    with zero coupling/solution weights, and stiff accuracy (c_s = 1, b =
    last coupling row) makes f1 = k[-1] carry FSAL-style — one explicit VF
    evaluation per step, the implicit-NFE convention of the fixed-grid
    tier (fixed_grid_implicit.py:276-282)."""

    def step_fn(func, y0, f0, t0, dt, t1, tab):
        t_dtype = real_dtype(y0.dtype)
        t0c = jnp.asarray(t0).astype(t_dtype)
        dtc = jnp.asarray(dt).astype(t_dtype)
        t1c = jnp.asarray(t1).astype(t_dtype)
        tol = _solve_tol(y0.dtype) if stage_tol is None else stage_tol

        s = tab.n_stages
        alpha = np.asarray(tab.alpha)
        beta = np.asarray(tab.beta)
        assert tab.implicit and float(alpha[0]) == 0.0 \
            and not np.any(beta[0]), "step_fn expects a carried-f0 tableau"
        m = s - 1                       # coupled stages
        n = y0.shape[0]

        complex_state = jnp.iscomplexobj(y0)
        if complex_state:
            pack = lambda z: jnp.concatenate([jnp.real(z), jnp.imag(z)])
            unpack = lambda xr: (xr[:m * n] + 1j * xr[m * n:]).astype(y0.dtype)
        else:
            pack = unpack = lambda v: v

        def residual(Kr):
            K = unpack(Kr).reshape(m, n)
            stages = [f0] + [K[i] for i in range(m)]
            res = []
            for i in range(1, s):
                yi = weighted_sum(beta[i, :s], stages, dtc, base=y0)
                if float(alpha[i]) == 1.0:
                    ti, perturb = t1c, Perturb.PREV
                else:
                    ti = t0c + float(alpha[i]) * dtc
                    perturb = Perturb.NONE
                res.append(K[i - 1] - func(ti, yi, perturb=perturb))
            return pack(jnp.concatenate(res))

        def solve(res_fn, x0):
            return _newton(res_fn, x0, tol, max_iters)

        def tangent_solve(g, y):
            # materialise the linearisation at zero so the solve is linear
            # in y (required for reverse-mode transposition of custom_root)
            J = jax.jacfwd(g)(jnp.zeros_like(y))
            return linsolve.solve(J, y)

        K0 = pack(jnp.tile(f0, (m,)).astype(y0.dtype))
        Kr, conv = jax.lax.custom_root(residual, K0, solve, tangent_solve,
                                       has_aux=True)
        K = unpack(Kr).reshape(m, n)
        k = tuple([f0] + [K[i] for i in range(m)])

        y1 = weighted_sum(tab.c_sol, k, dtc, base=y0)
        f1 = k[-1]                      # stiffly accurate
        y1_error = _error_sum(tab, k, dtc, error_dtype)
        big = jnp.asarray(1e10, dtype=y1_error.dtype)
        conv_f = jax.lax.stop_gradient(
            jnp.asarray(conv).astype(y1_error.real.dtype))
        y1_error = jnp.where(conv_f > 0.5, y1_error,
                             y1_error + big * jnp.ones_like(y1_error))
        return y1, f1, y1_error, k

    return step_fn
