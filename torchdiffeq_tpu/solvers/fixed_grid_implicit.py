"""Fixed-grid implicit RK solvers (FIRK and DIRK).

Rebuild of the reference's Broyden-based implicit steppers
(torchdiffeq/_impl/rk_common.py:378-558) with a TPU-native gradient design:

* Forward: Broyden's method with rank-1 Jacobian updates, early-exit
  `lax.while_loop`, and a non-finite bailout replacing the reference's
  singular-matrix try/except (rk_common.py:449-451).
* Backward: instead of differentiating through the Broyden iterations (the
  reference backprops through them with autograd), each converged stage
  solve carries an implicit-function-theorem `custom_vjp`: with F(K*, aux)=0,

      dK*/daux = -(dF/dK)^{-1} dF/daux

  evaluated with the *exact* Jacobian at the solution.  This matches
  finite-difference gradients of the converged forward to solver tolerance
  and costs one linear solve instead of O(max_iters) reverse steps.

Closed-over parameters of the vector field are extracted with
`jax.closure_convert` so they appear as explicit inputs of the custom_vjp
and receive gradients.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..misc import Perturb, nextafter_down, real_dtype
from ..ops import linsolve
from ..ops.rk_step import weighted_sum
from .fixed_grid import (FixedStepMethod, construct_grid, integrate_fixed_grid)
from .solution import OK, ERR_IMPLICIT_NO_CONVERGENCE


def _solve_tol(dtype):
    # reference rk_common.py:425-429
    return 1e-8 if jnp.dtype(dtype) == jnp.float64 else 1e-6


def _broyden(residual, x0, aux, tol, max_iters):
    """Broyden's method on flat residual `residual(x, aux) -> F` (reference
    rk_common.py:441-462).  Returns (x, converged)."""
    m = x0.shape[0]
    f0 = residual(x0, aux)
    eye = jnp.eye(m, dtype=x0.dtype)

    def cond(c):
        x, f, J, it, bailed = c
        return (jnp.linalg.norm(f, 2) >= tol) & (~bailed) & (it < max_iters)

    def body(c):
        x, f, J, it, bailed = c
        s = -linsolve.solve(J, f)
        bail = ~jnp.all(jnp.isfinite(s))
        s = jnp.where(bail, jnp.zeros_like(s), s)
        x_new = x + s
        f_new = residual(x_new, aux)
        denom = jnp.maximum(jnp.dot(s, s), jnp.finfo(x.dtype).tiny)
        J_new = J + jnp.outer(f_new - f - J @ s, s) / denom
        x = jnp.where(bail, x, x_new)
        f = jnp.where(bail, f, f_new)
        J = jnp.where(bail, J, J_new)
        return (x, f, J, it + 1, bailed | bail)

    x, f, J, it, bailed = jax.lax.while_loop(
        cond, body, (x0, f0, eye, jnp.int32(0), jnp.asarray(False)))
    converged = jnp.linalg.norm(f, 2) < tol
    return x, converged


def _newton(residual, x0, aux, tol, max_iters):
    """Newton's method with the exact Jacobian via `jax.jacfwd`: quadratic
    convergence (typically 3-5 iterations vs Broyden's 10-20), at one
    m-wide fwd-mode Jacobian per iteration — usually the better trade on
    TPU, where the extra Jacobian FLOPs are batched matmul work while
    Broyden's extra *iterations* are sequential."""
    f0 = residual(x0, aux)

    def cond(c):
        x, f, it, bailed = c
        return (jnp.linalg.norm(f, 2) >= tol) & (~bailed) & (it < max_iters)

    def body(c):
        x, f, it, bailed = c
        J = jax.jacfwd(residual, argnums=0)(x, aux)
        s = -linsolve.solve(J, f)
        bail = ~jnp.all(jnp.isfinite(s))
        s = jnp.where(bail, jnp.zeros_like(s), s)
        x_new = x + s
        f_new = residual(x_new, aux)
        x = jnp.where(bail, x, x_new)
        f = jnp.where(bail, f, f_new)
        return (x, f, it + 1, bailed | bail)

    x, f, it, bailed = jax.lax.while_loop(
        cond, body, (x0, f0, jnp.int32(0), jnp.asarray(False)))
    return x, jnp.linalg.norm(f, 2) < tol


def _make_root_solver(residual, tol, max_iters, root_solver='broyden',
                      complex_state=False):
    """Root solve with IFT gradients (see module docstring).  Returns a
    callable ``(x0, aux) -> (x, converged)``.

    complex_state=True solves on the stacked real view ``[Re x, Im x]``
    (packing/unpacking with `jnp.real`/`imag` OUTSIDE the custom_vjp, so
    JAX's native complex-autodiff conventions apply): `jacfwd` (Newton and
    the IFT backward) requires real inputs, and Broyden's rank-1 update
    uses the real inner product — both are exactly right on the real view.
    """
    if complex_state:
        def residual_r(xr, aux):
            m = xr.shape[0] // 2
            f = residual(xr[:m] + 1j * xr[m:], aux)
            return jnp.concatenate([jnp.real(f), jnp.imag(f)])

        inner = _make_root_solver(residual_r, tol, max_iters, root_solver)

        def solve_complex(x0, aux):
            xr0 = jnp.concatenate([jnp.real(x0), jnp.imag(x0)])
            xr, conv = inner(xr0, aux)
            m = x0.shape[0]
            return (xr[:m] + 1j * xr[m:]).astype(x0.dtype), conv

        return solve_complex

    rootfind = _newton if root_solver == 'newton' else _broyden

    @jax.custom_vjp
    def solve_root(x0, aux):
        return rootfind(residual, x0, aux, tol, max_iters)

    def fwd(x0, aux):
        x, conv = solve_root(x0, aux)
        return (x, conv), (x, aux)

    def bwd(res, gs):
        x, aux = res
        g, _ = gs      # the converged flag gets no cotangent
        J = jax.jacfwd(residual, argnums=0)(x, aux)  # (m, m), exact at x*
        lam = linsolve.solve(J.T, g)
        _, pullback = jax.vjp(lambda a: residual(x, a), aux)
        (g_aux,) = pullback(-lam)
        return jnp.zeros_like(x), g_aux

    solve_root.defvjp(fwd, bwd)
    return solve_root


def _convert_func(prob):
    """closure_convert the (unperturbed) flat vector field so its captured
    parameters become explicit, differentiable inputs."""
    base = lambda tt, yy: prob.func(tt, yy, perturb=Perturb.NONE)
    t_ex = jnp.zeros((), dtype=real_dtype(prob.y0.dtype))
    conv, consts = jax.closure_convert(base, t_ex, prob.y0)
    return conv, tuple(consts)


def _stage_times(tableau, n_stages):
    """Static per-stage evaluation plan (reference `_residual`,
    rk_common.py:468-483): alpha==1 evaluates at nextafter-below t1
    (Perturb.PREV), alpha==0 with an all-zero coupling row is skipped — its
    stage slope is pinned to f(t0, y0)."""
    plan = []
    for i in range(n_stages):
        alpha_i = float(tableau.alpha[i])
        row = np.asarray(tableau.beta[i])
        if alpha_i == 1.0:
            plan.append(('prev_t1', None))
        elif alpha_i == 0.0 and np.all(row == 0.0):
            plan.append(('pinned', None))
        elif alpha_i == 0.0:
            plan.append(('at', 0.0))
        else:
            plan.append(('at', alpha_i))
    return plan


def make_fixed_step_method(prob, tableau, sequential):
    """Build the implicit `FixedStepMethod` for `tableau`.

    sequential=False -> FIRK: all stages solved as one (s*n)-dim system.
    sequential=True  -> DIRK: stages solved one at a time (n-dim systems).
    """
    opts = dict(prob.options)
    max_iters = opts.get('max_iters', 100)
    root_solver = opts.get('root_solver', 'broyden')
    conv, consts = _convert_func(prob)
    is_complex = jnp.issubdtype(prob.y0.dtype, jnp.complexfloating)
    n = prob.y0.shape[0]
    s = tableau.n_stages
    beta = np.asarray(tableau.beta)
    plan = _stage_times(tableau, s)
    tol = _solve_tol(prob.y0.dtype)

    def eval_f(ti, yi, theta):
        return conv(ti, yi, *theta)

    if not sequential:
        def residual(K_flat, aux):
            y0, t0, dt, t1, theta = aux
            K = K_flat.reshape(s, n)
            res = []
            for i in range(s):
                kind, a = plan[i]
                yi = y0 + weighted_sum(beta[i], list(K), dt)
                if kind == 'prev_t1':
                    ti = nextafter_down(t1)
                elif kind == 'pinned':
                    res.append(K[i] - eval_f(t0, y0, theta))
                    continue
                else:
                    ti = t0 + a * dt
                res.append(K[i] - eval_f(ti, yi, theta))
            return jnp.concatenate(res)

        solver = _make_root_solver(residual, tol, max_iters, root_solver,
                                   complex_state=is_complex)

        def step(func, t0, dt, t1, y0, perturb, state):
            f0 = func(t0, y0, perturb=Perturb.NEXT if perturb else Perturb.NONE)
            # time stays in the REAL dtype (complex state support; the
            # reference keeps float64 timelike, rk_common.py:180-195)
            td = real_dtype(y0.dtype)
            t0c, dtc, t1c = (jnp.asarray(v).astype(td) for v in (t0, dt, t1))
            aux = (y0, t0c, dtc, t1c, consts)
            K0 = jnp.tile(f0, (s,))
            K_flat, conv = solver(K0, aux)
            K = K_flat.reshape(s, n)
            dy = weighted_sum(tableau.c_sol, list(K), dtc)
            return dy, f0, state & conv

    else:
        # DIRK: per-stage n-dim solves; earlier stages enter via aux.
        stage_solvers = []
        for i in range(s):
            kind, a = plan[i]
            if kind == 'pinned':
                stage_solvers.append(None)
                continue

            def residual_i(k_flat, aux, i=i, kind=kind, a=a):
                y0, t0, dt, t1, K_prev, theta = aux  # K_prev: (i, n)
                prev = list(K_prev) + [k_flat]
                yi = y0 + weighted_sum(beta[i, :i + 1], prev, dt)
                if kind == 'prev_t1':
                    ti = nextafter_down(t1)
                else:
                    ti = t0 + a * dt
                return k_flat - eval_f(ti, yi, theta)

            stage_solvers.append(
                _make_root_solver(residual_i, tol, max_iters, root_solver,
                                  complex_state=is_complex))

        def step(func, t0, dt, t1, y0, perturb, state):
            f0 = func(t0, y0, perturb=Perturb.NEXT if perturb else Perturb.NONE)
            yd = y0.dtype
            td = real_dtype(yd)     # see FIRK branch
            t0c, dtc, t1c = (jnp.asarray(v).astype(td) for v in (t0, dt, t1))
            K = []
            conv_all = state
            for i in range(s):
                if stage_solvers[i] is None:
                    K.append(f0)
                    continue
                K_prev = (jnp.stack(K) if K
                          else jnp.zeros((0, n), dtype=yd))
                aux = (y0, t0c, dtc, t1c, K_prev, consts)
                ki, conv = stage_solvers[i](f0, aux)
                conv_all = conv_all & conv
                K.append(ki)
            dy = weighted_sum(tableau.c_sol, K, dtc)
            return dy, f0, conv_all

    # nfe bookkeeping for implicit stages is iteration-dependent; report the
    # single explicit f0 evaluation per step (stage-solve residual
    # evaluations are not user-visible NFE in the reference convention).
    # The stepper state carries an all-stages-converged flag; a failed
    # Broyden/Newton solve surfaces as error_code=4 in Stats (the
    # reference warns and continues with the unconverged iterate,
    # rk_common.py:461-462 — values match, the signal is stronger here).
    return FixedStepMethod(
        step, order=tableau.order, nfe_per_step=1,
        init_state=lambda func, y0, t0: jnp.asarray(True),
        error_from_state=lambda st: jnp.where(
            st, OK, ERR_IMPLICIT_NO_CONVERGENCE).astype(jnp.int32))


def integrate_implicit(prob, tableau, sequential):
    from ..odeint import _warn_unused
    opts = dict(prob.options)
    _warn_unused('implicit fixed-grid solver', opts,
                 {'step_size', 'grid_constructor', 'num_steps', 'perturb',
                  'interp', 'max_iters', 'root_solver', 'dtype'})
    method = make_fixed_step_method(prob, tableau, sequential)
    grid = construct_grid(prob.func, prob.y0, prob.t, opts.get('step_size'),
                          opts.get('grid_constructor'),
                          opts.get('num_steps'))
    return integrate_fixed_grid(method, prob.func, prob.y0, prob.t, grid,
                                interp=opts.get('interp', 'linear'),
                                perturb=opts.get('perturb', False))
