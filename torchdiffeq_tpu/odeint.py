"""The `odeint` front door: input normalisation, solver dispatch, gradients.

TPU-native rebuild of torchdiffeq/_impl/odeint.py:49-108.  Differences:

* State is any JAX pytree; `args` are passed explicitly (idiomatic JAX) but
  closures over parameters also work — `jax.closure_convert` extracts them
  for the adjoint path.
* Gradient strategy per method family:
    - fixed-grid explicit / Adams: native backprop through `lax.scan`
      (exact discretise-then-optimise, matching the reference's
      autograd-through-the-solver).
    - fixed-grid implicit (FIRK/DIRK): `lax.scan` over steps with
      implicit-function-theorem `custom_vjp` on each nonlinear stage solve
      (exact gradients of the converged solve).
    - adaptive RK (and all event solves): `custom_vjp` continuous adjoint at
      the same method/tolerances (a `lax.while_loop` is not
      reverse-differentiable; the continuous adjoint is accurate to solver
      tolerance).  Use `odeint_adjoint` to control the backward solve, or
      `options=dict(replay_grad=True)` for exact discretise-then-optimise
      gradients (+ forward-mode and higher-order AD) via step replay, or
      `options=dict(forward_grad=True)` for buffer-free exact forward
      sensitivities (`jax.jvp`/`jacfwd` trace straight through the
      while_loop; no reverse mode on that path).
* `odeint_with_stats` additionally returns solver telemetry (NFE, step and
  accept/reject counts, error code) — the compiled-loop replacement for the
  reference's callback system and `nfe` counter convention.
"""
from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp

from .misc import check_inputs, flat_to_tree, NormalisedProblem
from .solvers import SOLVERS, DIRECT_DIFF_KINDS, tree_state_capable
from .solvers import adaptive_rk, fixed_grid
from .solvers.solution import Stats


def _warn_unused(kind, options, allowed):
    unused = set(options) - set(allowed)
    if unused:
        warnings.warn(f"{kind}: Unexpected arguments {sorted(unused)}")


def _adaptive_config(prob: NormalisedProblem, tableau):
    opts = dict(prob.options)
    opts.pop('dtype', None)  # consumed by check_inputs (time dtype)
    _warn_unused('adaptive solver', opts,
                 {'first_step', 'step_t', 'jump_t', 'safety', 'ifactor',
                  'dfactor', 'min_step', 'max_step', 'max_num_steps',
                  'controller', 'pcoeff', 'icoeff', 'dcoeff', 'replay_grad',
                  'max_segments', 'compensated_time', 'stage_tol',
                  'max_iters', 'jump_state_fn', '_jump_branch_free',
                  'forward_grad', 'step_to_end', 'error_dtype'})
    step_fn = None
    if tableau.implicit:
        from .solvers.adaptive_implicit import (make_esdirk_step_fn,
                                                make_firk_step_fn)
        make = make_esdirk_step_fn if tableau.sdirk else make_firk_step_fn
        step_fn = make(stage_tol=opts.get('stage_tol'),
                       max_iters=opts.get('max_iters', 100),
                       error_dtype=opts.get('error_dtype'))
    return adaptive_rk.AdaptiveConfig(
        step_fn=step_fn,
        tableau=tableau, rtol=prob.rtol, atol=prob.atol, norm=prob.norm,
        first_step=opts.get('first_step'),
        step_t=opts.get('step_t'), jump_t=opts.get('jump_t'),
        safety=opts.get('safety', 0.9),
        ifactor=opts.get('ifactor', 10.0),
        dfactor=opts.get('dfactor', 0.2),
        min_step=opts.get('min_step', 0.0),
        max_step=opts.get('max_step', float('inf')),
        max_num_steps=opts.get('max_num_steps', 2 ** 31 - 1),
        controller=opts.get('controller', 'i'),
        pcoeff=opts.get('pcoeff', 0.4),
        icoeff=opts.get('icoeff', 0.7),
        dcoeff=opts.get('dcoeff', 0.0),
        compensated_time=opts.get('compensated_time', True),
        jump_state_fn=opts.get('jump_state_fn'),
        jump_branch_free=bool(opts.get('_jump_branch_free', False)),
        step_to_end=bool(opts.get('step_to_end', False)),
        error_dtype=opts.get('error_dtype'))


def _solve_normalised(prob: NormalisedProblem):
    """Raw forward solve on a normalised problem.  Returns (ys_flat, Stats).

    Fixed-grid kinds are natively differentiable; the adaptive kind is only
    forward-executable here (gradients are layered on in adjoint.py).
    """
    spec = SOLVERS[prob.method]
    kind = spec['kind']
    if kind == 'adaptive':
        cfg = _adaptive_config(prob, spec['tableau'])
        return adaptive_rk.integrate(prob.func, prob.y0, prob.t, cfg)
    elif kind == 'fixed':
        opts = dict(prob.options)
        _warn_unused('fixed-grid solver', opts,
                     {'step_size', 'grid_constructor', 'num_steps',
                      'perturb', 'interp', 'dtype', 'remat'})
        grid = fixed_grid.construct_grid(
            prob.func, prob.y0, prob.t, opts.get('step_size'),
            opts.get('grid_constructor'), opts.get('num_steps'))
        return fixed_grid.integrate_fixed_grid(
            spec['method'], prob.func, prob.y0, prob.t, grid,
            interp=opts.get('interp', 'linear'),
            perturb=opts.get('perturb', False),
            remat=opts.get('remat', False))
    elif kind == 'adams':
        from .solvers import adams
        return adams.integrate_adams(prob, implicit=spec['implicit'])
    elif kind in ('firk', 'dirk'):
        from .solvers import fixed_grid_implicit
        return fixed_grid_implicit.integrate_implicit(
            prob, spec['tableau'], sequential=(kind == 'dirk'))
    elif kind == 'scipy':
        from .solvers import scipy_wrapper
        return scipy_wrapper.integrate_scipy(prob)
    else:  # pragma: no cover
        raise ValueError(f"unknown solver kind {kind}")


def _solve_event_normalised(prob: NormalisedProblem):
    """Raw event solve.  Returns (event_t, ys2_flat (2, n), Stats)."""
    spec = SOLVERS[prob.method]
    kind = spec['kind']
    if kind == 'adaptive':
        cfg = _adaptive_config(prob, spec['tableau'])
        event_t, y_event, stats = adaptive_rk.integrate_until_event(
            prob.func, prob.y0, prob.t[0], prob.event_fn, cfg)
    elif kind in ('fixed', 'adams', 'firk', 'dirk'):
        opts = dict(prob.options)
        if kind == 'fixed':
            method = spec['method']
        else:
            from .solvers import adams, fixed_grid_implicit
            if kind == 'adams':
                method = adams.make_fixed_step_method(prob, spec['implicit'])
            else:
                method = fixed_grid_implicit.make_fixed_step_method(
                    prob, spec['tableau'], sequential=(kind == 'dirk'))
        event_t, y_event, stats = fixed_grid.integrate_until_event_fixed_grid(
            method, prob.func, prob.y0, prob.t[0], prob.event_fn,
            step_size=opts.get('step_size'),
            interp=opts.get('interp', 'linear'),
            perturb=opts.get('perturb', False),
            atol=prob.atol)
    else:
        raise ValueError(f"method '{prob.method}' does not support event handling")
    ys2 = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]),
                                 prob.y0, y_event)
    return event_t, ys2, stats


def _finalise(prob: NormalisedProblem, ys_flat):
    """Un-flatten the solution back to the user's state structure."""
    return flat_to_tree(prob.unravel, ys_flat)


def odeint(func, y0, t, *, rtol=1e-7, atol=1e-9, method=None, options=None,
           event_fn=None, args=()):
    """Integrate a system of ordinary differential equations.

    Solves the IVP ``dy/dt = func(t, y), y(t[0]) = y0`` where `y` is any JAX
    pytree.  API mirrors the reference `odeint` (torchdiffeq/_impl/odeint.py:49)
    with an extra idiomatic-JAX `args` parameter: `func` is called as
    ``func(t, y, *args)`` and gradients flow to `y0`, `t`, `args`, and any
    arrays closed over by `func`.

    Returns `ys` with a new leading time axis on every state leaf, or
    ``(event_t, ys)`` when `event_fn` is given.
    """
    ys, _ = _odeint_impl(func, y0, t, rtol, atol, method, options, event_fn,
                         args, with_stats=False)
    return ys


def odeint_with_stats(func, y0, t, *, rtol=1e-7, atol=1e-9, method=None,
                      options=None, event_fn=None, args=()):
    """Like `odeint`, but also returns a `Stats` pytree (NFE, steps,
    accept/reject counts, error code).  The stats path is the compiled-loop
    replacement for the reference's `nfe`-counter/callback conventions
    (tests/problems.py:41, FURTHER_DOCUMENTATION.md:62-77)."""
    return _odeint_impl(func, y0, t, rtol, atol, method, options, event_fn,
                        args, with_stats=True)


def _try_pallas_rk4(func, y0, t, method, options, event_fn, args):
    """Fused-kernel fast path for `odeint(..., method='rk4',
    options=dict(pallas=True, num_steps=N))`.

    Qualifies when the state is a 2-D (B, D) float array, the output times
    are concrete, increasing, and uniformly strided on the `num_steps`
    grid, and there is no event function.  Returns (ys, Stats) or None (the
    caller then falls back to the scan driver transparently).  Forward-only:
    the kernel's internal loop is not differentiable — use the default path
    (exact scan gradients) for training.
    """
    import numpy as np
    opts = options or {}
    if not isinstance(opts, dict) or not opts.get('pallas'):
        return None
    if method != 'rk4' or event_fn is not None:
        return None
    if set(opts) - {'pallas', 'num_steps', 'interpret', 'block_b'}:
        return None
    n_steps = opts.get('num_steps')
    if n_steps is None:
        return None
    if not isinstance(y0, (jnp.ndarray, np.ndarray)) or y0.ndim != 2 \
            or jnp.issubdtype(y0.dtype, jnp.complexfloating):
        return None
    try:
        t_np = np.asarray(t, dtype=np.float64)
    except Exception:
        return None
    T = t_np.shape[0]
    if t_np.ndim != 1 or T < 2 or not (np.diff(t_np) > 0).all():
        return None
    n_steps = int(n_steps)
    if n_steps % (T - 1) != 0:
        return None
    # outputs must sit exactly on the uniform grid
    if not np.allclose(t_np, np.linspace(t_np[0], t_np[-1], T),
                       rtol=0, atol=1e-12 * max(1.0, abs(t_np[-1]))):
        return None

    from .ops.pallas_kernels import rk4_integrate
    dt = (t_np[-1] - t_np[0]) / n_steps
    field = lambda tt, yy, *a: func(tt, yy, *a)
    ys = rk4_integrate(field, jnp.asarray(y0), t_np[0], dt, n_steps,
                       tuple(args), out_every=n_steps // (T - 1),
                       block_b=opts.get('block_b'),
                       interpret=bool(opts.get('interpret', False)))
    stats = Stats.make(nfe=4 * n_steps, n_steps=n_steps,
                       n_accepted=n_steps)
    return ys, stats


def _odeint_impl(func, y0, t, rtol, atol, method, options, event_fn, args,
                 with_stats):
    res = _try_pallas_rk4(func, y0, t, method, options, event_fn, args)
    if res is not None:
        return res
    if isinstance(options, dict) and ('pallas' in options
                                      or 'interpret' in options
                                      or 'block_b' in options):
        options = {k: v for k, v in options.items()
                   if k not in ('pallas', 'interpret', 'block_b')}
    # Native-shape tree state for the explicit adaptive and fixed-grid
    # tiers (replay mode keeps the raveled representation — its recording
    # buffers are flat; fixed-grid event bisection likewise).
    tree_ok = (tree_state_capable(method, event=event_fn is not None)
               and not (isinstance(options, dict)
                        and options.get('replay_grad')))
    prob = check_inputs(func, y0, t, rtol, atol, method, options, event_fn,
                        SOLVERS, args=args, ravel_state=not tree_ok)
    spec = SOLVERS[prob.method]
    direct = spec['kind'] in DIRECT_DIFF_KINDS or spec['kind'] == 'scipy'
    if direct and isinstance(prob.options, dict) \
            and 'forward_grad' in prob.options:
        # fixed-grid/Adams/implicit scans are already natively
        # forward-differentiable; accept the option as a no-op
        prob = prob._replace(options={k: v for k, v in prob.options.items()
                                      if k != 'forward_grad'})

    if prob.event_fn is None and direct:
        ys_flat, stats = _solve_normalised(prob)
        return _finalise(prob, ys_flat), stats

    if (spec['kind'] == 'adaptive'
            and prob.options.get('forward_grad', False)):
        # Forward-sensitivity mode: return the RAW while_loop solve with no
        # custom_vjp wrapper.  `jax.jvp` / `jax.jacfwd` then trace straight
        # through the compiled loop — exact discrete tangents (including
        # through the step controller), no replay buffers, arbitrary-order
        # forward AD.  Reverse mode is unavailable on this path (XLA
        # while_loop has no transpose); use the default adjoint or
        # replay_grad for that.
        if prob.event_fn is not None:
            raise ValueError(
                "forward_grad does not support event solves (the event "
                "time's bisection is non-differentiable forward-through; "
                "use options=dict(replay_grad=True) for differentiable "
                "event times)")
        opts = dict(prob.options)
        opts.pop('forward_grad', None)
        prob2 = prob._replace(options=opts)
        ys_flat, stats = _solve_normalised(prob2)
        return _finalise(prob, ys_flat), stats

    if (spec['kind'] == 'adaptive'
            and prob.options.get('replay_grad', False)):
        # exact discretise-then-optimise gradients (+ jvp / higher-order AD)
        # by re-executing the recorded step sequence as a lax.scan;
        # max_segments=None auto-sizes via a concrete probe (replay.py)
        from .misc import time_sign
        from .solvers import replay
        opts = dict(prob.options)
        opts.pop('replay_grad', None)
        # replay re-executes recorded segments through the interpolant;
        # the interp-free fast path does not compose with it
        opts.pop('step_to_end', None)
        max_segments = opts.pop('max_segments', None)
        prob2 = prob._replace(options=opts)
        cfg = _adaptive_config(prob2, spec['tableau'])
        if prob.event_fn is None:
            ys_flat, stats = replay.integrate_replay(
                prob.func, prob.y0, prob.t, cfg, max_segments)
            return _finalise(prob, ys_flat), stats
        event_t, y_event, stats = replay.integrate_replay_event(
            prob.func, prob.y0, prob.t[0], prob.event_fn, cfg, max_segments)
        ys2 = jnp.stack([prob.y0, y_event])
        event_t = time_sign(jnp.asarray(t)) * event_t
        return (event_t, _finalise(prob, ys2)), stats

    # Adaptive methods and event solves: continuous-adjoint custom_vjp with
    # backward settings equal to the forward settings (see module docstring).
    from .adjoint import adjoint_solve
    result, stats = adjoint_solve(
        func, y0, t, rtol=rtol, atol=atol, method=prob.method,
        options=options, event_fn=event_fn, args=args,
        adjoint_rtol=rtol, adjoint_atol=atol, adjoint_method=prob.method,
        adjoint_options=None)

    # adjoint_solve returns user-frame results for both modes.
    return result, stats
