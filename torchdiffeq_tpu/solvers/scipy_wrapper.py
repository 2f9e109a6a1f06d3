"""SciPy `solve_ivp` escape hatch.

Rebuild of torchdiffeq/_impl/scipy_wrapper.py: the solve round-trips through
the host via `jax.pure_callback` (the reference round-trips device->cpu numpy
the same way).  Non-differentiable, like the reference (which detaches).
Useful for stiff problems via LSODA/BDF/Radau.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def integrate_scipy(prob):
    from scipy.integrate import solve_ivp
    from ..odeint import _warn_unused
    from .solution import Stats

    opts = dict(prob.options)
    _warn_unused('scipy solver', opts,
                 {'solver', 'min_step', 'max_step', 'dtype', 'norm',
                  'grid_points', 'eps'})
    solver = opts.get('solver', 'LSODA')
    min_step = opts.get('min_step', 0)
    max_step = opts.get('max_step', float('inf'))

    T = prob.t.shape[0]
    n = prob.y0.shape[0]
    y_dtype = prob.y0.dtype
    func = prob.func  # must not close over traced values (host round-trip)

    # solve_ivp accepts vector atol (per-component) but only scalar rtol.
    rtol = np.asarray(prob.rtol)
    atol = np.asarray(prob.atol)
    if rtol.ndim > 0 and rtol.size > 1:
        raise ValueError(
            "scipy_solver requires a scalar rtol (scipy.solve_ivp does not "
            "support per-component rtol); per-leaf atol is supported.")
    rtol = float(rtol.reshape(()))
    atol = float(atol.reshape(())) if atol.size == 1 \
        else np.asarray(atol, dtype=np.float64).reshape(-1)

    def np_func(t, y):
        f = func(jnp.asarray(t, dtype=y_dtype), jnp.asarray(y, dtype=y_dtype))
        return np.asarray(f, dtype=np.float64).reshape(-1)

    def host_solve(y0, t):
        y0 = np.asarray(y0, dtype=np.float64).reshape(-1)
        t = np.asarray(t, dtype=np.float64)
        if t.size == 1:
            return y0[None].astype(y_dtype), np.int32(0)
        kwargs = {}
        if min_step != 0:
            kwargs['min_step'] = min_step
        if max_step != float('inf'):
            kwargs['max_step'] = max_step
        sol = solve_ivp(np_func, t_span=[t.min(), t.max()], y0=y0, t_eval=t,
                        method=solver, rtol=rtol, atol=atol,
                        **kwargs)
        return (np.ascontiguousarray(sol.y.T, dtype=y_dtype),
                np.int32(sol.nfev))

    out_shape = (jax.ShapeDtypeStruct((T, n), y_dtype),
                 jax.ShapeDtypeStruct((), jnp.int32))
    ys, nfev = jax.pure_callback(host_solve, out_shape,
                                 jax.lax.stop_gradient(prob.y0),
                                 jax.lax.stop_gradient(prob.t))
    return ys, Stats.make(nfe=nfev)
