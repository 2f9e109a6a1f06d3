"""Fixed-grid solvers as a single `lax.scan`.

TPU-native inversion of the reference's per-step Python loop
(torchdiffeq/_impl/solvers.py:102-128): the whole time grid is swept by one
`lax.scan` (reverse-differentiable, so backprop-through-the-solver works
natively, exactly like the reference's discretise-then-optimise semantics),
and the requested output times are then interpolated *vectorised* with a
`searchsorted` gather instead of interleaved emission.

Step functions mirror torchdiffeq/_impl/fixed_grid.py (euler, midpoint,
rk4 = 3/8-rule, heun2, heun3).  Steppers carry explicit solver state
(a pytree; empty for single-step methods, the f-history ring buffer for
Adams) so that multistep methods ride the same scan/while drivers.

The driver and the five explicit step functions are tree-polymorphic:
state may be any pytree of arrays with native leaf shapes (a bare ndarray
behaves exactly as before, so the raveled Adams/implicit tiers are
unchanged).  The explicit tier therefore runs tuple/dict states without
the ravel round-trip the reference's `_flat_to_shape` design forces
(misc.py:126-155) — on TPU that keeps each leaf's layout and sharding
intact through the scan (see ops/treemath.py; measured 2.5x on a
4-leaf adjoint-sized state, dev/budget_probe10.py).  The event driver
(`integrate_until_event_fixed_grid`) still requires a flat state and is
gated raveled in `tree_state_capable`.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..misc import Perturb
from ..ops.interp import linear_interp, cubic_hermite_interp
from ..ops import rk_step
from ..ops.treemath import tmap
from .solution import Stats, OK, ERR_MAX_NUM_STEPS


class FixedStepMethod(NamedTuple):
    """A fixed-grid stepper.

    step(func, t0, dt, t1, y0, perturb, state) -> (dy, f0, new_state)
    init_state(func, y0, t0) -> state pytree
    error_from_state(final_state) -> int32 error code (optional; lets a
    stepper surface e.g. implicit-stage non-convergence through Stats)
    nfe_from_state(final_state) -> int32 extra NFE accumulated in the
    stepper state (optional; lets a data-dependent stepper — e.g. the
    Adams-Moulton corrector, whose iteration count varies per step —
    report the reference's eval count, fixed_adams.py:208-222)
    """
    step: Callable
    order: int
    nfe_per_step: int
    init_state: Callable = lambda func, y0, t0: ()
    error_from_state: Callable = None
    nfe_from_state: Callable = None


def _stateless(fn):
    def step(func, t0, dt, t1, y0, perturb, state):
        dy, f0 = fn(func, t0, dt, t1, y0, perturb)
        return dy, f0, state
    return step


def _euler_step(func, t0, dt, t1, y0, perturb):
    f0 = func(t0, y0, perturb=Perturb.NEXT if perturb else Perturb.NONE)
    return tmap(lambda f: dt * f, f0), f0


def _midpoint_step(func, t0, dt, t1, y0, perturb):
    half_dt = 0.5 * dt
    f0 = func(t0, y0, perturb=Perturb.NEXT if perturb else Perturb.NONE)
    y_mid = tmap(lambda y, f: y + f * half_dt, y0, f0)
    return tmap(lambda f: dt * f, func(t0 + half_dt, y_mid)), f0


def _rk4_step(func, t0, dt, t1, y0, perturb):
    f0 = func(t0, y0, perturb=Perturb.NEXT if perturb else Perturb.NONE)
    return rk_step.rk4_alt_step_func(func, t0, dt, t1, y0, f0=f0, perturb=perturb), f0


_HEUN3_TABLE = [
    [0.0, 0.0, 0.0, 0.0],
    [1 / 3, 1 / 3, 0.0, 0.0],
    [2 / 3, 0.0, 2 / 3, 0.0],
    [0.0, 1 / 4, 0.0, 3 / 4],
]

_HEUN2_TABLE = [
    [0.0, 0.0, 0.0],
    [1.0, 1.0, 0.0],
    [0.0, 1 / 2, 1 / 2],
]


def _heun3_step(func, t0, dt, t1, y0, perturb):
    f0 = func(t0, y0, perturb=Perturb.NEXT if perturb else Perturb.NONE)
    return rk_step.rk3_step_func(func, t0, dt, t1, y0, butcher_tableu=_HEUN3_TABLE,
                                 f0=f0, perturb=perturb), f0


def _heun2_step(func, t0, dt, t1, y0, perturb):
    f0 = func(t0, y0, perturb=Perturb.NEXT if perturb else Perturb.NONE)
    return rk_step.rk2_step_func(func, t0, dt, t1, y0, butcher_tableu=_HEUN2_TABLE,
                                 f0=f0, perturb=perturb), f0


FIXED_STEP_METHODS = {
    'euler': FixedStepMethod(_stateless(_euler_step), order=1, nfe_per_step=1),
    'midpoint': FixedStepMethod(_stateless(_midpoint_step), order=2, nfe_per_step=2),
    'rk4': FixedStepMethod(_stateless(_rk4_step), order=4, nfe_per_step=4),
    'heun3': FixedStepMethod(_stateless(_heun3_step), order=3, nfe_per_step=3),
    'heun2': FixedStepMethod(_stateless(_heun2_step), order=2, nfe_per_step=2),
}


def construct_grid(func, y0, t, step_size, grid_constructor, num_steps=None):
    """Build the integration grid (reference solvers.py:70-96).

    `step_size` grids have a data-dependent length, so they require concrete
    (non-traced) `t` — grid *shape* must be static under XLA.  The
    trace-friendly alternative is ``num_steps`` (a static int): the grid is
    `num_steps + 1` points spread uniformly over [t[0], t[-1]], computable
    from traced endpoints.
    """
    if sum(x is not None for x in (step_size, grid_constructor,
                                   num_steps)) > 1:
        raise ValueError("step_size, grid_constructor and num_steps are "
                         "mutually exclusive arguments.")
    if num_steps is not None:
        t = jnp.asarray(t)
        frac = jnp.linspace(0.0, 1.0, int(num_steps) + 1, dtype=t.dtype)
        return t[0] + (t[-1] - t[0]) * frac
    if step_size is None:
        if grid_constructor is None:
            return t
        return grid_constructor(func, y0, t)
    try:
        t_np = np.asarray(t)
    except Exception:
        raise ValueError(
            "options['step_size'] requires concrete (non-traced) integration "
            "times, because the number of solver steps sets a static array "
            "shape under XLA (note: jit lifts even closed-over constants to "
            "tracers). Use options['num_steps'] (static int) or a "
            "grid_constructor returning a fixed-size grid instead.") from None
    start_time, end_time = t_np[0], t_np[-1]
    niters = int(np.ceil((end_time - start_time) / step_size + 1))
    t_infer = np.arange(0, niters, dtype=np.float64) * np.float64(step_size) + start_time
    t_infer[-1] = end_time
    return jnp.asarray(t_infer, dtype=jnp.asarray(t).dtype)


def integrate_fixed_grid(method: FixedStepMethod, func, y0, ts, grid, *,
                         interp="linear", perturb=False, remat=False):
    """Sweep `grid` with `method` and interpolate the solution at `ts`.

    Returns (ys (T, n), Stats).

    remat=True wraps each step in `jax.checkpoint`: the backward pass
    recomputes the step's internal stages instead of storing them, cutting
    training memory from O(steps * stages * n) to O(steps * n) at ~1.3x
    the backward FLOPs (a TPU-native trade — HBM for MXU cycles).
    """
    if interp not in ("linear", "cubic"):
        raise ValueError(f"Unknown interpolation method {interp}")
    grid = jnp.asarray(grid)
    G = grid.shape[0]
    cubic = interp == "cubic"

    state0 = method.init_state(func, y0, grid[0])

    def scan_body(carry, pair):
        y0_, st = carry
        t0, t1 = pair
        dt = t1 - t0
        if getattr(func, 'callback_step', None) is not None:
            func.callback_step(t0, y0_, dt)  # reference solvers.py:113
        dy, f0, st = method.step(func, t0, dt, t1, y0_, perturb, st)
        # f64 grid times must not promote an f32/complex state increment
        # (reference casts with `.type_as(y0)`).
        y1 = tmap(lambda a, d: a + d.astype(a.dtype), y0_, dy)
        if cubic:
            # The reference evaluates f1 afresh for cubic output interpolation
            # (solvers.py:119); we evaluate it once per interval.
            f1 = func(t1, y1, perturb=Perturb.NONE)
            return (y1, st), (y1, f0, f1)
        # Linear emission needs only the grid states: skip stacking the
        # per-step slopes (for big states that is 2 full trajectory
        # buffers of HBM writes the interpolation would never read).
        return (y1, st), (y1,)

    pairs = jnp.stack([grid[:-1], grid[1:]], axis=1)
    body = jax.checkpoint(scan_body) if remat else scan_body
    if cubic:
        (_, state_last), (ys_tail, f0s, f1s) = jax.lax.scan(
            body, (y0, state0), pairs)
    else:
        (_, state_last), (ys_tail,) = jax.lax.scan(
            body, (y0, state0), pairs)
    ys_grid = tmap(lambda y0l, tail: jnp.concatenate([y0l[None], tail],
                                                     axis=0),
                   y0, ys_tail)  # (G, ...) per leaf

    # Vectorised emission: t_j lives in grid interval [grid[i1-1], grid[i1]]
    # with grid[i1-1] < t_j <= grid[i1] (the reference emits at the first
    # interval whose right endpoint reaches t_j, solvers.py:117).
    i1 = jnp.clip(jnp.searchsorted(grid, ts, side='left'), 1, G - 1)
    t0s, t1s = grid[i1 - 1], grid[i1]
    ya = tmap(lambda a: a[i1 - 1], ys_grid)
    yb = tmap(lambda a: a[i1], ys_grid)
    if cubic:
        fa = tmap(lambda a: a[i1 - 1], f0s)
        fb = tmap(lambda a: a[i1 - 1], f1s)
        ys = jax.vmap(cubic_hermite_interp)(t0s, ya, fa, t1s, yb, fb, ts)
    else:
        ys = jax.vmap(linear_interp)(t0s, t1s, ya, yb, ts)

    n_steps = G - 1
    nfe = n_steps * method.nfe_per_step + (n_steps if cubic else 0)
    if method.nfe_from_state is not None:
        nfe = nfe + method.nfe_from_state(state_last)
    err = (method.error_from_state(state_last)
           if method.error_from_state is not None else OK)
    stats = Stats.make(nfe=nfe, n_steps=n_steps, n_accepted=n_steps,
                       error_code=err)
    return ys, stats


def integrate_until_event_fixed_grid(method: FixedStepMethod, func, y0, t0,
                                     event_fn, *, step_size, interp="linear",
                                     perturb=False, atol=1e-9,
                                     max_itrs=20000):
    """Fixed-grid event solve (reference solvers.py:130-164): step until the
    event function changes sign, then bisect on the interval interpolant."""
    from ..events import find_event

    if step_size is None:
        raise ValueError(
            "Event handling for fixed step solvers currently requires "
            "`step_size` to be provided in options.")
    if interp not in ("linear", "cubic"):
        raise ValueError(f"Unknown interpolation method {interp}")
    cubic = interp == "cubic"

    time_dtype = jnp.zeros((), y0.dtype).real.dtype  # real even for complex y
    t0 = jnp.asarray(t0).astype(time_dtype)
    dt = jnp.asarray(step_size).astype(time_dtype)
    sign0 = jnp.sign(event_fn(t0, y0))
    state0 = method.init_state(func, y0, t0)

    def one_step(t0_, y0_, st):
        t1 = t0_ + dt
        dy, f0, st = method.step(func, t0_, dt, t1, y0_, perturb, st)
        y1 = y0_ + dy.astype(y0_.dtype)
        if cubic:
            f1 = func(t1, y1, perturb=Perturb.NONE)
        else:
            f1 = jnp.zeros_like(f0)
        return t1, y1, f0, f1, st

    def cond(c):
        t0_, y0_, t1, y1, f0, f1, st, itr, changed = c
        return (~changed) & (itr < max_itrs)

    def body(c):
        t0_, y0_, _, _, _, _, st, itr, _ = c
        t1, y1, f0, f1, st = one_step(t0_, y0_, st)
        changed = jnp.sign(event_fn(t1, y1)) != sign0
        # On no-change, advance the left endpoint; on change, freeze the
        # bracketing interval for the bisection below.
        t0n = jnp.where(changed, t0_, t1)
        y0n = jnp.where(changed, y0_, y1)
        return (t0n, y0n, t1, y1, f0, f1, st, itr + 1, changed)

    zero = jnp.zeros_like(y0)
    init = (t0, y0, t0, y0, zero, zero, state0, jnp.int32(0), jnp.asarray(False))
    t0_, y0_, t1, y1, f0, f1, state_last, itr, changed = \
        jax.lax.while_loop(cond, body, init)

    if cubic:
        interp_fn = lambda t: cubic_hermite_interp(t0_, y0_, f0, t1, y1, f1, t)
    else:
        interp_fn = lambda t: linear_interp(t0_, t1, y0_, y1, t)

    event_t, y_event = find_event(interp_fn, sign0, t0_, t1, event_fn, atol)
    err = jnp.where(changed, OK, ERR_MAX_NUM_STEPS).astype(jnp.int32)
    nfe = itr * (method.nfe_per_step + (1 if cubic else 0))
    if method.nfe_from_state is not None:
        nfe = nfe + method.nfe_from_state(state_last)
    stats = Stats.make(nfe=nfe, n_steps=itr, n_accepted=itr, error_code=err)
    return event_t, y_event, stats
