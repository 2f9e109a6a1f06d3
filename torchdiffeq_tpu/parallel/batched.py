"""Per-sample batched adaptive step control.

The reference shares ONE error norm across the whole batch (the RMS runs
over the full flattened state, torchdiffeq misc.py:22-23, 80-82), so a
single stiff sample shrinks everyone's steps.  The TPU-native batched
controller gives every sample its own accept/reject sequence and step size.
Two execution paths:

* the general path expresses the batch as `jax.vmap` over the solve, which
  XLA lowers to one batched `while_loop` with per-lane masking (lanes that
  finish early idle until the batch completes; there is no host sync);
* with ``options=dict(pallas=True)`` and a qualifying problem (dopri5, 2-D
  (B, D) array state, concrete increasing output times, scalar tolerances),
  the whole batched solve dispatches to the fused Pallas kernel
  (`ops/pallas_kernels.dopri5_integrate_batched`): every VPU lane owns one
  trajectory resident in VMEM, with zero HBM traffic and zero loop dispatch
  between steps — measured 1.15-1.35x over the vmap path for many small
  ODEs (benchmarks/PERF.md), and it removes the per-call dispatch floor
  when solves already sit inside a larger jit region.
  With ``event_fn`` the kernel instead watches a per-lane event sign and
  bisects every lane's bracketing interpolant after the loop
  (`dopri5_events_batched`) — fused per-lane event solves.  Problems that
  do not qualify fall back to vmap transparently.

Args are SHARED across samples by default; pass ``args_axes`` (a tuple
of `None`/axis-int per arg, like `jax.vmap`'s `in_axes`) to map an arg
per sample.  The kernel path requires per-sample axes to be `-1` (the
lane axis); other axes fall back to vmap.

Scope note (round-4 decision, see ops/pallas_kernels.py): the kernel
path is an opt-in niche, frozen at current scope.  Expect the 1.15-1.35x
win only for lane-friendly fields (elementwise ops over the state
vector); fields spelled with per-component scalar indexing + `jnp.stack`
can lower several-x SLOWER in Mosaic than the vmap path — prefer the
default vmap path unless `benchmarks/bench_ensemble.py` shows a win for
your field shape.

`odeint_per_sample` returns solutions stacked as (B, T, ...) plus per-sample
`Stats` (so NFE/step counts are per trajectory) in the `_with_stats`
variant.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..odeint import odeint, odeint_with_stats
from ..solvers.solution import Stats, OK, ERR_MAX_NUM_STEPS

# options understood by the fused kernel; anything else falls back to vmap.
_PALLAS_OPTS = {'pallas', 'first_step', 'safety', 'ifactor', 'dfactor',
                'max_num_steps', 'interpret'}


def _pallas_qualifies(y0, t, rtol, atol, method, options, event_fn):
    from ..ops.pallas_kernels import PER_LANE_METHODS
    if not isinstance(options, dict) or not options.get('pallas'):
        return None
    if method is not None and method not in PER_LANE_METHODS:
        return None
    if set(options) - _PALLAS_OPTS:
        return None
    if not (np.isscalar(rtol) or np.ndim(rtol) == 0) \
            or not (np.isscalar(atol) or np.ndim(atol) == 0):
        return None
    if not isinstance(y0, (jnp.ndarray, np.ndarray)) or y0.ndim != 2:
        return None
    if jnp.issubdtype(y0.dtype, jnp.complexfloating):
        return None
    try:
        t_np = np.asarray(t, dtype=np.float64)
    except Exception:
        return None  # traced output times: grid must be concrete
    if t_np.ndim != 1 or t_np.shape[0] < 2 or not (np.diff(t_np) > 0).all():
        return None
    return t_np


def _norm_args_axes(args, args_axes):
    """Normalise args_axes to a per-arg tuple of None / axis ints."""
    if args_axes is None:
        return (None,) * len(args)
    args_axes = tuple(args_axes)
    if len(args_axes) != len(args):
        raise ValueError(f"args_axes has {len(args_axes)} entries for "
                         f"{len(args)} args")
    return args_axes


def _lane_field(func, lane_flags):
    """Lane-vectorise a per-sample ``func(t, y_i, *args)`` to the kernel
    layout (t (1,b), y (D,b) with the batch on lanes).  `lane_flags` marks
    which args are per-sample (mapped over their last axis — the kernel
    blocks exactly those per lane)."""
    axes = tuple(-1 if fl else None for fl in lane_flags)

    def field(tv, yv, *params):
        per_lane = lambda tt, yy, *ps: func(tt, yy, *ps)
        return jax.vmap(per_lane, in_axes=(0, 1) + axes,
                        out_axes=1)(tv[0], yv, *params)

    return field


def _per_step_nfe(method):
    from ..ops.pallas_kernels import _tableau_consts
    import numpy as np
    alpha, _, _, _, _, _, fsal = _tableau_consts(method, np.float32)
    return len(alpha) + (0 if fsal else 1)


def _pallas_per_sample(func, y0, t_np, rtol, atol, method, options, args,
                       lane_flags):
    from ..ops.pallas_kernels import dopri5_integrate_batched

    B, D = y0.shape
    dtype = y0.dtype
    # keep ts/t0/t1 as concrete numpy: jit lifts even closed-over jnp
    # constants to tracers, and the kernel bakes the emission times in
    # statically.
    ts = np.asarray(t_np, dtype)

    field = _lane_field(func, lane_flags)

    max_steps = int(options.get('max_num_steps', 10_000))
    ys, acc, stp = dopri5_integrate_batched(
        field, jnp.asarray(y0).T, ts[0], ts[-1], ts=ts,
        rtol=float(rtol), atol=float(atol), method=method,
        params=tuple(args),
        per_lane_params=lane_flags, max_steps=max_steps,
        safety=float(options.get('safety', 0.9)),
        ifactor=float(options.get('ifactor', 10.0)),
        dfactor=float(options.get('dfactor', 0.2)),
        first_step=options.get('first_step'),
        interpret=bool(options.get('interpret', False)))

    ys = jnp.transpose(ys, (2, 0, 1))   # (S, D, B) -> (B, S, D)
    stp_b = stp[0]
    acc_b = acc[0]
    init_nfe = 1 if options.get('first_step') is not None else 2
    stats = Stats.make(
        nfe=_per_step_nfe(method) * stp_b + init_nfe, n_steps=stp_b,
        n_accepted=acc_b, n_rejected=stp_b - acc_b,
        error_code=jnp.where(stp_b >= max_steps, ERR_MAX_NUM_STEPS, OK))
    return ys, stats


def _pallas_per_sample_event(func, y0, t0, event_fn, rtol, atol, method,
                             options, args, lane_flags):
    """Per-lane event solves in ONE fused kernel: every lane integrates
    until ITS OWN event fires (`ops/pallas_kernels.dopri5_events_batched`).
    Multi-output event functions are sign-combined per sample (reference
    event_handling.py:23-35); the initial signs ride the kernel's
    `ev_params` channel since kernel closures cannot capture traced
    arrays.  Result shape matches the vmap fallback:
    ``((event_t (B,), ys (B, 2, D)), per-sample Stats)`` with
    `error_code=ERR_MAX_NUM_STEPS` on lanes whose event never fired
    (their `event_t` is NaN).
    """
    from ..ops.pallas_kernels import dopri5_events_batched

    B, D = y0.shape
    dtype = y0.dtype
    field = _lane_field(func, lane_flags)

    sign0 = jax.lax.stop_gradient(
        jnp.sign(jax.vmap(lambda yy: jnp.atleast_1d(
            event_fn(jnp.asarray(t0, dtype), yy)))(y0))).T    # (K, B)

    def ev(tv, yv, s0):
        def one(tt, yy, s_i):
            return jnp.min(jnp.atleast_1d(event_fn(tt, yy)) * s_i)
        return jax.vmap(one, in_axes=(0, 1, 1),
                        out_axes=0)(tv[0], yv, s0)[None]

    max_steps = int(options.get('max_num_steps', 10_000))
    et, ye, found, acc, stp = dopri5_events_batched(
        field, jnp.asarray(y0).T, t0, ev,
        rtol=float(rtol), atol=float(atol), method=method,
        params=tuple(args),
        per_lane_params=lane_flags, ev_params=(sign0,),
        per_lane_ev_params=(True,), max_steps=max_steps,
        safety=float(options.get('safety', 0.9)),
        ifactor=float(options.get('ifactor', 10.0)),
        dfactor=float(options.get('dfactor', 0.2)),
        first_step=options.get('first_step'),
        interpret=bool(options.get('interpret', False)))

    event_t = et[0]                                       # (B,)
    ys2 = jnp.stack([jnp.asarray(y0), ye.T], axis=1)      # (B, 2, D)
    stp_b = stp[0]
    acc_b = acc[0]
    init_nfe = 1 if options.get('first_step') is not None else 2
    stats = Stats.make(
        nfe=_per_step_nfe(method) * stp_b + init_nfe, n_steps=stp_b,
        n_accepted=acc_b, n_rejected=stp_b - acc_b,
        error_code=jnp.where(found[0] > 0, OK, ERR_MAX_NUM_STEPS))
    return (event_t, ys2), stats


def odeint_per_sample(func, y0, t, args=(), args_axes=None, **kwargs):
    """Batched solve with independent per-sample step-size controllers.

    Args:
        func: vector field evaluated per sample: ``func(t, y_i, *args)``
            where `y_i` is one sample (no batch axis).
        y0: state pytree with a leading batch axis on every leaf.
        t: (T,) shared output times.
        args: extra arrays passed to `func` (shared across samples
            unless mapped by `args_axes`).
        args_axes: optional per-arg tuple of `None` (shared) or an axis
            int (mapped per sample, like `jax.vmap` in_axes).  The fused
            kernel path supports only axis `-1`; other axes use vmap.
        **kwargs: forwarded to `odeint`.  ``options=dict(pallas=True)``
            requests the fused per-lane Pallas kernel (see module
            docstring); non-qualifying problems fall back to vmap.

    Returns:
        ys with shape (B, T, ...) per leaf.
    """
    ys, _ = odeint_per_sample_with_stats(func, y0, t, args=args,
                                         args_axes=args_axes, **kwargs)
    return ys


def odeint_per_sample_with_stats(func, y0, t, args=(), args_axes=None,
                                 *, rtol=1e-7, atol=1e-9, method=None,
                                 options=None, event_fn=None, **kwargs):
    """Like `odeint_per_sample`, also returning per-sample `Stats`."""
    axes = _norm_args_axes(args, args_axes)
    t_np = _pallas_qualifies(y0, t, rtol, atol, method, options, event_fn)
    kernel_ok = all(a in (None, -1) for a in axes)
    if t_np is not None and not kwargs and kernel_ok:
        lane_flags = tuple(a == -1 for a in axes)
        kmethod = method or 'dopri5'
        if event_fn is not None:
            # event solves take t of shape (2,) = (t0, direction sentinel)
            # exactly like odeint(event_fn=...); enforce it here so the
            # kernel path cannot silently accept a t the vmap fallback
            # would reject
            if t_np.shape[0] != 2:
                raise ValueError(
                    "per-sample event solves require t of shape (2,) "
                    f"(t0 and a horizon/direction point), got {t_np.shape}")
            return _pallas_per_sample_event(func, y0, float(t_np[0]),
                                            event_fn, rtol, atol, kmethod,
                                            options, args, lane_flags)
        return _pallas_per_sample(func, y0, t_np, rtol, atol, kmethod,
                                  options, args, lane_flags)
    if isinstance(options, dict) and 'pallas' in options:
        options = {k: v for k, v in options.items() if k != 'pallas'}
    return jax.vmap(
        lambda y0_, *args_: odeint_with_stats(func, y0_, t, rtol=rtol,
                                              atol=atol, method=method,
                                              options=options,
                                              event_fn=event_fn, args=args_,
                                              **kwargs),
        in_axes=(0,) + axes)(y0, *args)
