"""Per-sample batched adaptive step control.

The reference shares ONE error norm across the whole batch (the RMS runs
over the full flattened state, torchdiffeq misc.py:22-23, 80-82), so a
single stiff sample shrinks everyone's steps.  The TPU-native batched
controller gives every sample its own accept/reject sequence and step size
— expressed as `jax.vmap` over the solve, which XLA lowers to one batched
`while_loop` with per-lane masking (lanes that finish early idle until the
batch completes; there is no host sync).

`odeint_per_sample` returns solutions stacked as (B, T, ...) plus per-sample
`Stats` (so NFE/step counts are per trajectory).
"""
from __future__ import annotations

from functools import partial

import jax

from ..odeint import odeint, odeint_with_stats


def odeint_per_sample(func, y0, t, **kwargs):
    """Batched solve with independent per-sample step-size controllers.

    Args:
        func: vector field evaluated per sample: ``func(t, y_i, *args)``
            where `y_i` is one sample (no batch axis).
        y0: state pytree with a leading batch axis on every leaf.
        t: (T,) shared output times.
        **kwargs: forwarded to `odeint`.

    Returns:
        ys with shape (B, T, ...) per leaf.
    """
    return jax.vmap(lambda y0_: odeint(func, y0_, t, **kwargs))(y0)


def odeint_per_sample_with_stats(func, y0, t, **kwargs):
    """Like `odeint_per_sample`, also returning per-sample `Stats`."""
    return jax.vmap(lambda y0_: odeint_with_stats(func, y0_, t, **kwargs))(y0)
