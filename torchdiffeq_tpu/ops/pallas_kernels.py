"""Pallas TPU kernels: fully-fused fixed-grid integration.

The scan-based fixed-grid drivers launch one fused loop body per step; for
small/medium state that leaves the TPU idle between steps (HBM round-trips
for the carry + loop dispatch).  `rk4_integrate` instead runs the *entire*
time loop inside one Pallas kernel: each program owns a batch tile of
trajectories resident in VMEM, parameters are loaded to VMEM once, and all
`n_steps` RK4 stages execute back-to-back on the VPU/MXU.

The vector field must be a JAX-traceable function built from ops Pallas
supports (elementwise math, `jnp.dot`/`@`, reductions) of signature
``field(t, y, *params)`` with `y` of shape (block_b, dim).  MLP fields in
`torchdiffeq_tpu.models` qualify.

Falls back to a `lax.scan` reference implementation on non-TPU backends (or
with `interpret=True` for testing).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import rk_step


def _rk4_step_inline(field, t0, dt, y, params):
    """Classic RK4 on a (b, d) block (3/8-rule variant to match the
    library's `rk4` method, reference rk_common.py:110-118)."""
    one_third = 1.0 / 3
    k1 = field(t0, y, *params)
    k2 = field(t0 + dt * one_third, y + dt * one_third * k1, *params)
    k3 = field(t0 + dt * 2 * one_third, y + dt * (k2 - one_third * k1), *params)
    k4 = field(t0 + dt, y + dt * (k1 - k2 + k3), *params)
    return y + dt * 0.125 * (k1 + 3 * (k2 + k3) + k4)


def rk4_integrate(field, y0, t0, dt, n_steps, params=(), *, block_b=None,
                  interpret=False):
    """Integrate ``dy/dt = field(t, y, *params)`` with `n_steps` fixed RK4
    steps of size `dt`, entirely inside one Pallas kernel per batch tile.

    Args:
        field: traceable vector field over a (b, d) state block.
        y0: (B, D) initial states.
        t0, dt: python/array scalars.
        n_steps: static int.
        params: tuple of parameter arrays (loaded to VMEM once per tile).
        block_b: batch tile size (default: whole batch if it fits).
        interpret: run in the Pallas interpreter (for CPU testing).

    Returns:
        (B, D) final states.
    """
    from jax.experimental import pallas as pl
    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem = pltpu.VMEM
    except Exception:  # pragma: no cover - non-TPU build
        vmem = None

    B, D = y0.shape
    if block_b is None:
        # Grid programs execute serially on a TensorCore, so prefer ONE tile
        # covering the whole batch; split only when the working set (state +
        # 4 stage buffers + headroom) would overflow VMEM (~16 MB/core).
        # TPU tiling pads the lane (last) dim to 128, so a (b, D) f32 buffer
        # really occupies b * max(D, 128) * 4 bytes.
        padded_d = -(-D // 128) * 128
        bytes_per_row = padded_d * jnp.dtype(y0.dtype).itemsize * 8
        block_b = B
        while block_b * bytes_per_row > 8 * 1024 * 1024 and block_b % 2 == 0:
            block_b //= 2
    if B % block_b != 0:
        raise ValueError(f"batch {B} must be divisible by block_b {block_b}")

    t0 = jnp.asarray(t0, y0.dtype)
    dt = jnp.asarray(dt, y0.dtype)
    n_steps = int(n_steps)

    if jax.default_backend() != 'tpu' and not interpret:
        # portable fallback: same numerics through lax.scan
        def body(y, i):
            t = t0 + i.astype(y0.dtype) * dt
            return _rk4_step_inline(field, t, dt, y, params), None
        y, _ = jax.lax.scan(body, y0, jnp.arange(n_steps))
        return y

    def kernel(tdt_ref, *refs):
        param_refs = refs[:len(params)]
        y0_ref, out_ref = refs[len(params)], refs[len(params) + 1]
        pvals = tuple(r[:] for r in param_refs)
        t_start = tdt_ref[0]
        dt_k = tdt_ref[1]

        def body(i, y):
            t = t_start + i.astype(y.dtype) * dt_k
            return _rk4_step_inline(field, t, dt_k, y, pvals)

        out_ref[:] = jax.lax.fori_loop(0, n_steps, body, y0_ref[:])

    grid = (B // block_b,)
    # t0 as a (1,) array in VMEM, params whole per tile, state blocked over
    # the batch axis.
    in_specs = ([pl.BlockSpec(memory_space=vmem)]
                + [pl.BlockSpec(memory_space=vmem) for _ in params]
                + [pl.BlockSpec((block_b, D), lambda i: (i, 0),
                                memory_space=vmem)])

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, D), lambda i: (i, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((B, D), y0.dtype),
        interpret=interpret,
    )(jnp.stack([t0, dt]), *params, y0)
    return out
