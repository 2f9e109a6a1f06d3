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


# ---------------------------------------------------------------------------
# Fused adaptive dopri5 with PER-LANE step-size control.
# ---------------------------------------------------------------------------

def _dopri5_consts(dtype):
    from . import tableaus
    import numpy as np
    tab = tableaus.DOPRI5
    return (np.asarray(tab.alpha, dtype), np.asarray(tab.beta, dtype),
            np.asarray(tab.c_sol, dtype), np.asarray(tab.c_error, dtype))


def dopri5_integrate_batched(field, y0, t0, t1, *, rtol=1e-4, atol=1e-6,
                             params=(), max_steps=10_000, safety=0.9,
                             ifactor=10.0, dfactor=0.2, interpret=False):
    """Adaptive dopri5 over a huge batch of small ODEs, fused into ONE
    Pallas kernel with an independent step-size controller PER SAMPLE.

    The host drivers give the whole batch one controller (reference
    semantics) or per-sample control via `vmap` (one loop dispatch per
    union step).  Here each of the 128 VPU lanes owns a trajectory: state
    is laid out (D, B) with the batch riding the lane axis, `t`/`dt` are
    (1, B) vectors, accept/reject is an elementwise mask, and the kernel's
    single `while_loop` runs until every lane reaches `t1`.  No HBM
    traffic and no loop dispatch between steps — the speed-of-light design
    for "millions of tiny ODEs" workloads (simulation ensembles, particle
    models, option pricing).

    Args:
        field: traceable `field(t, y, *params)` over (D, b) blocks with t
            of shape (1, b) (broadcasts elementwise).
        y0: (D, B) initial states, batch on the LAST axis.
        t0, t1: scalars.
        rtol, atol, max_steps, safety/ifactor/dfactor: controller config.

    Returns:
        (y_final (D, B), n_accepted (1, B) int32, n_steps (1, B) int32).
    """
    from jax.experimental import pallas as pl
    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem = pltpu.VMEM
    except Exception:  # pragma: no cover
        vmem = None

    D, B = y0.shape
    dtype = y0.dtype
    alpha, beta, c_sol, c_err = _dopri5_consts(dtype)
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    max_steps = int(max_steps)

    def one_solve(scal_ref, *refs):
        param_refs = refs[:len(params)]
        y0_ref = refs[len(params)]
        y_out, acc_out, steps_out = refs[len(params) + 1:]
        pvals = tuple(r[:] for r in param_refs)
        t_start, t_end = scal_ref[0], scal_ref[1]

        y_init = y0_ref[:]
        tiny = jnp.finfo(dtype).tiny
        span = t_end - t_start

        def f(tv, yv):
            return field(tv, yv, *pvals)

        def stage_sweep(t, dt, y, f0):
            ks = [f0]
            yi = y
            for i in range(len(alpha)):
                acc = None
                for j in range(i + 1):
                    if beta[i, j] == 0.0:
                        continue
                    term = float(beta[i, j]) * ks[j]
                    acc = term if acc is None else acc + term
                yi = y + dt * acc
                ti = t + float(alpha[i]) * dt
                ks.append(f(ti, yi))
            y1 = yi  # dopri5 is FSAL: last stage sits at (t+dt, y1)
            err = None
            for j, c in enumerate(c_err):
                if c == 0.0:
                    continue
                term = float(c) * ks[j]
                err = term if err is None else err + term
            return y1, ks[-1], dt * err

        def cond(carry):
            t, dt, y, fc, acc, stp = carry
            return jnp.any((t < t_end) & (stp < float(max_steps)))

        def body(carry):
            t, dt, y, fc, acc, stp = carry        # control vectors: (8, B)
            active = t < t_end
            dt_c = jnp.minimum(dt, t_end - t)       # never overshoot
            dt_c = jnp.where(active, dt_c, jnp.zeros_like(dt_c))
            y1, f1, err = stage_sweep(t[:1], dt_c[:1], y, fc)
            tol = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
            # per-sample RMS over the state dim, broadcast back to (8, B)
            msq = jnp.broadcast_to(jnp.mean((err / tol) ** 2, axis=0,
                                            keepdims=True), (8, B))
            ratio = jnp.sqrt(msq)
            accept = (ratio <= 1.0) & active
            y = jnp.where(accept[:1], y1, y)
            fc = jnp.where(accept[:1], f1, fc)
            t = jnp.where(accept, t + dt_c, t)
            dfac = jnp.where(ratio < 1.0, jnp.ones_like(ratio), dfactor)
            factor = jnp.minimum(
                ifactor, jnp.maximum(safety / jnp.maximum(ratio, tiny)
                                     ** (1.0 / 5.0), dfac))
            dt = jnp.where(active, dt_c * factor, dt)
            acc = acc + accept.astype(dtype)
            stp = stp + active.astype(dtype)
            return (t, dt, y, fc, acc, stp)

        # All control vectors live on the full (8, B) sublane tile with a
        # concrete (non-replicated) layout — Mosaic rejects while-carries
        # whose layout changes replication between iterations, and both
        # (1, B) carries and splat-initialised (8, B) carries hit that.
        # The iota term forces a materialised {0,0} layout.
        zero_like = 0.0 * jax.lax.broadcasted_iota(jnp.int32, (8, B), 1).astype(dtype)
        t_v = t_start + zero_like
        f0 = f(t_v[:1], y_init)
        dt_v = 0.01 * span + zero_like
        acc0 = zero_like
        carry = (t_v, dt_v, y_init, f0, acc0, acc0)
        t_v, dt_v, y, fc, acc, stp = jax.lax.while_loop(cond, body, carry)
        y_out[:] = y
        acc_out[:] = acc[:1].astype(jnp.int32)
        steps_out[:] = stp[:1].astype(jnp.int32)

    out_shapes = (jax.ShapeDtypeStruct((D, B), dtype),
                  jax.ShapeDtypeStruct((1, B), jnp.int32),
                  jax.ShapeDtypeStruct((1, B), jnp.int32))

    if jax.default_backend() != 'tpu' and not interpret:
        interpret = True  # portable fallback

    return pl.pallas_call(
        one_solve,
        in_specs=([pl.BlockSpec(memory_space=vmem)]
                  + [pl.BlockSpec(memory_space=vmem) for _ in params]
                  + [pl.BlockSpec(memory_space=vmem)]),
        out_specs=tuple(pl.BlockSpec(memory_space=vmem) for _ in range(3)),
        out_shape=out_shapes,
        interpret=interpret,
    )(jnp.stack([t0, t1]), *params, y0)
