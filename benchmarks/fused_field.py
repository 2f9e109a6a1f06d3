"""Fused adaptive-RK stage chain in Pallas: a MEASURED NEGATIVE RESULT.

Benchmark experiment, deliberately NOT wired into the library (see the
conclusion below).  Run `python benchmarks/bench_fused_field.py` on the
TPU to reproduce.

Hypothesis (round-2 roofline note): for an MLP field at batch 4096 the
XLA stage loop round-trips the (B, H) hidden activation plus the growing
k-stack through HBM each stage, so running the ENTIRE explicit stage
chain for a batch tile inside one Pallas program — state, k-slopes, and
field activations resident in VMEM, weights loaded once per tile, stage
combinations in f32 — should raise MFU for the neural-ODE training hot
loop (reference torchdiffeq/_impl/rk_common.py:266-361 driven by
examples/odenet_mnist.py, which the reference runs op-by-op in eager
torch).

Measured result (TPU v5 lite, B=4096 D=256 H=1024 tanh-MLP dopri5 chain,
slope-timed over 400- vs 1600-step scans so the host round trip drops
out — see benchmarks/PERF.md "measurement methodology"):

    stock XLA step  f32/f32-matmul   0.821 ms/step  31.4 TF/s  (95% of
                                     the ~33 TF/s six-pass f32 roof)
    fused Pallas    f32/f32-matmul   0.952 ms/step  27.1 TF/s
    stock XLA step  bf16             0.133 ms/step  194.2 TF/s (98.6% of
                                     the 197 TF/s bf16 peak)
    fused Pallas    bf16             0.141 ms/step  183.0 TF/s

Conclusion: XLA already fuses the stage chain to within ~1-5% of the
hardware roofline — the hypothesised HBM round trips do not survive XLA
fusion, so a hand-written kernel has no headroom and costs a little MXU
efficiency at the tile boundaries.  The round-2 "6-10% MFU" readings
that motivated this kernel were an artifact of latency-polluted timing
(single-dispatch measurements through the container's TPU tunnel, whose
~30 ms host round trip exceeds the device time of a whole solve).
The kernel is kept here as the reproducible evidence for that
conclusion, and as a starting point should a future field shape (e.g.
very small D with many stages) genuinely defeat XLA fusion.

Semantics vs the stock step kernel (`ops/rk_step.py`): identical stage
recursion and coefficients, but accumulation happens in f32 increment
form rather than the reference's state-dtype order, so accept/reject
sequences can differ by an ULP; ``Perturb`` time nudges are not applied.

The vector field must be JAX-traceable from ops Pallas supports
(elementwise math, ``jnp.dot``/``@``, reductions) with signature
``field(t, y, *params)`` on a (block_b, D) state block, closing over
nothing traced (params are passed as kernel operands).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pick_block_b(B, D, dtype, n_stages, hidden_guess=4):
    """Largest power-of-two divisor tile of B whose step working set
    (state + k-stack + ~`hidden_guess` field-intermediate buffers of the
    same row size) stays under ~8 MB of the ~16 MB VMEM."""
    padded_d = -(-D // 128) * 128
    bytes_per_row = padded_d * jnp.dtype(dtype).itemsize
    rows_live = n_stages + 4 + hidden_guess
    block_b = B
    while block_b > 8 and block_b * bytes_per_row * rows_live > 8 * 1024 * 1024 \
            and block_b % 2 == 0:
        block_b //= 2
    return block_b


def fused_stage_step(field, params, y0, f0, t0, dt, tableau, *,
                     error_dtype=None, block_b=None, interpret=False):
    """One explicit adaptive-RK step, all stages fused into one kernel.

    Args:
        field: traceable ``field(t, y, *params)`` on a (b, D) block.
        params: tuple of parameter arrays (VMEM-resident per tile).
        y0: (B, D) state; f0: (B, D) slope at (t0, y0) (FSAL input).
        t0, dt: scalar time / step (traced ok).
        tableau: explicit ``ButcherTableau`` with ``c_mid``.
        error_dtype: dtype for the embedded-error output (default f32 —
            the fused path always accumulates in f32; this only sets the
            output dtype).
        block_b: batch tile (default: auto, see `_pick_block_b`).
        interpret: run in the Pallas interpreter (CPU testing).

    Returns:
        (y1, f1, y1_err, dmid): y1/f1 in the state dtype; y1_err in
        `error_dtype` (f32 default); dmid = dt * sum(c_mid * k) in f32
        (the dense-output midpoint increment, `ops/interp.py`).
    """
    from jax.experimental import pallas as pl
    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem = pltpu.VMEM
    except Exception:  # pragma: no cover - non-TPU build
        vmem = None

    if tableau.c_mid is None:
        raise ValueError("fused_field requires a tableau with dense-output "
                         "c_mid coefficients")
    B, D = y0.shape
    n_stages = tableau.n_stages
    err_dt = jnp.dtype(error_dtype) if error_dtype is not None else jnp.dtype(jnp.float32)
    if block_b is None:
        block_b = _pick_block_b(B, D, y0.dtype, n_stages)
    if B % block_b != 0:
        raise ValueError(f"batch {B} must be divisible by the fused-field "
                         f"tile block_b={block_b}; pass block_b= with a "
                         "divisor")

    alpha = [float(a) for a in tableau.alpha]
    beta = [[float(b) for b in tableau.beta[i, :i + 1]]
            for i in range(len(alpha))]
    c_sol = [float(c) for c in tableau.c_sol]
    c_err = [float(c) for c in tableau.c_error]
    c_mid = [float(c) for c in tableau.c_mid]
    is_fsal = tableau.is_fsal
    state_dt = y0.dtype

    def _comb(coeffs, ks, dt32):
        """f32 accumulation of ``sum_i (coeffs[i]*dt) * k_i`` (zero
        coefficients skipped statically)."""
        total = None
        for c, v in zip(coeffs, ks):
            if c == 0.0:
                continue
            term = (c * dt32) * v
            total = term if total is None else total + term
        if total is None:
            total = jnp.zeros_like(ks[0])
        return total

    def kernel(tdt_ref, *refs):
        param_refs = refs[:len(params)]
        y0_ref, f0_ref = refs[len(params)], refs[len(params) + 1]
        y1_ref, f1_ref, err_ref, dmid_ref = refs[len(params) + 2:]
        pvals = tuple(r[:] for r in param_refs)
        t_start = tdt_ref[0]
        dt32 = tdt_ref[1]

        y0v = y0_ref[:].astype(jnp.float32)
        # k-slopes kept in f32 for the combinations; field inputs/outputs
        # run in the state dtype (bf16 state -> bf16 MXU throughput).
        k = [f0_ref[:].astype(jnp.float32)]
        for i in range(len(alpha)):
            ti = jnp.where(alpha[i] == 1.0, t_start + dt32,
                           t_start + alpha[i] * dt32)
            yi = (y0v + _comb(beta[i], k[:i + 1], dt32)).astype(state_dt)
            k.append(field(ti.astype(state_dt), yi, *pvals)
                     .astype(jnp.float32))

        if is_fsal:
            y1 = y0v + _comb(c_sol[:-1], k[:-1], dt32)
            f1 = k[-1]
        else:
            y1 = y0v + _comb(c_sol, k, dt32)
            f1 = field((t_start + dt32).astype(state_dt),
                       y1.astype(state_dt), *pvals).astype(jnp.float32)
        y1_ref[:] = y1.astype(state_dt)
        f1_ref[:] = f1.astype(state_dt)
        err_ref[:] = _comb(c_err, k, dt32).astype(err_dt)
        dmid_ref[:] = _comb(c_mid, k, dt32)

    if jax.default_backend() != 'tpu' and not interpret:
        # Portable fallback: identical numerics via plain XLA (still the
        # f32-accumulation contract, so tests cover the same arithmetic).
        pvals = tuple(params)
        t32 = jnp.asarray(t0, jnp.float32)
        dt32 = jnp.asarray(dt, jnp.float32)
        y0v = y0.astype(jnp.float32)
        k = [f0.astype(jnp.float32)]
        for i in range(len(alpha)):
            ti = t32 + dt32 if alpha[i] == 1.0 else t32 + alpha[i] * dt32
            yi = (y0v + _comb(beta[i], k[:i + 1], dt32)).astype(state_dt)
            k.append(field(ti.astype(state_dt), yi, *pvals)
                     .astype(jnp.float32))
        if is_fsal:
            y1 = y0v + _comb(c_sol[:-1], k[:-1], dt32)
            f1 = k[-1]
        else:
            y1 = y0v + _comb(c_sol, k, dt32)
            f1 = field((t32 + dt32).astype(state_dt),
                       y1.astype(state_dt), *pvals).astype(jnp.float32)
        return (y1.astype(state_dt), f1.astype(state_dt),
                _comb(c_err, k, dt32).astype(err_dt), _comb(c_mid, k, dt32))

    grid = (B // block_b,)
    blocked = pl.BlockSpec((block_b, D), lambda i: (i, 0), memory_space=vmem)
    in_specs = ([pl.BlockSpec(memory_space=vmem)]
                + [pl.BlockSpec(memory_space=vmem) for _ in params]
                + [blocked, blocked])
    out_specs = (blocked, blocked,
                 pl.BlockSpec((block_b, D), lambda i: (i, 0),
                              memory_space=vmem),
                 pl.BlockSpec((block_b, D), lambda i: (i, 0),
                              memory_space=vmem))
    out_shape = (jax.ShapeDtypeStruct((B, D), state_dt),
                 jax.ShapeDtypeStruct((B, D), state_dt),
                 jax.ShapeDtypeStruct((B, D), err_dt),
                 jax.ShapeDtypeStruct((B, D), jnp.float32))
    tdt = jnp.stack([jnp.asarray(t0, jnp.float32),
                     jnp.asarray(dt, jnp.float32)])
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
    )(tdt, *params, y0, f0)
