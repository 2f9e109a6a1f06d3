"""Reproduce the fused-stage-chain negative result (see fused_field.py).

Slope-based timing: t(N) = host_round_trip + N * per_step, measured at two
scan lengths so the container's TPU-tunnel round trip (~30 ms, larger than
many whole solves) drops out of the per-step estimate.  Every timing ends
in an explicit host fetch — `jax.block_until_ready` does not reliably wait
under the axon backend.

Run on the TPU (no platform pinning):  python benchmarks/bench_fused_field.py
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.fused_field import fused_stage_step
from torchdiffeq_tpu.ops import tableaus as tb
from torchdiffeq_tpu.ops.rk_step import runge_kutta_step

B, D, H = 4096, 256, 1024
BLOCK = int(os.environ.get('BLOCK', 256))
N1, N2 = 400, 1600


def run(dtype, matmul_prec):
    jax.config.update("jax_default_matmul_precision", matmul_prec)
    key = jax.random.PRNGKey(0)
    w1 = (jax.random.normal(key, (D, H)) * 0.05).astype(dtype)
    b1 = jnp.zeros((H,), dtype)
    w2 = (jax.random.normal(jax.random.PRNGKey(1), (H, D)) * 0.05).astype(dtype)
    b2 = jnp.zeros((D,), dtype)
    params = (w1, b1, w2, b2)

    def field(t, y, w1, b1, w2, b2):
        # bf16 inputs with f32 accumulators (Mosaic requires 32-bit matmul
        # accumulation; preferred_element_type also keeps XLA's epilogue
        # arithmetic comparable between the two paths)
        h = jnp.tanh(jnp.dot(y, w1, preferred_element_type=jnp.float32)
                     + b1.astype(jnp.float32)).astype(dtype)
        return (jnp.dot(h, w2, preferred_element_type=jnp.float32)
                + b2.astype(jnp.float32)).astype(dtype)

    y0 = jax.random.normal(jax.random.PRNGKey(2), (B, D)).astype(dtype)
    tab = tb.DOPRI5
    dt = jnp.float32(0.0001)

    def make(kind, n):
        if kind == 'fused':
            def body(carry, i):
                y, f = carry
                y1, f1, err, dmid = fused_stage_step(
                    field, params, y, f, i.astype(jnp.float32) * dt, dt,
                    tab, block_b=BLOCK)
                return (y1, f1), ()
        else:
            func = lambda t, y, perturb=None: field(t, y, *params)

            def body(carry, i):
                y, f = carry
                t0 = i.astype(jnp.float32) * dt
                y1, f1, err, k = runge_kutta_step(
                    func, y, f, t0, dt, t0 + dt, tab,
                    error_dtype=jnp.float32)
                return (y1, f1), ()

        @jax.jit
        def many(y0, f0):
            (y, f), _ = jax.lax.scan(body, (y0, f0), jnp.arange(n))
            return jnp.sum(y.astype(jnp.float32))
        return many

    f0 = field(jnp.float32(0.), y0, *params)
    for name in ['stock', 'fused']:
        t_at = {}
        for n in (N1, N2):
            fn = make(name, n)
            float(fn(y0, f0))  # compile + warm
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(y0, f0))
                ts.append(time.perf_counter() - t0)
            t_at[n] = statistics.median(ts)
        per_step = (t_at[N2] - t_at[N1]) / (N2 - N1)
        lat = t_at[N1] - N1 * per_step
        flops = 6 * 2 * 2 * B * D * H
        tf = flops / per_step / 1e12
        print(f"{jnp.dtype(dtype).name:9s} {matmul_prec:8s} {name}: "
              f"{per_step*1e3:7.3f} ms/step  {tf:6.1f} TF/s "
              f"({100*tf/197:5.1f}% of bf16 peak)  "
              f"[round trip {lat*1e3:5.1f} ms]")

    # numeric agreement over a short chain (fused accumulates in f32
    # increment form; agreement is to state-dtype rounding)
    short_f = make('fused', 20)
    short_s = make('stock', 20)
    print(f"   sum|y| fused vs stock after 20 steps: "
          f"{float(short_f(y0, f0)):.6g} vs {float(short_s(y0, f0)):.6g}")


if __name__ == "__main__":
    run(jnp.float32, 'float32')
    run(jnp.bfloat16, 'bfloat16')
