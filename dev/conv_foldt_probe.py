"""Measure the time-channel fold (conv_apply_foldt) on the conv ODE-Net
workload: fwd solve and train step, plain vs foldt, bf16 matmuls.

The fold removes the (B, H, W, C+1) concat materialisation per conv
(two per field eval): the spatially-constant time channel's contribution
is a once-per-eval (1, H, W, C) map.  Run: python dev/conv_foldt_probe.py [B]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "bfloat16")

import torchdiffeq_tpu as tde
from torchdiffeq_tpu.adjoint import odeint_adjoint
from torchdiffeq_tpu.models import (init_conv_field, conv_field,
                                    conv_field_foldt, conv_field_flops)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
DIM = 64


def chain(single, n):
    @jax.jit
    def fn():
        def body(acc, _):
            return acc + single(1e-30 * acc), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.), length=n)
        return acc
    return fn


def slope_time(single, n1=5, n2=20, reps=5):
    fns = {}
    for n in (n1, n2):
        fns[n] = chain(single, n)
        float(fns[n]())
    slopes, longs = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fns[n1]())
        t_1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fns[n2]())
        t_2 = time.perf_counter() - t0
        longs.append(t_2)
        slopes.append((t_2 - t_1) / (n2 - n1))
    dt = statistics.median(slopes)
    if dt <= 0:
        dt = min(longs) / n2
    return dt


def main():
    print(f"device: {jax.devices()[0].device_kind}  B={B} dim={DIM}",
          flush=True)
    cp = init_conv_field(jax.random.PRNGKey(0), DIM)
    x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (B, 6, 6, DIM),
                                 jnp.float32)
    t2 = jnp.linspace(0.0, 1.0, 2, dtype=jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(3), (6, 6, DIM), jnp.float32)
    fl = conv_field_flops(B, 6, 6, DIM)
    PEAK = 197e12

    for name, field in [("plain", conv_field), ("foldt", conv_field_foldt)]:
        fld = lambda tt, yy, p, _f=field: _f(p, tt, yy)

        def single_fwd(eps, _fld=fld):
            ys = tde.odeint(_fld, x0 + eps, t2, rtol=1e-3, atol=1e-3,
                            args=(cp,))
            return jnp.sum(ys[-1])

        _, st = tde.odeint_with_stats(fld, x0, t2, rtol=1e-3, atol=1e-3,
                                      args=(cp,))
        nfe = int(st.nfe)
        dt_f = slope_time(single_fwd)
        mfu_f = nfe * fl / dt_f / PEAK

        def loss(p, _fld=fld):
            ys = odeint_adjoint(_fld, x0, t2, rtol=1e-3, atol=1e-3, args=(p,))
            return jnp.mean((ys[-1] - tgt[None]) ** 2)

        def single_tr(eps, _loss=loss):
            g = jax.grad(_loss)(jax.tree_util.tree_map(
                lambda a: a + eps.astype(a.dtype), cp))
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(g))

        dt_t = slope_time(single_tr)
        print(f"{name}: fwd {dt_f*1e3:8.3f} ms ({nfe} NFE, "
              f"{mfu_f*100:4.1f}% MFU)   train {dt_t*1e3:8.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
