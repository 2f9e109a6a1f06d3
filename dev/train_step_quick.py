"""Quick bf16 training-step measurement (B=4096, D=256, H=1024, T=10,
rtol=1e-3) — the VERDICT r4 headline config.  Prints default and
noise_floor rows plus the TRUE backward kernel bound (real RK stage chain
on the augmented tuple, cf. dev/budget_probe9.py).

Run on the TPU:  python dev/train_step_quick.py
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "bfloat16")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import torchdiffeq_tpu as tde
from torchdiffeq_tpu.adjoint import odeint_adjoint
from torchdiffeq_tpu.models import init_mlp, mlp_apply

B, D, H = 4096, 256, 1024
p3 = init_mlp(jax.random.PRNGKey(0), [D, H, D], scale=0.01, dtype=jnp.float32)
f3 = lambda tt, yy, p: mlp_apply(p, jnp.tanh(yy))
y0 = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32) * 0.1
tgt = jax.random.normal(jax.random.PRNGKey(2), (D,), jnp.float32)
t = jnp.linspace(0.0, 1.0, 10, dtype=jnp.float32)
tmapu = jax.tree_util.tree_map


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


def train_wall(adj_opts=None):
    def loss(p):
        ys = odeint_adjoint(f3, y0, t, rtol=1e-3, atol=1e-5, args=(p,),
                            adjoint_options=adj_opts)
        return jnp.mean((ys[-1] - tgt[None]) ** 2)

    def single(eps):
        g = jax.grad(loss)(tmapu(lambda a: a + eps.astype(a.dtype), p3))
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(g))

    return slope_time(single)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    tr = train_wall()
    print(f"default     : {tr*1e3:7.2f} ms", flush=True)
    tr_nf = train_wall(dict(noise_floor=4e-3))
    print(f"noise_floor : {tr_nf*1e3:7.2f} ms", flush=True)
    tr_sn = train_wall(dict(norm='seminorm'))
    print(f"seminorm    : {tr_sn*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
