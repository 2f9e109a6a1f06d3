"""Probe: tree-native vs raveled state in the explicit fixed-grid driver.

The round-5 change lets `integrate_fixed_grid` carry the state as a
native-shape pytree (no ravel/unravel round-trip per VF eval).  This
probe measures the per-step cost of an rk4 fixed-grid solve over the
adjoint-sized 4-leaf augmented state (scalar vt, (B,D) y, (B,D) adj,
MLP-param tree) both ways:

  tree   — the shipped path (`tree_state_capable('rk4')` is True)
  ravel  — the pre-change behavior, forced by monkeypatching the gate

Run on the TPU:  python dev/tree_fixed_probe.py
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

import torchdiffeq_tpu as tde
from torchdiffeq_tpu.models import init_mlp, mlp_apply

B, D, H = 4096, 256, 1024
N_STEPS = 14

params = init_mlp(jax.random.PRNGKey(0), [D, H, D], scale=0.01,
                  dtype=jnp.float32)
f3 = lambda tt, yy, p: mlp_apply(p, jnp.tanh(yy))
y0 = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32) * 0.1
adj0 = jax.random.normal(jax.random.PRNGKey(3), (B, D), jnp.float32) * 0.1
th0 = jax.tree_util.tree_map(jnp.zeros_like, params)

tmap = jax.tree_util.tree_map


def f_aug(tt, aug):
    vt, y, adj, th = aug
    f, vjp_fn = jax.vjp(lambda ss, yy, p: f3(ss, yy, p), tt, y, params)
    vt_new, vy, vth = vjp_fn(tmap(jnp.negative, adj))
    return (vt_new.astype(vt.dtype), f, vy, vth)


AUG0 = (jnp.zeros((), jnp.float32), y0, adj0, th0)


def tsum(tree):
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(tree))


def tadd_eps(tree, eps):
    return tmap(lambda l: l + eps.astype(l.dtype), tree)


def chain(single, n):
    @jax.jit
    def fn():
        def body(acc, _):
            return acc + single(1e-30 * acc), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.), length=n)
        return acc
    return fn


def slope_time(single, n1=2, n2=8, reps=5):
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


def solve_per_step():
    def single(eps):
        ys = tde.odeint(f_aug, tadd_eps(AUG0, eps),
                        jnp.array([10.0, 0.0], jnp.float32),
                        method='rk4', options=dict(num_steps=N_STEPS))
        return tsum(tmap(lambda a: a[-1], ys))
    return slope_time(single) / N_STEPS


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)

    om = sys.modules['torchdiffeq_tpu.odeint']
    real_gate = om.tree_state_capable

    t_tree = solve_per_step()
    print(f"tree   {t_tree*1e3:7.3f} ms/step", flush=True)

    om.tree_state_capable = lambda m, event=False: False
    try:
        t_ravel = solve_per_step()
    finally:
        om.tree_state_capable = real_gate
    print(f"ravel  {t_ravel*1e3:7.3f} ms/step", flush=True)
    print(f"speedup (ravel/tree): {t_ravel/t_tree:.2f}x")


if __name__ == "__main__":
    main()
