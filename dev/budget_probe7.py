"""Budget probe 7: scatter-emission body vs cond body on big states.

The HLO of the cond-based while body (used when T*state >
_SCATTER_EMIT_MAX_ELEMENTS) shows the step branch COPIES the full
(T, state) output buffer every iteration (conditional branches cannot
alias pass-through operands) — so the cond body's per-step out-traffic
is the same as the scatter body's masked write, while also paying
branch-copy overhead for y/f, extra emission-only iterations, and a
fusion barrier.  Hypothesis: the scatter body is the right choice for
big states too (at least while T is moderate).

Measures driver ms/step for the probe-6 cases (B single 2.7M array,
D aug 4-tuple) and a T=10 forward, with the stock threshold vs a
monkeypatched huge one.

Run on the TPU:  python dev/budget_probe7.py
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
import torchdiffeq_tpu.solvers.adaptive_rk as ark
from torchdiffeq_tpu.models import init_mlp, mlp_apply

B, D, H = 4096, 256, 1024

params = init_mlp(jax.random.PRNGKey(0), [D, H, D], scale=0.01,
                  dtype=jnp.float32)
f3 = lambda tt, yy, p: mlp_apply(p, jnp.tanh(yy))
y0 = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32) * 0.1
adj0 = jax.random.normal(jax.random.PRNGKey(3), (B, D), jnp.float32) * 0.1
th0 = jax.tree_util.tree_map(jnp.zeros_like, params)
t10 = jnp.linspace(0.0, 1.0, 10, dtype=jnp.float32)


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


def tsum(tree):
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(tree))


def tadd_eps(tree, eps):
    return jax.tree_util.tree_map(lambda l: l + eps.astype(l.dtype), tree)


CASES = {}

yb = jax.random.normal(jax.random.PRNGKey(4), (B, 658), jnp.float32) * .1
Wb = jax.random.normal(jax.random.PRNGKey(5), (658, 658), jnp.float32) * .01
CASES['B (2.7M array, T=2)'] = (lambda t, y: jnp.tanh(y) @ Wb, yb,
                                jnp.stack([jnp.float32(1.), jnp.float32(0.)]),
                                dict(step_to_end=True))


def f_d(t, aug):
    vt, y, adj, th = aug
    f, vjp_fn = jax.vjp(lambda ss, yy, p: f3(ss, yy, p), t, y, params)
    vt_new, vy, vth = vjp_fn(jax.tree_util.tree_map(jnp.negative, adj))
    return (vt_new.astype(vt.dtype), f, vy, vth)


CASES['D (aug 4-tuple, T=2)'] = (f_d, (jnp.float32(0.), y0, adj0, th0),
                                 jnp.stack([jnp.float32(1.),
                                            jnp.float32(0.)]),
                                 dict(step_to_end=True))
CASES['F (fwd (B,256), T=10)'] = (lambda t, y: f3(t, y, params), y0, t10,
                                  None)


def run(tag, f, s0, ts_, opts):
    _, st = tde.odeint_with_stats(f, s0, ts_, rtol=1e-3, atol=1e-5,
                                  options=opts)
    ns = int(st.n_steps)

    def single(eps):
        sol = tde.odeint(f, tadd_eps(s0, eps), ts_, rtol=1e-3, atol=1e-5,
                         options=opts)
        return tsum(jax.tree_util.tree_map(lambda l: l[-1], sol))

    dt = slope_time(single)
    print(f"  {tag}: steps={ns:3d} wall {dt*1e3:8.3f} ms "
          f"({dt/ns*1e3:6.3f} ms/step)", flush=True)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    for thresh in [ark._SCATTER_EMIT_MAX_ELEMENTS, 1 << 28]:
        ark._SCATTER_EMIT_MAX_ELEMENTS = thresh
        print(f"threshold = {thresh} "
              f"({'cond body' if thresh == 1 << 22 else 'scatter body'} "
              f"for these cases)", flush=True)
        for tag, (f, s0, ts_, opts) in CASES.items():
            run(tag, f, s0, ts_, opts)


if __name__ == "__main__":
    main()
