"""Budget probe 4: floor the adjoint tolerance at the bf16 noise level.

Probe 3 showed the bf16 training step's backward takes 29 steps on the TPU
vs 14 on CPU — every step ACCEPTED, i.e. no rejection thrash: the bf16
matmul noise (~4e-3 relative per eval) inflates the error estimate into a
noise floor and the controller dutifully resolves below the arithmetic
noise, which cannot improve the gradient.  The fix candidate: raise the
ADJOINT tolerances to the noise floor (adjoint_rtol ~ 4e-3) while leaving
the forward solve's tolerances alone.

Measures, for adjoint_rtol in {1e-3 (status quo), 4e-3, 1e-2}:
  - backward steps + NFE (on TPU, via a standalone aug solve)
  - slope-timed full training-step wall
  - gradient accuracy vs two references:
      g_cpu_same   CPU f32 full-precision at the SAME tolerances
      g_cpu_tight  CPU f32 at rtol=1e-6 (proxy for the true gradient)
    If the bf16 grads sit at the same distance from g_cpu_tight at every
    adjoint_rtol, the extra backward steps were pure waste.

Run on the TPU:  python dev/budget_probe4.py
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
from torchdiffeq_tpu.models import init_mlp, mlp_apply

B, D, H = 4096, 256, 1024
RTOL, ATOL = 1e-3, 1e-5

params = init_mlp(jax.random.PRNGKey(0), [D, H, D], scale=0.01,
                  dtype=jnp.float32)
f3 = lambda tt, yy, p: mlp_apply(p, jnp.tanh(yy))
y0 = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32) * 0.1
t10 = jnp.linspace(0.0, 1.0, 10, dtype=jnp.float32)
tgt = jax.random.normal(jax.random.PRNGKey(2), (D,), jnp.float32)


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


def grad_of_loss(adj_rtol, adj_atol, device=None, rtol_all=None):
    def loss(p):
        kw = {}
        if rtol_all is None:
            kw = dict(rtol=RTOL, atol=ATOL,
                      adjoint_rtol=adj_rtol, adjoint_atol=adj_atol)
        else:
            kw = dict(rtol=rtol_all, atol=rtol_all * 1e-2)
        ys = odeint_adjoint(f3, y0, t10, args=(p,), **kw)
        return jnp.mean((ys[-1] - tgt[None]) ** 2)

    f = jax.jit(jax.grad(loss))
    if device is not None:
        with jax.default_device(device):
            g = f(params)
            g = jax.tree_util.tree_map(lambda a: a + 0, g)
            jax.block_until_ready(g)
    else:
        g = f(params)
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), g)


def rel_diff(a, b):
    num = sum(float(jnp.sum((x - y) ** 2)) for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))
    den = sum(float(jnp.sum(y ** 2))
              for y in jax.tree_util.tree_leaves(b))
    return (num / den) ** 0.5


def bwd_steps(adj_rtol, adj_atol):
    ys = tde.odeint(f3, y0, t10, rtol=RTOL, atol=ATOL, args=(params,))
    y_T = ys[-1]
    adj0 = jnp.ones_like(y_T)
    th0 = jax.tree_util.tree_map(jnp.zeros_like, params)

    def aug_dyn(s, aug):
        vt, y, adj_y, th_bar = aug
        f, vjp_fn = jax.vjp(lambda ss, yy, th: f3(ss, yy, th), s, y, params)
        vt_new, vy, vth = vjp_fn(jax.tree_util.tree_map(jnp.negative, adj_y))
        return (vt_new.astype(vt.dtype), f, vy, vth)

    aug0 = (jnp.float32(0.), y_T, adj0, th0)
    _, st = tde.odeint_with_stats(
        aug_dyn, aug0, jnp.stack([t10[-1], t10[0]]),
        rtol=adj_rtol, atol=adj_atol,
        options=dict(step_to_end=True, jump_t=t10[1:-1]))
    return int(st.n_steps), int(st.nfe)


def train_time(adj_rtol, adj_atol):
    def loss(p):
        ys = odeint_adjoint(f3, y0, t10, rtol=RTOL, atol=ATOL, args=(p,),
                            adjoint_rtol=adj_rtol, adjoint_atol=adj_atol)
        return jnp.mean((ys[-1] - tgt[None]) ** 2)

    def single(eps):
        g = jax.grad(loss)(jax.tree_util.tree_map(
            lambda a: a + eps.astype(a.dtype), params))
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(g))
    return slope_time(single)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    cpu = jax.local_devices(backend='cpu')[0]

    print("computing CPU references...", flush=True)
    g_tight = grad_of_loss(None, None, device=cpu, rtol_all=1e-6)
    g_same = grad_of_loss(RTOL, ATOL, device=cpu)
    print(f"  CPU same-tol vs tight: rel {rel_diff(g_same, g_tight):.2e}",
          flush=True)

    for adj_rtol, adj_atol in [(1e-3, 1e-5), (4e-3, 4e-5), (1e-2, 1e-4)]:
        ns, nfe = bwd_steps(adj_rtol, adj_atol)
        tr = train_time(adj_rtol, adj_atol)
        g = grad_of_loss(adj_rtol, adj_atol)
        print(f"adj_rtol={adj_rtol:g}: bwd steps={ns} nfe={nfe} | "
              f"TR {tr*1e3:7.3f} ms | grad rel-err vs tight "
              f"{rel_diff(g, g_tight):.3e}, vs same-tol "
              f"{rel_diff(g, g_same):.3e}", flush=True)


if __name__ == "__main__":
    main()
