"""Itemize the bf16 training step's device-time budget (VERDICT r3 item 2).

Measures, all slope-timed on the TPU (B=4096, D=256, H=1024 MLP field,
rtol=1e-3/atol=1e-5, bf16 matmuls):

  SC    isolated dopri5 stage chain, per step (the 98.6%-of-peak bound)
  AC    isolated augmented-VJP chain (jax.vjp(field) + cotangent combine,
        6 per backward step) — the backward's kernel bound
  F2se  forward solve, T=2 endpoint, step_to_end (no interp fit, no
        emission)        -> F2se - n_steps*SC   = controller/while_loop
  F2    forward solve, T=2 (interp fit every step, 1 output)
                         -> F2 - F2se           = interp-fit cost
  F10   forward solve, T=10 outputs
                         -> F10 - F2            = emission/output eval
  TR    full training step (fwd + fused adjoint bwd + MSE/grad plumbing)
                         -> TR - F10 - n_bwd*AC = backward driver overhead

Run on the TPU:  python dev/budget_probe.py
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
from torchdiffeq_tpu.ops import tableaus as tb
from torchdiffeq_tpu.ops.rk_step import runge_kutta_step

B, D, H = 4096, 256, 1024
RTOL, ATOL = 1e-3, 1e-5

params = init_mlp(jax.random.PRNGKey(0), [D, H, D], scale=0.01,
                  dtype=jnp.float32)
f3 = lambda tt, yy, p: mlp_apply(p, jnp.tanh(yy))
y0 = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32) * 0.1
t10 = jnp.linspace(0.0, 1.0, 10, dtype=jnp.float32)
t2 = jnp.linspace(0.0, 1.0, 2, dtype=jnp.float32)
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


# ---- isolated stage chain (per dopri5 step = 6 VF evals + sums) -----------
def stage_chain_per_step():
    func = lambda t, y, perturb=None: f3(t, y, params)
    dt = jnp.float32(1e-4)
    f0 = f3(jnp.float32(0.), y0, params)

    def single(eps):
        def body(carry, i):
            y, f = carry
            t0 = i.astype(jnp.float32) * dt
            y1, f1, err, k = runge_kutta_step(
                func, y, f, t0, dt, t0 + dt, tb.DOPRI5,
                error_dtype=jnp.float32)
            return (y1, f1), ()
        (y, f), _ = jax.lax.scan(body, (y0 + eps, f0), jnp.arange(40))
        return jnp.sum(y.astype(jnp.float32))

    return slope_time(single, n1=2, n2=8) / 40.0


# ---- isolated augmented-VJP chain (per backward step = 6 aug evals) --------
def aug_chain_per_step():
    adj0 = jax.random.normal(jax.random.PRNGKey(3), (B, D), jnp.float32) * .1
    th0 = jax.tree_util.tree_map(jnp.zeros_like, params)

    def single(eps):
        def body(carry, i):
            y, adj, th = carry
            s = i.astype(jnp.float32) * 1e-4
            f, vjp_fn = jax.vjp(lambda ss, yy, p: f3(ss, yy, p),
                                s, y + eps, params)
            vt, vy, vth = vjp_fn(-adj)
            y = y + 1e-6 * f
            adj = adj + 1e-6 * vy
            th = jax.tree_util.tree_map(lambda a, b: a + 1e-6 * b, th, vth)
            return (y, adj, th), ()
        (y, adj, th), _ = jax.lax.scan(body, (y0, adj0, th0),
                                       jnp.arange(40 * 6))
        return jnp.sum(y.astype(jnp.float32))

    return slope_time(single, n1=2, n2=8) / 40.0


# ---- forward solves --------------------------------------------------------
def fwd(ts_, opts):
    def single(eps):
        ys = tde.odeint(f3, y0 + eps, ts_, rtol=RTOL, atol=ATOL,
                        args=(params,), options=opts)
        return jnp.sum(ys[-1].astype(jnp.float32))
    return slope_time(single)


# ---- training step ----------------------------------------------------------
def train():
    def loss(p):
        ys = odeint_adjoint(f3, y0, t10, rtol=RTOL, atol=ATOL, args=(p,))
        return jnp.mean((ys[-1] - tgt[None]) ** 2)

    def single(eps):
        g = jax.grad(loss)(jax.tree_util.tree_map(
            lambda a: a + eps.astype(a.dtype), params))
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(g))
    return slope_time(single)


def count_nfe_train(adj_opts=None):
    count = [0]

    def _bump(_):
        count[0] += 1

    def cf(tt, yy, p):
        jax.debug.callback(_bump, tt)
        return f3(tt, yy, p)

    def loss(p):
        ys = odeint_adjoint(cf, y0, t10, rtol=RTOL, atol=ATOL, args=(p,),
                            adjoint_options=adj_opts)
        return jnp.mean((ys[-1] - tgt[None]) ** 2)

    cpu = jax.local_devices(backend='cpu')[0]
    with jax.default_device(cpu):
        g = jax.jit(jax.grad(loss))(params)
        jax.block_until_ready(g)
    jax.effects_barrier()
    return count[0]


def main():
    print("device:", jax.devices()[0].device_kind)
    _, s10 = tde.odeint_with_stats(f3, y0, t10, rtol=RTOL, atol=ATOL,
                                   args=(params,))
    nfe_fwd = int(s10.nfe)
    n_steps = int(s10.n_steps)
    n_acc = int(s10.n_accepted) if hasattr(s10, 'n_accepted') else -1
    print(f"fwd NFE={nfe_fwd} steps={n_steps} accepted={n_acc}")

    nfe_total = count_nfe_train()
    nfe_bwd = nfe_total - nfe_fwd
    print(f"total train NFE={nfe_total}  -> bwd NFE={nfe_bwd} "
          f"(~{nfe_bwd/6:.1f} bwd steps)")

    sc = stage_chain_per_step()
    ac = aug_chain_per_step()
    print(f"SC  stage chain        {sc*1e3:8.3f} ms/step")
    print(f"AC  augmented chain    {ac*1e3:8.3f} ms/step "
          f"({ac/sc:.2f}x stage chain)")

    f2se = fwd(t2, dict(step_to_end=True))
    f2 = fwd(t2, None)
    f10 = fwd(t10, None)
    tr = train()
    print(f"F2se fwd T=2 step_to_end {f2se*1e3:8.3f} ms")
    print(f"F2   fwd T=2             {f2*1e3:8.3f} ms")
    print(f"F10  fwd T=10            {f10*1e3:8.3f} ms")
    print(f"TR   training step       {tr*1e3:8.3f} ms")

    # budget
    kernel_fwd = n_steps * sc
    ctrl = f2se - kernel_fwd
    interp = f2 - f2se
    emission = f10 - f2
    bwd_total = tr - f10
    kernel_bwd = (nfe_bwd / 6.0) * ac
    bwd_driver = bwd_total - kernel_bwd
    print()
    print("budget (ms):")
    for k, v in [("fwd stage-chain bound", kernel_fwd),
                 ("fwd controller/loop", ctrl),
                 ("fwd interp fit", interp),
                 ("fwd emission/outputs", emission),
                 ("bwd aug-chain bound", kernel_bwd),
                 ("bwd driver overhead", bwd_driver),
                 ("TOTAL (sum)", kernel_fwd + ctrl + interp + emission
                  + kernel_bwd + bwd_driver),
                 ("TOTAL (measured)", tr)]:
        print(f"  {k:24s} {v*1e3:8.3f}  ({v/tr*100:5.1f}%)")


if __name__ == "__main__":
    main()
