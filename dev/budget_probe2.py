"""Budget probe 2: decompose the backward-driver overhead (VERDICT r3 #2).

Probe 1 (dev/budget_probe.py) showed the training step spends ~65% in
"bwd driver overhead" — but its AC bound measured ONLY the 6 vjp evals per
backward step, not the RK stage-sum arithmetic over the augmented carry
(y 1M + adj_y 1M + theta_bar 0.53M elements), which is pure HBM traffic.

This probe:
  1. ACrk  — augmented chain through the REAL runge_kutta_step on the
     4-tuple aug state (the honest per-backward-step kernel bound).
  2. Ablations of the full training step:
       TR          baseline (default adjoint norm, T=10)
       TR-semi     adjoint_options norm='seminorm' (drop theta_bar from
                   error control)
       TR-T2       T=2 (no interior cotangent injections)
       TR-interp   interpolated adjoint (no y carry; forward recording)
  3. XLA cost_analysis of the jitted training step: FLOPs + bytes
     accessed -> achieved TFLOP/s and GB/s vs the v5e roofline
     (~197 bf16 TFLOP/s, ~819 GB/s), to show which wall the step sits on.

Run on the TPU:  python dev/budget_probe2.py
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


# --- honest backward kernel bound: RK step over the real aug 4-tuple -------
def aug_rk_chain_per_step():
    adj0 = jax.random.normal(jax.random.PRNGKey(3), (B, D), jnp.float32) * .1
    th0 = jax.tree_util.tree_map(jnp.zeros_like, params)

    def aug_dyn(s, aug, perturb=None):
        vt, y, adj_y, th_bar = aug
        f, vjp_fn = jax.vjp(lambda ss, yy, th: f3(ss, yy, th), s, y, params)
        vt_new, vy, vth = vjp_fn(jax.tree_util.tree_map(jnp.negative, adj_y))
        return (vt_new.astype(vt.dtype), f, vy, vth)

    dt = jnp.float32(-1e-4)
    aug0 = (jnp.float32(0.), y0, adj0, th0)
    f0 = aug_dyn(jnp.float32(1.), aug0)

    def single(eps):
        def body(carry, i):
            aug, f = carry
            t0 = 1.0 + i.astype(jnp.float32) * dt
            a1, f1, err, k = runge_kutta_step(
                aug_dyn, aug, f, t0, dt, t0 + dt, tb.DOPRI5,
                error_dtype=jnp.float32)
            return (a1, f1), ()
        aug0p = (aug0[0], aug0[1] + eps, aug0[2], aug0[3])
        (aug, f), _ = jax.lax.scan(body, (aug0p, f0), jnp.arange(20))
        return jnp.sum(aug[1].astype(jnp.float32))

    return slope_time(single, n1=2, n2=8) / 20.0


def train_time(ts_, adj_opts=None, interpolated=False):
    ao = dict(adj_opts or {})
    if interpolated:
        ao['interpolated'] = True

    def loss(p):
        ys = odeint_adjoint(f3, y0, ts_, rtol=RTOL, atol=ATOL, args=(p,),
                            adjoint_options=ao or None)
        return jnp.mean((ys[-1] - tgt[None]) ** 2)

    def single(eps):
        g = jax.grad(loss)(jax.tree_util.tree_map(
            lambda a: a + eps.astype(a.dtype), params))
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(g))
    return slope_time(single)


def cost_analysis():
    def loss(p):
        ys = odeint_adjoint(f3, y0, t10, rtol=RTOL, atol=ATOL, args=(p,))
        return jnp.mean((ys[-1] - tgt[None]) ** 2)

    g = jax.jit(jax.grad(loss))
    c = g.lower(params).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return c


def main():
    print("device:", jax.devices()[0].device_kind)

    acrk = aug_rk_chain_per_step()
    print(f"ACrk aug RK-step chain  {acrk*1e3:8.3f} ms/step "
          f"(vjp evals + stage sums + error est over the 4-tuple)")

    tr = train_time(t10)
    print(f"TR        (T=10, default) {tr*1e3:8.3f} ms", flush=True)
    tr_semi = train_time(t10, dict(norm='seminorm'))
    print(f"TR-semi   (seminorm)      {tr_semi*1e3:8.3f} ms", flush=True)
    tr_t2 = train_time(t2)
    print(f"TR-T2     (T=2)           {tr_t2*1e3:8.3f} ms", flush=True)
    # the dense recording buffer is (max_segments, 5, B*D) — size it to the
    # actual step count (~20) or it OOMs at the 4096 default on big states
    tr_interp = train_time(t10, dict(max_segments=64), interpolated=True)
    print(f"TR-interp (interpolated)  {tr_interp*1e3:8.3f} ms", flush=True)

    c = cost_analysis()
    flops = c.get('flops', float('nan'))
    byts = c.get('bytes accessed', float('nan'))
    print(f"cost_analysis: {flops/1e9:.1f} GFLOP, {byts/1e9:.2f} GB accessed")
    print(f"  at measured TR: {flops/tr/1e12:.1f} TFLOP/s "
          f"({flops/tr/197e12*100:.0f}% of bf16 peak), "
          f"{byts/tr/1e9:.0f} GB/s ({byts/tr/819e9*100:.0f}% of HBM peak)")
    ai = flops / byts
    print(f"  arithmetic intensity {ai:.0f} FLOP/B "
          f"(roofline knee ~{197e12/819e9:.0f})")


if __name__ == "__main__":
    main()
