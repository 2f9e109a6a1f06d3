"""Conv ODE-Net workload decomposition (VERDICT r4 item 2).

The reference-shaped conv workload (B=128, 6x6x64 state, rtol=atol=1e-3)
trains at 8.2% MFU vs 65% for the MLP workload.  The dim-64 lane ceiling
explains at most 2x of the ~8x gap.  Where is the time?

Slope-timed components (bf16 matmuls, f32 state):
  1. conv GEMM alone           (one 3x3 SAME conv, chained)
  2. group_norm alone          (chained)
  3. full conv_field eval      (3 GN + 2 relu + 2 concat + 2 conv)
  4. augmented eval            (field + vjp wrt (t, y, params))
  5. fwd dopri5 stage chain    (6 field evals + stage sums per step)
  6. full fwd solve (T=2)
  7. full train step (fwd + fused adjoint bwd)

Run on the TPU:  python dev/conv_probe.py [B] [dim]
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
                                    conv_field_flops)
from torchdiffeq_tpu.models.conv_ode import conv_apply, group_norm, concat_time
from torchdiffeq_tpu.ops import tableaus as tb
from torchdiffeq_tpu.ops.rk_step import runge_kutta_step

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def chain(single, n):
    @jax.jit
    def fn():
        def body(acc, _):
            return acc + single(1e-30 * acc), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.), length=n)
        return acc
    return fn


def slope_time(single, n1=8, n2=32, reps=5):
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
    fl_eval = conv_field_flops(B, 6, 6, DIM)   # both convs, one field eval
    PEAK = 197e12

    def report(tag, dt, flops=None):
        extra = ""
        if flops:
            tfs = flops / dt / 1e12
            extra = f" | {tfs:7.2f} TF/s  {tfs*1e12/PEAK*100:5.1f}% MFU"
        print(f"{tag:34s} {dt*1e6:9.1f} us{extra}", flush=True)

    # 1. one conv (chained through its own output)
    def single_conv(eps):
        h = concat_time(jnp.float32(0.5), x0 + eps)
        y = conv_apply(cp['conv1'], h)
        return jnp.sum(y) * 1e-30 + jnp.sum(y[0, 0, 0, :2])

    # chain n convs data-dependently
    def single_conv_chain(eps):
        def body(h, _):
            y = conv_apply(cp['conv1'], concat_time(jnp.float32(0.5), h))
            return 0.5 * y, ()
        h, _ = jax.lax.scan(body, x0 + eps, length=8)
        return jnp.sum(h)

    dt = slope_time(single_conv_chain, n1=4, n2=16) / 8
    report("1. one 3x3 conv", dt, fl_eval / 2)

    # 2. one group_norm
    def single_gn_chain(eps):
        def body(h, _):
            return group_norm(h) + 0.01, ()
        h, _ = jax.lax.scan(body, x0 + eps, length=8)
        return jnp.sum(h)

    dt = slope_time(single_gn_chain, n1=4, n2=16) / 8
    report("2. one group_norm", dt)

    # 3. full field eval
    def single_field_chain(eps):
        def body(h, _):
            return h + 0.01 * conv_field(cp, jnp.float32(0.5), h), ()
        h, _ = jax.lax.scan(body, x0 + eps, length=8)
        return jnp.sum(h)

    dt_f = slope_time(single_field_chain, n1=4, n2=16) / 8
    report("3. full field eval", dt_f, fl_eval)

    # 4. augmented eval (field + vjp)
    adj0 = 0.1 * jax.random.normal(jax.random.PRNGKey(2), x0.shape,
                                   jnp.float32)

    def single_aug_chain(eps):
        def body(carry, _):
            h, a, th = carry
            f, vjp = jax.vjp(lambda tt, yy, p: conv_field(p, tt, yy),
                             jnp.float32(0.5), h, cp)
            vt, vy, vth = vjp(-a)
            return (h + 0.01 * f, a + 0.01 * vy,
                    jax.tree_util.tree_map(lambda u, v: u + 0.01 * v,
                                           th, vth)), ()
        th0 = jax.tree_util.tree_map(jnp.zeros_like, cp)
        (h, a, th), _ = jax.lax.scan(body, (x0 + eps, adj0, th0), length=8)
        return jnp.sum(h) + jnp.sum(a)

    dt_a = slope_time(single_aug_chain, n1=4, n2=16) / 8
    report("4. aug eval (field+vjp)", dt_a, 3 * fl_eval)

    # 5. fwd stage chain (6 field evals/step)
    cf = lambda tt, yy, perturb=None: conv_field(cp, tt, yy)
    f0 = cf(jnp.float32(0.), x0)
    dtk = jnp.float32(1e-3)

    def single_sc(eps):
        def body(carry, i):
            yy, ff = carry
            t0k = i.astype(jnp.float32) * dtk
            yn, fn, _, _ = runge_kutta_step(cf, yy, ff, t0k, dtk, t0k + dtk,
                                            tb.DOPRI5,
                                            error_dtype=jnp.float32)
            return (yn, fn), ()
        (yy, _), _ = jax.lax.scan(body, (x0 + eps, f0), jnp.arange(8))
        return jnp.sum(yy)

    dt_sc = slope_time(single_sc, n1=2, n2=8) / 8
    report("5. fwd stage chain (per step)", dt_sc, 6 * fl_eval)

    # 6. full fwd solve (T=2 endpoint, rtol=1e-3)
    t2 = jnp.linspace(0.0, 1.0, 2, dtype=jnp.float32)
    fld = lambda tt, yy, p: conv_field(p, tt, yy)
    _, st = tde.odeint_with_stats(fld, x0, t2, rtol=1e-3, atol=1e-3,
                                  args=(cp,))
    nfe_f, nst_f = int(st.nfe), int(st.n_steps)

    def single_fwd(eps):
        ys = tde.odeint(fld, x0 + eps, t2, rtol=1e-3, atol=1e-3, args=(cp,))
        return jnp.sum(ys[-1])

    dt_fwd = slope_time(single_fwd, n1=5, n2=20)
    report(f"6. fwd solve ({nfe_f} NFE, {nst_f} steps)", dt_fwd,
           nfe_f * fl_eval)

    # 7. train step
    tgt = jax.random.normal(jax.random.PRNGKey(3), (6, 6, DIM), jnp.float32)

    def loss(p):
        ys = odeint_adjoint(fld, x0, t2, rtol=1e-3, atol=1e-3, args=(p,))
        return jnp.mean((ys[-1] - tgt[None]) ** 2)

    def single_tr(eps):
        g = jax.grad(loss)(jax.tree_util.tree_map(
            lambda a: a + eps.astype(a.dtype), cp))
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(g))

    dt_tr = slope_time(single_tr, n1=5, n2=20)
    # same flop convention as sweep.py: ~2x per-eval matmul flops for the
    # augmented backward; 65-ish NFE measured separately on CPU -- here use
    # fwd_nfe*3 as a rough total (fwd + aug bwd at ~equal step counts)
    report("7. train step (see sweep for MFU)", dt_tr)

    print(f"\nper-step driver overhead fwd: "
          f"{(dt_fwd - nst_f * dt_sc) / max(nst_f, 1) * 1e6:.1f} us/step "
          f"({nst_f} steps)", flush=True)


if __name__ == "__main__":
    main()
