"""Width-packed conv probe (VERDICT r4 item 2 / ROADMAP lane-packing).

The reference-shaped conv workload (B=128, 6x6x64, odenet_mnist.py:76-134)
lowers its 3x3 SAME convs to implicit GEMMs with N=64 output channels —
half of the MXU's 128 lanes.  Width-packing computes TWO adjacent output
columns per MXU pass: kernel (3,4,Cin,128) at stride (1,2) where
out[:, :, 2j, 0:64]   = 3x3 conv at col 2j   (kernel cols 0..2)
out[:, :, 2j+1, 64:]  = 3x3 conv at col 2j+1 (kernel cols 1..3).
FLOPs grow 4/3 (kernel width 4 vs 3), lanes grow 2x -> ideal 1.5x IF the
baseline is lane-ceiling-bound.  This probe measures (a) raw GEMM ceilings
at the relevant shapes, (b) baseline vs packed conv, (c) packed conv_field,
fwd solve and train step; plus a correctness check.

Run on the TPU:  python dev/conv_pack_probe.py [B] [dim]
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
from torchdiffeq_tpu.models import (init_conv_field, conv_field,
                                    conv_field_flops)
from torchdiffeq_tpu.models.conv_ode import (conv_apply, group_norm,
                                             concat_time, conv_apply_packed,
                                             conv_field_packed)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
PEAK = 197e12


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


def report(tag, dt, flops=None):
    extra = ""
    if flops:
        tfs = flops / dt / 1e12
        extra = f" | {tfs:7.2f} TF/s  {tfs*1e12/PEAK*100:5.1f}% MFU"
    print(f"{tag:40s} {dt*1e6:9.1f} us{extra}", flush=True)


def main():
    print(f"device: {jax.devices()[0].device_kind}  B={B} dim={DIM}",
          flush=True)
    cp = init_conv_field(jax.random.PRNGKey(0), DIM)
    x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (B, 6, 6, DIM),
                                 jnp.float32)
    fl_eval = conv_field_flops(B, 6, 6, DIM)
    fl_conv = fl_eval / 2

    # 0. correctness: packed == baseline
    hb = concat_time(jnp.float32(0.5), x0)
    yb = conv_apply(cp['conv1'], hb)
    yp = conv_apply_packed(cp['conv1'], hb)
    print(f"0. packed-vs-baseline max|diff|: "
          f"{float(jnp.max(jnp.abs(yb - yp))):.3e} "
          f"(rms {float(jnp.sqrt(jnp.mean(yb**2))):.3e})", flush=True)

    # 1. raw GEMM ceilings at the conv's implicit-GEMM shapes
    M = B * 6 * 6
    K = 9 * (DIM + 1)
    for (m, k, n_, tag) in [
            (M, K, DIM, "GEMM M=BHW K=9(C+1) N=C (baseline)"),
            (M, K, 2 * DIM, "GEMM same M,K N=2C (lane-full)"),
            (M // 2, 12 * (DIM + 1), 2 * DIM, "GEMM packed shape"),
    ]:
        a = jax.random.normal(jax.random.PRNGKey(4), (m, k), jnp.float32)
        w_ = jax.random.normal(jax.random.PRNGKey(5), (k, n_), jnp.float32)

        # chained GEMM: y = (a + s) @ w, feed a scalar back
        def single_g(eps, a=a, w_=w_):
            def body(s, _):
                y = (a + s) @ w_
                return jnp.sum(y) * 1e-30, ()
            s, _ = jax.lax.scan(body, eps, length=8)
            return s

        dt = slope_time(single_g, n1=2, n2=8) / 8
        report(f"1. {tag}", dt, 2 * m * k * n_)

    # 2. one conv: baseline vs packed
    def single_conv(eps, apply):
        def body(h, _):
            y = apply(cp['conv1'], concat_time(jnp.float32(0.5), h))
            return 0.5 * y, ()
        h, _ = jax.lax.scan(body, x0 + eps, length=8)
        return jnp.sum(h)

    dt = slope_time(lambda e: single_conv(e, conv_apply), n1=4, n2=16) / 8
    report("2a. one 3x3 conv (baseline)", dt, fl_conv)
    dt = slope_time(lambda e: single_conv(e, conv_apply_packed),
                    n1=4, n2=16) / 8
    report("2b. one conv (width-packed)", dt, fl_conv)

    # 3. full field eval: baseline vs packed
    def single_field(eps, field):
        def body(h, _):
            return h + 0.01 * field(cp, jnp.float32(0.5), h), ()
        h, _ = jax.lax.scan(body, x0 + eps, length=8)
        return jnp.sum(h)

    dt = slope_time(lambda e: single_field(e, conv_field), n1=4, n2=16) / 8
    report("3a. field eval (baseline)", dt, fl_eval)
    dt = slope_time(lambda e: single_field(e, conv_field_packed),
                    n1=4, n2=16) / 8
    report("3b. field eval (packed)", dt, fl_eval)

    # 4. fwd solve + train step, baseline vs packed
    t2 = jnp.linspace(0.0, 1.0, 2, dtype=jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(3), (6, 6, DIM), jnp.float32)
    for tag, fld_fn in [("baseline", conv_field), ("packed",
                                                   conv_field_packed)]:
        fld = lambda tt, yy, p, fn=fld_fn: fn(p, tt, yy)
        _, st = tde.odeint_with_stats(fld, x0, t2, rtol=1e-3, atol=1e-3,
                                      args=(cp,))
        nfe_f = int(st.nfe)

        def single_fwd(eps, fld=fld):
            ys = tde.odeint(fld, x0 + eps, t2, rtol=1e-3, atol=1e-3,
                            args=(cp,))
            return jnp.sum(ys[-1])

        dt_fwd = slope_time(single_fwd, n1=5, n2=20)
        report(f"4. fwd solve {tag} ({nfe_f} NFE)", dt_fwd, nfe_f * fl_eval)

        def loss(p, fld=fld):
            ys = odeint_adjoint(fld, x0, t2, rtol=1e-3, atol=1e-3, args=(p,))
            return jnp.mean((ys[-1] - tgt[None]) ** 2)

        def single_tr(eps, loss=loss):
            g = jax.grad(loss)(jax.tree_util.tree_map(
                lambda a: a + eps.astype(a.dtype), cp))
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(g))

        dt_tr = slope_time(single_tr, n1=5, n2=20)
        report(f"5. train step {tag}", dt_tr)


if __name__ == "__main__":
    main()
