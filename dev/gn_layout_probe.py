"""GroupNorm layout probe: the packaged group_norm reshapes NHWC to
(n, h, w, g, c//g) — c//g = 2 lands in the minor-most dim, far from the
TPU's 128-lane vector layout.  A layout-friendly variant keeps every
big-tensor op in (n, h, w, c) (c minor) and combines per-channel moments
into group moments on the tiny (n, c) array.

Run: python dev/gn_layout_probe.py [B] [dim]

MEASURED RESULT (TPU v5 lite, B=1024 dim=64, f32): NEGATIVE — the
packaged reshape GN runs at 19.5 us = ~967 GB/s effective (at the HBM
roofline; XLA lays out and fuses the (n,h,w,g,2) reduction fine), while
this "lane-friendly" rewrite is 2.5x SLOWER (48.7 us): its extra
full-tensor x*x pass, repeats, and broadcasts cost more than the layout
saves.  Conclusion: group_norm is already bandwidth-optimal; the conv
workload's GN share is a roofline property, not an implementation gap.
Kept as the reproducible record.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from torchdiffeq_tpu.models.conv_ode import group_norm

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def group_norm_lanes(x, groups=32, eps=1e-5):
    n, h, w, c = x.shape
    g = max(d for d in range(1, min(groups, c) + 1) if c % d == 0)
    sd = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(sd)
    # per-channel moments in (n, h, w, c) layout, c minor
    s1 = xf.mean(axis=(1, 2))            # (n, c)
    s2 = (xf * xf).mean(axis=(1, 2))     # (n, c)
    # combine per group on the tiny (n, c) array
    gm = s1.reshape(n, g, c // g).mean(-1)          # (n, g)
    g2 = s2.reshape(n, g, c // g).mean(-1)          # (n, g)
    var = g2 - gm * gm
    mean_c = jnp.repeat(gm, c // g, axis=1)          # (n, c)
    rstd_c = jnp.repeat(jax.lax.rsqrt(var + eps), c // g, axis=1)
    out = (xf - mean_c[:, None, None, :]) * rstd_c[:, None, None, :]
    return out.astype(x.dtype)


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
    x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (B, 6, 6, DIM),
                                 jnp.float32)
    # correctness first
    a = group_norm(x0)
    b = group_norm_lanes(x0)
    print("max diff:", float(jnp.max(jnp.abs(a - b))), flush=True)

    for name, gn in [("reshape GN (packaged)", group_norm),
                     ("lane-layout GN", group_norm_lanes)]:
        def single(eps, _gn=gn):
            def body(hh, _):
                return _gn(hh) + 0.01, ()
            hh, _ = jax.lax.scan(body, x0 + eps, length=8)
            return jnp.sum(hh)

        dt = slope_time(single, n1=4, n2=16) / 8
        bw = 2 * x0.size * 4 / dt / 1e9   # read+write f32 GB/s
        print(f"{name:24s} {dt*1e6:8.1f} us  ({bw:6.0f} GB/s eff)",
              flush=True)


if __name__ == "__main__":
    main()
