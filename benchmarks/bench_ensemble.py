"""Heterogeneous-stiffness ensemble: per-lane Pallas kernel vs vmap path
(ROADMAP item 2 / VERDICT r3 item 5).

Three realistic per-sample field shapes, same harness, slope-timed:

  scalar   dy = -lam * y + sin(t), lam log-spaced over [1, 300]
           (the existing PERF.md row's shape, D=1)
  osc      damped oscillator, D=2, per-sample frequency: the NAIVE
           spelling with scalar indexing + jnp.stack — the documented
           Mosaic-lowering caveat case
  osc_lane the same oscillator spelled lane-friendly (elementwise ops on
           the state vector, no scalar indexing) — the layout-contract
           candidate
  mlp      per-lane tiny MLP field (D=4, H=16, per-sample weights via
           args_axes=-1) — "ensemble of small neural fields"

For each: pallas kernel vs vmap fallback, identical problem, rtol=1e-4 /
atol=1e-6, t in [0, 2], slope-timed (solves chained inside one jit).

Run on the TPU:  python benchmarks/bench_ensemble.py [--quick]
"""
import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from torchdiffeq_tpu.parallel import odeint_per_sample

RTOL, ATOL = 1e-4, 1e-6
T = np.asarray([0.0, 2.0], np.float32)


def slope_time(single, n1=2, n2=8, reps=5):
    def chain(n):
        @jax.jit
        def fn():
            def body(acc, _):
                return acc + single(1e-30 * acc), ()
            acc, _ = jax.lax.scan(body, jnp.float32(0.), length=n)
            return acc
        return fn

    fns = {}
    for n in (n1, n2):
        fns[n] = chain(n)
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


def problems(B):
    lam = jnp.asarray(np.logspace(0, np.log10(300.0), B), jnp.float32)
    y0_1 = jnp.ones((B, 1), jnp.float32)

    def f_scalar(t, y, lam_i):
        return -lam_i * y + jnp.sin(t)

    # damped oscillator with per-sample frequency, two spellings
    y0_2 = jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float32), (B, 1))

    def f_osc_naive(t, y, w):
        # scalar indexing + stack: the documented bad-lowering shape
        return jnp.stack([y[1], -w * w * y[0] - 0.1 * w * y[1]])

    def f_osc_lane(t, y, w):
        # lane-friendly: elementwise ops over the whole state vector
        # dy = flip(y) * (1, -w^2) - 0.1w * y * (0, 1)
        sel = jnp.asarray([0.0, 1.0], y.dtype)
        return jnp.flip(y) * (1.0 - (1.0 + w * w) * sel) \
            - (0.1 * w) * y * sel

    # per-lane tiny MLP field: y (4,), weights per sample on the LAST axis
    D, H = 4, 16
    rng = np.random.RandomState(0)
    W1 = jnp.asarray(rng.randn(D, H, B) * 0.4, jnp.float32)
    W2 = jnp.asarray(rng.randn(H, D, B) * 0.4, jnp.float32)
    y0_4 = jnp.asarray(rng.randn(B, D) * 0.3, jnp.float32)

    def f_mlp(t, y, W1_i, W2_i):
        h = jnp.tanh(y @ W1_i)
        return jnp.tanh(h @ W2_i) - 0.5 * y

    return [
        ('scalar', f_scalar, y0_1, (lam,), (-1,)),
        ('osc-naive', f_osc_naive, y0_2, (lam / 3.0,), (-1,)),
        ('osc-lane', f_osc_lane, y0_2, (lam / 3.0,), (-1,)),
        ('mlp', f_mlp, y0_4, (W1, W2), (-1, -1)),
    ]


def run(B):
    rows = []
    for name, f, y0, args, axes in problems(B):
        def solve(opts):
            def single(eps):
                ys = odeint_per_sample(
                    f, y0 + eps, jnp.asarray(T), args=args, args_axes=axes,
                    rtol=RTOL, atol=ATOL, method='dopri5', options=opts)
                return jnp.sum(ys[:, -1].astype(jnp.float32))
            return single

        # correctness first: kernel vs vmap endpoint agreement
        yk = odeint_per_sample(f, y0, jnp.asarray(T), args=args,
                               args_axes=axes, rtol=RTOL, atol=ATOL,
                               method='dopri5', options=dict(pallas=True))
        yv = odeint_per_sample(f, y0, jnp.asarray(T), args=args,
                               args_axes=axes, rtol=RTOL, atol=ATOL,
                               method='dopri5')
        diff = float(jnp.max(jnp.abs(yk - yv)))

        tp = slope_time(solve(dict(pallas=True)))
        tv = slope_time(solve(None))
        rows.append((name, tp * 1e3, tv * 1e3, tv / tp, diff))
        print(f"{name:10s} pallas {tp*1e3:7.3f} ms  vmap {tv*1e3:7.3f} ms  "
              f"speedup {tv/tp:5.2f}x  |kernel-vmap| {diff:.2e}", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true')
    ap.add_argument('-B', type=int, default=None)
    a = ap.parse_args()
    B = a.B or (1024 if a.quick else 8192)
    print(f"device: {jax.devices()[0].device_kind}  B={B}  "
          f"rtol={RTOL} atol={ATOL}  t={list(T)}")
    run(B)


if __name__ == '__main__':
    main()
