"""Budget probe 9: why does the REAL RK stage chain on the augmented
4-tuple cost 0.400 ms/step when a same-bytes same-flops single-array state
scans at 0.111 ms/step (probe 6 cases B vs D)?

Hypotheses:
  (a) pytree leaf count: 7 leaves x ~12 stage-sum ops each -> many small
      kernels whose fixed launch cost dominates (b1/b2/vt are tiny);
  (b) the VJP graph defeats XLA's stage-sum fusion;
  (c) irreducible HBM traffic (then nothing helps).

Cases (all: real runge_kutta_step dopri5 chain, bf16 matmuls, slope-timed):
  D  aug 4-tuple (vt, y, adj, th)      probe-6 baseline, tree carry
  E  same aug dynamics, RAVELED carry  one (2.63M,) vector; the field
                                       unravels -> vjp -> ravels back
  F  2-tuple (y, adj), no params       tuple without the tiny leaves
  G  2-tuple (y, adj) RAVELED

If E << D, flipping the fused adjoint backward to the raveled
representation recovers the loss (the injection hook already supports a
raveled carry).  Run on the TPU:  python dev/budget_probe9.py
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

jax.config.update("jax_default_matmul_precision", "bfloat16")

from torchdiffeq_tpu.models import init_mlp, mlp_apply
from torchdiffeq_tpu.ops import tableaus as tb
from torchdiffeq_tpu.ops.rk_step import runge_kutta_step

B, D, H = 4096, 256, 1024

params = init_mlp(jax.random.PRNGKey(0), [D, H, D], scale=0.01,
                  dtype=jnp.float32)
f3 = lambda tt, yy, p: mlp_apply(p, jnp.tanh(yy))
y0 = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32) * 0.1
adj0 = jax.random.normal(jax.random.PRNGKey(3), (B, D), jnp.float32) * 0.1
th0 = jax.tree_util.tree_map(jnp.zeros_like, params)


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


def tsum(tree):
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(tree))


def tadd_eps(tree, eps):
    return jax.tree_util.tree_map(lambda l: l + eps.astype(l.dtype), tree)


def scan_per_step(field, state0, n_scan=20, tag=""):
    f0 = field(jnp.float32(1.), state0)
    dt = jnp.float32(-1e-4)

    def single(eps):
        def body(carry, i):
            y, f = carry
            t0 = 1.0 + i.astype(jnp.float32) * dt
            fld = lambda tt, yy, perturb=None: field(tt, yy)
            y1, f1, err, k = runge_kutta_step(fld, y, f, t0, dt, t0 + dt,
                                              tb.DOPRI5,
                                              error_dtype=jnp.float32)
            return (y1, f1), ()
        (y, f), _ = jax.lax.scan(body, (tadd_eps(state0, eps), f0),
                                 jnp.arange(n_scan))
        return tsum(y)

    per = slope_time(single) / n_scan
    print(f"{tag:26s} scan {per*1e3:7.3f} ms/step", flush=True)
    return per


def f_aug(t, aug):
    vt, y, adj, th = aug
    f, vjp_fn = jax.vjp(lambda ss, yy, p: f3(ss, yy, p), t, y, params)
    vt_new, vy, vth = vjp_fn(jax.tree_util.tree_map(jnp.negative, adj))
    return (vt_new.astype(vt.dtype), f, vy, vth)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)

    aug0 = (jnp.float32(0.), y0, adj0, th0)

    # D: tree carry (probe-6 baseline, re-measured for today's conditions)
    scan_per_step(f_aug, aug0, tag="D aug 4-tuple (tree)")

    # E: raveled carry
    flat0, unravel = ravel_pytree(aug0)

    def f_aug_flat(t, v):
        out = f_aug(t, unravel(v))
        return ravel_pytree(out)[0]

    scan_per_step(f_aug_flat, flat0, tag="E aug raveled")

    # F: 2-tuple without the params cotangent
    def f_2(t, aug):
        y, adj = aug
        f, vjp_fn = jax.vjp(lambda yy: f3(t, yy, params), y)
        (vy,) = vjp_fn(-adj)
        return (f, vy)

    scan_per_step(f_2, (y0, adj0), tag="F (y, adj) 2-tuple")

    # G: the same raveled
    flat2, unravel2 = ravel_pytree((y0, adj0))

    def f_2_flat(t, v):
        return ravel_pytree(f_2(t, unravel2(v)))[0]

    scan_per_step(f_2_flat, flat2, tag="G (y, adj) raveled")


if __name__ == "__main__":
    main()
