"""Budget probe 6: bisect the adaptive driver's per-step overhead on the
augmented state.

Probe 5: the driver spends ~0.5 ms/step beyond the 0.137 ms/step RK
kernel on the aug 4-tuple (7 leaves, 2.63M elements).  The forward driver
on the single-array (B, 256) state costs only ~0.045 ms/step.  Is the
overhead driven by total bytes, by the pytree leaf structure, or by one
specific leaf (the parameter cotangent)?

All solves: dopri5, step_to_end, reverse span, rtol=1e-3/atol=1e-5,
slope-timed; per-step driver overhead = wall/steps - scan-chain/step for
the same field and state.

  A  (B, 256) single array          (the known-good baseline)
  B  (B, 658) single array          (same bytes as the full aug tuple)
  C  3-tuple (vt, y, adj)           (tuple structure, no params leaf)
  D  4-tuple (vt, y, adj, th_bar)   (the real aug state)

Run on the TPU:  python dev/budget_probe6.py
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


def scan_per_step(field, state0, n_scan=20):
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

    return slope_time(single, n1=2, n2=8) / n_scan


def driver_per_step(field, state0):
    t_rev = jnp.stack([jnp.float32(1.0), jnp.float32(0.0)])
    _, st = tde.odeint_with_stats(field, state0, t_rev, rtol=1e-3,
                                  atol=1e-5, options=dict(step_to_end=True))
    ns = int(st.n_steps)

    def single(eps):
        sol = tde.odeint(field, tadd_eps(state0, eps), t_rev, rtol=1e-3,
                         atol=1e-5, options=dict(step_to_end=True))
        return tsum(jax.tree_util.tree_map(lambda l: l[1], sol))

    return ns, slope_time(single)


def case(tag, field, state0):
    sc = scan_per_step(field, state0)
    ns, wall = driver_per_step(field, state0)
    per = wall / ns
    print(f"{tag}: steps={ns:3d} wall {wall*1e3:8.3f} ms | "
          f"scan {sc*1e3:6.3f} driver {per*1e3:6.3f} ms/step | "
          f"overhead {(per-sc)*1e3:6.3f}", flush=True)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)

    # A: plain single-array state
    case("A (B,256) array ", lambda t, y: f3(t, y, params), y0)

    # B: single array, same total bytes as the aug tuple (2.63M elems)
    yb = jax.random.normal(jax.random.PRNGKey(4), (B, 658), jnp.float32) * .1
    Wb = jax.random.normal(jax.random.PRNGKey(5), (658, 658),
                           jnp.float32) * 0.01
    case("B (B,658) array ", lambda t, y: jnp.tanh(y) @ Wb, yb)

    # C: 3-tuple, no params leaf
    def f_c(t, aug):
        vt, y, adj = aug
        f, vjp_fn = jax.vjp(lambda ss, yy: f3(ss, yy, params), t, y)
        vt_new, vy = vjp_fn(-adj)
        return (vt_new.astype(vt.dtype), f, vy)
    case("C 3-tuple       ", f_c, (jnp.float32(0.), y0, adj0))

    # D: the real 4-tuple aug state
    def f_d(t, aug):
        vt, y, adj, th = aug
        f, vjp_fn = jax.vjp(lambda ss, yy, p: f3(ss, yy, p), t, y, params)
        vt_new, vy, vth = vjp_fn(jax.tree_util.tree_map(jnp.negative, adj))
        return (vt_new.astype(vt.dtype), f, vy, vth)
    case("D 4-tuple (aug) ", f_d, (jnp.float32(0.), y0, adj0, th0))


if __name__ == "__main__":
    main()
