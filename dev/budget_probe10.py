"""Budget probe 10: decompose the fused backward's 0.155 ms/step driver
remainder (PERF.md budget: bwd driver 1.70 ms over ~11 steps).

The augmented stage chain itself is the kernel bound (probe 9, ~0.40
ms/step).  What does the adaptive while_loop driver add per step, and how
does it split between (a) the controller/accept machinery and (b) the
jump_t interface-injection path the fused adjoint adds?

Cases (bf16 matmuls, B=4096, 256-d state, 1024-wide MLP, the PERF.md
training shape; all slope-timed):
  A  aug stage-chain scan (kernel bound, probe-9 case D)   per step
  B  real adaptive odeint on the aug field, T=2 endpoint,
     step_to_end (no landings)                             per step
  C  same + 9 interior jump_t landings with the fused
     adjoint's branch-free inject hook                     per step
  D  rk4 fixed-grid scan driver, matched step count        per step

B - A       = controller + accept/select + carry cost per step
C - B       = the injection path's per-step surcharge
D - A       = the scan driver's floor (no controller at all)

Run on the TPU:  python dev/budget_probe10.py
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
RTOL, ATOL = 1e-3, 1e-5

params = init_mlp(jax.random.PRNGKey(0), [D, H, D], scale=0.01,
                  dtype=jnp.float32)
f3 = lambda tt, yy, p: mlp_apply(p, jnp.tanh(yy))
y0 = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32) * 0.1
adj0 = jax.random.normal(jax.random.PRNGKey(3), (B, D), jnp.float32) * 0.1
th0 = jax.tree_util.tree_map(jnp.zeros_like, params)

tmap = jax.tree_util.tree_map


def f_aug(tt, aug):
    vt, y, adj, th = aug
    f, vjp_fn = jax.vjp(lambda ss, yy, p: f3(ss, yy, p), tt, y, params)
    vt_new, vy, vth = vjp_fn(tmap(jnp.negative, adj))
    return (vt_new.astype(vt.dtype), f, vy, vth)


AUG0 = (jnp.zeros((), jnp.float32), y0, adj0, th0)


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
    return tmap(lambda l: l + eps.astype(l.dtype), tree)


def case_A(n_scan=20):
    f0 = f_aug(jnp.float32(10.), AUG0)
    dt = jnp.float32(-1e-4)

    def single(eps):
        def body(carry, i):
            y, f = carry
            t0 = 10.0 + i.astype(jnp.float32) * dt
            fld = lambda tt, yy, perturb=None: f_aug(tt, yy)
            y1, f1, err, k = runge_kutta_step(fld, y, f, t0, dt, t0 + dt,
                                              tb.DOPRI5,
                                              error_dtype=jnp.float32)
            return (y1, f1), ()
        (y, f), _ = jax.lax.scan(body, (tadd_eps(AUG0, eps), f0),
                                 jnp.arange(n_scan))
        return tsum(y)

    return slope_time(single) / n_scan


def _steps(opts):
    _, st = tde.odeint_with_stats(
        lambda tt, yy: f_aug(tt, yy), AUG0,
        jnp.array([10.0, 0.0], jnp.float32), rtol=RTOL, atol=ATOL,
        options=opts)
    return int(st.n_steps), int(st.n_accepted), int(st.n_rejected)


def case_BC(jumps):
    opts = dict(step_to_end=True)
    if jumps:
        T = 11
        ys_stack = jnp.stack([y0] * T)
        gs_stack = jnp.stack([adj0] * T)
        dLds = jnp.zeros((T - 1,), jnp.float32)

        def inject(k, tt, aug_state):
            vt, y, adj, th = aug_state
            j = (T - 2) - k
            vt = vt - dLds[j - 1].astype(vt.dtype)
            y = ys_stack[j]
            adj = tmap(jnp.add, adj, gs_stack[j])
            return (vt, y, adj, th)

        opts['jump_t'] = jnp.arange(1.0, 10.0, dtype=jnp.float32)
        opts['jump_state_fn'] = inject
        opts['_jump_branch_free'] = True

    n_steps, n_acc, n_rej = _steps(opts)

    def single(eps):
        ys = tde.odeint(lambda tt, yy: f_aug(tt, yy), tadd_eps(AUG0, eps),
                        jnp.array([10.0, 0.0], jnp.float32),
                        rtol=RTOL, atol=ATOL, options=opts)
        return tsum(tindex_last(ys))

    return slope_time(single), n_steps, n_acc, n_rej


def tindex_last(tree):
    return tmap(lambda a: a[-1], tree)


def case_D(n_steps):
    opts = dict(num_steps=n_steps)

    def single(eps):
        ys = tde.odeint(lambda tt, yy: f_aug(tt, yy), tadd_eps(AUG0, eps),
                        jnp.array([10.0, 0.0], jnp.float32),
                        method='rk4', options=opts)
        return tsum(tindex_last(ys))

    return slope_time(single)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    a = case_A()
    print(f"A  aug stage-chain scan bound        {a*1e3:7.3f} ms/step",
          flush=True)

    wall_b, ns_b, na_b, nr_b = case_BC(jumps=False)
    per_b = wall_b / ns_b
    print(f"B  adaptive T=2 endpoint             {per_b*1e3:7.3f} ms/step"
          f"  ({ns_b} steps, {na_b} acc, {nr_b} rej; wall "
          f"{wall_b*1e3:.2f} ms)", flush=True)

    wall_c, ns_c, na_c, nr_c = case_BC(jumps=True)
    per_c = wall_c / ns_c
    print(f"C  + 9 branch-free jump landings     {per_c*1e3:7.3f} ms/step"
          f"  ({ns_c} steps, {na_c} acc, {nr_c} rej; wall "
          f"{wall_c*1e3:.2f} ms)", flush=True)

    d = case_D(ns_b) / ns_b
    print(f"D  rk4 scan driver, {ns_b} steps     {d*1e3:7.3f} ms/step",
          flush=True)

    print(f"\ndriver per step (B - A):             {(per_b-a)*1e3:7.3f} ms")
    print(f"injection surcharge per step (C - B):{(per_c-per_b)*1e3:7.3f} ms"
          f"  [note C has {ns_c} vs B {ns_b} steps]")
    print(f"scan-driver floor (D - A):           {(d-a)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
