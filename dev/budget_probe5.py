"""Budget probe 5: where is the backward's step-count-independent floor?

Probe 4: raising adjoint_rtol 1e-3 -> 1e-2 cuts backward steps 29 -> 17
but TR only moves 10.6 -> 9.5 ms.  With fwd(T=10) at 1.95 ms and the
17-step kernel bound at 2.3 ms, ~5 ms of backward time is NOT
step-proportional.  Candidates: the adjoint custom_vjp wrapper (residual
plumbing, dLds, cotangent injection machinery w/ dynamic slices over the
(T, B, D) buffers) vs the adaptive driver itself.

Measures (slope-timed, bf16, B=4096 D=256 H=1024):
  AS-nj   standalone aug solve, reverse span, step_to_end, NO jump_t
  AS-j    same + jump_t at the 8 interior output times (driver-level
          interface machinery, no state injection)
  both at adjoint_rtol 1e-3 and 1e-2, with their TPU step counts, so
  the per-step slope and the intercept can be split.

Run on the TPU:  python dev/budget_probe5.py
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

B, D, H = 4096, 256, 1024
RTOL, ATOL = 1e-3, 1e-5

params = init_mlp(jax.random.PRNGKey(0), [D, H, D], scale=0.01,
                  dtype=jnp.float32)
f3 = lambda tt, yy, p: mlp_apply(p, jnp.tanh(yy))
y0 = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32) * 0.1
t10 = jnp.linspace(0.0, 1.0, 10, dtype=jnp.float32)


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


ys_f = tde.odeint(f3, y0, t10, rtol=RTOL, atol=ATOL, args=(params,))
y_T = ys_f[-1]
adj_T = jnp.ones_like(y_T)
th0 = jax.tree_util.tree_map(jnp.zeros_like, params)


def aug_dyn(s, aug):
    vt, y, adj_y, th_bar = aug
    f, vjp_fn = jax.vjp(lambda ss, yy, th: f3(ss, yy, th), s, y, params)
    vt_new, vy, vth = vjp_fn(jax.tree_util.tree_map(jnp.negative, adj_y))
    return (vt_new.astype(vt.dtype), f, vy, vth)


def run(tag, jump, adj_rtol, adj_atol):
    opts = dict(step_to_end=True)
    if jump:
        opts['jump_t'] = t10[1:-1]
    aug0 = (jnp.float32(0.), y_T, adj_T, th0)
    t_rev = jnp.stack([t10[-1], t10[0]])

    _, st = tde.odeint_with_stats(aug_dyn, aug0, t_rev, rtol=adj_rtol,
                                  atol=adj_atol, options=opts)
    ns = int(st.n_steps)

    def single(eps):
        a0 = (aug0[0], aug0[1] + eps, aug0[2], aug0[3])
        sol, _ = tde.odeint_with_stats(aug_dyn, a0, t_rev, rtol=adj_rtol,
                                       atol=adj_atol, options=opts)
        return jnp.sum(sol[1][1].astype(jnp.float32))

    dt = slope_time(single)
    print(f"{tag}: steps={ns}  wall {dt*1e3:7.3f} ms  "
          f"({dt/ns*1e3:6.3f} ms/step)", flush=True)
    return ns, dt


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    run("AS-nj 1e-3", False, 1e-3, 1e-5)
    run("AS-nj 1e-2", False, 1e-2, 1e-4)
    run("AS-j  1e-3", True, 1e-3, 1e-5)
    run("AS-j  1e-2", True, 1e-2, 1e-4)


if __name__ == "__main__":
    main()
