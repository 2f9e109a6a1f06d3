"""Budget probe 3: is the TPU backward step count what the CPU count says?

Probe 1 sized the backward kernel bound from a CPU-side NFE count
(bwd NFE=79 ~ 13.2 dopri5 steps).  Probe 2 showed TR(T=10)-TR(T=2) ~=
7.5 ms — far more than 8 extra interface landings explain at 0.137
ms/step.  Hypothesis: on the TPU (bf16 matmuls) the augmented backward's
error estimates are noisier, so the controller rejects more and the REAL
step count is several-x the CPU figure.

Method: run the augmented backward solve standalone via the public
odeint_with_stats — same aug dynamics the adjoint uses (vjp of the field,
negated cotangate), reversed span, step_to_end, jump_t at the 8 interior
output times (forcing the same interface landings; no state injection —
step COUNT is what matters) — once on the TPU backend, once on CPU.

Run on the TPU:  python dev/budget_probe3.py
"""
import os
import sys

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


def aug_solve_stats(device):
    with jax.default_device(device):
        # forward endpoint state
        ys = tde.odeint(f3, y0, t10, rtol=RTOL, atol=ATOL, args=(params,))
        y_T = ys[-1]
        adj0 = jnp.ones_like(y_T)  # d(sum y_T)/dy_T
        th0 = jax.tree_util.tree_map(jnp.zeros_like, params)

        def aug_dyn(s, aug):
            vt, y, adj_y, th_bar = aug
            f, vjp_fn = jax.vjp(lambda ss, yy, th: f3(ss, yy, th),
                                s, y, params)
            vt_new, vy, vth = vjp_fn(
                jax.tree_util.tree_map(jnp.negative, adj_y))
            return (vt_new.astype(vt.dtype), f, vy, vth)

        aug0 = (jnp.float32(0.), y_T, adj0, th0)
        t_rev = jnp.stack([t10[-1], t10[0]])
        _, st = tde.odeint_with_stats(
            aug_dyn, aug0, t_rev, rtol=RTOL, atol=ATOL,
            options=dict(step_to_end=True, jump_t=t10[1:-1]))
        fwd_stats = tde.odeint_with_stats(f3, y0, t10, rtol=RTOL,
                                          atol=ATOL, args=(params,))[1]
    return (int(st.n_steps), int(st.n_accepted), int(st.nfe),
            int(fwd_stats.n_steps), int(fwd_stats.nfe))


def main():
    tpu = jax.devices()[0]
    cpu = jax.local_devices(backend='cpu')[0]
    for name, dev in [("TPU", tpu), ("CPU", cpu)]:
        bs, ba, bn, fs, fn = aug_solve_stats(dev)
        print(f"{name}: backward steps={bs} accepted={ba} nfe={bn} | "
              f"forward steps={fs} nfe={fn}", flush=True)


if __name__ == "__main__":
    main()
