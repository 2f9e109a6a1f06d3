"""Benchmark: batched neural-ODE training step (dopri5 solve + adjoint).

Measures vector-field evaluations/second for a full training step (forward
adaptive dopri5 solve + continuous-adjoint backward + SGD update) of the
spiral neural-ODE (BASELINE.json config 1: examples/ode_demo.py's MLP field)
at rtol=1e-7, and compares against the reference torchdiffeq running the
identical workload with torch (CPU — the only torch device here).

A "VF eval" is one evaluation of the vector field for one batch element, so
a batched call counts `batch` evals (both frameworks batch identically).

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "vf_evals_per_sec", "vs_baseline": N}
"""
import json
import sys
import time

import numpy as np

BATCH = 1024
HIDDEN = 64
T_POINTS = 10
RTOL, ATOL = 1e-7, 1e-9
N_TIMED = 10


def bench_jax():
    import jax
    # TPU default matmul precision is bf16: at rtol=1e-7 that pollutes the
    # embedded error estimate and inflates step counts ~30x. Full-f32
    # matmuls make the numerical work identical to the torch baseline.
    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp
    import torchdiffeq_tpu as tde
    from torchdiffeq_tpu.models import init_mlp, mlp_apply

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    params = init_mlp(key, [2, HIDDEN, 2], scale=0.1, dtype=dtype)
    y0 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 2), dtype)
    target = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 2), dtype)
    t = jnp.linspace(0.0, 1.0, T_POINTS, dtype=dtype)

    def field(tt, yy, p):
        return mlp_apply(p, yy ** 3)

    def loss_fn(params):
        ys = tde.odeint_adjoint(field, y0, t, rtol=RTOL, atol=ATOL,
                                method='dopri5', args=(params,))
        return jnp.mean((ys - target[None]) ** 2)

    @jax.jit
    def train_step(params):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params = jax.tree_util.tree_map(lambda p, g: p - 1e-3 * g,
                                        params, grads)
        return loss, params

    # Exact VF-call count (forward + adjoint backward).  Python counters
    # don't survive closure_convert (it replays a jaxpr), so count with
    # jax.debug.callback, which is preserved through jit/vjp/while_loop and
    # fires once per *executed* VF evaluation.  Run on the host CPU backend.
    count = [0]

    def _bump(_):
        count[0] += 1

    def counting_field(tt, yy, p):
        jax.debug.callback(_bump, tt)
        return mlp_apply(p, yy ** 3)

    def counted_loss(params):
        ys = tde.odeint_adjoint(counting_field, y0, t, rtol=RTOL, atol=ATOL,
                                method='dopri5', args=(params,))
        return jnp.mean((ys - target[None]) ** 2)

    cpu = jax.local_devices(backend='cpu')[0]
    with jax.default_device(cpu):
        g = jax.jit(jax.grad(counted_loss))(params)
        jax.block_until_ready(g)
    jax.effects_barrier()  # drain pending debug callbacks before reading
    nfe_per_step = count[0]

    # warm up (compile)
    loss, params2 = train_step(params)
    jax.block_until_ready((loss, params2))

    t0 = time.perf_counter()
    p = params
    for _ in range(N_TIMED):
        loss, p = train_step(p)
    jax.block_until_ready((loss, p))
    dt = (time.perf_counter() - t0) / N_TIMED

    evals_per_sec = nfe_per_step * BATCH / dt
    return dict(step_seconds=dt, nfe=nfe_per_step,
                evals_per_sec=evals_per_sec, loss=float(loss),
                backend=jax.default_backend())


def bench_torch():
    import torch
    sys.path.insert(0, '/root/reference')
    from torchdiffeq import odeint_adjoint

    torch.manual_seed(0)
    net = torch.nn.Sequential(
        torch.nn.Linear(2, HIDDEN), torch.nn.Tanh(),
        torch.nn.Linear(HIDDEN, 2))

    class Field(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.net = net
            self.nfe = 0

        def forward(self, t, y):
            self.nfe += 1
            return self.net(y ** 3)

    field = Field()
    y0 = torch.randn(BATCH, 2)
    target = torch.randn(BATCH, 2)
    t = torch.linspace(0.0, 1.0, T_POINTS)
    opt = torch.optim.SGD(field.parameters(), lr=1e-3)

    def step():
        opt.zero_grad()
        ys = odeint_adjoint(field, y0, t, rtol=RTOL, atol=ATOL,
                            method='dopri5')
        loss = torch.mean((ys - target[None]) ** 2)
        loss.backward()
        opt.step()
        return loss

    step()  # warm up
    field.nfe = 0
    n_timed = 3
    t0 = time.perf_counter()
    for _ in range(n_timed):
        loss = step()
    dt = (time.perf_counter() - t0) / n_timed
    nfe_per_step = field.nfe / n_timed

    return dict(step_seconds=dt, nfe=nfe_per_step,
                evals_per_sec=nfe_per_step * BATCH / dt,
                loss=float(loss))


def main():
    jax_res = bench_jax()
    try:
        torch_res = bench_torch()
        vs_baseline = jax_res['evals_per_sec'] / torch_res['evals_per_sec']
    except Exception as e:  # torch baseline unavailable
        torch_res = dict(error=str(e)[:200])
        vs_baseline = float('nan')

    print(json.dumps({
        "metric": ("VF evals/sec, batched spiral neural-ODE training step "
                   "(dopri5 fwd + adjoint bwd, rtol=1e-7, batch %d) on %s "
                   "vs torchdiffeq CPU" % (BATCH, jax_res['backend'])),
        "value": round(jax_res['evals_per_sec'], 1),
        "unit": "vf_evals_per_sec",
        "vs_baseline": (round(vs_baseline, 3)
                        if vs_baseline == vs_baseline else None),
        "detail": {"jax": {k: (round(v, 6) if isinstance(v, float) else v)
                           for k, v in jax_res.items()},
                   "torch_cpu": {k: (round(v, 6) if isinstance(v, float) else v)
                                 for k, v in torch_res.items()}},
    }))


if __name__ == "__main__":
    main()
