"""Benchmark: batched neural-ODE training step (dopri5 solve + adjoint).

Measures vector-field evaluations/second for a full training step (forward
adaptive dopri5 solve + continuous-adjoint backward + SGD update) of the
spiral neural-ODE (BASELINE.json config 1: examples/ode_demo.py's MLP field)
at rtol=1e-7, and compares against the reference torchdiffeq running the
identical workload with torch (CPU — the only torch device here).

Both frameworks consume THE SAME weights, initial states, and targets
(generated once with numpy), so step counts and NFE line up; timing is the
median over N_GROUPS groups of N_TIMED steps after a compile/warmup step.

Timed steps are chained inside ONE jit call per group (a `lax.scan` over
training steps — the standard JAX training-loop idiom), and the headline
`step_seconds` is the SLOPE between a 10-step and a 40-step group:
t(n) = round_trip + n*step_seconds.  Two lengths are required because this
container reaches the TPU through a tunnel whose host round trip
(~3-30 ms, varies with congestion; reported as `round_trip_ms`) exceeds
the device time of the whole group, and `jax.block_until_ready` does not
reliably wait under the axon backend — every timing here ends in an
explicit host fetch of a scalar.  `step_seconds_amortized10` keeps the
round-2 protocol number (group of 10, fetch included) for comparability,
and `step_seconds_percall` the fully unamortized per-dispatch time.

A "VF eval" is one evaluation of the vector field for one batch element, so
a batched call counts `batch` evals (both frameworks batch identically).

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "vf_evals_per_sec", "vs_baseline": N}

Also embeds `tpu_accuracy`: an on-TPU accuracy/step-count check at
rtol=1e-7 against the closed-form solution of a linear problem at a large
time offset (the compensated f32-time contract; CPU-x64 reference step
count computed on the host CPU backend).
"""
import json
import statistics
import sys
import time

import numpy as np

BATCH = 1024
HIDDEN = 64
T_POINTS = 10
RTOL, ATOL = 1e-7, 1e-9
N_TIMED = 10
N_TIMED_LONG = 40
N_GROUPS = 5


def make_shared_init():
    rng = np.random.RandomState(0)
    w1 = (rng.randn(2, HIDDEN) * 0.1).astype(np.float32)
    b1 = np.zeros(HIDDEN, np.float32)
    w2 = (rng.randn(HIDDEN, 2) * 0.1).astype(np.float32)
    b2 = np.zeros(2, np.float32)
    y0 = rng.randn(BATCH, 2).astype(np.float32)
    target = rng.randn(BATCH, 2).astype(np.float32)
    return (w1, b1, w2, b2), y0, target


def bench_jax(shared):
    import jax
    # TPU default matmul precision is bf16: at rtol=1e-7 that pollutes the
    # embedded error estimate and inflates step counts ~30x. Full-f32
    # matmuls make the numerical work identical to the torch baseline.
    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp
    import torchdiffeq_tpu as tde

    (w1, b1, w2, b2), y0_np, target_np = shared
    params = [dict(w=jnp.asarray(w1), b=jnp.asarray(b1)),
              dict(w=jnp.asarray(w2), b=jnp.asarray(b2))]
    y0 = jnp.asarray(y0_np)
    target = jnp.asarray(target_np)
    t = jnp.linspace(0.0, 1.0, T_POINTS, dtype=jnp.float32)

    def field(tt, yy, p):
        h = jnp.tanh((yy ** 3) @ p[0]['w'] + p[0]['b'])
        return h @ p[1]['w'] + p[1]['b']

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

    def make_train_many(n):
        @jax.jit
        def train_many(params):
            """`n` chained training steps inside one compiled program."""
            def body(p, _):
                loss, grads = jax.value_and_grad(loss_fn)(p)
                p = jax.tree_util.tree_map(lambda a, g: a - 1e-3 * g, p,
                                           grads)
                return p, loss
            params, losses = jax.lax.scan(body, params, None, length=n)
            return losses[-1], params
        return train_many

    train_many = make_train_many(N_TIMED)
    train_many_long = make_train_many(N_TIMED_LONG)

    # Exact VF-call counts (forward / forward+adjoint backward).  Python
    # counters don't survive closure_convert (it replays a jaxpr), so count
    # with jax.debug.callback, which is preserved through jit/vjp/while_loop
    # and fires once per *executed* VF evaluation.  Run on the host CPU
    # backend.
    count = [0]

    def _bump(_):
        count[0] += 1

    def counting_field(tt, yy, p):
        jax.debug.callback(_bump, tt)
        return field(tt, yy, p)

    cpu = jax.local_devices(backend='cpu')[0]
    with jax.default_device(cpu):
        ys = jax.jit(lambda p: tde.odeint(counting_field, y0, t, rtol=RTOL,
                                          atol=ATOL, method='dopri5',
                                          args=(p,)))(params)
        jax.block_until_ready(ys)
        jax.effects_barrier()
        nfe_fwd = count[0]
        count[0] = 0

        def counted_loss(params):
            ys = tde.odeint_adjoint(counting_field, y0, t, rtol=RTOL,
                                    atol=ATOL, method='dopri5',
                                    args=(params,))
            return jnp.mean((ys - target[None]) ** 2)

        g = jax.jit(jax.grad(counted_loss))(params)
        jax.block_until_ready(g)
    jax.effects_barrier()  # drain pending debug callbacks before reading
    nfe_per_step = count[0]

    # warm up (compile all programs; end in a host fetch — under the axon
    # tunnel block_until_ready does not reliably wait, so every timing
    # below syncs by fetching the loss scalar)
    loss, params2 = train_step(params)
    float(loss)
    loss, params2 = train_many(params)
    float(loss)
    loss, params2 = train_many_long(params)
    float(loss)

    # host round trip of a single trivial jit call through the TPU tunnel
    # (device work negligible): context for the per-call timing below.
    trivial = jax.jit(lambda p: jnp.sum(p[0]['b'] * 2.0))
    float(trivial(params))
    floor_times = []
    for _ in range(N_GROUPS):
        t0 = time.perf_counter()
        float(trivial(params))
        floor_times.append(time.perf_counter() - t0)
    dispatch_floor = statistics.median(floor_times)

    # Short and long groups are timed back-to-back in PAIRS, and the slope
    # is taken per pair (median across pairs): the tunnel round trip
    # drifts 3-30 ms with congestion, so timing all short groups first and
    # all long groups minutes later would let the drift enter the slope —
    # up to making it negative.  Pairing cancels drift slower than one
    # pair (~seconds); the median rejects single-spike pairs.
    slopes, shorts, longs = [], [], []
    p = params
    for _ in range(N_GROUPS):
        t0 = time.perf_counter()
        loss, p = train_many(p)
        float(loss)  # host fetch = real completion barrier
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        loss, p = train_many_long(p)
        float(loss)
        t_long = time.perf_counter() - t0
        shorts.append(t_short)
        longs.append(t_long)
        slopes.append((t_long - t_short) / (N_TIMED_LONG - N_TIMED))
    dt = statistics.median(slopes)
    if dt <= 0:
        # congestion spike still swallowed every pair: fall back to the
        # amortized long-group time — an UPPER bound on per-step device
        # time (it still contains 1/N_TIMED_LONG of one round trip).
        dt = min(longs) / N_TIMED_LONG
    dt_amortized10 = statistics.median(shorts) / N_TIMED

    percall_times = []
    p = params
    for _ in range(N_GROUPS):
        t0 = time.perf_counter()
        for _ in range(N_TIMED):
            loss_pc, p = train_step(p)
        float(loss_pc)
        percall_times.append((time.perf_counter() - t0) / N_TIMED)
    dt_percall = statistics.median(percall_times)

    evals_per_sec = nfe_per_step * BATCH / dt
    return dict(step_seconds=dt,
                step_seconds_amortized10=round(dt_amortized10, 6),
                step_seconds_percall=round(dt_percall, 6),
                round_trip_ms=round(dispatch_floor * 1e3, 3),
                nfe=nfe_per_step, nfe_forward=nfe_fwd,
                nfe_backward=nfe_per_step - nfe_fwd,
                evals_per_sec=evals_per_sec, loss=float(loss),
                backend=jax.default_backend())


CONV_BATCH = 128        # the reference example's batch size
CONV_DIM = 64           # its channel count; state (B, 6, 6, 64)
CONV_TOL = 1e-3         # its --tol default
CONV_N_SHORT, CONV_N_LONG = 4, 12


def make_shared_conv():
    """Shared weights/state for the conv-field (ODE-Net MNIST) workload:
    two 3x3 time-concat convs, HWIO with the time channel LAST (the torch
    side permutes to the reference's t-first OIHW layout)."""
    rng = np.random.RandomState(3)
    d = CONV_DIM

    def he(c_in):
        return (rng.randn(3, 3, c_in, d) *
                np.sqrt(2.0 / (9 * c_in))).astype(np.float32)

    w1, w2 = he(d + 1), he(d + 1)
    b1 = np.zeros(d, np.float32)
    b2 = np.zeros(d, np.float32)
    y0 = (0.3 * rng.randn(CONV_BATCH, 6, 6, d)).astype(np.float32)
    target = rng.randn(6, 6, d).astype(np.float32)
    return (w1, b1, w2, b2), y0, target


def bench_jax_conv(shared):
    """Training step on the reference's flagship conv-field workload
    (examples/odenet_mnist.py:76-134 shape): dopri5 fwd + continuous
    adjoint bwd + SGD at rtol=atol=1e-3 over a (B, 6, 6, 64) state."""
    import jax
    import jax.numpy as jnp
    import torchdiffeq_tpu as tde
    from torchdiffeq_tpu.models import conv_field, conv_field_flops

    (w1, b1, w2, b2), y0_np, tgt_np = shared
    params = dict(conv1=dict(w=jnp.asarray(w1), b=jnp.asarray(b1)),
                  conv2=dict(w=jnp.asarray(w2), b=jnp.asarray(b2)))
    y0 = jnp.asarray(y0_np)
    tgt = jnp.asarray(tgt_np)
    t = jnp.array([0.0, 1.0], jnp.float32)
    f = lambda tt, yy, p: conv_field(p, tt, yy)

    def loss_fn(p):
        ys = tde.odeint_adjoint(f, y0, t, rtol=CONV_TOL, atol=CONV_TOL,
                                args=(p,))
        return jnp.mean((ys[-1] - tgt[None]) ** 2)

    def make_train_many(n):
        @jax.jit
        def train_many(p):
            def body(p, _):
                loss, grads = jax.value_and_grad(loss_fn)(p)
                p = jax.tree_util.tree_map(lambda a, g: a - 1e-3 * g, p,
                                           grads)
                return p, loss
            p, losses = jax.lax.scan(body, p, None, length=n)
            return losses[-1], p
        return train_many

    def time_steps(prec):
        # Compile + time under an explicit matmul precision (the context
        # must wrap tracing, not just execution).
        with jax.default_matmul_precision(prec):
            train_short = make_train_many(CONV_N_SHORT)
            train_long = make_train_many(CONV_N_LONG)
            float(train_short(params)[0])
            float(train_long(params)[0])
            slopes, longs = [], []
            p = params
            for _ in range(N_GROUPS):
                t0 = time.perf_counter()
                loss, p = train_short(p)
                float(loss)
                t_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                loss, p = train_long(p)
                float(loss)
                t_l = time.perf_counter() - t0
                longs.append(t_l)
                slopes.append((t_l - t_s) / (CONV_N_LONG - CONV_N_SHORT))
            dt = statistics.median(slopes)
            if dt <= 0:
                dt = min(longs) / CONV_N_LONG
            return dt, float(loss)

    # exact fwd+bwd VF-eval count on the host CPU backend
    count = [0]

    def _bump(_):
        count[0] += 1

    def cfield(tt, yy, p):
        jax.debug.callback(_bump, tt)
        return f(tt, yy, p)

    cpu = jax.local_devices(backend='cpu')[0]
    with jax.default_device(cpu):
        ys = jax.jit(lambda p: tde.odeint(cfield, y0, t, rtol=CONV_TOL,
                                          atol=CONV_TOL, args=(p,)))(params)
        jax.block_until_ready(ys)
        jax.effects_barrier()
        nfe_fwd = count[0]
        count[0] = 0

        def counted_loss(p):
            ys = tde.odeint_adjoint(cfield, y0, t, rtol=CONV_TOL,
                                    atol=CONV_TOL, args=(p,))
            return jnp.mean((ys[-1] - tgt[None]) ** 2)

        g = jax.jit(jax.grad(counted_loss))(params)
        jax.block_until_ready(g)
    jax.effects_barrier()
    nfe_step = count[0]

    dt, loss = time_steps('float32')
    dt_bf16, _ = time_steps('bfloat16')

    flops = nfe_step * conv_field_flops(CONV_BATCH, 6, 6, CONV_DIM) * 2
    return dict(step_seconds=dt, nfe=nfe_step, nfe_forward=nfe_fwd,
                nfe_backward=nfe_step - nfe_fwd,
                evals_per_sec=nfe_step * CONV_BATCH / dt,
                tflops_per_sec=round(flops / dt / 1e12, 3),
                mfu_bf16_peak=round(flops / dt / 197e12, 4),
                step_seconds_bf16=dt_bf16,
                tflops_per_sec_bf16=round(flops / dt_bf16 / 1e12, 3),
                mfu_bf16=round(flops / dt_bf16 / 197e12, 4),
                loss=loss, backend=jax.default_backend())


def bench_torch_conv(shared):
    """The identical conv-field training step on reference torchdiffeq
    (torch CPU): reference ODEfunc architecture (odenet_mnist.py:92-113),
    weights copied (time channel moved first, HWIO -> OIHW)."""
    import torch
    import torch.nn.functional as F
    sys.path.insert(0, '/root/reference')
    from torchdiffeq import odeint_adjoint

    (w1, b1, w2, b2), y0_np, tgt_np = shared
    d = CONV_DIM

    def to_torch_w(w):
        wt = torch.from_numpy(w.copy())
        wt = torch.roll(wt, shifts=1, dims=2)   # time channel first
        return torch.nn.Parameter(wt.permute(3, 2, 0, 1).contiguous())

    class ODEfunc(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.w1 = to_torch_w(w1)
            self.b1 = torch.nn.Parameter(torch.from_numpy(b1.copy()))
            self.w2 = to_torch_w(w2)
            self.b2 = torch.nn.Parameter(torch.from_numpy(b2.copy()))
            self.nfe = 0

        def forward(self, t, x):
            self.nfe += 1

            def cat_t(x):
                return torch.cat([torch.ones_like(x[:, :1]) * t, x], 1)

            h = F.group_norm(x, min(32, d))
            h = F.relu(h)
            h = F.conv2d(cat_t(h), self.w1, self.b1, padding=1)
            h = F.group_norm(h, min(32, d))
            h = F.relu(h)
            h = F.conv2d(cat_t(h), self.w2, self.b2, padding=1)
            return F.group_norm(h, min(32, d))

    func = ODEfunc()
    y0 = torch.from_numpy(y0_np.copy()).permute(0, 3, 1, 2).contiguous()
    tgt = torch.from_numpy(tgt_np.copy()).permute(2, 0, 1).contiguous()
    t = torch.tensor([0.0, 1.0])
    opt = torch.optim.SGD(func.parameters(), lr=1e-3)

    def step():
        opt.zero_grad()
        ys = odeint_adjoint(func, y0, t, rtol=CONV_TOL, atol=CONV_TOL)
        loss = torch.mean((ys[-1] - tgt[None]) ** 2)
        loss.backward()
        opt.step()
        return loss

    step()  # warm up
    func.nfe = 0
    n_timed = 2
    t0 = time.perf_counter()
    for _ in range(n_timed):
        loss = step()
    dt = (time.perf_counter() - t0) / n_timed
    nfe_step = func.nfe / n_timed
    return dict(step_seconds=dt, nfe=nfe_step,
                evals_per_sec=nfe_step * CONV_BATCH / dt,
                loss=float(loss.detach()))


def bench_jax_tpu_accuracy():
    """On-TPU accuracy/step-count evidence at rtol=1e-7 (compensated f32
    time): linear decay on t in [16384, 16392], closed-form solution."""
    import jax
    import jax.numpy as jnp
    import torchdiffeq_tpu as tde

    lam = 0.3
    T0 = 16384.0
    f = lambda tt, yy: -lam * yy
    t = jnp.linspace(T0, T0 + 8.0, 9, dtype=jnp.float32)
    y0 = jnp.ones((1,), jnp.float32)

    ys, st = tde.odeint_with_stats(f, y0, t, rtol=1e-7, atol=1e-9)
    jax.block_until_ready(ys)
    exact = np.exp(-lam * (np.asarray(t, np.float64) - T0))
    err = float(np.max(np.abs(np.asarray(ys[:, 0], np.float64) - exact)))

    # reference step count: the same solve in f64 on the host CPU backend
    cpu = jax.local_devices(backend='cpu')[0]
    with jax.default_device(cpu):
        _, st64 = tde.odeint_with_stats(f, y0.astype(jnp.float64),
                                        t.astype(jnp.float64),
                                        rtol=1e-7, atol=1e-9)
    return dict(backend=jax.default_backend(),
                max_abs_err=err, n_steps_tpu=int(st.n_steps),
                n_steps_cpu_f64=int(st64.n_steps),
                step_ratio=round(int(st.n_steps) / max(int(st64.n_steps), 1),
                                 4),
                error_code=int(st.error_code))


def bench_torch(shared):
    import torch
    sys.path.insert(0, '/root/reference')
    from torchdiffeq import odeint, odeint_adjoint

    (w1, b1, w2, b2), y0_np, target_np = shared
    net = torch.nn.Sequential(
        torch.nn.Linear(2, HIDDEN), torch.nn.Tanh(),
        torch.nn.Linear(HIDDEN, 2))
    with torch.no_grad():
        net[0].weight.copy_(torch.from_numpy(w1.T))
        net[0].bias.copy_(torch.from_numpy(b1))
        net[2].weight.copy_(torch.from_numpy(w2.T))
        net[2].bias.copy_(torch.from_numpy(b2))

    class Field(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.net = net
            self.nfe = 0

        def forward(self, t, y):
            self.nfe += 1
            return self.net(y ** 3)

    field = Field()
    y0 = torch.from_numpy(y0_np)
    target = torch.from_numpy(target_np)
    t = torch.linspace(0.0, 1.0, T_POINTS)
    opt = torch.optim.SGD(field.parameters(), lr=1e-3)

    with torch.no_grad():
        field.nfe = 0
        odeint(field, y0, t, rtol=RTOL, atol=ATOL, method='dopri5')
        nfe_fwd = field.nfe

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

    return dict(step_seconds=dt, nfe=nfe_per_step, nfe_forward=nfe_fwd,
                nfe_backward=nfe_per_step - nfe_fwd,
                evals_per_sec=nfe_per_step * BATCH / dt,
                loss=float(loss))


def _probe_default_backend():
    """The axon TPU tunnel occasionally drops (runtime FAILED_PRECONDITION
    on every op while the device still enumerates).  Probe in a SUBPROCESS
    — platform pinning only takes effect before this process's backends
    initialise — and on failure pin the parent to CPU before its first jax
    op, so the bench still produces an artifact (its `backend` field
    records the fallback)."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, '-c',
             'import jax, jax.numpy as jnp; '
             'jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.ones(8)))'],
            capture_output=True, timeout=300)
        healthy = r.returncode == 0
    except Exception:
        healthy = False
    if not healthy:
        sys.stderr.write("default backend unhealthy; pinning CPU for this "
                         "bench run\n")
        import jax
        jax.config.update("jax_platforms", "cpu")


def main():
    _probe_default_backend()
    shared = make_shared_init()
    jax_res = bench_jax(shared)
    try:
        acc_res = bench_jax_tpu_accuracy()
    except Exception as e:  # pragma: no cover
        acc_res = dict(error=str(e)[:200])
    try:
        torch_res = bench_torch(shared)
        vs_baseline = jax_res['evals_per_sec'] / torch_res['evals_per_sec']
    except Exception as e:  # torch baseline unavailable
        torch_res = dict(error=str(e)[:200])
        vs_baseline = float('nan')

    # second workload shape: the reference's flagship conv-field ODE-Net
    shared_conv = make_shared_conv()
    try:
        conv_res = bench_jax_conv(shared_conv)
    except Exception as e:  # pragma: no cover
        conv_res = dict(error=str(e)[:200])
    try:
        conv_torch_res = bench_torch_conv(shared_conv)
        conv_vs = (conv_res['evals_per_sec'] / conv_torch_res['evals_per_sec']
                   if 'evals_per_sec' in conv_res else None)
    except Exception as e:
        conv_torch_res = dict(error=str(e)[:200])
        conv_vs = None

    print(json.dumps({
        "metric": ("VF evals/sec, batched spiral neural-ODE training step "
                   "(dopri5 fwd + adjoint bwd, rtol=1e-7, batch %d; device "
                   "time via %d- vs %d-step scanned-group slope, tunnel "
                   "round trip excluded and reported) on %s vs torchdiffeq "
                   "CPU" % (BATCH, N_TIMED, N_TIMED_LONG,
                            jax_res['backend'])),
        "value": round(jax_res['evals_per_sec'], 1),
        "unit": "vf_evals_per_sec",
        "vs_baseline": (round(vs_baseline, 3)
                        if vs_baseline == vs_baseline else None),
        "detail": {"note": ("nfe differs by design: both frameworks make "
                            "identical forward solves (nfe_forward equal), "
                            "but the jax adjoint backward is ONE fused "
                            "reverse solve over the whole span while the "
                            "reference restarts its solver + init probe "
                            "per output interval — fewer evals for the "
                            "same gradients, so evals/sec understates the "
                            "wall-clock step_seconds ratio"),
                   "jax": {k: (round(v, 6) if isinstance(v, float) else v)
                           for k, v in jax_res.items()},
                   "torch_cpu": {k: (round(v, 6) if isinstance(v, float) else v)
                                 for k, v in torch_res.items()},
                   "conv_odenet_workload": {
                       "config": ("ODE-Net MNIST conv field (ConcatConv2d+GN"
                                  ", B=%d, state 6x6x%d, rtol=atol=%g), "
                                  "training step fwd dopri5 + adjoint bwd"
                                  % (CONV_BATCH, CONV_DIM, CONV_TOL)),
                       "jax": {k: (round(v, 6) if isinstance(v, float) else v)
                               for k, v in conv_res.items()},
                       "torch_cpu": {k: (round(v, 6)
                                         if isinstance(v, float) else v)
                                     for k, v in conv_torch_res.items()},
                       "vs_torch_cpu": (round(conv_vs, 3)
                                        if conv_vs else None)},
                   "tpu_accuracy": acc_res},
    }))


if __name__ == "__main__":
    main()
