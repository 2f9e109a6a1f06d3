"""End-to-end baselines vs the reference on CPU (BASELINE.md mandate).

Two of BASELINE.md's named configs that previously had no head-to-head
numbers (VERDICT r3 item 8):

  latent_ode  -- the latent-ODE VAE training step (reference
                 examples/latent_ode.py:197-274): RNN encoder -> sample z0
                 -> odeint(adjoint) over the irregular grid -> decoder ->
                 ELBO.  Both frameworks train their own idiomatic
                 implementation at MATCHED sizes (latent 4, hidden 20,
                 rnn 25), MATCHED data (same numpy spirals), MATCHED
                 tolerances (rtol=1e-4, atol=1e-5, dopri5), MATCHED
                 optimizer (Adam, lr=0.01).
  event_train -- learn-physics-style event training (reference
                 examples/learn_physics.py:52-123): recover (pos0, vel0)
                 of a bouncing ball from two observed bounce times by
                 differentiating through chained odeint_event solves
                 (Adam, lr=0.05, f64, rtol=atol=1e-8).

Reports ms/iter (median over iters after the first, which includes
compilation for the JAX side), forward NFE at the final parameters, and
the loss at iter 1 / final iter.  Losses are each framework's own ELBO /
squared-time loss on the SAME data+targets, at the same iteration count.

Run on CPU:  python benchmarks/baselines.py [--quick]
Writes benchmarks/BASELINES.md.
"""
import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

sys.path.insert(0, '/root/reference')
import torch  # noqa: E402

import torchdiffeq_tpu as tde  # noqa: E402
from torchdiffeq_tpu.adjoint import odeint_adjoint  # noqa: E402
from torchdiffeq_tpu.models import init_mlp, mlp_apply  # noqa: E402

RTOL, ATOL = 1e-4, 1e-5
LATENT, NHID, RNNHID, OBS = 4, 20, 25, 2


# --------------------------------------------------------------------------
# shared data
# --------------------------------------------------------------------------
def make_spirals(nspiral, nsample, ntotal=150, noise_std=0.3, seed=0):
    ts = np.linspace(0.0, 4 * np.pi, ntotal)
    r_cw = 0.5 + ts / (4 * np.pi)
    cw = np.stack([r_cw * np.cos(ts) - 1, r_cw * np.sin(ts)], axis=1)
    r_cc = 1.5 - ts / (4 * np.pi)
    cc = np.stack([r_cc * np.cos(ts) + 1, r_cc * np.sin(ts)], axis=1)
    rng = np.random.RandomState(seed)
    start = rng.randint(0, ntotal - nsample, nspiral)
    trajs = []
    for i in range(nspiral):
        base = cw if rng.rand() > 0.5 else cc
        window = base[start[i]:start[i] + nsample]
        trajs.append(window + noise_std * rng.randn(*window.shape))
    return np.stack(trajs).astype(np.float32), (ts[:nsample] / 10.0).astype(np.float32)


def iter_stats(times_s):
    """ms/iter: median of all iters after the first (first = compile)."""
    return (times_s[0] * 1e3,
            statistics.median(times_s[1:]) * 1e3 if len(times_s) > 1 else float('nan'))


def make_shared_latent_weights(seed=0):
    """One numpy RNG -> identical initial weights for BOTH frameworks, so
    the per-iteration losses are directly comparable (the event-training
    baseline already matches to 4 decimals; this gives the latent-ODE rows
    the same property).  Layers use the torch nn.Linear default init
    (U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for weight and bias)."""
    rng = np.random.RandomState(seed + 1234)

    def lin(fan_in, fan_out):
        bound = 1.0 / np.sqrt(fan_in)
        w = rng.uniform(-bound, bound, (fan_in, fan_out)).astype(np.float32)
        b = rng.uniform(-bound, bound, (fan_out,)).astype(np.float32)
        return w, b

    return dict(
        func=[lin(LATENT, NHID), lin(NHID, NHID), lin(NHID, LATENT)],
        i2h=lin(OBS + RNNHID, RNNHID),
        h2o=lin(RNNHID, 2 * LATENT),
        dec=[lin(LATENT, NHID), lin(NHID, OBS)],
    )


def make_shared_eps(niters, nspiral, seed=0):
    """The reparameterisation noise per (iteration, spiral), shared by both
    frameworks so the ELBO sequences are on identical z0 draws."""
    rng = np.random.RandomState(seed + 4321)
    return rng.randn(niters, nspiral, LATENT).astype(np.float32)


# --------------------------------------------------------------------------
# latent ODE -- ours
# --------------------------------------------------------------------------
def latent_ode_ours(trajs_np, ts_np, niters, shared_w, eps_seq):
    trajs = jnp.asarray(trajs_np)
    ts = jnp.asarray(ts_np)
    mk = lambda layers: [dict(w=jnp.asarray(w), b=jnp.asarray(b))
                         for (w, b) in layers]
    params = dict(
        func=mk(shared_w['func']),
        rnn_w=jnp.asarray(shared_w['i2h'][0]),
        rnn_b=jnp.asarray(shared_w['i2h'][1]),
        rnn_out=mk([shared_w['h2o']]),
        dec=mk(shared_w['dec']),
    )

    def encode(params, traj):
        def step(h, x):
            return jnp.tanh(jnp.concatenate([x, h], -1) @ params['rnn_w']
                            + params['rnn_b']), None
        h, _ = jax.lax.scan(step, jnp.zeros((RNNHID,)), traj[::-1])
        out = mlp_apply(params['rnn_out'], h)
        return out[:LATENT], out[LATENT:]

    def field(tt, z, fp):
        return mlp_apply(fp, z, activation=jax.nn.elu)

    noise_std = 0.3

    def elbo(params, eps_batch):
        def single(traj, eps):
            mean, logvar = encode(params, traj)
            z0 = mean + eps * jnp.exp(0.5 * logvar)
            zs = odeint_adjoint(field, z0, ts, args=(params['func'],),
                                rtol=RTOL, atol=ATOL)
            # decoder activation matches the reference module (ReLU)
            pred = mlp_apply(params['dec'], zs, activation=jax.nn.relu)
            logpx = -0.5 * jnp.sum(((pred - traj) / noise_std) ** 2
                                   + np.log(2 * np.pi * noise_std ** 2))
            kl = -0.5 * jnp.sum(1 + logvar - mean ** 2 - jnp.exp(logvar))
            return -(logpx - kl)
        return jnp.mean(jax.vmap(single)(trajs, eps_batch))

    opt = optax.adam(0.01)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, eps_batch):
        loss, grads = jax.value_and_grad(elbo)(params, eps_batch)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses, times = [], []
    for i in range(niters):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(eps_seq[i]))
        loss = float(loss)
        times.append(time.perf_counter() - t0)
        losses.append(loss)

    # forward NFE at final params (single spiral, matched to the ref below)
    mean, _ = encode(params, trajs[0])
    _, stats = tde.odeint_with_stats(field, mean, ts, args=(params['func'],),
                                     rtol=RTOL, atol=ATOL)
    first_ms, ms = iter_stats(times)
    return dict(first_ms=first_ms, ms=ms, nfe=int(stats.nfe),
                loss1=losses[0], lossN=losses[-1])


# --------------------------------------------------------------------------
# latent ODE -- reference (torch modules per examples/latent_ode.py:108-159)
# --------------------------------------------------------------------------
def latent_ode_ref(trajs_np, ts_np, niters, shared_w, eps_seq):
    from torchdiffeq import odeint_adjoint as t_odeint

    class Field(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.net = torch.nn.Sequential(
                torch.nn.Linear(LATENT, NHID), torch.nn.ELU(),
                torch.nn.Linear(NHID, NHID), torch.nn.ELU(),
                torch.nn.Linear(NHID, LATENT))
            self.nfe = 0

        def forward(self, t, x):
            self.nfe += 1
            return self.net(x)

    class Rnn(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.i2h = torch.nn.Linear(OBS + RNNHID, RNNHID)
            self.h2o = torch.nn.Linear(RNNHID, 2 * LATENT)

        def forward(self, x, h):
            h = torch.tanh(self.i2h(torch.cat((x, h), dim=-1)))
            return self.h2o(h), h

    field, rnn = Field(), Rnn()
    dec = torch.nn.Sequential(torch.nn.Linear(LATENT, NHID), torch.nn.ReLU(),
                              torch.nn.Linear(NHID, OBS))

    # load the SAME initial weights as the JAX side (numpy (in, out) ->
    # torch Linear (out, in) transpose)
    def load_lin(mod, wb):
        w, b = wb
        with torch.no_grad():
            mod.weight.copy_(torch.from_numpy(w.T))
            mod.bias.copy_(torch.from_numpy(b))

    load_lin(field.net[0], shared_w['func'][0])
    load_lin(field.net[2], shared_w['func'][1])
    load_lin(field.net[4], shared_w['func'][2])
    load_lin(rnn.i2h, shared_w['i2h'])
    load_lin(rnn.h2o, shared_w['h2o'])
    load_lin(dec[0], shared_w['dec'][0])
    load_lin(dec[2], shared_w['dec'][1])

    params = (list(field.parameters()) + list(rnn.parameters())
              + list(dec.parameters()))
    optimizer = torch.optim.Adam(params, lr=0.01)
    trajs = torch.from_numpy(trajs_np)
    ts = torch.from_numpy(ts_np)
    noise_std = 0.3

    losses, times = [], []
    for it in range(niters):
        t0 = time.perf_counter()
        optimizer.zero_grad()
        h = torch.zeros(trajs.shape[0], RNNHID)
        for i in reversed(range(trajs.shape[1])):
            out, h = rnn(trajs[:, i], h)
        mean, logvar = out[:, :LATENT], out[:, LATENT:]
        z0 = mean + torch.from_numpy(eps_seq[it]) * torch.exp(0.5 * logvar)
        zs = t_odeint(field, z0, ts, rtol=RTOL, atol=ATOL).permute(1, 0, 2)
        pred = dec(zs)
        logpx = -0.5 * torch.sum(((pred - trajs) / noise_std) ** 2
                                 + np.log(2 * np.pi * noise_std ** 2),
                                 dim=(1, 2))
        kl = -0.5 * torch.sum(1 + logvar - mean ** 2 - torch.exp(logvar),
                              dim=1)
        loss = torch.mean(-(logpx - kl))
        loss.backward()
        optimizer.step()
        times.append(time.perf_counter() - t0)
        losses.append(float(loss.detach()))

    field.nfe = 0
    with torch.no_grad():
        h = torch.zeros(1, RNNHID)
        for i in reversed(range(trajs.shape[1])):
            out, h = rnn(trajs[:1, i], h)
        t_odeint(field, out[:, :LATENT], ts, rtol=RTOL, atol=ATOL)
    first_ms, ms = iter_stats(times)
    return dict(first_ms=first_ms, ms=ms, nfe=field.nfe,
                loss1=losses[0], lossN=losses[-1])


# --------------------------------------------------------------------------
# event training -- recover (pos0, vel0) from two observed bounce times
# --------------------------------------------------------------------------
EV_TARGETS = (1.09, 2.78)   # ~bounce times for pos0=10, vel0=-2, g=9.8
EV_TOL = 1e-8
EV_LR = 0.05


def event_train_ours(niters):
    from torchdiffeq_tpu import odeint_event
    jax.config.update('jax_enable_x64', True)
    try:
        g = 9.8

        def dyn(t, s):
            pos, vel = s
            return (vel, -g * jnp.ones_like(vel))

        def ev(t, s):
            return s[0] - 0.3

        def bounce_times(pos0, vel0):
            state, t, out = (pos0, vel0), jnp.asarray(0.0), []
            for _ in range(2):
                # default interface (plain odeint), as in the reference's
                # learn_physics.py:87 — its adjoint interface requires an
                # nn.Module func / explicit adjoint_params
                event_t, sol = odeint_event(
                    dyn, state, t, event_fn=ev,
                    rtol=EV_TOL, atol=EV_TOL)
                out.append(event_t)
                pos, vel = (s[-1] for s in sol)
                state = (pos + 1e-7, -0.8 * vel)
                t = event_t
            return out

        targets = jnp.asarray(EV_TARGETS)

        def loss_fn(p):
            t1, t2 = bounce_times(p['pos0'], p['vel0'])
            return (t1 - targets[0]) ** 2 + (t2 - targets[1]) ** 2

        params = dict(pos0=jnp.asarray(8.0), vel0=jnp.asarray(-1.0))
        opt = optax.adam(EV_LR)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        losses, times = [], []
        for _ in range(niters):
            t0 = time.perf_counter()
            params, opt_state, loss = step(params, opt_state)
            loss = float(loss)
            times.append(time.perf_counter() - t0)
            losses.append(loss)
        first_ms, ms = iter_stats(times)
        return dict(first_ms=first_ms, ms=ms, nfe=-1,
                    loss1=losses[0], lossN=losses[-1])
    finally:
        jax.config.update('jax_enable_x64', False)


def event_train_ref(niters):
    from torchdiffeq import odeint_event as t_event
    torch.set_default_dtype(torch.float64)
    try:
        g = 9.8

        def dyn(t, s):
            pos, vel = s
            return (vel, -g * torch.ones_like(vel))

        def ev(t, s):
            return s[0] - 0.3

        pos0 = torch.tensor(8.0, requires_grad=True)
        vel0 = torch.tensor(-1.0, requires_grad=True)
        optimizer = torch.optim.Adam([pos0, vel0], lr=EV_LR)
        targets = torch.tensor(EV_TARGETS)

        losses, times = [], []
        for _ in range(niters):
            t0 = time.perf_counter()
            optimizer.zero_grad()
            state, t, out = (pos0, vel0), torch.tensor(0.0), []
            for _b in range(2):
                event_t, sol = t_event(dyn, state, t, event_fn=ev,
                                       rtol=EV_TOL, atol=EV_TOL)
                out.append(event_t)
                pos, vel = (s[-1] for s in sol)
                state = (pos + 1e-7, -0.8 * vel)
                t = event_t
            loss = (out[0] - targets[0]) ** 2 + (out[1] - targets[1]) ** 2
            loss.backward()
            optimizer.step()
            times.append(time.perf_counter() - t0)
            losses.append(float(loss.detach()))
        first_ms, ms = iter_stats(times)
        return dict(first_ms=first_ms, ms=ms, nfe=-1,
                    loss1=losses[0], lossN=losses[-1])
    finally:
        torch.set_default_dtype(torch.float32)


# --------------------------------------------------------------------------
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true')
    a = ap.parse_args()
    nspiral, nsample = (8, 20) if a.quick else (32, 30)
    n_lat = 5 if a.quick else 20
    n_ev = 5 if a.quick else 30

    trajs, ts = make_spirals(nspiral, nsample)
    shared_w = make_shared_latent_weights()
    eps_seq = make_shared_eps(n_lat, nspiral)
    rows = []
    print(f'latent ODE: {nspiral} spirals x {nsample} samples, '
          f'{n_lat} iters, rtol={RTOL} atol={ATOL} '
          f'(shared init weights + shared z0 noise)')
    rows.append(('latent ODE', 'torchdiffeq_tpu',
                 latent_ode_ours(trajs, ts, n_lat, shared_w, eps_seq)))
    rows.append(('latent ODE', 'reference (torch)',
                 latent_ode_ref(trajs, ts, n_lat, shared_w, eps_seq)))
    print(f'event training: 2 chained bounces, {n_ev} iters, '
          f'tol={EV_TOL}, Adam lr={EV_LR}, f64')
    rows.append(('event training', 'torchdiffeq_tpu', event_train_ours(n_ev)))
    rows.append(('event training', 'reference (torch)', event_train_ref(n_ev)))

    hdr = ('| workload | framework | iter-1 ms (compile) | ms/iter | '
           'fwd NFE | loss @1 | loss @final |')
    sep = '|---|---|---|---|---|---|---|'
    lines = [hdr, sep]
    for wl, fw, r in rows:
        nfe = str(r['nfe']) if r['nfe'] >= 0 else 'n/a'
        lines.append(f"| {wl} | {fw} | {r['first_ms']:.0f} | {r['ms']:.1f} "
                     f"| {nfe} | {r['loss1']:.4f} | {r['lossN']:.4f} |")
    table = '\n'.join(lines)
    print(table)

    speed = {}
    for wl, fw, r in rows:
        speed.setdefault(wl, {})[fw] = r['ms']
    ratio_lines = []
    for wl, d in speed.items():
        ratio = d['reference (torch)'] / d['torchdiffeq_tpu']
        ratio_lines.append(f'- **{wl}**: {ratio:.1f}x faster per iter than '
                           f'the reference (CPU, matched tolerances)')
    summary = '\n'.join(ratio_lines)
    print(summary)

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, 'BASELINES.md'), 'w') as f:
        f.write(
            "# End-to-end baselines vs the reference (CPU)\n\n"
            "Generated by `python benchmarks/baselines.py` -- see the module\n"
            "docstring for the matched-config protocol. Both frameworks run\n"
            "their own idiomatic implementation on the SAME data at the SAME\n"
            "sizes, tolerances, optimizer, and iteration count, on CPU --\n"
            "and, for the latent ODE, from IDENTICAL initial weights and\n"
            "identical per-iteration z0 reparameterisation noise (one numpy\n"
            "RNG feeds both frameworks), so the per-iteration loss columns\n"
            "are directly comparable optimization trajectories, not merely\n"
            "matched configs.\n"
            "JAX iter-1 includes jit compilation (one-time); ms/iter is the\n"
            "median of the remaining iters.\n\n"
            f"Config: latent ODE = {nspiral} spirals x {nsample} samples, "
            f"{n_lat} iters, dopri5 rtol={RTOL} atol={ATOL}; event training "
            f"= 2 chained bounces, {n_ev} iters, tol={EV_TOL}, f64.\n\n"
            + table + '\n\n' + summary + '\n')
    print('wrote benchmarks/BASELINES.md')


if __name__ == '__main__':
    main()
