"""Learning dynamics + events + instantaneous updates from trajectory data
— JAX re-authoring of reference examples/learn_physics.py.

A bouncing-ball system where the dynamics (gravity) and the instantaneous
bounce update (restitution) are *learned* from an observed trajectory.
Unlike the reference — which must carry learnable event parameters in the
STATE so torch autograd reaches them (learn_physics.py:72-74) — here the
parameters are ordinary closed-over values: `jax.closure_convert` routes
exact gradients to them through the adjoint and the IFT event-time
reroute.  The event function guards on a terminal time (:66-70); bounces
are chained up to `max_events` (:83-123).

Run:  python examples/learn_physics.py [--niters 200]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torchdiffeq_tpu import odeint_event, odeint
from torchdiffeq_tpu.adjoint import odeint_adjoint

parser = argparse.ArgumentParser()
parser.add_argument('--niters', type=int, default=300)
parser.add_argument('--lr', type=float, default=0.05)
parser.add_argument('--max_events', type=int, default=3)
parser.add_argument('--t_end', type=float, default=3.0)
parser.add_argument('--seed', type=int, default=0)

TRUE_GRAVITY = 9.8
TRUE_RESTITUTION = 0.8


def simulate_true(t_obs, max_events=6):
    """Ground-truth bouncing ball via exact kinematics."""
    g, e = TRUE_GRAVITY, TRUE_RESTITUTION
    pos, vel, t0 = 2.0, 0.0, 0.0
    segs = []  # (t_start, pos, vel)
    for _ in range(max_events):
        segs.append((t0, pos, vel))
        disc = vel * vel + 2 * g * pos
        t_hit = (vel + np.sqrt(disc)) / g
        t0, vel, pos = t0 + t_hit, -e * (vel - g * t_hit), 0.0
    out = np.zeros_like(t_obs)
    for (ts, p, v) in segs:
        m = t_obs >= ts
        out[m] = p + v * (t_obs[m] - ts) - 0.5 * g * (t_obs[m] - ts) ** 2
    return np.maximum(out, 0.0)


def trajectory_loss(params, t_obs, y_obs, t_end, max_events):
    """Piecewise model trajectory evaluated at observation times."""
    gravity = jnp.exp(params['log_gravity'])
    restitution = jax.nn.sigmoid(params['logit_restitution'])

    def dynamics(t, state):
        pos, vel = state
        return (vel, -gravity * jnp.ones_like(vel))

    def event_fn(t, state):
        pos, vel = state
        return jnp.minimum(pos[0], t_end - t)

    state = (jnp.array([2.0]), jnp.array([0.0]))
    t = jnp.asarray(0.0)
    loss = 0.0
    seg_starts, seg_states = [], []
    for _ in range(max_events):
        seg_starts.append(t)
        seg_states.append(state)
        event_t, sol = odeint_event(
            dynamics, state, t, event_fn=event_fn,
            odeint_interface=odeint_adjoint, rtol=1e-6, atol=1e-8)
        pos, vel = (s[-1] for s in sol)
        state = (pos + 1e-6, -restitution * vel)
        t = event_t

    seg_starts.append(t)
    # closed-form within segments (dynamics are exactly integrable given
    # the segment initial conditions, which carry solver gradients)
    for i in range(max_events):
        t0 = seg_starts[i]
        t1 = seg_starts[i + 1]
        p0, v0 = seg_states[i]
        m = (t_obs >= t0) & (t_obs < t1)
        dt = t_obs - t0
        pred = p0[0] + v0[0] * dt - 0.5 * gravity * dt ** 2
        loss = loss + jnp.sum(jnp.where(m, (pred - y_obs) ** 2, 0.0))
    return loss / t_obs.shape[0]


def main():
    args = parser.parse_args()
    t_obs = jnp.asarray(np.linspace(0.0, args.t_end, 100), jnp.float64)
    y_obs = jnp.asarray(simulate_true(np.asarray(t_obs)), jnp.float64)

    params = dict(log_gravity=jnp.asarray(np.log(5.0)),
                  logit_restitution=jnp.asarray(0.0))

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    loss_grad = jax.jit(jax.value_and_grad(
        lambda p: trajectory_loss(p, t_obs, y_obs, args.t_end,
                                  args.max_events)))

    for itr in range(1, args.niters + 1):
        loss, grads = loss_grad(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        if itr % 25 == 0 or itr == 1:
            g = float(jnp.exp(params['log_gravity']))
            e = float(jax.nn.sigmoid(params['logit_restitution']))
            print(f'Iter {itr:04d} | loss {float(loss):.5f} | '
                  f'gravity {g:.3f} (true {TRUE_GRAVITY}) | '
                  f'restitution {e:.3f} (true {TRUE_RESTITUTION})')

    g = float(jnp.exp(params['log_gravity']))
    assert abs(g - TRUE_GRAVITY) < 0.5, f"gravity not recovered: {g}"
    print('learned physics parameters recovered')


if __name__ == '__main__':
    main()
