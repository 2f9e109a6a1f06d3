"""Latent ODE VAE on irregularly-sampled spirals — JAX re-authoring of
reference examples/latent_ode.py.

An RNN encoder consumes the trajectory backwards to produce q(z0 | x)
(reference latent_ode.py:128-144), the latent dynamics are an MLP vector
field integrated with `odeint_adjoint` over the irregular time grid
(:108-125), a decoder maps latents to observations (:147-159), and training
maximises the ELBO (:181-194, 262-274).  Checkpoint save/load uses
numpy npz (the reference uses torch.save, :233-247).

Run:  python examples/latent_ode.py [--niters 500]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import optax

from torchdiffeq_tpu.adjoint import odeint_adjoint
from torchdiffeq_tpu.models import init_mlp, mlp_apply

parser = argparse.ArgumentParser()
parser.add_argument('--niters', type=int, default=500)
parser.add_argument('--lr', type=float, default=0.01)
parser.add_argument('--latent_dim', type=int, default=4)
parser.add_argument('--nhidden', type=int, default=20)
parser.add_argument('--rnn_nhidden', type=int, default=25)
parser.add_argument('--obs_dim', type=int, default=2)
parser.add_argument('--nspiral', type=int, default=100)
parser.add_argument('--ntotal', type=int, default=150)
parser.add_argument('--nsample', type=int, default=50)
parser.add_argument('--noise_std', type=float, default=0.3)
parser.add_argument('--train_dir', type=str, default=None)
parser.add_argument('--seed', type=int, default=0)


def generate_spirals(key, args):
    """Clockwise/counter-clockwise noisy spirals on irregular samples
    (reference latent_ode.py:32-105, simplified)."""
    ts = np.linspace(0.0, 4 * np.pi, args.ntotal)
    # two archetypes
    r_cw = 0.5 + ts / (4 * np.pi)
    cw = np.stack([r_cw * np.cos(ts) - 1, r_cw * np.sin(ts)], axis=1)
    r_cc = 1.5 - ts / (4 * np.pi)
    cc = np.stack([r_cc * np.cos(ts) + 1, r_cc * np.sin(ts)], axis=1)

    rng = np.random.RandomState(args.seed)
    start = rng.randint(0, args.ntotal - args.nsample, args.nspiral)
    trajs, samp_ts = [], None
    for i in range(args.nspiral):
        base = cw if rng.rand() > 0.5 else cc
        window = base[start[i]:start[i] + args.nsample]
        trajs.append(window + args.noise_std * rng.randn(*window.shape))
    samp_ts = ts[:args.nsample] / 10.0
    return (jnp.asarray(np.stack(trajs), jnp.float32),
            jnp.asarray(samp_ts, jnp.float32))


def init_params(key, args):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return dict(
        func=init_mlp(k1, [args.latent_dim, args.nhidden, args.nhidden,
                           args.latent_dim]),
        # GRU-less simple RNN encoder: h' = tanh(W [x, h] + b)
        rnn_w=jax.random.normal(
            k2, (args.obs_dim + args.rnn_nhidden, args.rnn_nhidden),
            jnp.float32) * 0.1,
        rnn_b=jnp.zeros((args.rnn_nhidden,), jnp.float32),
        rnn_out=init_mlp(k3, [args.rnn_nhidden, 2 * args.latent_dim]),
        dec=init_mlp(k4, [args.latent_dim, args.nhidden, args.obs_dim]),
    )


def encode(params, traj):
    """Run the RNN backwards in time (reference latent_ode.py:262-265)."""
    def step(h, x):
        h = jnp.tanh(jnp.concatenate([x, h], -1) @ params['rnn_w']
                     + params['rnn_b'])
        return h, None

    h0 = jnp.zeros(params['rnn_b'].shape)
    h, _ = jax.lax.scan(step, h0, traj[::-1])
    out = mlp_apply(params['rnn_out'], h)
    d = out.shape[-1] // 2
    return out[:d], out[d:]  # mean, logvar


def latent_field(tt, z, fparams):
    return mlp_apply(fparams, z, activation=jax.nn.elu)


def elbo_loss(params, trajs, ts, key, noise_std):
    def single(traj, key):
        mean, logvar = encode(params, traj)
        eps = jax.random.normal(key, mean.shape)
        z0 = mean + eps * jnp.exp(0.5 * logvar)
        zs = odeint_adjoint(latent_field, z0, ts, args=(params['func'],),
                            rtol=1e-4, atol=1e-5)
        pred = mlp_apply(params['dec'], zs)
        logpx = -0.5 * jnp.sum(((pred - traj) / noise_std) ** 2
                               + np.log(2 * np.pi * noise_std ** 2))
        kl = -0.5 * jnp.sum(1 + logvar - mean ** 2 - jnp.exp(logvar))
        return -(logpx - kl)

    keys = jax.random.split(key, trajs.shape[0])
    return jnp.mean(jax.vmap(single)(trajs, keys))


def main():
    args = parser.parse_args()
    key = jax.random.PRNGKey(args.seed)
    trajs, ts = generate_spirals(key, args)

    key, pkey = jax.random.split(key)
    params = init_params(pkey, args)

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(elbo_loss)(params, trajs, ts, key,
                                                    args.noise_std)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for itr in range(1, args.niters + 1):
        key, skey = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, skey)
        if itr % 20 == 0 or itr == 1:
            print(f'Iter: {itr}, neg elbo: {float(loss):.4f}')

    if args.train_dir is not None:
        os.makedirs(args.train_dir, exist_ok=True)
        flat, _ = jax.flatten_util.ravel_pytree(params)
        np.savez(os.path.join(args.train_dir, 'ckpt.npz'),
                 params=np.asarray(flat))
        print('saved checkpoint')

    # extrapolation (incl. negative time, reference :311-317)
    mean, logvar = encode(params, trajs[0])
    ts_ext = jnp.linspace(-1.0, 2.0, 30, dtype=jnp.float32)
    # integrate from ts[0]=0: prepend 0 grid going backwards then forwards
    zs_b = odeint_adjoint(latent_field, mean,
                          jnp.concatenate([jnp.zeros(1, jnp.float32),
                                           ts_ext[ts_ext < 0][::-1]]),
                          args=(params['func'],))
    zs_f = odeint_adjoint(latent_field, mean,
                          jnp.concatenate([jnp.zeros(1, jnp.float32),
                                           ts_ext[ts_ext >= 0]]),
                          args=(params['func'],))
    print('extrapolated (back, fwd):', zs_b.shape, zs_f.shape)


if __name__ == '__main__':
    main()
