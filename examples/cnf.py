"""Continuous normalizing flow on the two-circles dataset — JAX re-authoring
of reference examples/cnf.py.

A hypernetwork produces the time-varying weights of the flow field
(reference cnf.py:77-114); the instantaneous change of log-density is the
exact negative divergence, computed with `jax.jvp` probes per dimension
(the reference uses per-dim autograd, `trace_df_dz`, cnf.py:66-74 — forward
mode is the natural JAX idiom and exercises autodiff *inside* the vector
field during the solve).  Density is obtained by solving the augmented
(z, logp) tuple state backwards from t1 to t0 (reference :175-186),
exercising tuple state + reverse time + grad-inside-func.

Run:  python examples/cnf.py [--niters 1000] [--viz]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# full-precision matmuls: the TPU default is bf16, which pollutes the
# embedded error estimate below rtol ~ 1e-4 (~30x more steps; see FAQ)
jax.config.update("jax_default_matmul_precision", "float32")

import jax.numpy as jnp
import numpy as np
import optax

from torchdiffeq_tpu import odeint
from torchdiffeq_tpu.adjoint import odeint_adjoint

parser = argparse.ArgumentParser()
parser.add_argument('--adjoint', action='store_true')
parser.add_argument('--niters', type=int, default=500)
parser.add_argument('--lr', type=float, default=1e-2)
parser.add_argument('--num_samples', type=int, default=512)
parser.add_argument('--width', type=int, default=32)
parser.add_argument('--hidden_dim', type=int, default=32)
parser.add_argument('--t0', type=float, default=0.0)
parser.add_argument('--t1', type=float, default=10.0)
parser.add_argument('--viz', action='store_true')
parser.add_argument('--seed', type=int, default=0)


def init_hyper_net(key, in_out_dim, hidden_dim, width):
    """Hypernetwork: t -> (W, B, U) of the CNF field (reference cnf.py:77-114)."""
    blocksize = width * in_out_dim
    k1, k2, k3 = jax.random.split(key, 3)
    sizes = [1, hidden_dim, hidden_dim, 3 * blocksize + width]
    params = []
    keys = jax.random.split(k3, len(sizes) - 1)
    for k, (m, n) in zip(keys, zip(sizes[:-1], sizes[1:])):
        params.append(dict(w=jax.random.normal(k, (m, n)) * (1.0 / np.sqrt(m)),
                           b=jnp.zeros((n,))))
    return params


def hyper_net(params, t, in_out_dim, width):
    blocksize = width * in_out_dim
    h = jnp.asarray(t).reshape(1, 1)
    for i, layer in enumerate(params):
        h = h @ layer['w'] + layer['b']
        if i != len(params) - 1:
            h = jnp.tanh(h)
    h = h.reshape(-1)
    W = h[:blocksize].reshape(width, in_out_dim, 1)
    U = h[blocksize:2 * blocksize].reshape(width, 1, in_out_dim)
    G = jax.nn.sigmoid(h[2 * blocksize:3 * blocksize]).reshape(width, 1, in_out_dim)
    U = U * G
    B = h[3 * blocksize:].reshape(width, 1, 1)
    return W, B, U


def cnf_field(params, t, z, in_out_dim, width):
    """dz/dt = sum_k U_k tanh(W_k z + B_k) (planar-flow mixture)."""
    W, B, U = hyper_net(params, t, in_out_dim, width)
    # z: (batch, dim)
    h = jnp.tanh(jnp.einsum('kd,bd->bk', W[:, :, 0], z) + B[:, 0, 0][None])
    return jnp.einsum('bk,kd->bd', h, U[:, 0, :])


def augmented_dynamics(t, state, params, in_out_dim, width):
    """d(z, logp)/dt with exact trace via one jvp probe per dimension
    (grad-inside-the-vector-field, the CNF signature move)."""
    z, logp = state
    f = lambda zz: cnf_field(params, t, zz, in_out_dim, width)
    dz = f(z)
    # divergence: sum_i d f_i / d z_i via forward-mode probes
    div = jnp.zeros(z.shape[0], dtype=z.dtype)
    for i in range(in_out_dim):
        e = jnp.zeros_like(z).at[:, i].set(1.0)
        _, jv = jax.jvp(f, (z,), (e,))
        div = div + jv[:, i]
    return (dz, -div[:, None])


def sample_circles(key, n):
    """Two concentric circles (reference uses sklearn make_circles)."""
    k1, k2, k3 = jax.random.split(key, 3)
    theta = jax.random.uniform(k1, (n,)) * 2 * np.pi
    r = jnp.where(jax.random.bernoulli(k2, 0.5, (n,)), 1.0, 0.5)
    x = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=1)
    return x + 0.02 * jax.random.normal(k3, (n, 2))


def std_normal_logprob(z):
    return jnp.sum(-0.5 * np.log(2 * np.pi) - z ** 2 / 2, axis=1, keepdims=True)


def main():
    args = parser.parse_args()
    key = jax.random.PRNGKey(args.seed)
    in_out_dim = 2
    solver = odeint_adjoint if args.adjoint else odeint

    key, pkey = jax.random.split(key)
    params = init_hyper_net(pkey, in_out_dim, args.hidden_dim, args.width)

    t_span = jnp.array([args.t1, args.t0])  # solve t1 -> t0 (reverse time)

    def loss_fn(params, x):
        logp_init = jnp.zeros((x.shape[0], 1))
        func = lambda tt, state, p: augmented_dynamics(tt, state, p,
                                                       in_out_dim, args.width)
        z_t, logp_diff_t = solver(func, (x, logp_init), t_span,
                                  args=(params,), atol=1e-5, rtol=1e-5)
        z0, logp_diff0 = z_t[-1], logp_diff_t[-1]
        logp_x = std_normal_logprob(z0) - logp_diff0
        return -jnp.mean(logp_x)

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x):
        loss, grads = jax.value_and_grad(loss_fn)(params, x)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for itr in range(1, args.niters + 1):
        key, dkey = jax.random.split(key)
        x = sample_circles(dkey, args.num_samples)
        params, opt_state, loss = step(params, opt_state, x)
        if itr % 50 == 0 or itr == 1:
            print(f'Iter {itr:04d} | NLL {float(loss):.4f}')

    print('final NLL:', float(loss))


if __name__ == '__main__':
    main()
