"""ODE-Net image classifier — JAX re-authoring of reference
examples/odenet_mnist.py.

An `ODEBlock` integrates a time-concat conv field over [0, 1] and takes the
final state (reference odenet_mnist.py:116-134); the field concatenates `t`
as an extra channel (`ConcatConv2d`, :76-89).  `--network resnet` swaps the
ODE block for residual blocks (:13).  NFE-F/NFE-B meters (:346-360) come
from `odeint_with_stats`.

MNIST cannot be downloaded in this zero-egress environment, so
`--data synthetic` (default) trains on a synthetic 10-class digit-like
dataset; drop real MNIST npz files into --data_dir to use them.

Run:  python examples/odenet_mnist.py [--adjoint] [--network odenet|resnet]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torchdiffeq_tpu import odeint, odeint_with_stats
from torchdiffeq_tpu.adjoint import odeint_adjoint

parser = argparse.ArgumentParser()
parser.add_argument('--network', choices=['resnet', 'odenet'], default='odenet')
parser.add_argument('--tol', type=float, default=1e-3)
parser.add_argument('--adjoint', action='store_true')
parser.add_argument('--nepochs', type=int, default=3)
parser.add_argument('--lr', type=float, default=0.1)
parser.add_argument('--batch_size', type=int, default=128)
parser.add_argument('--hidden', type=int, default=32)
parser.add_argument('--data', choices=['synthetic', 'mnist'], default='synthetic')
parser.add_argument('--data_dir', type=str, default='./data')
parser.add_argument('--steps_per_epoch', type=int, default=100)
parser.add_argument('--seed', type=int, default=0)


def load_mnist_npz(data_dir):
    """Load real MNIST from ``{data_dir}/mnist.npz`` (Keras archive layout:
    x_train/y_train/x_test/y_test).  This environment cannot download it;
    drop the file in place to train on real data.  Normalisation matches
    the reference (mean 0.1307, std 0.3081, odenet_mnist.py:276-330)."""
    import os
    path = os.path.join(data_dir, 'mnist.npz')
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"--data mnist requires {path} with keys x_train/y_train/"
            f"x_test/y_test (e.g. the Keras mnist.npz archive); this "
            f"zero-egress environment cannot download it — use "
            f"--data synthetic instead")
    with np.load(path) as d:
        xtr = (d['x_train'].astype(np.float32) / 255.0 - 0.1307) / 0.3081
        ytr = d['y_train'].astype(np.int32)
        xte = (d['x_test'].astype(np.float32) / 255.0 - 0.1307) / 0.3081
        yte = d['y_test'].astype(np.int32)
    return (jnp.asarray(xtr[..., None]), jnp.asarray(ytr),
            jnp.asarray(xte[..., None]), jnp.asarray(yte))


def synthetic_digits(key, n, size=16):
    """10-class synthetic 'digit' dataset: each class is a fixed random
    blob pattern plus noise."""
    kproto, kidx, knoise = jax.random.split(key, 3)
    protos = jax.random.normal(kproto, (10, size, size)) * 1.0
    labels = jax.random.randint(kidx, (n,), 0, 10)
    imgs = protos[labels] + 0.5 * jax.random.normal(knoise, (n, size, size))
    return imgs[..., None], labels  # NHWC


from torchdiffeq_tpu.models.conv_ode import (init_conv as conv,
                                             conv_apply as apply_conv,
                                             group_norm, init_conv_field,
                                             conv_field)


def init_ode_func(key, dim):
    return init_conv_field(key, dim)


def ode_func(t, x, params):
    """f(t, x): the reference ODEfunc (odenet_mnist.py:92-113), from the
    shared model library — norm1/relu/concat-conv1/norm2/relu/concat-conv2/
    norm3 with GroupNorm(min(32, dim))."""
    return conv_field(params, t, x)


def init_model(key, args):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dim = args.hidden
    model = dict(
        down1=conv(k1, 1, dim),
        down2=conv(k2, dim, dim),
        fc=dict(w=jax.random.normal(k4, (dim, 10)) * 0.01,
                b=jnp.zeros((10,))),
    )
    if args.network == 'odenet':
        model['odefunc'] = init_ode_func(k3, dim)
    else:
        ks = jax.random.split(k3, 4)
        model['res'] = [dict(conv1=conv(ks[2 * i], dim, dim),
                             conv2=conv(ks[2 * i + 1], dim, dim))
                        for i in range(2)]
    return model


def forward(model, x, args, with_stats=False):
    h = jax.nn.relu(apply_conv(model['down1'], x, stride=2))
    h = jax.nn.relu(apply_conv(model['down2'], h, stride=2))
    stats = None
    if args.network == 'odenet':
        t = jnp.array([0.0, 1.0], jnp.float32)
        solver = odeint_adjoint if args.adjoint else odeint
        if with_stats:
            ys, stats = odeint_with_stats(ode_func, h, t,
                                          args=(model['odefunc'],),
                                          rtol=args.tol, atol=args.tol)
        else:
            ys = solver(ode_func, h, t, args=(model['odefunc'],),
                        rtol=args.tol, atol=args.tol)
        h = ys[1]
    else:
        for blk in model['res']:
            r = group_norm(h)
            r = jax.nn.relu(r)
            r = apply_conv(blk['conv1'], r)
            r = group_norm(r)
            r = jax.nn.relu(r)
            r = apply_conv(blk['conv2'], r)
            h = h + r
    h = group_norm(h)
    h = jax.nn.relu(h)
    h = h.mean(axis=(1, 2))  # global average pool
    logits = h @ model['fc']['w'] + model['fc']['b']
    return logits, stats


def main():
    args = parser.parse_args()
    key = jax.random.PRNGKey(args.seed)

    key, dkey = jax.random.split(key)
    if args.data == 'mnist':
        train_x, train_y, test_x, test_y = load_mnist_npz(args.data_dir)
    else:
        all_x, all_y = synthetic_digits(dkey, 5120)  # shared prototypes
        train_x, train_y = all_x[:4096], all_y[:4096]
        test_x, test_y = all_x[4096:], all_y[4096:]

    key, mkey = jax.random.split(key)
    model = init_model(mkey, args)

    opt = optax.sgd(args.lr, momentum=0.9)
    opt_state = opt.init(model)

    def loss_fn(model, x, y):
        logits, _ = forward(model, x, args)
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, y))

    @jax.jit
    def train_step(model, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(model, x, y)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(model, updates), opt_state, loss

    @jax.jit
    def accuracy(model, x, y):
        logits, _ = forward(model, x, args)
        return jnp.mean(jnp.argmax(logits, -1) == y)

    n = train_x.shape[0]
    for epoch in range(args.nepochs):
        key, ekey = jax.random.split(key)
        perm = jax.random.permutation(ekey, n)
        start = time.time()
        for i in range(args.steps_per_epoch):
            idx = perm[(i * args.batch_size) % n:][:args.batch_size]
            model, opt_state, loss = train_step(model, opt_state,
                                                train_x[idx], train_y[idx])
        acc = float(accuracy(model, test_x[:512], test_y[:512]))
        msg = (f'Epoch {epoch:02d} | Loss {float(loss):.4f} | '
               f'Test Acc {acc:.4f} | {time.time() - start:.1f}s')
        if args.network == 'odenet':
            _, stats = forward(model, test_x[:8], args, with_stats=True)
            msg += f' | NFE-F {int(stats.nfe)}'
        print(msg)


if __name__ == '__main__':
    main()
