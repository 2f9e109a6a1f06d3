"""Neural-ODE model family: MLP vector fields and ODE blocks.

JAX re-design of the reference examples' model code
(examples/ode_demo.py:111-128 ODEFunc MLP; examples/odenet_mnist.py:116-134
ODEBlock).  Parameters are explicit pytrees; models are pure functions, so
they compose with jit/grad/vmap/pjit and shard over device meshes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..odeint import odeint
from ..adjoint import odeint_adjoint


def init_mlp(key, sizes, scale=None, dtype=jnp.float32):
    """Initialise an MLP given layer sizes [in, h1, ..., out]."""
    params = []
    keys = jax.random.split(key, len(sizes) - 1)
    for k, (fan_in, fan_out) in zip(keys, zip(sizes[:-1], sizes[1:])):
        s = scale if scale is not None else (1.0 / jnp.sqrt(fan_in))
        w = jax.random.normal(k, (fan_in, fan_out), dtype) * s
        b = jnp.zeros((fan_out,), dtype)
        params.append(dict(w=w, b=b))
    return params


def mlp_apply(params, x, activation=jnp.tanh):
    for i, layer in enumerate(params):
        x = x @ layer['w'] + layer['b']
        if i != len(params) - 1:
            x = activation(x)
    return x


def mlp_vector_field(params, t, y, activation=jnp.tanh, time_dependent=False):
    """f(t, y) as an MLP over y (optionally concat t, as in the reference's
    ConcatConv2d idea, odenet_mnist.py:76-89)."""
    if time_dependent:
        tcol = jnp.broadcast_to(jnp.asarray(t, dtype=y.dtype),
                                y.shape[:-1] + (1,))
        inp = jnp.concatenate([y, tcol], axis=-1)
    else:
        inp = y
    return mlp_apply(params, inp, activation)


def spiral_field(params, t, y):
    """The learnable field for the spiral-fitting demo
    (reference examples/ode_demo.py:111-121: MLP applied to y**3)."""
    return mlp_apply(params, y ** 3)


def init_spiral_model(key, hidden=50, dtype=jnp.float32):
    return init_mlp(key, [2, hidden, 2], scale=0.1, dtype=dtype)


def ode_block(params, y0, t, *, field, use_adjoint=True, rtol=1e-3,
              atol=1e-4, method='dopri5', **kwargs):
    """Integrate `field(params, t, y)` over `t` and return the trajectory
    (the reference's ODEBlock takes out[1], odenet_mnist.py:123-126)."""
    solver = odeint_adjoint if use_adjoint else odeint
    func = lambda tt, yy, p: field(p, tt, yy)
    return solver(func, y0, t, rtol=rtol, atol=atol, method=method,
                  args=(params,), **kwargs)
