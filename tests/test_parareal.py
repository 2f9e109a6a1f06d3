"""Parallel-in-time (Parareal) solver tests.

No reference counterpart (torchdiffeq is sequential in time); correctness
oracles are the scheme's own mathematics:

* finite termination: with n_iters = T-1 the result IS the sequential
  fine solution (exactly, incl. floating point);
* monotone correction decay for small n_iters;
* mesh execution: shard_map over the slice axis on the 8-device CPU mesh
  matches the single-device vmap path;
* differentiability through the whole scheme.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdiffeq_tpu as tde
from torchdiffeq_tpu.parallel import (make_mesh, odeint_parareal,
                                      odeint_parareal_with_info)


def _stiffish_field(tt, yy):
    return jnp.stack([-0.5 * yy[0] + 2.0 * yy[1],
                      -2.0 * yy[0] - 0.5 * yy[1]])


def test_finite_termination_matches_fine_solution():
    """n_iters = T-1 reproduces the restarted sequential fine propagation
    (the scheme's exact fixed point) to fp accuracy.  Note the oracle is
    the slice-restarted chain, not `odeint` over the full grid — the
    latter steps across output boundaries and interpolates."""
    y0 = jnp.array([1.0, 0.3])
    t = jnp.linspace(0., 4., 9)
    u = y0
    ys_seq = [y0]
    for s in range(8):
        u = tde.odeint(_stiffish_field, u, t[s:s + 2],
                       rtol=1e-8, atol=1e-10)[-1]
        ys_seq.append(u)
    ys_seq = np.stack([np.asarray(x) for x in ys_seq])
    ys_par = odeint_parareal(_stiffish_field, y0, t, rtol=1e-8, atol=1e-10,
                             n_iters=8, coarse_num_steps=1)
    np.testing.assert_allclose(np.asarray(ys_par), ys_seq,
                               rtol=1e-10, atol=1e-12)


def test_correction_decay_and_early_accuracy():
    """Correction norms decay monotonically; a few iterations already reach
    tolerance-level accuracy on a smooth nonlinear problem."""
    f = lambda tt, yy: jnp.sin(tt) - 0.8 * yy
    y0 = jnp.array([0.7])
    t = jnp.linspace(0., 6., 13)
    ys_seq = tde.odeint(f, y0, t, rtol=1e-8, atol=1e-10)
    ys_par, deltas = odeint_parareal_with_info(
        f, y0, t, rtol=1e-8, atol=1e-10, n_iters=5, coarse_num_steps=2)
    d = np.asarray(deltas)
    assert (np.diff(d) <= 1e-12).all(), d  # monotone (to fp noise)
    np.testing.assert_allclose(np.asarray(ys_par), np.asarray(ys_seq),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_execution_matches_vmap():
    """shard_map over the slice axis on an 8-device mesh gives the same
    trajectory as the single-device vmap path."""
    mesh = make_mesh({'time': 8})
    y0 = jnp.array([1.0, 0.3])
    t = jnp.linspace(0., 4., 9)  # 8 slices over 8 devices
    ys_v = odeint_parareal(_stiffish_field, y0, t, rtol=1e-8, atol=1e-10,
                           n_iters=3)
    ys_m = jax.jit(lambda y: odeint_parareal(
        _stiffish_field, y, t, rtol=1e-8, atol=1e-10, n_iters=3,
        mesh=mesh, axis='time'))(y0)
    np.testing.assert_allclose(np.asarray(ys_m), np.asarray(ys_v),
                               rtol=1e-10, atol=1e-12)


def test_gradients_flow_through_parareal():
    """jax.grad through the full scheme (fine custom_vjp adjoint + coarse
    scan backprop) matches the sequential-solve gradient."""
    A = jnp.array([[-0.5, 2.0], [-2.0, -0.5]])
    f = lambda tt, yy, A_: yy @ A_.T
    y0 = jnp.array([1.0, 0.3])
    t = jnp.linspace(0., 2., 5)

    def loss_par(y0_, A_):
        ys = odeint_parareal(f, y0_, t, rtol=1e-9, atol=1e-11, n_iters=4,
                             args=(A_,))
        return jnp.sum(ys[-1] ** 2)

    def loss_seq(y0_, A_):
        ys = tde.odeint(f, y0_, t, rtol=1e-9, atol=1e-11, args=(A_,))
        return jnp.sum(ys[-1] ** 2)

    gp = jax.grad(loss_par, argnums=(0, 1))(y0, A)
    gs = jax.grad(loss_seq, argnums=(0, 1))(y0, A)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


def test_pytree_state():
    """Container state works through the ravel/unravel plumbing."""
    f = lambda tt, yy: dict(a=-yy['a'], b=-2.0 * yy['b'])
    y0 = dict(a=jnp.array([1.0]), b=jnp.array([2.0, 3.0]))
    t = jnp.linspace(0., 1., 5)
    ys = odeint_parareal(f, y0, t, rtol=1e-8, atol=1e-10, n_iters=4)
    np.testing.assert_allclose(np.asarray(ys['a'][-1, 0]), np.exp(-1.0),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ys['b'][-1]),
                               np.array([2.0, 3.0]) * np.exp(-2.0),
                               rtol=1e-6)


def test_input_validation():
    f = lambda tt, yy: -yy
    with pytest.raises(ValueError):
        odeint_parareal(f, jnp.ones(1), jnp.array([0.]), n_iters=2)
    with pytest.raises(ValueError):
        odeint_parareal(f, jnp.ones(1), jnp.linspace(0., 1., 4), n_iters=0)
    mesh = make_mesh({'time': len(jax.devices())})
    if mesh.shape['time'] > 1:
        with pytest.raises(ValueError):
            # 4 slices not divisible by the mesh axis when it is 8
            if mesh.shape['time'] == 8:
                odeint_parareal(f, jnp.ones(1), jnp.linspace(0., 1., 5),
                                n_iters=1, mesh=mesh, axis='time')
            else:
                raise ValueError("skip")
