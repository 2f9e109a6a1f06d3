"""API-shape tests, mirroring reference tests/api_tests.py plus JAX-specific
surface: pytree state matches per-leaf tensor solves, gradcheck through tuple
state, dense output, stats, scalar state, dict state."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdiffeq_tpu as tde
from problems import construct_problem


def test_tuple_state_matches_tensor():
    """Tuple-state forward matches solving each component separately
    (reference api_tests.py:11-30)."""
    f1 = lambda t, y: -0.5 * y
    f2 = lambda t, y: 1.5 * y

    def f_tuple(t, y):
        return (-0.5 * y[0], 1.5 * y[1])

    t = jnp.linspace(0., 2., 7)
    a0 = jnp.array([1.0, 2.0])
    b0 = jnp.array([[0.5]])

    ys_a = tde.odeint(f1, a0, t, rtol=1e-10, atol=1e-12)
    ys_b = tde.odeint(f2, b0, t, rtol=1e-10, atol=1e-12)
    ys = tde.odeint(f_tuple, (a0, b0), t, rtol=1e-10, atol=1e-12)

    # the tupled solve shares one error norm, so allow solver-level slack
    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(ys_a),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ys[1]), np.asarray(ys_b),
                               rtol=1e-7, atol=1e-9)


def test_dict_state():
    def f(t, y):
        return {'a': -y['a'], 'b': {'c': 2.0 * y['b']['c']}}

    y0 = {'a': jnp.array([1.0]), 'b': {'c': jnp.array([1.0, 1.0])}}
    t = jnp.linspace(0., 1., 3)
    ys = tde.odeint(f, y0, t, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(ys['a'][-1, 0]), np.exp(-1), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(ys['b']['c'][-1]),
                               np.exp(2) * np.ones(2), rtol=1e-8)


def test_scalar_state():
    f = lambda t, y: -y
    ys = tde.odeint(f, jnp.asarray(1.0), jnp.linspace(0., 1., 3))
    assert ys.shape == (3,)
    np.testing.assert_allclose(float(ys[-1]), np.exp(-1), rtol=1e-6)


def test_tuple_state_gradcheck():
    """Gradients flow through tuple state (reference api_tests.py:31-39)."""
    def f_tuple(t, y):
        return (-0.5 * y[0] + 0.1 * jnp.sum(y[1]) * jnp.ones_like(y[0]),
                1.5 * y[1])

    t = jnp.linspace(0., 1., 3)
    a0 = jnp.array([1.0])
    b0 = jnp.array([0.5])

    def loss(a0_, b0_):
        ya, yb = tde.odeint(f_tuple, (a0_, b0_), t, rtol=1e-10, atol=1e-12)
        return jnp.sum(ya[-1]) + jnp.sum(yb[-1])

    ga, gb = jax.grad(loss, argnums=(0, 1))(a0, b0)
    eps = 1e-6
    fd_a = (float(loss(a0 + eps, b0)) - float(loss(a0 - eps, b0))) / (2 * eps)
    fd_b = (float(loss(a0, b0 + eps)) - float(loss(a0, b0 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(ga[0]), fd_a, rtol=1e-5)
    np.testing.assert_allclose(float(gb[0]), fd_b, rtol=1e-5)


def test_per_leaf_tolerances():
    """rtol/atol may be given per state leaf (reference _tuple_tol,
    misc.py:115-123)."""
    def f_tuple(t, y):
        return (-0.5 * y[0], 1.5 * y[1])

    t = jnp.linspace(0., 1., 3)
    ys = tde.odeint(f_tuple, (jnp.array([1.0]), jnp.array([0.5])), t,
                    rtol=[1e-6, 1e-9], atol=[1e-8, 1e-11])
    np.testing.assert_allclose(float(ys[0][-1, 0]), np.exp(-0.5), rtol=1e-5)


def test_odeint_dense_matches_odeint():
    f, y0, t_points, sol = construct_problem(ode='sine', npts=20)
    dense = tde.odeint_dense(f, y0, t_points[0], t_points[-1],
                             rtol=1e-8, atol=1e-10)
    ys = dense(t_points)
    ys_ref = tde.odeint(f, y0, t_points, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref),
                               rtol=1e-5, atol=1e-7)


def test_stats_pytree():
    f, y0, t_points, sol = construct_problem(ode='constant')
    ys, stats = tde.odeint_with_stats(f, y0, t_points)
    assert isinstance(stats, tde.Stats)
    for name in ('nfe', 'n_steps', 'n_accepted', 'n_rejected', 'error_code'):
        assert getattr(stats, name).dtype == jnp.int32, name
    assert jnp.issubdtype(stats.final_dt.dtype, jnp.floating)


def test_options_unknown_method():
    f, y0, t_points, sol = construct_problem(ode='constant')
    with pytest.raises(ValueError):
        tde.odeint(f, y0, t_points, method='totally_fake')


def test_event_requires_len2_horizon():
    f = lambda t, y: -y
    with pytest.raises(ValueError):
        tde.odeint(f, jnp.array([1.0]), jnp.linspace(0, 1, 5),
                   event_fn=lambda t, y: y[0] - 0.5)


def test_vmap_over_odeint():
    """The whole solve is vmappable — batched independent solves, a
    capability the reference cannot express (its batching shares one step
    sequence across the batch)."""
    f = lambda t, y: -y
    t = jnp.linspace(0., 1., 3)
    y0s = jnp.linspace(1.0, 2.0, 4)[:, None]

    ys = jax.vmap(lambda y0: tde.odeint(f, y0, t, method='rk4',
                                        options=dict(step_size=0.1)))(y0s)
    assert ys.shape == (4, 3, 1)
    np.testing.assert_allclose(np.asarray(ys[:, -1, 0]),
                               np.asarray(y0s[:, 0]) * np.exp(-1), rtol=1e-5)


def test_args_passthrough():
    def f(t, y, alpha, beta):
        return alpha * y + beta

    t = jnp.linspace(0., 1., 3)
    ys = tde.odeint(f, jnp.array([1.0]), t, args=(-1.0, jnp.array([0.5])),
                    rtol=1e-10, atol=1e-12)
    # y' = -y + 0.5 -> y(t) = 0.5 + 0.5 e^-t
    np.testing.assert_allclose(float(ys[-1, 0]), 0.5 + 0.5 * np.exp(-1),
                               rtol=1e-8)


def test_non_monotonic_t_raises():
    f = lambda t, y: -y
    with pytest.raises(ValueError):
        tde.odeint(f, jnp.array([1.0]), jnp.array([0.0, 2.0, 1.0]))


def test_stats_raise_if_error():
    fb = lambda t, y: y ** 3
    ys, stats = tde.odeint_with_stats(fb, jnp.array([5.0]),
                                      jnp.linspace(0., 5., 3),
                                      options=dict(max_num_steps=2000))
    with pytest.raises(RuntimeError):
        stats.raise_if_error()
    ys, stats = tde.odeint_with_stats(lambda t, y: -y, jnp.array([1.0]),
                                      jnp.linspace(0., 1., 3))
    stats.raise_if_error()  # no-op on success
