"""Interpolated adjoint: `adjoint_options=dict(interpolated=True)`.

Extension over the reference (PAPERS.md: Daulbaev et al. 2020): the
backward pass evaluates y(t) from a dense interpolant of the forward
trajectory instead of re-integrating y alongside the adjoint, so the
augmented state is (vjp_t, adj_y, theta_bar) — no y carry.  Validated
against the standard continuous adjoint (which tests/test_gradients.py
pins against FD and direct gradients), plus the separatrix case where
the standard backward y-re-solve is unstable and interpolation wins.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchdiffeq_tpu.adjoint import odeint_adjoint


F = lambda t, y: -y + jnp.sin(t)
Y0 = jnp.array([1.0, 2.0])
T5 = jnp.linspace(0.0, 2.0, 5)


def _grads(opts, t=T5, argnums=(0, 1)):
    def loss(y0_, t_):
        return jnp.sum(odeint_adjoint(F, y0_, t_, adjoint_options=opts)[-1])
    return jax.grad(loss, argnums=argnums)(Y0, t)


def test_matches_standard_adjoint_y0_and_t():
    g_std = _grads(None)
    g_int = _grads(dict(interpolated=True))
    np.testing.assert_allclose(np.asarray(g_int[0]), np.asarray(g_std[0]),
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(g_int[1]), np.asarray(g_std[1]),
                               rtol=1e-5, atol=1e-9)


def test_matches_standard_adjoint_params():
    def loss(w, opts):
        return jnp.sum(odeint_adjoint(lambda tt, yy: -w * yy, Y0, T5,
                                      adjoint_options=opts)[-1])
    w = jnp.array([0.7])
    g_std = jax.grad(loss)(w, None)
    g_int = jax.grad(loss)(w, dict(interpolated=True))
    np.testing.assert_allclose(np.asarray(g_int), np.asarray(g_std),
                               rtol=1e-5)


def test_reverse_time_and_endpoint_only():
    tr = jnp.linspace(2.0, 0.0, 4)
    for t in (tr, jnp.linspace(0.0, 1.0, 2)):
        g_std = jax.grad(lambda y: jnp.sum(
            odeint_adjoint(F, y, t)[-1]))(Y0)
        g_int = jax.grad(lambda y: jnp.sum(
            odeint_adjoint(F, y, t,
                           adjoint_options=dict(interpolated=True))[-1]))(Y0)
        np.testing.assert_allclose(np.asarray(g_int), np.asarray(g_std),
                                   rtol=1e-5)


def test_container_state_and_seminorm():
    ft = lambda t, y: (-y[0], dict(a=-0.5 * y[1]['a']))
    y0t = (jnp.array([1.0]), dict(a=jnp.array([2.0])))

    def loss(y, opts):
        return jnp.sum(odeint_adjoint(ft, y, T5, adjoint_options=opts)[0][-1])

    g_std = jax.grad(lambda y: loss(y, None))(y0t)
    g_int = jax.grad(lambda y: loss(
        y, dict(interpolated=True, norm='seminorm')))(y0t)
    np.testing.assert_allclose(np.asarray(g_int[0]), np.asarray(g_std[0]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_int[1]['a']),
                               np.asarray(g_std[1]['a']), rtol=1e-5)


def test_under_jit():
    g = jax.jit(jax.grad(lambda y: jnp.sum(odeint_adjoint(
        F, y, T5, adjoint_options=dict(interpolated=True))[-1])))(Y0)
    np.testing.assert_allclose(np.asarray(g), np.exp(-2.0), rtol=1e-5)


def test_separatrix_robustness():
    """Logistic y' = y(1-y), y0=0.2, T=25: y(T) saturates at the
    separatrix y=1, so the standard adjoint's backward y-re-solve is
    repelled from it and corrupts df/dy = 1-2y along the sweep (its
    gradient lands ~10x off), while the interpolated mode reads y from
    the forward interpolant and recovers the analytic sensitivity to
    ~1e-2 relative."""
    f = lambda t, y: y * (1.0 - y)
    T = 25.0
    t = jnp.linspace(0.0, T, 2)
    y0v = 0.2
    # d/dy0 [ 1 / (1 + (1/y0 - 1) e^{-T}) ] evaluated analytically
    g_true = (np.exp(-T) / y0v ** 2) / (1.0 + (1.0 / y0v - 1.0)
                                        * np.exp(-T)) ** 2

    def grad_of(opts):
        L = lambda y: odeint_adjoint(f, jnp.array([y]), t, rtol=1e-9,
                                     atol=1e-11, adjoint_options=opts)[-1, 0]
        return float(jax.grad(L)(y0v))

    g_int = grad_of(dict(interpolated=True))
    g_std = grad_of(None)
    assert abs(g_int - g_true) / g_true < 5e-2, (g_int, g_true)
    # document the standard adjoint's failure mode on this problem (if a
    # future driver change makes it accurate too, this guard can go)
    assert abs(g_std - g_true) / g_true > 1.0, (g_std, g_true)


def test_forward_jump_t_is_honored():
    """Regression: the dense recording used to drop user step_t/jump_t
    (odeint_dense passed None to the step kernel), silently integrating
    through discontinuities ~450x over tolerance."""
    f = lambda t, y: jnp.where(t < 0.5, -y, -3.0 * y)
    t = jnp.linspace(0.0, 1.0, 3)
    exact = np.where(np.asarray(t) < 0.5, np.exp(-np.asarray(t)),
                     np.exp(-0.5) * np.exp(-3 * (np.asarray(t) - 0.5)))
    ys = odeint_adjoint(f, jnp.array([1.0]), t, rtol=1e-9, atol=1e-11,
                        options=dict(jump_t=jnp.array([0.5])),
                        adjoint_options=dict(interpolated=True))
    err = np.max(np.abs(np.asarray(ys[:, 0]) - exact))
    assert err < 1e-8, err


def test_recording_failure_poisons_outputs():
    """Regression: a recording that trips its step budget used to return
    the interpolant's clamped (finite but wrong) tail; it must NaN-poison
    outputs past the integrated span like the standard driver."""
    ys = odeint_adjoint(F, Y0, T5, options=dict(max_num_steps=1),
                        adjoint_options=dict(interpolated=True))
    assert bool(jnp.all(jnp.isnan(ys[-1]))), ys
    assert bool(jnp.all(jnp.isfinite(ys[0])))  # initial row always valid


def test_invalid_configs_raise():
    with pytest.raises(ValueError, match="Invalid method"):
        odeint_adjoint(F, Y0, T5, method="dopri5x",
                       adjoint_options=dict(interpolated=True))
    with pytest.raises(ValueError, match="adaptive"):
        jax.grad(lambda y: jnp.sum(odeint_adjoint(
            F, y, T5, method='rk4', options=dict(step_size=0.1),
            adjoint_options=dict(interpolated=True))[-1]))(Y0)
    with pytest.raises(ValueError, match="custom adjoint norm"):
        odeint_adjoint(F, Y0, T5,
                       adjoint_options=dict(interpolated=True,
                                            norm=lambda aug: 0.0))
    with pytest.raises(ValueError, match="event mode"):
        odeint_adjoint(F, Y0, jnp.array([0.0, 10.0]),
                       event_fn=lambda t, y: y[0] - 0.5,
                       adjoint_options=dict(interpolated=True))
