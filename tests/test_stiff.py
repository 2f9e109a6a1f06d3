"""Adaptive implicit (stiff) tier: Kvaerno 3(2) / 5(4) ESDIRK under the
adaptive driver — a capability EXTENSION over the reference (which has only
fixed-grid implicit methods).  Covers accuracy, empirical convergence order,
the stiff step-count advantage over explicit methods (L-stability),
controller telemetry, gradients (adjoint + replay), and stage-solve
non-convergence handling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdiffeq_tpu as tde

STIFF_METHODS = ('kvaerno3', 'kvaerno5', 'radau5a')


@pytest.mark.parametrize('method', STIFF_METHODS)
def test_accuracy(method):
    f = lambda t, y: -y
    t = jnp.linspace(0., 2., 5)
    ys, st = tde.odeint_with_stats(f, jnp.array([1.0]), t, method=method,
                                   rtol=1e-8, atol=1e-10)
    err = float(jnp.max(jnp.abs(ys[:, 0] - jnp.exp(-t))))
    assert err < 1e-6, err
    assert int(st.error_code) == 0


@pytest.mark.parametrize('method,order', [('kvaerno3', 3), ('kvaerno5', 5),
                                          ('radau5a', 5)])
def test_convergence_order(method, order):
    """Empirical order on pinned step sizes (min=max=first=h forces the
    controller to accept every step at exactly h)."""
    f = lambda t, y: -y
    t = jnp.linspace(0., 2., 2)
    errs = []
    for h in (0.2, 0.1):
        ys = tde.odeint(f, jnp.array([1.0]), t, method=method,
                        rtol=1e3, atol=1e3,
                        options=dict(min_step=h, max_step=h, first_step=h))
        errs.append(abs(float(ys[-1, 0]) - np.exp(-2)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.5, (rate, errs)


def test_stiff_step_count_advantage():
    """On lambda = 1e4 stiffness, the L-stable ESDIRK takes ~100x fewer
    steps than dopri5 (whose step size is stability-limited to ~2.8/lambda
    regardless of accuracy) — the reason this tier exists."""
    lam = 1e4
    f = lambda t, y: -lam * (y - jnp.cos(t)) - jnp.sin(t)
    t = jnp.linspace(0., 2., 3)
    y0 = jnp.array([1.5])

    _, st_imp = tde.odeint_with_stats(f, y0, t, method='kvaerno5',
                                      rtol=1e-6, atol=1e-8)
    _, st_exp = tde.odeint_with_stats(f, y0, t, method='dopri5',
                                      rtol=1e-6, atol=1e-8)
    assert int(st_imp.error_code) == 0
    assert int(st_imp.n_steps) * 50 < int(st_exp.n_steps), \
        (int(st_imp.n_steps), int(st_exp.n_steps))

    ys, _ = tde.odeint_with_stats(f, y0, t, method='kvaerno5',
                                  rtol=1e-6, atol=1e-8)
    exact = np.cos(np.asarray(t)) + 0.5 * np.exp(-lam * np.asarray(t))
    assert float(np.max(np.abs(np.asarray(ys[:, 0]) - exact))) < 1e-3


def test_van_der_pol():
    """Stiff van der Pol (mu=100) over one excursion: solves cleanly at a
    modest step count where dopri5 needs orders of magnitude more."""
    mu = 100.0

    def f(t, y):
        return jnp.stack([y[1], mu * ((1 - y[0] ** 2) * y[1]) - y[0]])

    t = jnp.linspace(0., 100.0, 5)
    y0 = jnp.array([2.0, 0.0])
    ys, st = tde.odeint_with_stats(f, y0, t, method='kvaerno5',
                                   rtol=1e-6, atol=1e-8)
    assert int(st.error_code) == 0
    assert bool(jnp.all(jnp.isfinite(ys)))
    # the limit cycle keeps |y0| <= ~2.01
    assert float(jnp.max(jnp.abs(ys[:, 0]))) < 2.5


@pytest.mark.parametrize('method', STIFF_METHODS)
def test_adjoint_gradients(method):
    """Continuous-adjoint gradients (the backward solve reuses the same
    ESDIRK method on the augmented dynamics) match the closed form."""
    f = lambda t, y: -y
    t = jnp.linspace(0., 2., 3)

    def loss(y0_):
        return jnp.sum(tde.odeint(f, y0_, t, method=method,
                                  rtol=1e-8, atol=1e-10)[-1])

    g = float(jax.grad(loss)(jnp.array([1.0]))[0])
    np.testing.assert_allclose(g, np.exp(-2), rtol=1e-5)


def test_replay_gradients_and_jvp():
    """Replay-mode exact discrete gradients work for implicit steppers: the
    lax.custom_root stage solves are IFT-differentiable in BOTH modes."""
    f = lambda t, y: -y
    t = jnp.linspace(0., 2., 3)
    y0 = jnp.array([1.0])
    opts = dict(replay_grad=True, max_segments=256)

    def loss(y0_):
        return jnp.sum(tde.odeint(f, y0_, t, method='kvaerno3',
                                  rtol=1e-6, atol=1e-8, options=opts)[-1])

    g = float(jax.grad(loss)(y0)[0])
    np.testing.assert_allclose(g, np.exp(-2), rtol=1e-4)

    solve = lambda y: tde.odeint(f, y, t, method='kvaerno3', rtol=1e-6,
                                 atol=1e-8, options=opts)[-1]
    _, tangent = jax.jvp(solve, (y0,), (jnp.ones(1),))
    np.testing.assert_allclose(float(tangent[0]), np.exp(-2), rtol=1e-4)


@pytest.mark.parametrize('method', ['kvaerno3', 'radau5a'])
def test_event_solve(method):
    f = lambda t, y: -y
    et, _ = tde.odeint_event(f, jnp.array([1.0]), jnp.array(0.0),
                             event_fn=lambda t, y: y[0] - 0.5,
                             method=method, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(float(et), np.log(2), rtol=1e-7)


def test_radau5a_stiff_advantage_and_accuracy():
    """Adaptive Radau IIA 5(3): L-stable 5th-order collocation under the
    adaptive controller — the RADAU5 benchmark standard (Hairer & Wanner
    IV.8).  On lambda=1e4 stiffness it needs ~100x fewer steps than
    dopri5, whose step size is stability-limited."""
    lam = 1e4
    f = lambda t, y: -lam * (y - jnp.cos(t)) - jnp.sin(t)
    t = jnp.linspace(0., 2., 3)
    y0 = jnp.array([1.5])

    ys, st = tde.odeint_with_stats(f, y0, t, method='radau5a',
                                   rtol=1e-6, atol=1e-8)
    assert int(st.error_code) == 0
    _, st_exp = tde.odeint_with_stats(f, y0, t, method='dopri5',
                                      rtol=1e-6, atol=1e-8)
    assert int(st.n_steps) * 50 < int(st_exp.n_steps), \
        (int(st.n_steps), int(st_exp.n_steps))

    exact = np.cos(np.asarray(t)) + 0.5 * np.exp(-lam * np.asarray(t))
    assert float(np.max(np.abs(np.asarray(ys[:, 0]) - exact))) < 1e-5


def test_param_gradients_closure():
    """Closure-converted parameter gradients through the stiff adjoint."""
    t = jnp.linspace(0., 1., 3)

    def loss(a):
        f = lambda tt, yy: -a * yy
        return jnp.sum(tde.odeint(f, jnp.ones((1,)), t, method='kvaerno5',
                                  rtol=1e-8, atol=1e-10)[-1])

    a0 = 1.3
    g = float(jax.grad(loss)(a0))
    np.testing.assert_allclose(g, -np.exp(-a0), rtol=1e-5)


def test_nonconvergence_rejects_not_errors():
    """A hard nonlinear problem at a huge first step: the Newton stage
    solve fails, the step is rejected via the inflated error estimate, and
    the controller recovers (no NaNs, error_code 0)."""
    f = lambda t, y: -jnp.exp(2.0 * y) + 1.0
    t = jnp.linspace(0., 1., 2)
    ys, st = tde.odeint_with_stats(f, jnp.array([2.0]), t, method='kvaerno3',
                                   rtol=1e-6, atol=1e-8,
                                   options=dict(first_step=1.0))
    assert int(st.error_code) == 0
    assert bool(jnp.all(jnp.isfinite(ys)))


def test_jump_t_stiff():
    """step truncation + discontinuity handling under the implicit tier."""
    f = lambda t, y: jnp.where(t < 0.5, -y, -3.0 * y)
    t = jnp.linspace(0., 1., 3)
    ys = tde.odeint(f, jnp.array([1.0]), t, method='kvaerno3',
                    rtol=1e-8, atol=1e-10,
                    options=dict(jump_t=jnp.array([0.5])))
    exact = np.exp(-0.5) * np.exp(-3.0 * 0.5)
    np.testing.assert_allclose(float(ys[-1, 0]), exact, rtol=1e-6)
