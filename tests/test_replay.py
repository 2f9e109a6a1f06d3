"""Replay-mode gradient tests: exact discretise-then-optimise gradients for
adaptive solvers, plus forward-mode (jvp) through an adaptive solve —
capabilities the continuous-adjoint path cannot offer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdiffeq_tpu as tde
from problems import construct_problem

REPLAY = dict(replay_grad=True, max_segments=256)
# low-order methods need thousands of steps at tight tolerances
REPLAY_BIG = dict(replay_grad=True, max_segments=4096)


@pytest.mark.parametrize('method', ['dopri5', 'bosh3', 'adaptive_heun',
                                    'tsit5'])
def test_replay_matches_forward(method):
    f, y0, t_points, sol = construct_problem(ode='sine')
    # low-order methods take O(10^4) steps at the default 1e-7 tolerance
    tol = dict(rtol=1e-5, atol=1e-7) if method == 'adaptive_heun' else {}
    ys_plain = tde.odeint(f, y0, t_points, method=method, **tol)
    ys_replay = tde.odeint(f, y0, t_points, method=method,
                           options=REPLAY_BIG, **tol)
    np.testing.assert_allclose(np.asarray(ys_replay), np.asarray(ys_plain),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize('method', ['dopri5', 'bosh3', 'adaptive_heun'])
def test_replay_exact_discrete_gradients(method):
    """Replay gradients are the exact derivative of the discrete solver map
    (step boundaries held fixed): FD through the replay with *frozen*
    recorded boundaries matches autodiff to near machine precision — even
    for low-order methods, where the continuous adjoint plateaus ~1e-3
    (see test_gradients).  (FD through the full adaptive solve would
    re-record a different step sequence per perturbation.)"""
    from torchdiffeq_tpu.misc import check_inputs
    from torchdiffeq_tpu.solvers import SOLVERS, replay
    from torchdiffeq_tpu.odeint import _adaptive_config

    f, y0, t_points, sol = construct_problem(ode='linear', npts=3)
    w = jnp.arange(1.0, 1.0 + y0.shape[0])
    S = 8192 if method == 'adaptive_heun' else 512

    prob = check_inputs(f, y0, t_points, 1e-6, 1e-8, method, None, None,
                        SOLVERS)
    cfg = _adaptive_config(prob, SOLVERS[method]['tableau'])
    times, count, stats = replay.record_segments(prob.func, prob.y0, prob.t,
                                                 cfg, S)
    assert int(stats.error_code) == 0

    def loss(y0_flat):
        ys = replay.replay_integrate(prob.func, y0_flat, prob.t, cfg,
                                     times, count)
        return jnp.sum(ys[-1] * w)

    g = np.asarray(jax.grad(loss)(prob.y0))
    eps = 1e-7
    g_fd = np.zeros_like(g)
    y0n = np.asarray(prob.y0)
    for i in range(y0n.size):
        hi = y0n.copy(); hi[i] += eps
        lo = y0n.copy(); lo[i] -= eps
        g_fd[i] = (float(loss(jnp.asarray(hi)))
                   - float(loss(jnp.asarray(lo)))) / (2 * eps)
    np.testing.assert_allclose(g, g_fd, rtol=5e-6, atol=1e-8,
                               err_msg=method)


def test_replay_forward_mode():
    """jax.jvp through an adaptive solve (impossible with custom_vjp)."""
    f = lambda t, y: -y
    t = jnp.linspace(0., 2., 4)
    y0 = jnp.array([1.0])

    def solve(y0_):
        return tde.odeint(f, y0_, t, options=REPLAY)[-1]

    primal, tangent = jax.jvp(solve, (y0,), (jnp.ones(1),))
    np.testing.assert_allclose(float(primal[0]), np.exp(-2), rtol=1e-7)
    np.testing.assert_allclose(float(tangent[0]), np.exp(-2), rtol=1e-6)


def test_replay_second_order():
    """Hessian through an adaptive solve."""
    f = lambda t, y: -y ** 2
    t = jnp.linspace(0., 1., 2)

    def last(y0_):
        return tde.odeint(f, y0_[None], t, options=REPLAY)[-1, 0]

    # y(1) = y0 / (1 + y0); d2/dy0^2 = -2/(1+y0)^3
    y0 = jnp.asarray(0.5)
    h = jax.grad(jax.grad(last))(y0)
    np.testing.assert_allclose(float(h), -2 / 1.5 ** 3, rtol=1e-5)


def test_replay_param_gradients():
    A = jnp.array([[-0.4]])

    def loss(A_):
        f = lambda t, y: y @ A_
        ys = tde.odeint(f, jnp.ones((1,)), jnp.linspace(0., 2., 3),
                        options=REPLAY)
        return jnp.sum(ys[-1])

    g = jax.grad(loss)(A)
    np.testing.assert_allclose(float(g[0, 0]), 2 * np.exp(-0.8), rtol=1e-6)


def test_replay_overflow_flags_error():
    f = lambda t, y: -y
    ys, stats = tde.odeint_with_stats(
        f, jnp.ones((1,)), jnp.linspace(0., 50., 3),
        options=dict(replay_grad=True, max_segments=2))
    assert int(stats.error_code) != 0
    assert bool(jnp.isnan(ys[-1, 0]))


def test_replay_auto_segments_probe():
    """max_segments omitted: a concrete probe sizes the capacity exactly
    (doubling past the 512 default if needed) and the result matches the
    plain forward solve bit-for-bit."""
    f = lambda t, y: -y
    y0 = jnp.array([1.0, 2.0])
    t = jnp.linspace(0., 2., 5)
    ys_plain = tde.odeint(f, y0, t, rtol=1e-8, atol=1e-10)
    ys_auto = tde.odeint(f, y0, t, rtol=1e-8, atol=1e-10,
                         options=dict(replay_grad=True))
    # (jit-vs-eager fusion differences allow last-ulp deviations)
    np.testing.assert_allclose(np.asarray(ys_auto), np.asarray(ys_plain),
                               rtol=1e-13, atol=1e-15)
    # > 512 accepted steps: the probe must double its capacity
    g = lambda t, y: -60.0 * y  # stiff-ish: many small steps at 1e-9
    ys_a = tde.odeint(g, y0, jnp.linspace(0., 4., 3), rtol=1e-9, atol=1e-11,
                      method='bosh3', options=dict(replay_grad=True))
    ys_p = tde.odeint(g, y0, jnp.linspace(0., 4., 3), rtol=1e-9, atol=1e-11,
                      method='bosh3')
    np.testing.assert_allclose(np.asarray(ys_a), np.asarray(ys_p),
                               rtol=1e-13, atol=1e-15)


def test_replay_auto_segments_traced_fallback():
    """Inside jit the probe is impossible: the fixed default capacity is
    used and the solve still matches (within capacity)."""
    f = lambda t, y: -y
    y0 = jnp.array([1.0])
    t = jnp.linspace(0., 2., 3)
    run = jax.jit(lambda y0_: tde.odeint(f, y0_, t, rtol=1e-7, atol=1e-9,
                                         options=dict(replay_grad=True)))
    ys = run(y0)
    ys_plain = tde.odeint(f, y0, t, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_plain),
                               rtol=1e-12, atol=1e-14)


def test_replay_step_t_jump_t_forward_parity():
    """step_t/jump_t replay reproduces the main driver's solution exactly
    (reference truncation semantics, rk_common.py:293-311)."""
    y0 = jnp.array([1.0, 2.0])
    t = jnp.linspace(0., 2., 5)
    opts = dict(step_t=jnp.array([0.33]), jump_t=jnp.array([0.77]))
    g = lambda tt, yy: jnp.where(tt < 0.77, -yy, -2.0 * yy)
    ys_p = tde.odeint(g, y0, t, rtol=1e-8, atol=1e-10, options=opts)
    ys_r = tde.odeint(g, y0, t, rtol=1e-8, atol=1e-10,
                      options=dict(replay_grad=True, **opts))
    np.testing.assert_allclose(np.asarray(ys_r), np.asarray(ys_p),
                               rtol=1e-12, atol=1e-14)


def test_replay_jump_t_gradients():
    """Exact discrete gradients through a jump_t discontinuity (the main
    driver's FSAL jump re-evaluation is mirrored in the replay scan)."""
    y0 = jnp.array([1.0, 2.0])
    t = jnp.linspace(0., 2., 5)

    def loss(a):
        h = lambda tt, yy: jnp.where(tt < 0.77, -a * yy, -2 * a * yy)
        ys = tde.odeint(h, y0, t, rtol=1e-8, atol=1e-10,
                        options=dict(replay_grad=True,
                                     jump_t=jnp.array([0.77])))
        return jnp.sum(ys[-1])

    g = float(jax.grad(loss)(0.5))
    eps = 1e-6
    g_fd = (float(loss(0.5 + eps)) - float(loss(0.5 - eps))) / (2 * eps)
    np.testing.assert_allclose(g, g_fd, rtol=1e-5)


def test_replay_event_solve():
    """Replay event solve: the event time is differentiable with exact
    discrete gradients (no IFT regulariser — cf. events.py's 1e-12)."""

    def ev_time(a):
        h = lambda tt, yy: -a * yy
        event = lambda tt, yy: yy[0] - 0.5
        et, ys = tde.odeint_event(h, jnp.array([1.0]), jnp.array(0.0),
                                  event_fn=event, rtol=1e-10, atol=1e-12,
                                  options=dict(replay_grad=True))
        return et

    a0 = 0.7
    et = float(ev_time(a0))
    np.testing.assert_allclose(et, np.log(2) / a0, rtol=1e-8)
    g = float(jax.grad(ev_time)(a0))
    np.testing.assert_allclose(g, -np.log(2) / a0 ** 2, rtol=1e-6)


def test_replay_event_state_gradient():
    """Gradient of the event-time *state* includes the event-time motion
    (total derivative), matching finite differences."""

    def ev_y1(a):
        # 2-D: event on y[0], observe y[1] at the event
        h = lambda tt, yy: jnp.array([-a * yy[0], -0.3 * yy[1]])
        event = lambda tt, yy: yy[0] - 0.5
        et, ys = tde.odeint_event(h, jnp.array([1.0, 1.0]), jnp.array(0.0),
                                  event_fn=event, rtol=1e-10, atol=1e-12,
                                  options=dict(replay_grad=True))
        return ys[-1, 1]

    a0 = 0.7
    g = float(jax.grad(ev_y1)(a0))
    eps = 1e-6
    g_fd = (float(ev_y1(a0 + eps)) - float(ev_y1(a0 - eps))) / (2 * eps)
    np.testing.assert_allclose(g, g_fd, rtol=1e-4)
