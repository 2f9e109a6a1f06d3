"""Event-handling tests, mirroring reference tests/event_tests.py:

* event solve hits a known crossing state/time for all methods (fixed
  methods with step_size=0.01 and interp='cubic', :14-49)
* adjoint event backward runs (:51-64)
* plus IFT event-time gradient checks against closed form (modelled on
  examples/bouncing_ball.py:103-151's finite-difference protocol).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdiffeq_tpu as tde
from problems import ADAPTIVE_METHODS, FIXED_METHODS

# sin(t) crossing zero at pi: y = (sin t, cos t) with y0 at t0=0
# event: y[0] (= sin t) crosses 0 going negative at t = pi.


def f_circle(t, y):
    return jnp.stack([y[1], -y[0]])


EVENT_METHODS = [m for m in ADAPTIVE_METHODS + FIXED_METHODS
                 if m not in ('explicit_adams', 'implicit_adams')] \
    + ['explicit_adams', 'implicit_adams']


@pytest.mark.parametrize('method', EVENT_METHODS)
def test_event_known_crossing(method):
    y0 = jnp.array([np.sin(0.5), np.cos(0.5)])  # y(t) = (sin t, cos t)
    t0 = jnp.array(0.5)

    def event_fn(t, y):
        return y[0]  # sin(t): transversal zero crossing at t = pi

    kwargs = {}
    if method not in ADAPTIVE_METHODS:
        opts = dict(step_size=0.01, interp='cubic')
        if method in ('explicit_adams', 'implicit_adams'):
            # order-12 AB is unstable on the circle at h=0.01 — verified
            # identical blow-up in the reference implementation.
            opts['max_order'] = 6
        kwargs = dict(options=opts)

    event_t, solution = tde.odeint_event(
        f_circle, y0, t0, event_fn=event_fn, method=method,
        rtol=1e-8, atol=1e-10, **kwargs)

    # first-order methods carry O(h) global error into both time and state
    tol = 2e-2 if method in ('euler', 'implicit_euler') else 2e-4
    assert abs(float(event_t) - np.pi) < tol, method
    np.testing.assert_allclose(np.asarray(solution[-1]),
                               np.array([0.0, -1.0]), atol=tol)


def test_event_reverse_time():
    y0 = jnp.array([1.0])   # dy/dt = -y backwards from t0=0: y(t)=e^{-t}
    t0 = jnp.array(0.0)

    def f(t, y):
        return -y

    def event_fn(t, y):
        return y[0] - 2.0   # going backward, y grows: hits 2 at t = -ln 2

    event_t, solution = tde.odeint_event(f, y0, t0, event_fn=event_fn,
                                         reverse_time=True,
                                         rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(event_t), -np.log(2.0), atol=1e-6)
    np.testing.assert_allclose(float(solution[-1, 0]), 2.0, atol=1e-6)


def test_event_time_gradient_ift():
    """d(event_t)/dy0 via the IFT reroute matches the closed form.
    For dy/dt = -y, event y == c:  t* = ln(y0/c), dt*/dy0 = 1/y0."""
    f = lambda t, y: -y

    def event_fn(t, y):
        return y[0] - 0.5

    def event_time(y0):
        ev_t, _ = tde.odeint_event(f, y0, jnp.array(0.0), event_fn=event_fn,
                                   rtol=1e-10, atol=1e-12)
        return ev_t

    y0 = jnp.array([1.3])
    g = jax.grad(event_time)(y0)
    np.testing.assert_allclose(float(g[0]), 1 / 1.3, rtol=1e-6)


def test_event_param_gradient_through_state():
    """Gradients through the event *state* splice: loss on y(t*) flows to
    y0 (reference odeint_event splices a differentiable final state,
    odeint.py:188-192)."""
    f = lambda t, y: -y

    def event_fn(t, y):
        return y[0] - 0.5

    def loss(y0):
        ev_t, sol = tde.odeint_event(f, y0, jnp.array(0.0),
                                     event_fn=event_fn,
                                     rtol=1e-10, atol=1e-12)
        # y(t*) == 0.5 independent of y0 => sol[-1,0] grad ~ 0 wrt y0; use
        # sum over both rows so y0-row contributes exactly 1.
        return jnp.sum(sol)

    g = jax.grad(loss)(jnp.array([1.3]))
    np.testing.assert_allclose(float(g[0]), 1.0, atol=1e-5)


def test_adjoint_event_backward():
    """odeint_event through odeint_adjoint: backward runs and matches the
    closed-form dt*/dy0 (reference event_tests.py:51-64 only checks it
    runs)."""
    f = lambda t, y: -y

    def event_fn(t, y):
        return y[0] - 0.5

    def event_time(y0):
        ev_t, sol = tde.odeint_event(f, y0, jnp.array(0.0),
                                     event_fn=event_fn,
                                     odeint_interface=tde.odeint_adjoint,
                                     rtol=1e-10, atol=1e-12)
        return ev_t + jnp.sum(sol[-1])

    y0 = jnp.array([1.3])
    g = jax.grad(event_time)(y0)
    np.testing.assert_allclose(float(g[0]), 1 / 1.3, rtol=1e-5)


def test_multi_output_event():
    """Multi-output event functions are sign-normalised and min-combined
    (reference event_handling.py:23-35)."""
    f = lambda t, y: jnp.ones_like(y)
    y0 = jnp.array([0.0])

    def event_fn(t, y):
        # two events: y == 1 (hits at t=1) and y == 3 (hits at t=3)
        return jnp.stack([y[0] - 1.0, y[0] - 3.0])

    event_t, _ = tde.odeint_event(f, y0, jnp.array(0.0), event_fn=event_fn,
                                  rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(event_t), 1.0, atol=1e-6)


def test_event_at_start():
    """Event already zero at t0 returns immediately."""
    f = lambda t, y: jnp.ones_like(y)

    def event_fn(t, y):
        return y[0]

    event_t, sol = tde.odeint_event(f, jnp.array([0.0]), jnp.array(2.0),
                                    event_fn=event_fn)
    np.testing.assert_allclose(float(event_t), 2.0)


def test_replay_flag_does_not_break_ift_on_adjoint_interface():
    """replay_grad with an interface/method the replay path does NOT
    handle must still apply the IFT event-time gradient reroute (the
    early-return previously skipped it, silently zeroing grads)."""
    f = lambda t, y: -y

    def event_time(y0_):
        ev_t, _ = tde.odeint_event(
            f, y0_, jnp.asarray(0.0), event_fn=lambda t, y: y[0] - 0.5,
            odeint_interface=tde.odeint_adjoint,
            options=dict(replay_grad=True))
        return ev_t

    y0 = jnp.array([1.0])
    g = jax.grad(event_time)(y0)
    # t* = ln(y0 / 0.5) => dt*/dy0 = 1/y0 = 1
    np.testing.assert_allclose(float(g[0]), 1.0, rtol=1e-5)
