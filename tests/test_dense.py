"""`odeint_dense` / DenseSolution tests.

The reference only exposes dopri5 dense output with no derivative or event
helpers (odeint.py:111-157); the extensions (any adaptive method,
``derivative``, ``find_event``, pytree state, jit-returnable pytree
solution) are exercised here.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdiffeq_tpu as tde


def exp_problem():
    f = lambda t, y: -y
    y0 = jnp.array([1.0])
    return f, y0


# interpolant accuracy between nodes degrades with method order: the quartic
# fit is built from the method's own y_mid estimate, so low-order methods
# (bosh3) carry larger interior/derivative error at matched tolerances.
@pytest.mark.parametrize("method,vtol,dtol", [
    ("dopri5", 1e-6, 1e-4),
    ("tsit5", 1e-6, 1e-4),
    # dopri8 takes very large steps at this tolerance, so the 4th-order
    # interpolant (not the solution) limits interior accuracy — same
    # trade-off as the reference's output interpolation.
    ("dopri8", 1e-4, 1e-2),
    ("bosh3", 1e-4, 1e-2),
    ("kvaerno3", 1e-4, 1e-2),
])
def test_dense_value_and_derivative(method, vtol, dtol):
    f, y0 = exp_problem()
    sol = tde.odeint_dense(f, y0, 0., 2., method=method)
    tq = jnp.array([0.3, 1.1, 1.9])
    yv = np.asarray(sol(tq))[:, 0]
    np.testing.assert_allclose(yv, np.exp(-np.asarray(tq)), atol=vtol)
    dv = np.asarray(sol.derivative(tq))[:, 0]
    np.testing.assert_allclose(dv, -np.exp(-np.asarray(tq)), atol=dtol)


def test_dense_honors_jump_t():
    """Regression: the dense loop used to drop user step_t/jump_t, so a
    discontinuous field was integrated straight through the jump."""
    f = lambda t, y: jnp.where(t < 0.5, -y, -3.0 * y)
    sol = tde.odeint_dense(f, jnp.array([1.0]), 0.0, 1.0,
                           rtol=1e-9, atol=1e-11,
                           options=dict(jump_t=jnp.array([0.5])))
    for tv in (0.25, 0.5, 0.75, 1.0):
        exact = (np.exp(-tv) if tv <= 0.5
                 else np.exp(-0.5) * np.exp(-3 * (tv - 0.5)))
        assert abs(float(sol(tv)[0]) - exact) < 1e-8, tv


def test_dense_non_adaptive_method_raises():
    f, y0 = exp_problem()
    with pytest.raises(ValueError, match="adaptive"):
        tde.odeint_dense(f, y0, 0., 2., method="rk4")


def test_dense_find_event():
    f, y0 = exp_problem()
    sol = tde.odeint_dense(f, y0, 0., 2.)
    ev_t, y_ev = sol.find_event(lambda t, y: y[0] - 0.5)
    assert abs(float(ev_t) - np.log(2.)) < 1e-5
    assert abs(float(y_ev[0]) - 0.5) < 1e-5
    # matches a full odeint_event re-solve
    ev_ref, _ = tde.odeint_event(f, y0, jnp.array(0.),
                                 event_fn=lambda t, y: y[0] - 0.5)
    assert abs(float(ev_t) - float(ev_ref)) < 1e-5


def test_dense_find_event_no_crossing_is_nan():
    f, y0 = exp_problem()
    sol = tde.odeint_dense(f, y0, 0., 2.)
    ev_t, _ = sol.find_event(lambda t, y: y[0] + 1.0)
    assert np.isnan(float(ev_t))


def test_dense_reverse_time():
    f, y0 = exp_problem()
    sol = tde.odeint_dense(f, y0, 2., 0.)     # y(t) = exp(2 - t)
    tq = jnp.array([1.5, 0.5])
    np.testing.assert_allclose(np.asarray(sol(tq))[:, 0],
                               np.exp(2. - np.asarray(tq)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol.derivative(tq))[:, 0],
                               -np.exp(2. - np.asarray(tq)), atol=1e-4)
    ev_t, _ = sol.find_event(lambda t, y: y[0] - 3.0)
    assert abs(float(ev_t) - (2. - np.log(3.))) < 1e-5


def test_dense_pytree_state():
    f = lambda t, y: (-y[0], 0.5 * y[1])
    y0 = (jnp.array([1.0]), jnp.array([2.0]))
    sol = tde.odeint_dense(f, y0, 0., 1.)
    a, b = sol(jnp.array(0.5))
    assert abs(float(a[0]) - np.exp(-0.5)) < 1e-6
    assert abs(float(b[0]) - 2 * np.exp(0.25)) < 1e-6
    da, db = sol.derivative(jnp.array(0.5))
    assert abs(float(da[0]) + np.exp(-0.5)) < 1e-4
    assert abs(float(db[0]) - np.exp(0.25)) < 1e-4


def test_dense_returnable_from_jit():
    f, y0 = exp_problem()

    @jax.jit
    def solve(y0_):
        return tde.odeint_dense(f, y0_, 0., 2.)

    sol = solve(y0)
    assert abs(float(sol(jnp.array(1.0))[0]) - np.exp(-1.)) < 1e-6


def test_dense_find_event_multi_output():
    """Multi-output event fns are sign-combined like odeint_event
    (events.py:46-56); time-dependent event fns never see the inf
    padding boundaries."""
    f, y0 = exp_problem()
    sol = tde.odeint_dense(f, y0, 0., 2.)
    # two outputs: y - 0.5 crosses at ln 2; y - 10 never crosses
    ev_t, y_ev = sol.find_event(
        lambda t, y: jnp.stack([y[0] - 0.5, y[0] - 10.0]))
    assert abs(float(ev_t) - np.log(2.)) < 1e-5
    # time-dependent event fn (would NaN at the inf-filled padding)
    ev_t2, _ = sol.find_event(lambda t, y: jnp.sin(t) - y[0])
    # root of sin(t) = exp(-t): t ~ 0.5885327
    assert abs(float(ev_t2) - 0.5885327) < 1e-4


def test_dense_find_event_zero_segment_solve():
    """A solve whose first step already fails (count == 0) returns NaN
    from find_event immediately — the bisection bracket uses the clamped
    padding times, not the inf fill (which made the iteration count
    undefined)."""
    f = lambda t, y: y * y          # blow-up; huge y0 -> nonfinite fast
    y0 = jnp.array([1e30])
    sol = tde.odeint_dense(f, y0, 0., 1.)
    assert int(sol.error_code) != 0
    ev_t, _ = sol.find_event(lambda t, y: y[0] - 0.5)
    assert np.isnan(float(ev_t))
