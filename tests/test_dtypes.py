"""Dtype-coverage tests: complex state (reference handles complex via real
time casting, misc.py:188-190) and bfloat16 state (TPU-native)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdiffeq_tpu as tde

W = 2.0


def f_rot(t, y):
    return 1j * W * y


def test_complex_adaptive():
    y0 = jnp.array([1.0 + 0j], dtype=jnp.complex128)
    t = jnp.linspace(0., 1., 5)
    ys = tde.odeint(f_rot, y0, t, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(ys[:, 0]),
                               np.exp(1j * W * np.asarray(t)), rtol=1e-7)


def test_complex_fixed():
    y0 = jnp.array([1.0 + 0j], dtype=jnp.complex128)
    t = jnp.linspace(0., 1., 5)
    ys = tde.odeint(f_rot, y0, t, method='rk4', options=dict(step_size=0.01))
    np.testing.assert_allclose(np.asarray(ys[:, 0]),
                               np.exp(1j * W * np.asarray(t)), rtol=1e-6)


def test_complex_gradient():
    y0 = jnp.array([1.0 + 0j], dtype=jnp.complex128)
    t = jnp.linspace(0., 1., 3)

    def loss(y0_):
        ys = tde.odeint(f_rot, y0_, t, rtol=1e-10, atol=1e-12)
        return jnp.sum(jnp.abs(ys[-1]) ** 2)

    g = jax.grad(loss)(y0)
    # |y(1)|^2 = |y0|^2 for a rotation: d/dy0* = y0 -> grad = 2*Re part conv.
    np.testing.assert_allclose(np.asarray(g), np.array([2.0 + 0j]),
                               atol=1e-6)


def test_complex_event():
    y0 = jnp.array([1.0 + 0j], dtype=jnp.complex128)
    ev_t, _ = tde.odeint_event(f_rot, y0, jnp.array(0.0),
                               event_fn=lambda t, y: jnp.real(y[0]),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(float(ev_t), np.pi / 4, atol=1e-7)


def test_bfloat16_state():
    f = lambda t, y: -y
    y0 = jnp.array([1.0], dtype=jnp.bfloat16)
    t = jnp.linspace(0., 1., 3, dtype=jnp.float32)
    ys = tde.odeint(f, y0, t, rtol=1e-2, atol=1e-2)
    assert ys.dtype == jnp.bfloat16
    assert abs(float(ys[-1, 0]) - np.exp(-1)) < 0.02


def test_float32_state_f64_time():
    """The mixed-precision contract: f32 state, f64 timelike (reference
    rk_common.py:180-195)."""
    f = lambda t, y: -y
    y0 = jnp.array([1.0], dtype=jnp.float32)
    t = jnp.linspace(0., 1., 3)  # f64 under x64
    ys = tde.odeint(f, y0, t)
    assert ys.dtype == jnp.float32
    np.testing.assert_allclose(float(ys[-1, 0]), np.exp(-1), rtol=1e-5)


@pytest.mark.parametrize('method', ['implicit_euler', 'trapezoid', 'sdirk2',
                                    'gl4', 'kvaerno3'])
def test_complex_state_implicit_methods(method):
    """Implicit solvers on complex state: stage solves run on the stacked
    real view (jacfwd/Broyden need real arithmetic), packing outside the
    custom_vjp/custom_root so complex autodiff conventions hold."""
    f = lambda t, y: 1j * y
    y0 = jnp.array([1.0 + 0.0j], jnp.complex128)
    t = jnp.linspace(0., 1., 3)
    kwargs = ({} if method == 'kvaerno3'
              else dict(options=dict(num_steps=64)))
    ys = tde.odeint(f, y0, t, method=method, **kwargs)
    assert abs(complex(ys[-1, 0]) - np.exp(1j)) < 1e-2

    # gradients: |y(t)| is conserved, so d|y(T)|^2/d(Re y0) = 2 Re y0
    def loss(y0_):
        ys_ = tde.odeint(f, y0_, t, method=method, **kwargs)
        return jnp.sum(jnp.abs(ys_[-1]) ** 2)

    g = jax.grad(loss)(y0)
    # backward Euler is dissipative (|y1| = |y0|/|1 - ih|), so its exact
    # discrete gradient sits ~(1+h^2)^-N below 2; higher-order methods
    # conserve |y| to their order
    tol = 5e-2 if method == 'implicit_euler' else 1e-2
    assert abs(complex(g[0]) - 2.0) < tol, g
