"""Convergence-order property tests (an opportunity the reference lacks,
SURVEY.md §4): halving the step size must reduce the error by ~2^order."""
import jax.numpy as jnp
import numpy as np
import pytest

import torchdiffeq_tpu as tde

# y' = -y + sin(t), y(0) = 1; exact: y = (sin t - cos t)/2 + 1.5 e^{-t}
def f(t, y):
    return -y + jnp.sin(t) * jnp.ones_like(y)


def exact(t):
    return (np.sin(t) - np.cos(t)) / 2 + 1.5 * np.exp(-t)


ORDERS = {
    'euler': 1, 'midpoint': 2, 'heun2': 2, 'heun3': 3, 'rk4': 4,
    'implicit_euler': 1, 'implicit_midpoint': 2, 'trapezoid': 2,
    'radauIIA3': 3, 'gl4': 4, 'sdirk2': 2, 'trbdf2': 2,
}


@pytest.mark.parametrize('method,order', sorted(ORDERS.items()))
def test_convergence_order(method, order):
    y0 = jnp.array([1.0])
    t = jnp.array([0.0, 2.0])

    errs = []
    for h in (0.1, 0.05):
        ys = tde.odeint(f, y0, t, method=method,
                        options=dict(step_size=h))
        errs.append(abs(float(ys[-1, 0]) - exact(2.0)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.35, (method, errs, rate)
