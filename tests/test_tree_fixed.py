"""Tree-native fixed-grid tier: pytree state runs the explicit fixed-grid
driver without the ravel round-trip (fixed_grid.py module docstring).

Contracts:
- tuple/dict state solves are BIT-IDENTICAL per leaf to solving each
  component as a bare array (the tree driver applies the same per-leaf
  arithmetic; the reference's `_flat_to_shape` design cannot change
  per-element values either, misc.py:126-155);
- gradients (scan backprop and the fixed-step adjoint backward) work on
  tree state;
- the event path (gated raveled) and the raveled Adams/implicit tiers
  are unchanged.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdiffeq_tpu as tde
from torchdiffeq_tpu.solvers import tree_state_capable

FIXED_METHODS = ['euler', 'midpoint', 'rk4', 'heun2', 'heun3']

T5 = jnp.linspace(0.0, 2.0, 5)


def f_pair(t, y):
    return (-y[0], -2.0 * y[1])


Y0_PAIR = (jnp.array([1.0]), jnp.array([2.0]))


def test_tree_state_capable_gate():
    for m in FIXED_METHODS:
        assert tree_state_capable(m)
        assert not tree_state_capable(m, event=True)
    assert tree_state_capable('dopri5')
    assert tree_state_capable('dopri5', event=True)  # adaptive event driver is tree-native
    for m in ('fixed_adams', 'implicit_euler', 'gl4', 'scipy_solver'):
        assert not tree_state_capable(m)


@pytest.mark.parametrize('method', FIXED_METHODS)
def test_tuple_state_bit_identical_to_component_solves(method):
    opts = dict(step_size=0.01)
    ys_pair, stats = tde.odeint_with_stats(f_pair, Y0_PAIR, T5,
                                           method=method, options=opts)
    assert int(stats.error_code) == 0
    ys_a = tde.odeint(lambda t, y: -y, Y0_PAIR[0], T5, method=method,
                      options=opts)
    ys_b = tde.odeint(lambda t, y: -2.0 * y, Y0_PAIR[1], T5, method=method,
                      options=opts)
    assert jnp.array_equal(ys_pair[0], ys_a)
    assert jnp.array_equal(ys_pair[1], ys_b)


@pytest.mark.parametrize('interp', ['linear', 'cubic'])
def test_tuple_state_interp_accuracy(interp):
    ys = tde.odeint(f_pair, Y0_PAIR, T5, method='rk4',
                    options=dict(step_size=0.05, interp=interp))
    assert float(jnp.max(jnp.abs(ys[0][:, 0] - jnp.exp(-T5)))) < 1e-6
    assert float(jnp.max(jnp.abs(ys[1][:, 0] - 2 * jnp.exp(-2 * T5)))) < 1e-5


def test_dict_state_fixed_grid():
    f = lambda t, y: {'a': -y['a'], 'b': -2.0 * y['b']}
    y0 = {'a': jnp.array([1.0]), 'b': jnp.array([[2.0, 4.0]])}
    ys = tde.odeint(f, y0, T5, method='rk4', options=dict(step_size=0.05))
    assert ys['a'].shape == (5, 1) and ys['b'].shape == (5, 1, 2)
    assert float(jnp.abs(ys['a'][-1, 0] - np.exp(-2.0))) < 1e-6


def test_tuple_state_scan_backprop_gradient():
    def loss(y0a):
        ys = tde.odeint(f_pair, (y0a, Y0_PAIR[1]), T5, method='rk4',
                        options=dict(step_size=0.05))
        return jnp.sum(ys[0][-1])

    g = jax.grad(loss)(Y0_PAIR[0])
    assert abs(float(g[0]) - np.exp(-2.0)) < 1e-6


def test_tuple_state_fixed_adjoint_backward():
    # adjoint_method='rk4' sends the augmented 4-tuple through the
    # tree-native fixed-grid driver (the interval-by-interval sweep).
    def loss(y0a):
        ys = tde.odeint_adjoint(f_pair, (y0a, Y0_PAIR[1]), T5,
                                adjoint_method='rk4',
                                adjoint_options=dict(num_steps=50))
        return jnp.sum(ys[0][-1])

    g = jax.grad(loss)(Y0_PAIR[0])
    assert abs(float(g[0]) - np.exp(-2.0)) < 1e-3


def test_tuple_state_reverse_time_and_jit_traced_t():
    tr = jnp.linspace(2.0, 0.0, 5)
    y0 = (jnp.array([np.exp(-2.0)]), jnp.array([2 * np.exp(-4.0)]))
    ys = tde.odeint(f_pair, y0, tr, method='rk4',
                    options=dict(step_size=0.01))
    assert float(jnp.abs(ys[0][-1, 0] - 1.0)) < 1e-5

    jf = jax.jit(lambda tt: tde.odeint(f_pair, Y0_PAIR, tt, method='rk4',
                                       options=dict(num_steps=100))[0][-1])
    assert abs(float(jf(T5)[0]) - np.exp(-2.0)) < 1e-6


def test_complex_state_fixed_grid():
    f = lambda t, y: 1j * y
    ys = tde.odeint(f, jnp.array([1.0 + 0j]), T5, method='rk4',
                    options=dict(step_size=0.01))
    assert abs(complex(ys[-1, 0]) - np.exp(2j)) < 1e-8


def test_fixed_event_mode_still_raveled_and_correct():
    f = lambda t, y: -y
    ev_t, sol = tde.odeint_event(f, jnp.array([1.0]), jnp.array(0.0),
                                 event_fn=lambda t, y: y[0] - 0.5,
                                 method='rk4', options=dict(step_size=0.01))
    assert abs(float(ev_t) - np.log(2.0)) < 1e-4


def test_raveled_tiers_unchanged_on_tuple_state():
    # Adams and implicit tiers keep the raveled representation; tuple
    # state must still solve through them.
    for m in ('fixed_adams', 'implicit_euler'):
        opts = dict(step_size=0.05) if m == 'implicit_euler' else None
        ys = tde.odeint(f_pair, Y0_PAIR, T5, method=m, options=opts)
        assert float(jnp.abs(ys[0][-1, 0] - np.exp(-2.0))) < 1e-2


def test_grid_constructor_receives_tree_state():
    # In tree mode the user's grid_constructor sees the state in the
    # user's own structure (documented generalisation of the reference's
    # flat-tensor convention).
    seen = {}

    def gc(func, y0, t):
        seen['structure'] = jax.tree_util.tree_structure(y0)
        return jnp.linspace(t[0], t[-1], 41)

    ys = tde.odeint(f_pair, Y0_PAIR, T5, method='rk4',
                    options=dict(grid_constructor=gc))
    assert seen['structure'] == jax.tree_util.tree_structure(Y0_PAIR)
    assert float(jnp.abs(ys[0][-1, 0] - np.exp(-2.0))) < 1e-6
