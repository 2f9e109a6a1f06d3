"""Norm-contract tests, mirroring reference tests/norm_tests.py:

* the user norm's input shape contract: original-shaped state for array
  state, tuple of leaves for container state (:43-89)
* the adjoint norm receives (t, y, adj_y, *adj_params) (:91-242)
* larger norm => more NFE (:244-270); seminorm => fewer NFE (:272-306)
"""
import jax
import jax.numpy as jnp
import numpy as np

import torchdiffeq_tpu as tde
from problems import construct_problem


def test_norm_receives_original_shape():
    shapes = []

    def norm(x):
        shapes.append(jnp.shape(x))
        return jnp.sqrt(jnp.mean(jnp.abs(x) ** 2))

    f = lambda t, y: -y
    y0 = jnp.ones((2, 3))
    with jax.disable_jit():
        tde.odeint(f, y0, jnp.linspace(0., 1., 2), method='dopri5',
                   options=dict(norm=norm))
    assert len(shapes) > 0
    assert all(s == (2, 3) for s in shapes)


def test_norm_receives_tuple():
    structures = []

    def norm(x):
        structures.append(jax.tree_util.tree_structure(x))
        return jnp.max(jnp.stack([jnp.sqrt(jnp.mean(jnp.abs(l) ** 2))
                                  for l in jax.tree_util.tree_leaves(x)]))

    def f(t, y):
        return (-y[0], 2.0 * y[1])

    y0 = (jnp.ones((2,)), jnp.ones((1,)))
    with jax.disable_jit():
        tde.odeint(f, y0, jnp.linspace(0., 1., 2), method='dopri5',
                   options=dict(norm=norm))
    expected = jax.tree_util.tree_structure(y0)
    assert len(structures) > 0
    assert all(s == expected for s in structures)


def test_adjoint_norm_contract():
    """The default adjoint norm sees (t, y, adj_y, *adj_params); a custom
    adjoint norm receives that tuple (reference norm_tests.py:91-242)."""
    seen = []

    def adjoint_norm(x):
        seen.append(len(x))
        return jnp.max(jnp.stack([jnp.max(jnp.abs(jnp.atleast_1d(l)))
                                  for l in x]))

    A = jnp.array([[-0.5]])

    def loss(A_):
        f = lambda t, y: y @ A_
        with jax.disable_jit():
            ys = tde.odeint_adjoint(f, jnp.ones((1,)),
                                    jnp.linspace(0., 1., 3),
                                    adjoint_options=dict(norm=adjoint_norm))
        return jnp.sum(ys[-1])

    jax.grad(loss)(A)
    assert len(seen) > 0
    # (t, y, adj_y, A_grad) -> 4 components
    assert all(n == 4 for n in seen)


def test_larger_norm_more_nfe():
    """A norm that reports double the error forces smaller steps => at
    least as many NFE (reference norm_tests.py:244-270)."""
    f, y0, t_points, sol = construct_problem(ode='linear')

    def big_norm(x):
        return 10.0 * jnp.sqrt(jnp.mean(jnp.abs(x) ** 2))

    _, stats_plain = tde.odeint_with_stats(f, y0, t_points, method='dopri5')
    _, stats_big = tde.odeint_with_stats(f, y0, t_points, method='dopri5',
                                         options=dict(norm=big_norm))
    assert int(stats_big.nfe) >= int(stats_plain.nfe)


def test_seminorm_fewer_nfe():
    """The seminorm adjoint drops parameter state from error control =>
    at most as many backward VF calls (reference norm_tests.py:272-306,
    "Hey, that's not an ODE": Kidger et al. 2021).  Counted eagerly with a
    Python counter under jax.disable_jit()."""
    nfe = {}
    grads = {}
    A = jnp.array([[-0.3, 10.0], [-10.0, -0.3]])

    for key, adjoint_options in (('default', None),
                                 ('seminorm', dict(norm='seminorm'))):
        count = [0]

        def loss(A_):
            def f_(t, y):
                count[0] += 1
                return y @ A_
            ys = tde.odeint_adjoint(f_, jnp.ones((2,)),
                                    jnp.linspace(0., 5., 2),
                                    rtol=1e-6, atol=1e-8,
                                    adjoint_options=adjoint_options)
            return jnp.sum(ys[-1])

        with jax.disable_jit():
            grads[key] = np.asarray(jax.grad(loss)(A))
        nfe[key] = count[0]

    assert nfe['seminorm'] <= nfe['default'], nfe
    np.testing.assert_allclose(grads['seminorm'], grads['default'],
                               rtol=1e-3, atol=1e-5)
