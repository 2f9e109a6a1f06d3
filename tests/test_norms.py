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


def test_default_adjoint_norm_matrix():
    """The auto-constructed default adjoint norm equals
    max(|t|, ||y||, ||adj_y||, mixed(adj_params)) for array states of
    shapes (), (1,), (2,2) — verified behaviorally: a hand-written norm
    with that exact definition must reproduce the backward NFE of the
    default, across (no adjoint_options | {} | seminorm)
    (reference norm_tests.py:91-152's spy contract)."""
    t = jnp.linspace(0., 1., 2)
    p1 = jnp.linspace(0.1, 0.7, 7)
    p2 = jnp.asarray(0.5)

    for shape in ((), (1,), (2, 2)):
        y0 = jnp.full(shape, 1.0)

        def f(tt, yy, p1_, p2_):
            return yy * jnp.mean(p1_) * 0.0 - yy * p2_

        def count_nfe(adjoint_options):
            count = [0]

            def fc(tt, yy, p1_, p2_):
                count[0] += 1
                return f(tt, yy, p1_, p2_)

            def loss(p2_):
                ys = tde.odeint_adjoint(fc, y0, t, args=(p1, p2_),
                                        adjoint_options=adjoint_options)
                return jnp.sum(ys[-1])

            with jax.disable_jit():
                jax.grad(loss)(p2)
            return count[0]

        def rms(x):
            return jnp.sqrt(jnp.mean(jnp.abs(x) ** 2))

        def explicit_default(aug):
            # (t, y, adj_y, *adj_params) with y/adj_y in original shape
            vt, y, adj_y = aug[0], aug[1], aug[2]
            params = aug[3:]
            out = jnp.abs(vt)
            out = jnp.maximum(out, rms(y))
            out = jnp.maximum(out, rms(adj_y))
            for p in params:
                out = jnp.maximum(out, rms(jnp.atleast_1d(p)))
            return out

        def explicit_seminorm(aug):
            vt, y, adj_y = aug[0], aug[1], aug[2]
            out = jnp.abs(vt)
            out = jnp.maximum(out, rms(y))
            return jnp.maximum(out, rms(adj_y))

        n_default = count_nfe(None)
        n_empty_opts = count_nfe({})
        n_explicit = count_nfe(dict(norm=explicit_default))
        n_semi = count_nfe(dict(norm='seminorm'))
        n_semi_explicit = count_nfe(dict(norm=explicit_seminorm))

        assert n_default == n_empty_opts == n_explicit, \
            (shape, n_default, n_empty_opts, n_explicit)
        assert n_semi == n_semi_explicit, (shape, n_semi, n_semi_explicit)


def test_user_adjoint_norm_shapes_container_state():
    """A user adjoint norm on a container state receives
    (t, *y_leaves, *adj_y_leaves, *adj_params) with original leaf shapes
    (reference norm_tests.py:222-242)."""
    shapes_seen = []
    p1 = jnp.linspace(0.1, 0.7, 7)

    def adjoint_norm(aug):
        shapes_seen.append(tuple(jnp.shape(a) for a in aug))
        return jnp.max(jnp.stack([jnp.max(jnp.abs(jnp.atleast_1d(a)))
                                  for a in aug]))

    def f(tt, yy, p1_):
        a, b = yy
        return (-a * jnp.mean(p1_), -b)

    y0 = (jnp.asarray(1.0), jnp.full((2, 2), 0.5))

    def loss(p1_):
        with jax.disable_jit():
            ys = tde.odeint_adjoint(f, y0, jnp.linspace(0., 1., 2),
                                    args=(p1_,),
                                    adjoint_options=dict(norm=adjoint_norm))
        return jnp.sum(ys[1][-1])

    jax.grad(loss)(p1)
    assert len(shapes_seen) > 0
    # (t, y_a, y_b, adj_a, adj_b, ...params)
    for s in shapes_seen:
        assert s[0] == ()
        assert s[1] == () and s[2] == (2, 2)
        assert s[3] == () and s[4] == (2, 2)
        assert (7,) in s[5:]


def test_forward_norm_reused_with_container_state():
    """With a container state and a user forward norm, the adjoint's state
    norm wraps the user norm over the original structure (reference
    handle_adjoint_norm_, adjoint.py:252-262): passing the same norm
    explicitly must reproduce the default backward NFE."""
    structures = []

    def user_norm(tree):
        structures.append(jax.tree_util.tree_structure(tree))
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.max(jnp.stack([jnp.sqrt(jnp.mean(jnp.abs(l) ** 2))
                                  for l in leaves]))

    def f(tt, yy):
        return (-yy[0], -2.0 * yy[1])

    y0 = (jnp.ones((2,)), jnp.ones((3,)))

    def loss(y0_):
        with jax.disable_jit():
            ys = tde.odeint_adjoint(f, y0_, jnp.linspace(0., 1., 2),
                                    options=dict(norm=user_norm))
        return jnp.sum(ys[0][-1])

    jax.grad(loss)(y0)
    # the forward norm is invoked on the original structure during both the
    # forward solve and (wrapped) inside the adjoint norm
    expected = jax.tree_util.tree_structure(y0)
    assert len(structures) > 0
    assert all(s == expected for s in structures)
