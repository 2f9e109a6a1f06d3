"""Gradient-mode x option compatibility matrix (docs/FAQ.md section
"Gradient-mode compatibility") — every "raises" cell in the published table
must actually raise, and the uncertain "works" cells are exercised here so
the table stays honest.

Modes under test:
  direct discrete      odeint + fixed-grid/Adams/implicit (scan-native AD)
  continuous adjoint   odeint_adjoint (fused single-sweep or interval-scan)
  interpolated adjoint adjoint_options=dict(interpolated=True)
  replay               options=dict(replay_grad=True)
  forward_grad         options=dict(forward_grad=True)
  IFT event grads      odeint_event
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdiffeq_tpu as tde
from torchdiffeq_tpu.adjoint import odeint_adjoint


def field(t, y):
    return -0.5 * y


def field_p(t, y, a):
    return -a * y


Y0 = jnp.asarray([1.0, 2.0])
T = jnp.linspace(0.0, 1.0, 5)
T2 = jnp.asarray([0.0, 1.0])


def ev(t, y):
    return y[0] - 0.5


# ---------------------------------------------------------------------------
# "raises" cells
# ---------------------------------------------------------------------------
def test_interpolated_rejects_events():
    with pytest.raises(ValueError, match="does not support.*event"):
        tde.odeint_event(field, Y0, jnp.asarray(0.0), event_fn=ev,
                         odeint_interface=odeint_adjoint,
                         adjoint_options=dict(interpolated=True))


def test_interpolated_rejects_fixed_grid_method():
    with pytest.raises(ValueError, match="adaptive"):
        odeint_adjoint(field, Y0, T, method='rk4',
                       options=dict(step_size=0.1),
                       adjoint_options=dict(interpolated=True))


def test_interpolated_rejects_nonadaptive_adjoint_method():
    with pytest.raises(ValueError, match="adaptive"):
        odeint_adjoint(field, Y0, T, method='dopri5',
                       adjoint_method='rk4',
                       adjoint_options=dict(interpolated=True,
                                            step_size=0.1))


def test_interpolated_rejects_custom_norm_callable():
    with pytest.raises(ValueError, match="norm"):
        odeint_adjoint(field, Y0, T,
                       adjoint_options=dict(interpolated=True,
                                            norm=lambda x: jnp.max(jnp.abs(x))))


@pytest.mark.parametrize("key", ["step_t", "jump_t"])
def test_interpolated_rejects_adjoint_step_jump_t(key):
    with pytest.raises(ValueError, match=key):
        odeint_adjoint(field, Y0, T,
                       adjoint_options={"interpolated": True,
                                        key: jnp.asarray([0.5])})


def test_forward_grad_rejects_events():
    with pytest.raises(ValueError, match="forward_grad does not support"):
        tde.odeint_event(field, Y0, jnp.asarray(0.0), event_fn=ev,
                         options=dict(forward_grad=True))


def test_forward_grad_has_no_reverse_mode():
    def loss(y0):
        ys = tde.odeint(field, y0, T2, options=dict(forward_grad=True))
        return jnp.sum(ys[-1])
    # XLA while_loop has no transpose; JAX raises from the AD machinery
    with pytest.raises(Exception, match="[Rr]everse-mode|transpose|while"):
        jax.grad(loss)(Y0)


def test_scipy_solver_rejects_events():
    with pytest.raises(ValueError, match="does not support event"):
        tde.odeint_event(field, Y0, jnp.asarray(0.0), event_fn=ev,
                         method='scipy_solver')


# ---------------------------------------------------------------------------
# uncertain "works" cells — pinned here so the table stays truthful
# ---------------------------------------------------------------------------
def test_interpolated_norm_seminorm_string_works():
    g = jax.grad(lambda y0: jnp.sum(odeint_adjoint(
        field, y0, T, adjoint_options=dict(interpolated=True,
                                           norm='seminorm'))[-1]))(Y0)
    ref = jax.grad(lambda y0: jnp.sum(odeint_adjoint(field, y0, T)[-1]))(Y0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-4)


def test_interpolated_forward_step_jump_t_work():
    """FORWARD step_t/jump_t compose with the interpolated backward
    (only the ADJOINT step_t/jump_t are rejected)."""
    g = jax.grad(lambda y0: jnp.sum(odeint_adjoint(
        field, y0, T, options=dict(step_t=jnp.asarray([0.33])),
        adjoint_options=dict(interpolated=True))[-1]))(Y0)
    ref = jax.grad(lambda y0: jnp.sum(odeint_adjoint(field, y0, T)[-1]))(Y0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-4)


def test_interpolated_pytree_state_works():
    y0 = dict(a=jnp.asarray([1.0, 2.0]), b=jnp.asarray(0.5))

    def f(t, y):
        return dict(a=-y['a'], b=0.1 * y['b'])

    g = jax.grad(lambda y0: jnp.sum(odeint_adjoint(
        f, y0, T, adjoint_options=dict(interpolated=True))['a'][-1]))(y0)
    ref = jax.grad(lambda y0: jnp.sum(
        odeint_adjoint(f, y0, T)['a'][-1]))(y0)
    np.testing.assert_allclose(np.asarray(g['a']), np.asarray(ref['a']),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g['b']), np.asarray(ref['b']),
                               rtol=1e-4, atol=1e-7)


def test_interpolated_complex_state_works():
    y0 = jnp.asarray([1.0 + 0.5j, 0.5 - 0.25j])

    def f(t, y):
        return 1j * y

    g = jax.grad(lambda y0: jnp.sum(jnp.abs(odeint_adjoint(
        f, y0, T, adjoint_options=dict(interpolated=True))[-1]) ** 2))(y0)
    ref = jax.grad(lambda y0: jnp.sum(jnp.abs(
        odeint_adjoint(f, y0, T)[-1]) ** 2))(y0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-4)


def test_interpolated_vmap_works():
    y0b = jnp.stack([Y0, 2 * Y0, 3 * Y0])

    def one(y0):
        return jnp.sum(odeint_adjoint(
            field, y0, T, adjoint_options=dict(interpolated=True))[-1])

    g = jax.vmap(jax.grad(one))(y0b)
    ref = jnp.stack([jax.grad(one)(y) for y in y0b])
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-5)


def test_replay_pytree_state_works():
    y0 = dict(a=jnp.asarray([1.0, 2.0]), b=jnp.asarray(0.5))

    def f(t, y):
        return dict(a=-y['a'], b=0.1 * y['b'])

    g = jax.grad(lambda y0: jnp.sum(tde.odeint(
        f, y0, T, options=dict(replay_grad=True))['a'][-1]))(y0)
    ref = jax.grad(lambda y0: jnp.sum(odeint_adjoint(f, y0, T)['a'][-1]))(y0)
    np.testing.assert_allclose(np.asarray(g['a']), np.asarray(ref['a']),
                               rtol=1e-3)


def test_replay_traced_t_needs_max_segments():
    """Under jit-traced t the auto-sizing probe cannot run on concrete
    values; an explicit max_segments makes it compile."""
    @jax.jit
    def solve(t1):
        t = jnp.stack([jnp.zeros_like(t1), t1])
        return tde.odeint(field, Y0, t,
                          options=dict(replay_grad=True, max_segments=256))

    ys = solve(jnp.asarray(1.0))
    ref = tde.odeint(field, Y0, T2)
    np.testing.assert_allclose(np.asarray(ys[-1]), np.asarray(ref[-1]),
                               rtol=1e-6)


def test_replay_custom_norm_works():
    g = jax.grad(lambda y0: jnp.sum(tde.odeint(
        field, y0, T, options=dict(
            replay_grad=True,
            norm=lambda x: jnp.max(jnp.abs(x))))[-1]))(Y0)
    ref = jax.grad(lambda y0: jnp.sum(odeint_adjoint(field, y0, T)[-1]))(Y0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-3)


def test_forward_grad_jvp_works():
    def endpoint(y0):
        return tde.odeint(field, y0, T2,
                          options=dict(forward_grad=True))[-1]

    _, tangent = jax.jvp(endpoint, (Y0,), (jnp.ones_like(Y0),))
    # d/dy0 [y0 * e^{-t/2}] . 1 = e^{-1/2} per component
    np.testing.assert_allclose(np.asarray(tangent),
                               np.exp(-0.5) * np.ones(2), rtol=1e-4)


def test_direct_discrete_traced_t_works():
    @jax.jit
    def solve(t1):
        t = jnp.stack([jnp.zeros_like(t1), t1])
        return tde.odeint(field, Y0, t, method='rk4',
                          options=dict(num_steps=64))

    ys = solve(jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(ys[-1]),
                               np.asarray(Y0) * np.exp(-0.5), rtol=1e-5)
