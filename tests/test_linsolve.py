"""Mixed-precision linear solves (ops/linsolve.py): the machinery that
keeps f64 stiff stage solves TPU-resident (f32 LU + iterative refinement
with f64 residuals).

The suite runs CPU-pinned, so `FORCE_REFINED` is used to exercise the
exact code path the TPU dispatch takes — same program, same numerics.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torchdiffeq_tpu as tde
from torchdiffeq_tpu.ops import linsolve


@pytest.fixture
def force_refined():
    linsolve.FORCE_REFINED = True
    try:
        yield
    finally:
        linsolve.FORCE_REFINED = False


def _random_system(key, n, cond):
    """Random (n, n) f64 system with prescribed 2-norm condition number."""
    k1, k2, k3 = jax.random.split(key, 3)
    q1, _ = jnp.linalg.qr(jax.random.normal(k1, (n, n), jnp.float64))
    q2, _ = jnp.linalg.qr(jax.random.normal(k2, (n, n), jnp.float64))
    s = jnp.logspace(0.0, np.log10(cond), n)
    J = q1 @ jnp.diag(s) @ q2.T
    b = jax.random.normal(k3, (n,), jnp.float64)
    return J, b


@pytest.mark.parametrize("cond", [1e1, 1e3, 1e5])
def test_refined_reaches_f64_accuracy(cond):
    J, b = _random_system(jax.random.PRNGKey(0), 24, cond)
    x = linsolve.solve_refined(J, b)
    x_ref = np.linalg.solve(np.asarray(J), np.asarray(b))
    rel = np.max(np.abs(np.asarray(x) - x_ref)) / np.max(np.abs(x_ref))
    # f64 accuracy, NOT the ~cond*6e-8 a plain f32 solve would give
    assert rel < 1e-12 * cond, rel


def test_refined_beats_plain_f32():
    J, b = _random_system(jax.random.PRNGKey(1), 24, 1e5)
    x_ref = np.linalg.solve(np.asarray(J), np.asarray(b))
    x_f32 = np.asarray(jnp.linalg.solve(J.astype(jnp.float32),
                                        b.astype(jnp.float32)), np.float64)
    x_ir = np.asarray(linsolve.solve_refined(J, b))
    err_f32 = np.max(np.abs(x_f32 - x_ref))
    err_ir = np.max(np.abs(x_ir - x_ref))
    assert err_ir < 1e-4 * err_f32, (err_ir, err_f32)


def test_refined_matrix_rhs():
    J, _ = _random_system(jax.random.PRNGKey(2), 12, 1e2)
    B = jax.random.normal(jax.random.PRNGKey(3), (12, 4), jnp.float64)
    X = linsolve.solve_refined(J, B)
    np.testing.assert_allclose(np.asarray(J @ X), np.asarray(B),
                               rtol=1e-10, atol=1e-10)


def test_solve_dispatch_native_for_f32():
    # f32 never takes the refined path (native f32 LU everywhere)
    J = jnp.eye(4, dtype=jnp.float32) * 2.0
    b = jnp.ones(4, jnp.float32)
    np.testing.assert_allclose(np.asarray(linsolve.solve(J, b)), 0.5,
                               rtol=1e-6)


def test_refined_is_linear_in_b():
    """The refinement scan must be linear in b (custom_root transposition
    contract): solve(J, a*b1 + b2) == a*solve(J, b1) + solve(J, b2)."""
    J, b1 = _random_system(jax.random.PRNGKey(4), 10, 1e3)
    b2 = jax.random.normal(jax.random.PRNGKey(5), (10,), jnp.float64)
    lhs = linsolve.solve_refined(J, 2.5 * b1 + b2)
    rhs = 2.5 * linsolve.solve_refined(J, b1) + linsolve.solve_refined(J, b2)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=1e-12, atol=1e-12)


STIFF_METHODS = ('kvaerno3', 'kvaerno5', 'radau5a')


@pytest.mark.parametrize('method', STIFF_METHODS)
def test_stiff_f64_solve_on_refined_path(method, force_refined):
    """The adaptive stiff tier at tight tolerance (stage tol 1e-8 — the
    reference's f64 stage-solve semantics, rk_common.py:425-429) through
    the refined path: matches the native-LAPACK path to f64-class
    accuracy.  This is the exact program the TPU runs."""
    lam = 1e3
    f = lambda t, y: -lam * (y - jnp.cos(t)) - jnp.sin(t)
    t = jnp.linspace(0., 2., 5, dtype=jnp.float64)
    y0 = jnp.array([1.5], jnp.float64)

    ys_ir, st = tde.odeint_with_stats(f, y0, t, method=method,
                                      rtol=1e-8, atol=1e-10)
    assert int(st.error_code) == 0
    linsolve.FORCE_REFINED = False
    ys_native = tde.odeint(f, y0, t, method=method, rtol=1e-8, atol=1e-10)
    linsolve.FORCE_REFINED = True
    np.testing.assert_allclose(np.asarray(ys_ir), np.asarray(ys_native),
                               rtol=1e-9, atol=1e-11)
    # and both track the exact solution: y = cos(t) + (y0-1)exp(-lam t)
    exact = np.cos(np.asarray(t)) + 0.5 * np.exp(-lam * np.asarray(t))
    assert np.max(np.abs(np.asarray(ys_ir[:, 0]) - exact)) < 1e-6


@pytest.mark.parametrize('method', ['radauIIA5', 'gl6', 'sdirk2'])
def test_fixed_implicit_f64_on_refined_path(method, force_refined):
    """Fixed-grid FIRK/DIRK tier (Broyden + IFT backward) on the refined
    path, f64: same answers as native."""
    f = lambda t, y: -y
    t = jnp.linspace(0., 2., 5, dtype=jnp.float64)
    y0 = jnp.array([1.0], jnp.float64)
    opts = dict(step_size=0.1)
    ys_ir = tde.odeint(f, y0, t, method=method, options=opts)
    linsolve.FORCE_REFINED = False
    ys_native = tde.odeint(f, y0, t, method=method, options=opts)
    linsolve.FORCE_REFINED = True
    np.testing.assert_allclose(np.asarray(ys_ir), np.asarray(ys_native),
                               rtol=1e-11, atol=1e-13)


def test_gradients_through_refined_path(force_refined):
    """custom_root reverse-mode (IFT tangent_solve transposition) works
    through the refinement scan and matches the native-path gradients."""
    lam = 50.0

    def loss_of(y0_scalar):
        f = lambda t, y: -lam * y + jnp.sin(t)
        ys = tde.odeint(f, jnp.array([y0_scalar]),
                        jnp.linspace(0., 1., 3, dtype=jnp.float64),
                        method='kvaerno5', rtol=1e-8, atol=1e-10)
        return jnp.sum(ys[-1])

    g_ir = jax.grad(loss_of)(jnp.float64(1.3))
    linsolve.FORCE_REFINED = False
    g_native = jax.grad(loss_of)(jnp.float64(1.3))
    linsolve.FORCE_REFINED = True
    np.testing.assert_allclose(float(g_ir), float(g_native),
                               rtol=1e-9, atol=1e-12)


def test_ill_conditioned_stage_self_heals(force_refined):
    """A stiff solve whose early trial steps produce ill-conditioned stage
    systems still completes cleanly: IR stall -> Newton non-convergence ->
    step rejection -> smaller dt -> better-conditioned J."""
    lam = 1e7  # extreme stiffness: J = I - dt*gamma*(-lam) gets huge
    f = lambda t, y: -lam * (y - 1.0)
    t = jnp.linspace(0., 1e-3, 3, dtype=jnp.float64)
    ys, st = tde.odeint_with_stats(f, jnp.array([2.0], jnp.float64), t,
                                   method='kvaerno5', rtol=1e-6, atol=1e-8)
    assert int(st.error_code) == 0
    exact = 1.0 + np.exp(-lam * np.asarray(t))
    assert np.max(np.abs(np.asarray(ys[:, 0]) - exact)) < 1e-4
