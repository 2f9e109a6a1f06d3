"""Callback-system tests (reference odeint_tests.py:289-386): callbacks are
attributes of `func`, fire per executed step via jax.debug.callback, and
`accepts + rejects == steps` for adaptive solvers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import warnings

import torchdiffeq_tpu as tde
from problems import construct_problem


class CountingFunc:
    def __init__(self, f):
        self.f = f
        self.steps = 0
        self.accepts = 0
        self.rejects = 0
        self.adjoint_steps = 0

    def __call__(self, t, y):
        return self.f(t, y)

    def callback_step(self, t0, y0, dt):
        self.steps += 1

    def callback_accept_step(self, t0, y0, dt):
        self.accepts += 1

    def callback_reject_step(self, t0, y0, dt):
        self.rejects += 1

    def callback_step_adjoint(self, t0, y0, dt):
        self.adjoint_steps += 1


def test_adaptive_callbacks_accounting():
    f, y0, t_points, sol = construct_problem(ode='linear')
    cf = CountingFunc(f)
    ys, stats = tde.odeint_with_stats(cf, y0, t_points, method='dopri5')
    jax.block_until_ready(ys)
    jax.effects_barrier()
    assert cf.steps == int(stats.n_steps)
    assert cf.accepts == int(stats.n_accepted)
    assert cf.rejects == int(stats.n_rejected)
    assert cf.accepts + cf.rejects == cf.steps


def test_callback_args_user_frame():
    """Callbacks receive user-frame time and user-structured state, even
    for reversed integration (reference misc.py:326-333)."""
    seen = []

    class F:
        def __call__(self, t, y):
            return -y

        def callback_step(self, t0, y0, dt):
            seen.append((float(t0), np.asarray(y0).shape))

    t_rev = jnp.linspace(2.0, 0.0, 3)
    tde.odeint(F(), jnp.ones((2, 2)), t_rev)
    jax.effects_barrier()
    assert len(seen) > 0
    ts = [s[0] for s in seen]
    assert all(s[1] == (2, 2) for s in seen)
    # user-frame times lie inside [0, 2] (the *internal* frame is negated)
    assert all(-2.0 <= tv <= 2.0 + 1e-6 for tv in ts)
    assert any(tv > 0 for tv in ts)


def test_fixed_grid_step_callback():
    f, y0, t_points, sol = construct_problem(ode='constant')
    cf = CountingFunc(f)
    tde.odeint(cf, y0, t_points, method='euler',
               options=dict(step_size=0.5))
    jax.effects_barrier()
    assert cf.steps == 14  # 15 grid points over [1, 8] at h=0.5 -> 14 steps
    assert cf.accepts == 0 and cf.rejects == 0


def test_invalid_callback_warns():
    f, y0, t_points, sol = construct_problem(ode='constant')
    cf = CountingFunc(f)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        tde.odeint(cf, y0, t_points, method='euler',
                   options=dict(step_size=1.0))
        msgs = [str(x.message) for x in w]
    assert any('does not support callbacks' in m for m in msgs), msgs


def test_adjoint_callback():
    f, y0, t_points, sol = construct_problem(ode='constant', npts=3)
    cf = CountingFunc(f)

    def loss(y0_):
        return jnp.sum(tde.odeint_adjoint(cf, y0_, t_points)[-1])

    jax.block_until_ready(jax.grad(loss)(y0))
    jax.effects_barrier()
    assert cf.adjoint_steps > 0


def test_adjoint_noise_floor_preset():
    """adjoint_options=dict(noise_floor=True) floors the backward rtol at
    the state dtype's rounding unit (eps/2): for bf16 state it cuts the
    backward step count while leaving the gradient at the bf16 noise
    level; for f32 state at ordinary tolerances it is a no-op."""
    y0 = jnp.ones((4,), dtype=jnp.bfloat16)
    t_pts = jnp.array([0.0, 1.0, 2.0], dtype=jnp.float32)

    def run(noise_floor, dtype):
        cf = CountingFunc(lambda t, y: -0.5 * y)
        opts = dict(noise_floor=True) if noise_floor else None

        def loss(y0_):
            ys = tde.odeint_adjoint(cf, y0_, t_pts, rtol=1e-4, atol=1e-6,
                                    adjoint_options=opts)
            return jnp.sum(ys[-1].astype(jnp.float32))

        g = jax.grad(loss)(y0.astype(dtype))
        jax.block_until_ready(g)
        jax.effects_barrier()
        return cf.adjoint_steps, np.asarray(g, dtype=np.float64)

    steps_plain, g_plain = run(False, jnp.bfloat16)
    steps_floor, g_floor = run(True, jnp.bfloat16)
    assert steps_floor < steps_plain, (steps_floor, steps_plain)
    # gradient unchanged at the bf16 noise level (analytic: e^{-1})
    assert np.allclose(g_floor, np.exp(-1.0), rtol=0.05)
    assert np.allclose(g_plain, g_floor, rtol=0.05)

    # f32 state: u ~ 6e-8 < rtol=1e-4 -> identical step counts
    s1, _ = run(False, jnp.float32)
    s2, _ = run(True, jnp.float32)
    assert s1 == s2


def test_adjoint_noise_floor_explicit_float():
    """noise_floor=<float> floors the backward rtol at the given value —
    the form for f32 state whose eval noise is set by bf16 matmul
    precision rather than the state dtype."""
    y0 = jnp.ones((4,), dtype=jnp.float32)
    t_pts = jnp.array([0.0, 1.0, 2.0], dtype=jnp.float32)

    def run(opts):
        cf = CountingFunc(lambda t, y: -0.5 * y)

        def loss(y0_):
            ys = tde.odeint_adjoint(cf, y0_, t_pts, rtol=1e-5, atol=1e-7,
                                    adjoint_options=opts)
            return jnp.sum(ys[-1])

        g = jax.grad(loss)(y0)
        jax.block_until_ready(g)
        jax.effects_barrier()
        return cf.adjoint_steps, np.asarray(g, dtype=np.float64)

    s_plain, _ = run(None)
    s_floor, g_floor = run(dict(noise_floor=4e-3))
    assert s_floor < s_plain, (s_floor, s_plain)
    assert np.allclose(g_floor, np.exp(-1.0), rtol=4e-3)
