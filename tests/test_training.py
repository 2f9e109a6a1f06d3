"""Tests for the dispatch-free training loop utilities (training.py).

Verifies the scanned loops are step-for-step equivalent to the plain
one-dispatch-per-step Python loop (same params, same losses), that optax
optimizers thread through the scan carry, and that the chunked `fit`
driver handles data pipelines (constant shapes, short final chunk,
exhausted iterators).
"""
import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from torchdiffeq_tpu import odeint_adjoint
from torchdiffeq_tpu.models.neural_ode import (init_spiral_model,
                                               spiral_field)
from torchdiffeq_tpu import training


def _spiral_problem(dtype=jnp.float32):
    key = jax.random.PRNGKey(0)
    params = init_spiral_model(key, hidden=16, dtype=dtype)
    y0 = jnp.array([2.0, 0.0], dtype)
    t = jnp.linspace(0.0, 1.0, 5, dtype=dtype)
    target = jnp.stack([2.0 * jnp.cos(t), 2.0 * jnp.sin(t)], axis=-1)

    def loss_fn(p, _batch):
        func = lambda tt, yy, pp: spiral_field(pp, tt, yy)
        ys = odeint_adjoint(func, y0, t, rtol=1e-3, atol=1e-4,
                            method='dopri5', args=(p,))
        return jnp.mean((ys - target) ** 2)

    return params, loss_fn


def test_sgd_scan_matches_python_loop():
    params, loss_fn = _spiral_problem()
    step = training.make_sgd_step(loss_fn, lr=1e-2)

    # scanned: 6 steps in one dispatch
    p_scan, losses = training.scan_steps(step, params, length=6)
    # reference: one jitted step per dispatch
    jstep = jax.jit(step)
    p_loop = params
    loop_losses = []
    for _ in range(6):
        p_loop, l = jstep(p_loop, None)
        loop_losses.append(float(l))
    np.testing.assert_allclose(np.asarray(losses), loop_losses, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_scan),
                    jax.tree_util.tree_leaves(p_loop)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)
    # and training actually trained
    assert losses[-1] < losses[0]


def test_optax_step_decreases_loss():
    params, loss_fn = _spiral_problem()
    init, step = training.make_optax_step(loss_fn, optax.adam(1e-2))
    carry, losses = training.scan_steps(step, init(params), length=8)
    assert losses[-1] < losses[0]
    new_params, opt_state = carry
    # carry keeps the params pytree structure
    assert (jax.tree_util.tree_structure(new_params)
            == jax.tree_util.tree_structure(params))
    assert len(losses) == 8


def test_scan_steps_over_batches():
    # batched xs: per-step data drives the loss
    def loss_fn(w, batch):
        x, y = batch
        return jnp.mean((x @ w - y) ** 2)

    key = jax.random.PRNGKey(1)
    w = jnp.zeros((3,))
    xs = (jax.random.normal(key, (7, 8, 3)),
          jnp.ones((7, 8)))  # 7 steps of (8,3)/(8,) batches
    step = training.make_sgd_step(loss_fn, lr=0.1)
    w1, losses = training.scan_steps(step, w, xs)
    assert losses.shape == (7,)
    assert np.all(np.isfinite(np.asarray(losses)))
    # equivalent python loop
    w2 = jnp.zeros((3,))
    for i in range(7):
        w2, _ = step(w2, (xs[0][i], xs[1][i]))
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-6)


def test_scan_steps_requires_xs_or_length():
    step = training.make_sgd_step(lambda p, b: jnp.sum(p ** 2))
    with pytest.raises(ValueError):
        training.scan_steps(step, jnp.ones(2))


def test_fit_chunks_match_single_scan():
    def loss_fn(w, batch):
        return jnp.mean((batch @ w - 1.0) ** 2)

    xs = jax.random.normal(jax.random.PRNGKey(2), (10, 4, 3))
    step = training.make_sgd_step(loss_fn, lr=0.05)

    # fit in chunks of 4 (4+4+2: exercises the short final chunk)
    w_fit, losses_fit = training.fit(step, jnp.zeros((3,)),
                                     batches=iter(list(xs)),
                                     num_steps=10, steps_per_dispatch=4)
    # one scan over all 10
    w_one, losses_one = training.scan_steps(step, jnp.zeros((3,)), xs)
    assert losses_fit.shape == (10,)
    np.testing.assert_allclose(losses_fit, np.asarray(losses_one), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w_fit), np.asarray(w_one),
                               rtol=1e-6)


def test_fit_exhausted_iterator_stops_early():
    def loss_fn(w, batch):
        return jnp.mean((batch @ w) ** 2)

    xs = [jnp.ones((4, 3))] * 5  # pipeline has only 5 batches
    step = training.make_sgd_step(loss_fn, lr=0.1)
    w, losses = training.fit(step, jnp.ones((3,)), batches=iter(xs),
                             num_steps=12, steps_per_dispatch=4)
    assert losses.shape == (5,)


def test_fit_batchfree():
    params, loss_fn = _spiral_problem()
    step = training.make_sgd_step(loss_fn, lr=1e-2)
    p, losses = training.fit(step, params, num_steps=5,
                             steps_per_dispatch=2)
    assert losses.shape == (5,)
    assert losses[-1] < losses[0]


def test_fit_rejects_nonpositive_steps():
    step = training.make_sgd_step(lambda p, b: jnp.sum(p ** 2))
    with pytest.raises(ValueError):
        training.fit(step, jnp.ones(2), num_steps=0)


def test_fit_rejects_nonpositive_steps_per_dispatch():
    step = training.make_sgd_step(lambda p, b: jnp.sum(p ** 2))
    with pytest.raises(ValueError):
        training.fit(step, jnp.ones(2), num_steps=4, steps_per_dispatch=0)


def test_fit_empty_pipeline_returns_empty_losses():
    def loss_fn(w, batch):
        return jnp.mean((batch @ w) ** 2)

    step = training.make_sgd_step(loss_fn, lr=0.1)
    w0 = jnp.ones((3,))
    w, losses = training.fit(step, w0, batches=iter([]), num_steps=4)
    assert losses.shape == (0,)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w0))


def test_optax_step_keeps_bf16_param_dtype():
    # adam emits f32-scale updates; apply_updates must cast them back so
    # the scan carry's dtype is stable (raw p + u would promote to f32).
    def loss_fn(w, _):
        return jnp.sum((w - 1.0) ** 2).astype(jnp.float32)

    w = jnp.zeros((4,), jnp.bfloat16)
    init, step = training.make_optax_step(loss_fn, optax.adam(1e-2))
    (w1, _), losses = training.scan_steps(step, init(w), length=3)
    assert w1.dtype == jnp.bfloat16
    assert losses.shape == (3,)
