"""TPU fast-path options: `step_to_end` (interp-free endpoint stepping),
`error_dtype` (mixed-precision error control), and the tree-native state
representation (no ravel for the explicit adaptive tier)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdiffeq_tpu as tde


def _exp_err(ys, t):
    return float(jnp.max(jnp.abs(ys[:, 0] - jnp.exp(-t))))


@pytest.mark.parametrize('method', ['dopri5', 'tsit5', 'bosh3'])
def test_step_to_end_accuracy(method):
    f = lambda t, y: -y
    t = jnp.linspace(0., 2., 7)
    y0 = jnp.array([1.0, 2.0])
    ys, st = tde.odeint_with_stats(f, y0, t, method=method,
                                   options=dict(step_to_end=True))
    assert int(st.error_code) == 0
    assert _exp_err(ys, t) < 1e-6
    # every output row is written (the emission path is equality-based)
    assert bool(jnp.all(jnp.isfinite(ys)))
    assert float(jnp.abs(ys[0, 0] - y0[0])) == 0.0


def test_step_to_end_reverse_time():
    f = lambda t, y: -y
    t = jnp.linspace(2., 0., 5)
    ys = tde.odeint(f, jnp.array([1.0]), t, options=dict(step_to_end=True))
    err = float(jnp.max(jnp.abs(ys[:, 0] - jnp.exp(2. - t))))
    assert err < 1e-5, err


def test_step_to_end_tuple_state():
    f = lambda t, y: (-y[0], {'a': -2.0 * y[1]['a']})
    y0 = (jnp.array([1.0]), {'a': jnp.array([3.0])})
    t = jnp.linspace(0., 1., 4)
    ys = tde.odeint(f, y0, t, options=dict(step_to_end=True))
    np.testing.assert_allclose(np.asarray(ys[0][:, 0]), np.exp(-np.asarray(t)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ys[1]['a'][:, 0]),
                               3 * np.exp(-2 * np.asarray(t)), rtol=1e-6)


def test_step_to_end_composes_with_step_t():
    """User step_t boundaries merge with the forced output boundaries."""
    f = lambda t, y: -y
    t = jnp.linspace(0., 1., 3)
    ys, st = tde.odeint_with_stats(
        f, jnp.array([1.0]), t,
        options=dict(step_to_end=True, step_t=jnp.array([0.123, 0.777])))
    assert int(st.error_code) == 0
    assert _exp_err(ys, t) < 1e-6


def test_step_to_end_step_t_collides_with_output_time():
    """Regression: a user step_t equal to an output time used to leave a
    duplicate in the merged forced-boundary array, stalling step_idx on
    the second copy so every LATER output boundary was skipped — outputs
    were silently broadcast-copied from overshooting steps (~1e-2 error,
    error_code 0)."""
    f = lambda t, y: -y
    t = jnp.linspace(0., 2., 5)           # outputs at 0.5, 1.0, 1.5, 2.0
    ys, st = tde.odeint_with_stats(
        f, jnp.array([1.0]), t,
        options=dict(step_to_end=True, step_t=jnp.array([0.5])))
    assert int(st.error_code) == 0
    assert _exp_err(ys, t) < 1e-6


def test_step_to_end_jump_t_at_output_time():
    """Regression: with step_to_end, an output time equal to a user
    jump_t was claimed by the forced step_t boundary FIRST, so the strict
    jump window never fired — no far-side re-evaluation, jump_idx stalled,
    and every later jump_t entry was dead."""
    # field discontinuous at t=0.5 (rate -1 -> -3); exact solution known
    f = lambda t, y: jnp.where(t < 0.5, -y, -3. * y)
    t = jnp.linspace(0., 1., 3)           # output at 0.5 == jump_t[0]
    exact = np.where(np.asarray(t) < 0.5, np.exp(-np.asarray(t)),
                     np.exp(-0.5) * np.exp(-3 * (np.asarray(t) - 0.5)))
    for opts in (dict(jump_t=jnp.array([0.5])),
                 dict(step_to_end=True, jump_t=jnp.array([0.5]))):
        ys, st = tde.odeint_with_stats(f, jnp.array([1.0]), t,
                                       rtol=1e-7, atol=1e-9, options=opts)
        assert int(st.error_code) == 0
        err = np.max(np.abs(np.asarray(ys[:, 0]) - exact))
        assert err < 1e-6, (opts, err)


def test_error_dtype_plumbed_to_implicit_step_fns():
    """Regression: `error_dtype` was silently inert for the implicit
    adaptive tier — the factories now accumulate the embedded error in
    the requested dtype (docs/OPTIONS.md says every adaptive option
    applies to kvaerno3/5 and radau5a)."""
    from torchdiffeq_tpu.ops import tableaus as tb
    from torchdiffeq_tpu.solvers.adaptive_implicit import (
        make_esdirk_step_fn, make_firk_step_fn)

    def f(t, y, perturb=None):
        return -y

    y0 = jnp.array([1.0, 2.0], jnp.float32)
    f0 = f(0., y0)
    for make, tab in ((make_esdirk_step_fn, tb.KVAERNO3),
                      (make_firk_step_fn, tb.RADAU5A)):
        _, _, e_plain, _ = make()(f, y0, f0, 0., 0.1, 0.1, tab)
        _, _, e_up, _ = make(error_dtype=jnp.float64)(
            f, y0, f0, 0., 0.1, 0.1, tab)
        assert e_plain.dtype == jnp.float32
        assert e_up.dtype == jnp.float64
        # the sum is near-cancelling: f32 vs f64 accumulation differ at
        # up to ~1e-2 relative of the (tiny) estimate — the very noise
        # the option removes; only same-order agreement is meaningful
        np.testing.assert_allclose(np.asarray(e_up),
                                   np.asarray(e_plain, np.float64),
                                   rtol=5e-2)
    # end-to-end: the option reaches the step_fn through odeint dispatch
    t = jnp.linspace(0., 1., 3)
    ys = tde.odeint(lambda tt, yy: -yy, y0, t, method='kvaerno3',
                    rtol=1e-6, atol=1e-8,
                    options=dict(error_dtype=jnp.float64))
    np.testing.assert_allclose(np.asarray(ys[-1]),
                               np.asarray(y0) * np.exp(-1), rtol=1e-5)


def test_step_to_end_gradients():
    f = lambda t, y: -y
    t = jnp.linspace(0., 2., 3)

    def loss(y0_):
        return jnp.sum(tde.odeint(f, y0_, t,
                                  options=dict(step_to_end=True))[-1])

    g = float(jax.grad(loss)(jnp.array([1.0]))[0])
    np.testing.assert_allclose(g, np.exp(-2), rtol=1e-6)


def test_step_to_end_under_jit_traced_t():
    f = lambda t, y: -y
    t = jnp.linspace(0., 1., 4)
    run = jax.jit(lambda y, tt: tde.odeint(f, y, tt,
                                           options=dict(step_to_end=True)))
    ys = run(jnp.array([1.0]), t)
    assert _exp_err(ys, t) < 1e-6


def test_error_dtype_reduces_bf16_churn():
    """bfloat16 state: accumulating the embedded error (and its tolerance
    ratio) in f32 removes the catastrophic-cancellation noise, so the
    controller takes substantially fewer steps at the same tolerance."""
    f = lambda t, y: -y
    y0 = jnp.ones((4, 2), jnp.bfloat16)
    t = jnp.linspace(0., 1., 3)
    _, st_plain = tde.odeint_with_stats(f, y0, t, rtol=1e-5, atol=1e-7)
    _, st_mixed = tde.odeint_with_stats(
        f, y0, t, rtol=1e-5, atol=1e-7,
        options=dict(error_dtype=jnp.float32))
    assert int(st_mixed.error_code) == 0
    assert int(st_mixed.n_steps) < int(st_plain.n_steps), \
        (int(st_mixed.n_steps), int(st_plain.n_steps))


def test_bf16_interpolated_outputs_accurate():
    """Interpolated (non-endpoint) outputs of a bfloat16 solve carry only
    step-rounding-level error (~1-2%), not the ~12-21% the y-form quartic
    fit's O(|y|) cancellation produced in bf16 (regression: the fit now
    runs in f32 increment form for sub-f32 leaves, ops/interp.py
    `interp_fit_step`)."""
    f = lambda t, y: -y
    y0 = jnp.array([1.0], jnp.bfloat16)
    t = jnp.linspace(0., 2., 9, dtype=jnp.float32)
    for opts in (None, dict(error_dtype=jnp.float32)):
        ys = tde.odeint(f, y0, t, rtol=1e-3, atol=1e-5, options=opts)
        assert ys.dtype == jnp.bfloat16
        rel = np.abs(np.asarray(ys[:, 0], np.float64)
                     / np.exp(-np.asarray(t, np.float64)) - 1).max()
        assert rel < 0.03, rel


def test_bf16_event_time_accurate():
    """Event bisection on the dense interpolant stays accurate for bf16
    state (the interpolant is f32; y_event is cast back to bf16)."""
    f = lambda t, y: -y
    ev_t, y_ev = tde.odeint_event(
        f, jnp.array([1.0], jnp.bfloat16), jnp.array(0., jnp.float32),
        event_fn=lambda t, y: y[0] - 0.5, rtol=1e-3, atol=1e-5)
    assert y_ev.dtype == jnp.bfloat16
    assert abs(float(ev_t) - np.log(2)) < 0.02


def test_error_dtype_noop_on_f32():
    """error_dtype=f32 on f32 state changes nothing (the casts are
    identities): identical step counts and trajectories."""
    f = lambda t, y: -y
    y0 = jnp.array([1.0, 2.0], jnp.float32)
    t = jnp.linspace(0., 2., 5, dtype=jnp.float32)
    ys_a, st_a = tde.odeint_with_stats(f, y0, t, rtol=1e-6, atol=1e-8)
    ys_b, st_b = tde.odeint_with_stats(
        f, y0, t, rtol=1e-6, atol=1e-8,
        options=dict(error_dtype=jnp.float32))
    assert int(st_a.n_steps) == int(st_b.n_steps)
    np.testing.assert_array_equal(np.asarray(ys_a), np.asarray(ys_b))


def test_tree_state_native_shapes():
    """The explicit adaptive tier keeps native leaf shapes end to end: the
    vector field sees the user's (B, D) array / container directly (no
    flat (n,) ravel), which is what preserves leaf shardings on a mesh."""
    seen = []

    def f(t, y):
        seen.append(jnp.shape(y))
        return -y

    y0 = jnp.ones((8, 3))
    t = jnp.linspace(0., 1., 3)
    ys = tde.odeint(f, y0, t)
    assert all(s == (8, 3) for s in seen), set(seen)
    assert ys.shape == (3, 8, 3)

    seen_tree = []

    def ft(t, y):
        seen_tree.append(jnp.shape(y['x']))
        return {'x': -y['x']}

    yst = tde.odeint(ft, {'x': jnp.ones((4, 2))}, t)
    assert all(s == (4, 2) for s in seen_tree)
    assert yst['x'].shape == (3, 4, 2)


def test_raveled_paths_still_used_where_required():
    """Implicit adaptive methods and replay mode keep the flat
    representation (stage solves / recording buffers are linear-algebra on
    vectors) — and still produce correct results on container state."""
    f = lambda t, y: (-y[0],)
    y0 = (jnp.array([1.0]),)
    t = jnp.linspace(0., 1., 3)
    ys = tde.odeint(f, y0, t, method='kvaerno3', rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ys[0][-1, 0]), np.exp(-1),
                               rtol=1e-5)
    ys_r = tde.odeint(f, y0, t, options=dict(replay_grad=True,
                                             max_segments=128))
    np.testing.assert_allclose(np.asarray(ys_r[0][-1, 0]), np.exp(-1),
                               rtol=1e-6)


# ---- T=2 endpoint fast path (no output buffer in the while carry) ---------

def test_endpoint_fastpath_matches_interpolated_t2():
    """T=2 + step_to_end (buffer-free fast path) agrees with the plain T=2
    interpolated solve and the closed form."""
    f = lambda t, y: -y
    t2 = jnp.linspace(0., 2., 2)
    y0 = jnp.array([1.0, 0.5])
    y_fast, st = tde.odeint_with_stats(f, y0, t2,
                                       options=dict(step_to_end=True))
    y_interp = tde.odeint(f, y0, t2)
    assert int(st.error_code) == 0
    assert float(jnp.max(jnp.abs(y_fast[0] - y0))) == 0.0
    np.testing.assert_allclose(np.asarray(y_fast[1]),
                               np.asarray(y0) * np.exp(-2.), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(y_fast[1]), np.asarray(y_interp[1]),
                               rtol=1e-6)


def test_endpoint_fastpath_reverse_and_tuple_state():
    f = lambda t, y: (-y[0], {'a': -2.0 * y[1]['a']})
    y0 = (jnp.array([1.0]), {'a': jnp.array([3.0])})
    t2 = jnp.linspace(1., 0., 2)  # reversed span
    ys = tde.odeint(f, y0, t2, options=dict(step_to_end=True))
    np.testing.assert_allclose(float(ys[0][1, 0]), np.exp(1.), rtol=1e-6)
    np.testing.assert_allclose(float(ys[1]['a'][1, 0]), 3 * np.exp(2.),
                               rtol=1e-6)


def test_endpoint_fastpath_poisons_on_guard_trip():
    """Guard failure must still NaN-poison the (unreached) endpoint row and
    leave row 0 = y0 — the fast path has no output buffer to poison, so the
    post-loop assembly must reproduce the contract."""
    f = lambda t, y: y ** 3
    ys, st = tde.odeint_with_stats(f, jnp.array([1.0]),
                                   jnp.linspace(0., 2., 2),
                                   options=dict(step_to_end=True,
                                                max_num_steps=40))
    assert int(st.error_code) != 0
    assert bool(jnp.isnan(ys[1, 0]))
    assert float(ys[0, 0]) == 1.0


def test_endpoint_fastpath_gradients():
    """Direct (scan) and adjoint gradients through the fast path; the fused
    adjoint backward itself runs on this path (T=2 reversed span)."""
    from torchdiffeq_tpu import odeint_adjoint
    f = lambda t, y: -y
    t2 = jnp.linspace(0., 1.5, 2)
    y0 = jnp.array([1.0])

    g_adj = jax.grad(lambda y: jnp.sum(
        odeint_adjoint(f, y, t2)[-1]))(y0)
    np.testing.assert_allclose(float(g_adj[0]), np.exp(-1.5), rtol=1e-5)
