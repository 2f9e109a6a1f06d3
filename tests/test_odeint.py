"""Solver conformance tests, mirroring reference tests/odeint_tests.py:

* analytic-solution accuracy across {method} x {dtype} x {direction} with
  per-method error budgets (reference odeint_tests.py:15-58)
* scipy solver sweep (:77-95)
* single-time-point no-op (:98-111)
* jump_t reduces NFE (:126-161)
* perturb moves evaluation times off grid points (:164-207)
* custom grid_constructor (:210-248)
* min_step / max_step change NFE in the expected direction (:251-268)
* accept + reject == step accounting (:310-386, via Stats instead of
  callbacks)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdiffeq_tpu as tde
from problems import (construct_problem, ADAPTIVE_METHODS, FIXED_METHODS,
                      FIXED_EXPLICIT_METHODS, METHODS, ADAMS_METHODS,
                      IMPLICIT_METHODS)


def rel_error(sol, ys):
    sol = np.asarray(sol)
    ys = np.asarray(ys)
    return np.max(np.abs(sol - ys) / (1e-6 + np.abs(sol)))


def _problem_matrix(method):
    """Which problems each method family is tested on (reference
    odeint_tests.py:34-42): adaptive -> all four, implicit fixed-grid ->
    constant+exp, other fixed-grid -> constant only."""
    if method in ADAPTIVE_METHODS or method in ('scipy_solver',):
        return ('constant', 'linear', 'sine', 'exp')
    if method in IMPLICIT_METHODS:
        return ('constant', 'exp')
    return ('constant',)


def _eps(method, ode):
    """Reference error budgets (odeint_tests.py:44-51)."""
    if method in ('adaptive_heun', 'bosh3'):
        return 4e-3
    if ode == 'linear':
        return 2e-3
    if ode == 'exp':
        return 5e-2
    return 3e-4


def _kwargs(method, dtype):
    if method == 'dopri8':
        # dopri8 needs very tight tolerances before the quartic interpolant
        # stops dominating (reference odeint_tests.py:28-31).
        return dict(rtol=1e-12, atol=1e-14) if dtype == jnp.float64 \
            else dict(rtol=1e-7, atol=1e-7)
    return {}


@pytest.mark.parametrize('reverse', [False, True])
@pytest.mark.parametrize('method', METHODS)
def test_odeint_accuracy(method, reverse):
    dtype = jnp.float64
    for ode in _problem_matrix(method):
        eps = _eps(method, ode)
        kwargs = _kwargs(method, dtype)
        f, y0, t_points, sol = construct_problem(ode=ode, reverse=reverse,
                                                 dtype=dtype)
        ys = tde.odeint(f, y0, t_points, method=method, **kwargs)
        err = rel_error(sol, ys)
        assert err < eps, f"{method}/{ode}/rev={reverse}: {err} >= {eps}"


@pytest.mark.parametrize('method', ADAPTIVE_METHODS)
def test_odeint_accuracy_f32(method):
    f, y0, t_points, sol = construct_problem(ode='constant',
                                             dtype=jnp.float32)
    ys = tde.odeint(f, y0, t_points, method=method,
                    **_kwargs(method, jnp.float32))
    assert rel_error(sol, ys) < 5e-3


@pytest.mark.parametrize('reverse', [False, True])
def test_odeint_adjoint_accuracy(reverse):
    """reference odeint_tests.py:60-74."""
    for ode in ('constant', 'linear', 'sine', 'exp'):
        eps = 2e-3 if ode == 'linear' else 1e-4
        f, y0, t_points, sol = construct_problem(ode=ode, reverse=reverse)
        ys = tde.odeint_adjoint(f, y0, t_points)
        assert rel_error(sol, ys) < eps, f"{ode}/rev={reverse}"


@pytest.mark.parametrize('solver', ['LSODA', 'RK45', 'BDF'])
def test_scipy_solvers(solver):
    f, y0, t_points, sol = construct_problem(ode='constant')
    ys = tde.odeint(f, y0, t_points, method='scipy_solver',
                    options=dict(solver=solver))
    assert rel_error(sol, ys) < 1e-3


@pytest.mark.parametrize('method', ('dopri5', 'rk4', 'implicit_adams'))
def test_single_time_point(method):
    f, y0, t_points, sol = construct_problem(ode='constant')
    kwargs = dict(options=dict(step_size=0.1)) if method != 'dopri5' else {}
    ys = tde.odeint(f, y0, t_points[0:1], method=method, **kwargs)
    assert ys.shape[0] == 1
    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(y0), rtol=1e-12)


def test_jump_t_reduces_nfe():
    """A vector field with a jump: telling the solver where the jump is
    should reduce NFE (reference odeint_tests.py:126-161)."""
    def f(t, y):
        return jnp.where(t < 0.5, -0.5 * y, y ** 2)

    y0 = jnp.array([1.0])
    t = jnp.linspace(0., 1.0, 2)

    _, stats_plain = tde.odeint_with_stats(f, y0, t, method='dopri5')
    _, stats_jump = tde.odeint_with_stats(f, y0, t, method='dopri5',
                                          options=dict(jump_t=jnp.array([0.5])))
    assert stats_plain.error_code == 0 and stats_jump.error_code == 0
    assert int(stats_jump.nfe) < int(stats_plain.nfe)


def test_step_t_hits_grid_point():
    """step_t forces a step boundary exactly at the given time."""
    hit = []

    def f(t, y):
        return -y

    y0 = jnp.array([1.0])
    t = jnp.linspace(0., 2., 2)
    ys, stats = tde.odeint_with_stats(f, y0, t, method='dopri5',
                                      options=dict(step_t=jnp.array([0.7])))
    assert stats.error_code == 0
    assert abs(float(ys[-1, 0]) - np.exp(-2)) < 1e-6


@pytest.mark.parametrize('perturb', [False, True])
def test_perturb(perturb):
    """With perturb=True, fixed solvers evaluate at nextafter-shifted times
    (reference odeint_tests.py:164-207).  Observed via jax.pure_callback
    recording of evaluation times."""
    times = []

    def f(t, y):
        def record(tv):
            times.append(float(tv))
            return np.zeros((), np.float64)
        _ = jax.pure_callback(record, jax.ShapeDtypeStruct((), jnp.float64),
                              t.astype(jnp.float64))
        return -y + 0.0 * _

    # Start at 1.0, not 0.0: nextafter(0.0) is a denormal that XLA's
    # flush-to-zero returns to exactly 0.0 (the reference test also uses a
    # grid away from zero, odeint_tests.py:171).
    y0 = jnp.array([1.0])
    t = jnp.array([1.0, 2.0])
    with jax.disable_jit():
        tde.odeint(f, y0, t, method='euler',
                   options=dict(step_size=0.5, perturb=perturb))
    assert len(times) > 0
    on_grid = [tt for tt in times if tt in (1.0, 1.5)]
    if perturb:
        # every evaluation time is nudged off the exact grid point
        assert len(on_grid) == 0, times
    else:
        assert len(on_grid) > 0, times


def test_nextafter_arith_emulation():
    """The arithmetic nextafter emulation (f64-on-TPU path, where XLA
    cannot lower f64 `nextafter`): bumps 1-2 ULP in the right direction,
    is exact-identity at x1 == x2, and moves off the value at 0."""
    from torchdiffeq_tpu.misc import _nextafter_arith
    for x in [1.0, -1.0, 0.37, 1e10, 1e-10, 0.0]:
        for target, sign in [(x + 1.0, +1), (x - 1.0, -1)]:
            out = float(_nextafter_arith(jnp.float64(x), jnp.float64(target)))
            exact = np.nextafter(x, np.float64(target))
            ulp = abs(exact - x) if exact != x else np.finfo(np.float64).tiny
            # moved off x, toward target, by at most 2 ULP + tiny floor
            assert out != x
            assert (out - x) * sign > 0
            assert abs(out - x) <= 2 * ulp + 2 * np.finfo(np.float64).tiny
    # identity when already equal
    assert float(_nextafter_arith(jnp.float64(3.5), jnp.float64(3.5))) == 3.5


def test_grid_constructor():
    """Custom grid constructor drives the fixed solver (reference
    odeint_tests.py:210-230)."""
    f, y0, t_points, sol = construct_problem(ode='constant')

    def grid_constructor(func, y0, t):
        return jnp.linspace(float(t_points[0]), float(t_points[-1]), 200)

    ys = tde.odeint(f, y0, t_points, method='euler',
                    options=dict(grid_constructor=grid_constructor))
    assert rel_error(sol, ys) < 2e-2


def test_min_max_step():
    """max_step decreases step sizes => more NFE; min_step forces larger
    steps => fewer NFE (reference odeint_tests.py:251-268)."""
    f, y0, t_points, sol = construct_problem(ode='linear')
    _, stats = tde.odeint_with_stats(f, y0, t_points, method='dopri5')
    _, stats_max = tde.odeint_with_stats(f, y0, t_points, method='dopri5',
                                         options=dict(max_step=0.05))
    _, stats_min = tde.odeint_with_stats(f, y0, t_points, method='dopri5',
                                         options=dict(min_step=0.5))
    assert int(stats_max.nfe) > int(stats.nfe)
    assert int(stats_min.nfe) < int(stats.nfe)


def test_accept_plus_reject_equals_steps():
    """Step accounting invariant (reference odeint_tests.py:310-386 tests
    this via callbacks; we assert it on Stats)."""
    f, y0, t_points, sol = construct_problem(ode='linear')
    for method in ADAPTIVE_METHODS:
        _, stats = tde.odeint_with_stats(f, y0, t_points, method=method)
        assert int(stats.n_accepted) + int(stats.n_rejected) == int(stats.n_steps)
        assert int(stats.error_code) == 0


def test_dopri5_fsal_nfe():
    """dopri5 costs 6 VF evals per step (FSAL) plus 2 for initial-step
    selection (reference FAQ.md:44-52)."""
    f, y0, t_points, sol = construct_problem(ode='linear')
    _, stats = tde.odeint_with_stats(f, y0, t_points, method='dopri5')
    assert int(stats.nfe) == 6 * int(stats.n_steps) + 2


def test_first_step_option():
    f, y0, t_points, sol = construct_problem(ode='linear')
    _, stats = tde.odeint_with_stats(f, y0, t_points, method='dopri5',
                                     options=dict(first_step=0.01))
    # no initial-step probe => nfe == 6*steps + 1
    assert int(stats.nfe) == 6 * int(stats.n_steps) + 1


def test_error_code_on_blowup():
    fb = lambda t, y: y ** 3
    ys, stats = tde.odeint_with_stats(fb, jnp.array([5.0]),
                                      jnp.linspace(0., 5., 5),
                                      method='dopri5',
                                      options=dict(max_num_steps=5000))
    assert int(stats.error_code) != 0
    assert bool(jnp.isnan(ys[-1, 0]))


def test_blowup_poisons_exactly_the_unreached_tail():
    """A mid-trajectory guard trip must NaN-poison EVERY output row past
    the integrated span and leave every reached row finite.  Regression
    for the guard-trip emission bug: the frozen carry kept the last
    accepted step's window, whose re-emission advanced i_out past the
    truly-written rows and left unreached rows as silent zeros."""
    fb = lambda t, y: y ** 3  # y0=1: blow-up at t=0.5
    ys, stats = tde.odeint_with_stats(fb, jnp.array([1.0]),
                                      jnp.linspace(0., 1., 6),
                                      rtol=1e-6, atol=1e-8,
                                      options=dict(max_num_steps=20))
    assert int(stats.error_code) == 3
    vals = np.asarray(ys[:, 0])
    nan_mask = np.isnan(vals)
    # rows strictly before t=0.5 (indices 0, 1, 2 at t=0, .2, .4) are
    # reachable and must be finite; everything at/after the singularity
    # must be poisoned — and poisoning must be a contiguous tail.
    assert not nan_mask[:3].any(), vals
    assert nan_mask[3:].all(), vals
    exact = 1.0 / np.sqrt(1.0 - 2.0 * np.linspace(0., 1., 6)[:3])
    np.testing.assert_allclose(vals[:3], exact, rtol=1e-4)


def test_odeint_under_jit_traced_t():
    f = lambda t, y: -y
    y0 = jnp.array([1.0])
    t = jnp.linspace(0., 2., 5)

    @jax.jit
    def solve(y0_, t_):
        return tde.odeint(f, y0_, t_, rtol=1e-9, atol=1e-11)

    ys = solve(y0, t)
    assert abs(float(ys[-1, 0]) - np.exp(-2)) < 1e-7
    ys_rev = solve(jnp.array([np.exp(-2.0)]), jnp.linspace(2., 0., 5))
    assert abs(float(ys_rev[-1, 0]) - 1.0) < 1e-6


def test_pi_controller():
    """PI controller solves correctly with (near-)zero rejections
    (Gustafsson-style; reference only has the I-controller)."""
    f, y0, t_points, sol = construct_problem(ode='linear')
    ys_i, s_i = tde.odeint_with_stats(f, y0, t_points, method='bosh3')
    ys_pi, s_pi = tde.odeint_with_stats(f, y0, t_points, method='bosh3',
                                        options=dict(controller='pi'))
    assert int(s_pi.n_rejected) < int(s_i.n_rejected)
    assert rel_error(sol, ys_pi) < 4e-3


def test_pid_controller():
    """Full PID controller (Söderlind digital-filter family): correct
    solves; dcoeff=0 reduces EXACTLY to the PI controller."""
    f, y0, t_points, sol = construct_problem(ode='linear')
    ys_pid, s_pid = tde.odeint_with_stats(
        f, y0, t_points, options=dict(controller='pid', dcoeff=0.2))
    assert rel_error(sol, ys_pid) < 1e-5
    assert int(s_pid.error_code) == 0

    _, s_pi = tde.odeint_with_stats(f, y0, t_points,
                                    options=dict(controller='pi'))
    _, s_pid0 = tde.odeint_with_stats(
        f, y0, t_points, options=dict(controller='pid', dcoeff=0.0))
    assert int(s_pid0.n_steps) == int(s_pi.n_steps)
    assert int(s_pid0.n_rejected) == int(s_pi.n_rejected)


def test_implicit_nonconvergence_error_code():
    """A stage solve that exhausts max_iters surfaces error_code=4
    (the reference warns and continues, rk_common.py:461-462; values
    still match, the signal is machine-checkable here)."""
    f = lambda t, y: -1e4 * (y - jnp.cos(10 * t))
    ys, st = tde.odeint_with_stats(
        f, jnp.array([0.0]), jnp.linspace(0., 1., 2),
        method='implicit_midpoint', options=dict(num_steps=2, max_iters=1))
    assert int(st.error_code) == 4
    with pytest.raises(RuntimeError, match="did not converge"):
        st.raise_if_error()

    _, st_ok = tde.odeint_with_stats(
        f, jnp.array([0.0]), jnp.linspace(0., 1., 2),
        method='implicit_euler', options=dict(num_steps=200))
    assert int(st_ok.error_code) == 0
