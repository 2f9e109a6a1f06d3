"""Gradient correctness, mirroring reference tests/gradient_tests.py:

* finite-difference gradient checks through the solver for every method wrt
  (y0, t) (reference uses torch.autograd.gradcheck, :13-32; we use
  jax.test_util.check_grads / manual FD)
* adjoint gradients vs direct-backprop gradients at tight tolerance,
  including parameter and time gradients (:34-86)
* unused parameters receive exactly zero gradient (:89-135)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdiffeq_tpu as tde
from problems import (construct_problem, ADAPTIVE_METHODS, FIXED_METHODS,
                      FIXED_EXPLICIT_METHODS, FIXED_IMPLICIT_METHODS)

# Methods x the gradient path they use:
#  - fixed explicit/adams: native backprop through lax.scan (exact discrete)
#  - fixed implicit: IFT custom_vjp on each stage solve (exact at tolerance)
#  - adaptive: continuous adjoint at solver tolerance
# Every SOLVERS key except scipy_solver (non-differentiable host bridge,
# as in the reference), matching reference gradient_tests.py:13-32.
GRAD_METHODS = ('dopri5', 'dopri8', 'tsit5', 'tsit5_le', 'bosh3', 'fehlberg2',
                'adaptive_heun', 'euler', 'midpoint', 'rk4', 'heun2',
                'heun3', 'explicit_adams', 'implicit_adams', 'fixed_adams',
                'implicit_euler', 'implicit_midpoint', 'trapezoid', 'gl4',
                'gl6', 'radauIIA3', 'radauIIA5', 'sdirk2', 'trbdf2',
                'kvaerno3', 'kvaerno5', 'radau5a')


def _fd_grad(fn, x, eps=1e-6):
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    for i in range(x.size):
        xp = x.copy().reshape(-1)
        xm = x.copy().reshape(-1)
        xp[i] += eps
        xm[i] -= eps
        g.reshape(-1)[i] = (float(fn(jnp.asarray(xp.reshape(x.shape))))
                            - float(fn(jnp.asarray(xm.reshape(x.shape))))) / (2 * eps)
    return g


# Reference-rigor FD gradchecks: finite differences perturb the DISCRETE
# solver map, so the differentiable path under test must be the same
# discrete map.  For adaptive methods that map is the replayed step
# sequence (discretise-then-optimise, the reference's autograd-through-
# the-solver semantics, gradient_tests.py:13-32) with the accepted-step
# boundaries FROZEN from one recording pass: re-recording per FD
# perturbation would flip accept/reject decisions and add O(tol/eps)
# noise that has nothing to do with gradient correctness.  Fixed/implicit
# scans already backprop their discrete map natively.  The continuous
# adjoint (the default gradient path) is validated separately in
# test_adjoint_vs_direct and test_adjoint_vs_replay.

# Per-method budgets: low-order methods take tens of thousands of steps at
# 1e-9 (infeasible replay scans); the frozen-boundary comparison is
# budget-independent, so run them at a cheaper tolerance.
_ADAPTIVE_GRADCHECK_TOL = {
    'bosh3': dict(rtol=1e-6, atol=1e-8),
    'fehlberg2': dict(rtol=1e-6, atol=1e-8),
    'adaptive_heun': dict(rtol=1e-6, atol=1e-8),
    'kvaerno3': dict(rtol=1e-7, atol=1e-9),
}


def _frozen_replay_loss(f, y0, t_points, method, project):
    """Build a differentiable loss through the frozen-boundary replayed
    discrete solve: loss(y0_, t_) -> scalar."""
    from torchdiffeq_tpu.misc import check_inputs
    from torchdiffeq_tpu.odeint import _adaptive_config
    from torchdiffeq_tpu.solvers import SOLVERS, replay

    tol = _ADAPTIVE_GRADCHECK_TOL.get(method, dict(rtol=1e-9, atol=1e-11))
    prob = check_inputs(f, y0, t_points, tol['rtol'], tol['atol'], method,
                        None, None, SOLVERS)
    cfg = _adaptive_config(prob, SOLVERS[prob.method]['tableau'])

    # one concrete recording pass; trim the buffer to the exact count
    cap = 1 << 16
    times, count, stats = jax.jit(
        lambda: replay.record_segments(replay._tangent_free(prob.func),
                                       prob.y0, prob.t, cfg, cap))()
    assert int(stats.error_code) == 0, int(stats.error_code)
    times = jnp.asarray(np.asarray(times)[:int(count) + 1])
    count = jnp.int32(int(count))

    def loss(y0_, t_):
        prob_ = check_inputs(f, y0_, t_, tol['rtol'], tol['atol'], method,
                             None, None, SOLVERS)
        out = replay.replay_integrate(prob_.func, prob_.y0, prob_.t, cfg,
                                      times, count)
        return project(out)

    return loss


@pytest.mark.slow
@pytest.mark.parametrize('method', GRAD_METHODS)
def test_gradcheck_y0(method):
    """d(sum y(T))/dy0 matches central finite differences, at a uniform
    2e-3 slack for every method (reference gradient_tests.py:13-32)."""
    f, y0, t_points, sol = construct_problem(ode='linear', npts=3)
    project = lambda ys: jnp.sum(ys[-1] * jnp.arange(1.0, 1.0 + ys.shape[1]))

    if method in ADAPTIVE_METHODS:
        loss2 = _frozen_replay_loss(f, y0, t_points, method, project)
        loss = jax.jit(lambda y0_: loss2(y0_, t_points))
    else:
        kwargs = {}
        # num_steps (not step_size): the losses are jitted — the FD loop
        # re-executes the compiled solve instead of eager op-by-op stepping
        # (the implicit methods' masked Broyden iterations are ~100x slower
        # eager) — and jit lifts the closed-over t to a tracer, which
        # step_size rejects (static grid shape).
        n_grid = int(round(float(t_points[-1] - t_points[0]) / 0.1))
        if method in ('euler', 'midpoint', 'heun2', 'implicit_euler',
                      'implicit_midpoint'):
            kwargs = dict(options=dict(num_steps=n_grid))
        if method in ('explicit_adams', 'implicit_adams', 'fixed_adams'):
            # order-12 AB is unstable on this problem at h=0.1 (tiny
            # stability region — the reference behaves identically).
            kwargs = dict(options=dict(num_steps=n_grid, max_order=4))

        @jax.jit
        def loss(y0_):
            return project(tde.odeint(f, y0_, t_points, method=method,
                                      **kwargs))

    g = np.asarray(jax.jit(jax.grad(loss))(y0))
    g_fd = _fd_grad(loss, y0)
    np.testing.assert_allclose(g, g_fd, rtol=2e-3, atol=1e-7,
                               err_msg=f"method={method}")


@pytest.mark.slow
@pytest.mark.parametrize('method', GRAD_METHODS)
def test_gradcheck_t(method):
    """Gradient wrt the output times matches finite differences, for every
    method at a uniform 2e-3 slack (reference gradchecks (y0, t) for all
    methods, gradient_tests.py:13-32).  Fixed-grid methods step on the
    output grid itself, so t-grads flow through the step sizes; adaptive
    methods differentiate the frozen-boundary replayed map (emission
    through the interpolant included, exactly what FD perturbs)."""
    f, y0, t_points, sol = construct_problem(ode='sine', npts=4)
    project = lambda ys: jnp.sum(ys ** 2)

    if method in ADAPTIVE_METHODS:
        loss2 = _frozen_replay_loss(f, y0, t_points, method, project)
        loss = jax.jit(lambda t_: loss2(y0, t_))
    else:
        kwargs = {}
        if method in ('explicit_adams', 'implicit_adams', 'fixed_adams'):
            kwargs = dict(options=dict(max_order=4))

        @jax.jit
        def loss(t_):
            return project(tde.odeint(f, y0, t_, method=method, **kwargs))

    g = np.asarray(jax.jit(jax.grad(loss))(t_points))
    g_fd = _fd_grad(loss, t_points, eps=1e-6)
    # atol scaled to the gradient magnitude: central FD of a loss of size L
    # carries ~L*eps_f64/fd_eps = 1e-10*L absolute noise, which swamps tiny
    # entries when other entries (hence L) are ~1e7 (the 'sine' problem's
    # growing solution).  This is FD conditioning, not gradient error.
    atol = max(1e-7, 1e-8 * float(np.abs(g_fd).max()))
    np.testing.assert_allclose(g, g_fd, rtol=2e-3, atol=atol,
                               err_msg=f"method={method}")


@pytest.mark.parametrize('method', sorted(set(ADAPTIVE_METHODS)))
def test_adjoint_vs_replay(method):
    """The continuous adjoint (default gradient path) agrees with the exact
    discrete replay gradients, per adaptive method.  The gap IS the
    continuous-vs-discrete difference, bounded by the integration
    tolerance (hence the order-dependent budgets: low-order methods run at
    the cheaper tolerance their step counts allow)."""
    f, y0, t_points, sol = construct_problem(ode='linear', npts=3)
    tol = _ADAPTIVE_GRADCHECK_TOL.get(method, dict(rtol=1e-9, atol=1e-11))

    def loss(y0_, opts):
        ys = tde.odeint(f, y0_, t_points, method=method, **tol, options=opts)
        return jnp.sum(ys[-1] * jnp.arange(1.0, 1.0 + ys.shape[1]))

    g_adj = np.asarray(jax.jit(jax.grad(lambda y: loss(y, None)))(y0))
    g_rep = np.asarray(jax.jit(jax.grad(
        lambda y: loss(y, dict(replay_grad=True, max_segments=16384))))(y0))
    rtol = {'bosh3': 1e-3, 'adaptive_heun': 1e-3, 'fehlberg2': 1e-3,
            'kvaerno3': 5e-3}.get(method, 1e-5)
    np.testing.assert_allclose(g_adj, g_rep, rtol=rtol, atol=1e-8,
                               err_msg=f"method={method}")


@pytest.mark.parametrize('ode', ['constant', 'linear', 'sine', 'exp'])
@pytest.mark.parametrize('reverse', [False, True])
def test_adjoint_vs_direct(ode, reverse):
    """odeint_adjoint gradients match plain odeint gradients at tight
    tolerance, incl. parameters and times (reference gradient_tests.py:34-86).
    Per-problem error budgets from the reference (:41-49)."""
    import copy
    eps = dict(constant=1e-10, sine=5e-3, linear=2e-3, exp=1e-2)[ode]

    f, y0, t_points, _ = construct_problem(ode=ode, reverse=reverse)
    params = f.params

    def bind(params_):
        g = copy.copy(f)
        g.params = params_
        return g

    def make_loss(odeint_fn):
        def loss(y0_, t_, params_):
            ys = odeint_fn(bind(params_), y0_, t_, rtol=1e-9, atol=1e-12)
            return jnp.sum(ys ** 2)
        return loss

    loss_direct = make_loss(tde.odeint)
    loss_adjoint = make_loss(tde.odeint_adjoint)

    g_direct = jax.grad(loss_direct, argnums=(0, 1, 2))(y0, t_points, params)
    g_adjoint = jax.grad(loss_adjoint, argnums=(0, 1, 2))(y0, t_points, params)

    for ga, gd in zip(jax.tree_util.tree_leaves(g_adjoint),
                      jax.tree_util.tree_leaves(g_direct)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gd),
                                   rtol=eps, atol=eps)


def test_unused_params_zero_grad():
    """Parameters not used by the vector field get exactly zero gradient
    (reference gradient_tests.py:89-135)."""
    used = jnp.array([[-0.5]])
    unused = jnp.array([7.0, 8.0])

    def f(t, y, used_, unused_):
        return y @ used_

    def loss(used_, unused_):
        ys = tde.odeint_adjoint(f, jnp.ones((1,)), jnp.linspace(0., 1., 3),
                                args=(used_, unused_))
        return jnp.sum(ys[-1])

    g_used, g_unused = jax.grad(loss, argnums=(0, 1))(used, unused)
    assert float(jnp.max(jnp.abs(g_used))) > 0
    np.testing.assert_array_equal(np.asarray(g_unused), np.zeros(2))


def test_adjoint_closure_params():
    """Gradients flow to arrays closed over by func (reference requires
    nn.Module param discovery, adjoint.py:226-240; we use closure_convert)."""
    A = jnp.array([[-0.7]])

    def loss(A_):
        f = lambda t, y: y @ A_
        ys = tde.odeint_adjoint(f, jnp.ones((1,)), jnp.linspace(0., 2., 3),
                                rtol=1e-10, atol=1e-12)
        return jnp.sum(ys[-1])

    g = jax.grad(loss)(A)
    g_fd = _fd_grad(loss, A)
    np.testing.assert_allclose(np.asarray(g), g_fd, rtol=1e-6, atol=1e-9)


def test_adjoint_different_method():
    """adjoint_method different from forward method."""
    f, y0, t_points, sol = construct_problem(ode='constant', npts=3)

    def loss(y0_):
        ys = tde.odeint_adjoint(f, y0_, t_points, rtol=1e-9, atol=1e-11,
                                adjoint_method='bosh3', adjoint_rtol=1e-9,
                                adjoint_atol=1e-11)
        return jnp.sum(ys[-1])

    g = np.asarray(jax.grad(loss)(y0))
    g_fd = _fd_grad(loss, y0)
    np.testing.assert_allclose(g, g_fd, rtol=1e-5, atol=1e-8)


def test_second_forward_after_grad():
    """The solve is re-usable after being differentiated (no tracer
    leakage from the custom_vjp machinery)."""
    f, y0, t_points, sol = construct_problem(ode='constant', npts=3)
    loss = lambda y0_: jnp.sum(tde.odeint(f, y0_, t_points)[-1])
    jax.grad(loss)(y0)
    out1 = loss(y0)
    out2 = loss(y0)
    assert float(out1) == float(out2)


# ---- forward-mode sensitivities: options=dict(forward_grad=True) ----------
# Extension over the reference (torch has no forward-mode odeint): the raw
# while_loop solve is returned with no custom_vjp wrapper, so jvp/jacfwd
# trace straight through the compiled loop.

def test_forward_grad_jvp_matches_closed_form():
    f = lambda t, y: -y
    t = jnp.linspace(0., 2., 5)
    y0 = jnp.array([1.0])
    solve = lambda y0_: tde.odeint(f, y0_, t,
                                   options=dict(forward_grad=True))
    primal, tangent = jax.jvp(solve, (y0,), (jnp.ones(1),))
    np.testing.assert_allclose(np.asarray(primal[:, 0]),
                               np.exp(-np.asarray(t)), rtol=1e-6)
    # d y(t)/d y0 = exp(-t) for linear decay
    np.testing.assert_allclose(np.asarray(tangent[:, 0]),
                               np.exp(-np.asarray(t)), rtol=1e-6)


def test_forward_grad_jacfwd_matches_adjoint_jacrev():
    f, y0, t_points, sol = construct_problem(ode='linear', npts=3)
    last = lambda y0_, opts: tde.odeint(f, y0_, t_points, rtol=1e-9,
                                        atol=1e-11, options=opts)[-1]
    J_fwd = jax.jacfwd(lambda y: last(y, dict(forward_grad=True)))(y0)
    J_rev = jax.jacrev(lambda y: last(y, None))(y0)
    np.testing.assert_allclose(np.asarray(J_fwd), np.asarray(J_rev),
                               rtol=1e-4, atol=1e-7)


def test_forward_grad_jvp_wrt_t():
    f = lambda t, y: -y
    y0 = jnp.array([1.0])

    def ends(t1):
        t = jnp.stack([jnp.asarray(0.), t1])
        return tde.odeint(f, y0, t, options=dict(forward_grad=True))[-1, 0]

    _, tang = jax.jvp(ends, (jnp.asarray(1.5),), (jnp.asarray(1.0),))
    # d y(t1)/d t1 = -exp(-t1)
    np.testing.assert_allclose(float(tang), -np.exp(-1.5), rtol=1e-6)


def test_forward_grad_second_order():
    f = lambda t, y: -y ** 2
    t = jnp.linspace(0., 1., 2)

    def last(y0_):
        return tde.odeint(f, y0_[None], t, rtol=1e-10, atol=1e-12,
                          options=dict(forward_grad=True))[-1, 0]

    # y(1) = y0/(1 + y0); d2y/dy0^2 = -2/(1+y0)^3
    y0 = jnp.asarray(0.5)
    d2 = jax.jacfwd(jax.jacfwd(last))(y0)
    np.testing.assert_allclose(float(d2), -2 / 1.5 ** 3, rtol=1e-5)


def test_forward_grad_event_raises():
    f = lambda t, y: -y
    with pytest.raises(ValueError, match="replay_grad"):
        tde.odeint(f, jnp.array([1.0]), jnp.linspace(0., 1., 2),
                   event_fn=lambda t, y: y[0] - 0.5,
                   options=dict(forward_grad=True))


def test_forward_grad_noop_on_fixed_methods():
    """Fixed-grid scans are already forward-differentiable; the option is
    accepted silently and both AD modes keep working."""
    f = lambda t, y: -y
    t = jnp.linspace(0., 2., 5)
    y0 = jnp.array([1.0])
    solve = lambda y0_: tde.odeint(f, y0_, t, method='rk4',
                                   options=dict(forward_grad=True,
                                                step_size=0.05))
    _, tangent = jax.jvp(solve, (y0,), (jnp.ones(1),))
    np.testing.assert_allclose(np.asarray(tangent[:, 0]),
                               np.exp(-np.asarray(t)), rtol=1e-5)
    g = jax.grad(lambda y: jnp.sum(solve(y)))(y0)
    assert np.isfinite(np.asarray(g)).all()


def test_adjoint_max_num_steps_is_per_interval():
    """A user adjoint max_num_steps budget keeps its reference semantics
    (per backward interval) under the fused single-sweep backward: the
    fused solve scales the budget by T-1, so a budget that suffices per
    interval yields correct finite gradients, not a truncated sweep."""
    f = lambda t, y: -y
    t = jnp.linspace(0., 2., 10)
    y0 = jnp.array([1.0])

    def loss(y0_):
        ys = tde.odeint_adjoint(f, y0_, t,
                                adjoint_options=dict(max_num_steps=50))
        return jnp.sum(ys[-1])

    g = np.asarray(jax.grad(loss)(y0))
    assert np.isfinite(g).all()
    np.testing.assert_allclose(g[0], np.exp(-2.), rtol=1e-5)


def test_adjoint_max_num_steps_budget_no_overflow():
    """A generous per-interval budget times many output intervals must not
    overflow int32 at trace time (the fused backward clamps the scaled
    whole-span budget)."""
    f = lambda t, y: -y
    t = jnp.linspace(0., 1., 3000)
    y0 = jnp.array([1.0])

    def loss(y0_):
        ys = tde.odeint_adjoint(f, y0_, t,
                                adjoint_options=dict(max_num_steps=10**6))
        return jnp.sum(ys[-1])

    g = np.asarray(jax.grad(loss)(y0))
    np.testing.assert_allclose(g[0], np.exp(-1.), rtol=1e-5)


def test_vmap_of_grad_fused_adjoint():
    """vmap(grad(...)) over the fused single-sweep adjoint: per-sample
    controllers in both the forward and the fused backward while_loop."""
    f = lambda t, y: -y
    t = jnp.linspace(0., 2., 6)
    y0s = jnp.linspace(0.5, 2.0, 8)[:, None]       # (8, 1)

    def loss(y0_):
        return jnp.sum(tde.odeint_adjoint(f, y0_, t))

    gs = jax.vmap(jax.grad(loss))(y0s)
    exact = np.sum(np.exp(-np.asarray(t)))          # d/dy0 sum_i y0 e^{-t_i}
    np.testing.assert_allclose(np.asarray(gs[:, 0]), exact, rtol=1e-5)
