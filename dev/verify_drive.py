import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
import torchdiffeq_tpu as tde
from torchdiffeq_tpu.adjoint import odeint_adjoint

f = lambda t, y: -y
t = jnp.linspace(0., 2., 5); y0 = jnp.array([1.0])

# forward, every family
for method, opts in [(None, None), ('dopri8', None), ('tsit5', None),
                     ('rk4', dict(step_size=0.01)),
                     ('fixed_adams', dict(step_size=0.01)),
                     ('trapezoid', dict(step_size=0.01)),
                     ('kvaerno5', None), ('scipy_solver', None)]:
    ys = tde.odeint(f, y0, t, method=method, options=opts, rtol=1e-8, atol=1e-10)
    err = float(jnp.max(jnp.abs(ys[:, 0] - jnp.exp(-t))))
    # dopri8's interior outputs come from the quartic interpolant
    # (order-4, like the reference's) whose midpoint error exceeds the
    # solver tolerance at order-8 step sizes — bit-identical pre/post
    # change, a design characteristic not a regression
    tol = 1e-5 if method in ('dopri8', 'trapezoid') else (1e-6 if method in ('rk4', 'fixed_adams', 'kvaerno5') else 1e-7)
    assert err < tol, (method, err)
    print(f"{method or 'dopri5':14s} max err {err:.2e}")

# big-T grid: exercises BOTH emission bodies around the new _SCATTER_EMIT_MAX_T=64
for T in (64, 65, 200):
    tT = jnp.linspace(0., 2., T)
    ysT, st = tde.odeint_with_stats(f, y0, tT)
    assert int(st.error_code) == 0
    err = float(jnp.max(jnp.abs(ysT[:, 0] - jnp.exp(-tT))))
    assert err < 1e-7, (T, err)
    print(f"T={T:4d} max err {err:.2e} steps={int(st.n_steps)}")

# big-state path (the new scatter-body regime): (B=3000, D=200) = 6M elems, T=10
yB = jnp.ones((3000, 200)); tB = jnp.linspace(0., 1., 10)
ysB, stB = tde.odeint_with_stats(f, yB, tB, rtol=1e-6, atol=1e-8)
assert int(stB.error_code) == 0
errB = float(jnp.max(jnp.abs(ysB[-1] - np.exp(-1.0))))
assert errB < 1e-6, errB
print(f"big-state T=10 (6M elems) err {errB:.2e} steps={int(stB.n_steps)}")

# gradients: plain, adjoint+seminorm, replay
g = jax.grad(lambda y: jnp.sum(tde.odeint(f, y, t)[-1]))(y0)
assert abs(float(g[0]) - np.exp(-2)) < 1e-6
g2 = jax.grad(lambda y: jnp.sum(odeint_adjoint(
    f, y, t, adjoint_options=dict(norm='seminorm'))[-1]))(y0)
assert abs(float(g2[0]) - np.exp(-2)) < 1e-6
g3 = jax.grad(lambda y: jnp.sum(tde.odeint(
    f, y, t, options=dict(replay_grad=True))[-1]))(y0)
assert abs(float(g3[0]) - np.exp(-2)) < 1e-6
print("grads ok:", float(g[0]), float(g2[0]), float(g3[0]))

# big-state adjoint grad (new body in the backward too)
gB = jax.grad(lambda y: jnp.sum(odeint_adjoint(f, y, tB)[-1]))(yB)
assert abs(float(gB[0, 0]) - np.exp(-1)) < 1e-5
print("big-state adjoint grad ok:", float(gB[0, 0]))

# events
ev_t, sol = tde.odeint_event(f, y0, jnp.array(0.),
                             event_fn=lambda t, y: y[0] - 0.5)
assert abs(float(ev_t) - np.log(2)) < 1e-6
print("event time ok:", float(ev_t))

# reversed time, pytree state, stats, dense, jit-traced t
ysr = tde.odeint(f, y0, jnp.linspace(2., 0., 5))
# reverse time: y(t) = e^(2-t) with y(2)=1, so y(0) = e^2
assert abs(float(ysr[-1, 0]) - np.exp(2)) < 1e-5, float(ysr[-1, 0])
y0p = (jnp.array([1.0]), dict(a=jnp.array(2.0)))
fp = lambda t, y: (-y[0], dict(a=-0.5 * y[1]['a']))
ysp = tde.odeint(fp, y0p, t)
assert abs(float(ysp[1]['a'][-1]) - 2 * np.exp(-1.0)) < 1e-7
_, s = tde.odeint_with_stats(f, y0, t)
assert int(s.error_code) == 0 and int(s.nfe) == 6 * int(s.n_steps) + 2
dsol = tde.odeint_dense(f, y0, 0.0, 2.0)
assert abs(float(dsol(jnp.array(1.3))[0]) - np.exp(-1.3)) < 1e-7

@jax.jit
def solve_traced(t1):
    tt = jnp.stack([jnp.zeros_like(t1), t1])
    return tde.odeint(f, y0, tt)[-1]
assert abs(float(solve_traced(jnp.array(2.0))[0]) - np.exp(-2)) < 1e-7
print("reversed/pytree/stats/dense/traced-t all ok")
print("VERIFY PASS")
