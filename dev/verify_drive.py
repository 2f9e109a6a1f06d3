"""End-to-end public-API verification drive (the /verify skill's recipe).

Run:  python dev/verify_drive.py     (CPU-pinned, x64; ~2 min)

Drives the library through its package boundary against closed-form ODE
solutions: forward accuracy, gradients, events, adjoint w/ seminorm,
several solver families, reversed time, pytree state, stats, dense output,
jit with traced t.  Exits nonzero on any failure.
"""
import sys

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, __file__.rsplit('/', 2)[0])
import torchdiffeq_tpu as tde  # noqa: E402


def main():
    f = lambda t, y: -y
    t = jnp.linspace(0., 2., 5)
    y0 = jnp.array([1.0])

    ys = tde.odeint(f, y0, t)
    assert float(jnp.max(jnp.abs(ys[:, 0] - jnp.exp(-t)))) < 1e-6

    g = jax.grad(lambda y: jnp.sum(tde.odeint(f, y, t)[-1]))(y0)
    assert abs(float(g[0]) - float(jnp.exp(-2.0))) < 1e-6

    ev_t, _ = tde.odeint_event(f, y0, jnp.array(0.),
                               event_fn=lambda t, y: y[0] - 0.5)
    assert abs(float(ev_t) - float(jnp.log(2.0))) < 1e-6

    ga = jax.grad(lambda y: jnp.sum(tde.odeint_adjoint(
        f, y, t, adjoint_options=dict(norm='seminorm'))[-1]))(y0)
    assert abs(float(ga[0]) - float(jnp.exp(-2.0))) < 1e-5

    for m, kw, tol in [
            ("rk4", dict(options=dict(step_size=0.05)), 1e-5),
            ("implicit_adams", dict(options=dict(step_size=0.05)), 1e-5),
            ("explicit_adams",
             dict(options=dict(step_size=0.05, max_order=4)), 1e-4),
            ("radauIIA5", dict(options=dict(step_size=0.05)), 1e-5),
            ("tsit5_le", {}, 1e-5),
            ("kvaerno5", {}, 1e-5),
            ("scipy_solver", {}, 1e-5)]:
        ysm = tde.odeint(f, y0, t, method=m, **kw)
        e = float(jnp.max(jnp.abs(ysm[:, 0] - jnp.exp(-t))))
        assert e < tol, (m, e)

    ysr = tde.odeint(f, jnp.array([float(jnp.exp(-2.0))]),
                     jnp.linspace(2., 0., 5))
    assert abs(float(ysr[-1, 0]) - 1.0) < 1e-6

    yst = tde.odeint(lambda t, y: (-y[0], -y[1]),
                     (jnp.array([1.0]), jnp.array(2.0)), t)
    assert abs(float(yst[1][-1]) - 2 * np.exp(-2)) < 1e-6

    _, stats = tde.odeint_with_stats(f, y0, t)
    assert int(stats.error_code) == 0
    assert int(stats.nfe) == 6 * int(stats.n_steps) + 2  # dopri5 convention

    dense = tde.odeint_dense(f, y0, 0.0, 2.0)
    assert abs(float(dense(jnp.array(1.3))[0]) - np.exp(-1.3)) < 1e-6

    jf = jax.jit(lambda tt: tde.odeint(f, y0, tt)[-1])
    assert abs(float(jf(t)[0]) - np.exp(-2.0)) < 1e-6

    print("ALL VERIFY CHECKS PASSED")


if __name__ == "__main__":
    main()
