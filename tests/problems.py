"""Closed-form ODE problem fixtures, mirroring the reference test fixtures
(reference tests/problems.py): constant, sine-forced linear, 10-dim
antisymmetric linear system with matrix-exponential ground truth, and an
exponential-decay problem.  Each problem exposes params as an explicit pytree
(idiomatic JAX) plus `y_exact`."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg


class ConstantODE:
    """dy/dt = a + (y - (a t + b))^5, exact y = a t + b
    (reference problems.py:7-18)."""

    def __init__(self, dtype=jnp.float64):
        self.params = dict(a=jnp.asarray(0.2, dtype=dtype),
                           b=jnp.asarray(3.0, dtype=dtype))
        self.dtype = dtype

    def __call__(self, t, y):
        a, b = self.params['a'], self.params['b']
        return a + (y - (a * t + b)) ** 5

    def with_params(self, params):
        new = ConstantODE.__new__(ConstantODE)
        new.params = params
        new.dtype = self.dtype
        return new

    def y_exact(self, t):
        a, b = self.params['a'], self.params['b']
        return (a * jnp.asarray(t, dtype=self.dtype) + b)[..., None]


class SineODE:
    """Exact y = -t^4 cos(2t)/2 + t^3 sin(2t)/2 + t^2 cos(2t)/4 - t^3 + 2 t^4
    + (pi - 0.25) t^2 (reference problems.py:21-28)."""

    def __init__(self, dtype=jnp.float64):
        self.params = dict()
        self.dtype = dtype

    def __call__(self, t, y):
        return 2 * y / t + t ** 4 * jnp.sin(2 * t) - t ** 2 + 4 * t ** 3

    def y_exact(self, t):
        t = jnp.asarray(t, dtype=self.dtype)
        y = (-0.5 * t ** 4 * jnp.cos(2 * t) + 0.5 * t ** 3 * jnp.sin(2 * t)
             + 0.25 * t ** 2 * jnp.cos(2 * t) - t ** 3 + 2 * t ** 4
             + (math.pi - 0.25) * t ** 2)
        return y[..., None]


class LinearODE:
    """dy/dt = A y with antisymmetric-ish A; exact via expm
    (reference problems.py:31-53)."""

    def __init__(self, dtype=jnp.float64, dim=10):
        self.dim = dim
        rng = np.random.RandomState(0)
        U = rng.randn(dim, dim) * 0.1
        A = 2 * U - (U + U.T)
        self.params = dict(A=jnp.asarray(A, dtype=dtype))
        self._A_np = np.asarray(A, dtype=np.float64)
        self.initial_val = np.ones((dim, 1))
        self.dtype = dtype

    def __call__(self, t, y):
        return (self.params['A'] @ y.reshape(self.dim, 1)).reshape(-1)

    def y_exact(self, t):
        t_np = np.asarray(jax.device_get(t), dtype=np.float64).reshape(-1)
        ans = [scipy.linalg.expm(self._A_np * t_i) @ self.initial_val
               for t_i in t_np]
        out = np.stack(ans).reshape(len(t_np), self.dim)
        return jnp.asarray(out, dtype=self.dtype)


class ExpODE:
    """dy/dt = -0.1 y_exact(t); exact y = exp(-0.1 t)
    (reference problems.py:56-61)."""

    def __init__(self, dtype=jnp.float64):
        self.params = dict()
        self.dtype = dtype

    def __call__(self, t, y):
        return -0.1 * jnp.exp(-0.1 * t) * jnp.ones_like(y)

    def y_exact(self, t):
        t = jnp.asarray(t, dtype=self.dtype)
        return jnp.exp(-0.1 * t)[..., None]


PROBLEMS = {'constant': ConstantODE, 'linear': LinearODE, 'sine': SineODE,
            'exp': ExpODE}

DTYPES = (jnp.float32, jnp.float64)

FIXED_EXPLICIT_METHODS = ('euler', 'midpoint', 'heun2', 'heun3', 'rk4',
                          'explicit_adams', 'implicit_adams')
FIXED_IMPLICIT_METHODS = ('implicit_euler', 'implicit_midpoint', 'trapezoid',
                          'radauIIA3', 'gl4', 'radauIIA5', 'gl6', 'sdirk2',
                          'trbdf2')
FIXED_METHODS = FIXED_EXPLICIT_METHODS + FIXED_IMPLICIT_METHODS
ADAMS_METHODS = ('explicit_adams', 'implicit_adams')
ADAPTIVE_EXPLICIT_METHODS = ('adaptive_heun', 'fehlberg2', 'bosh3', 'tsit5',
                             'dopri5', 'dopri8')
# beyond the reference: adaptive implicit (stiff) tier — Kvaerno ESDIRK
# and fully-coupled Radau IIA 5(3) collocation
ADAPTIVE_IMPLICIT_METHODS = ('kvaerno3', 'kvaerno5', 'radau5a')
ADAPTIVE_METHODS = ADAPTIVE_EXPLICIT_METHODS + ADAPTIVE_IMPLICIT_METHODS
SCIPY_METHODS = ('scipy_solver',)
IMPLICIT_METHODS = FIXED_IMPLICIT_METHODS
METHODS = FIXED_METHODS + ADAPTIVE_METHODS + SCIPY_METHODS


def construct_problem(npts=10, ode='constant', reverse=False,
                      dtype=jnp.float64):
    """Build (f, y0, t_points, sol) on t in [1, 8] (reference
    problems.py:79-95)."""
    f = PROBLEMS[ode](dtype=dtype)

    t_points = jnp.linspace(1, 8, npts, dtype=jnp.float64)
    sol = f.y_exact(t_points).astype(dtype)

    if reverse:
        t_points = t_points[::-1]
        sol = sol[::-1]

    return f, sol[0], t_points, sol
