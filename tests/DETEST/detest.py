"""The DETEST problem suite (Hull, Enright, Fellen & Sedgwick 1972):
25 classic nonstiff IVPs in five classes (A: single equations, B: small
systems, C: moderate systems, D: orbit equations, E: higher-order
equations), integrated on t in [0, 20].

Same protocol as the reference harness (reference tests/DETEST/detest.py);
the problem definitions are the published DETEST equations, written in JAX
idiom.  Each factory returns (diffeq, init, solution_or_None) with
``init() -> (t0, y0)``.
"""
import math

import jax.numpy as jnp
import numpy as np


# --------------------------- Class A: single equations ---------------------

def A1():
    diffeq = lambda t, y: -y
    init = lambda: (jnp.asarray(0.), jnp.asarray(1.))
    solution = lambda t: jnp.exp(-t)
    return diffeq, init, solution


def A2():
    diffeq = lambda t, y: -y ** 3 / 2
    init = lambda: (jnp.asarray(0.), jnp.asarray(1.))
    solution = lambda t: 1 / jnp.sqrt(t + 1)
    return diffeq, init, solution


def A3():
    diffeq = lambda t, y: y * jnp.cos(t)
    init = lambda: (jnp.asarray(0.), jnp.asarray(1.))
    solution = lambda t: jnp.exp(jnp.sin(t))
    return diffeq, init, solution


def A4():
    diffeq = lambda t, y: y / 4 * (1 - y / 20)
    init = lambda: (jnp.asarray(0.), jnp.asarray(1.))
    solution = lambda t: 20 / (1 + 19 * jnp.exp(-t / 4))
    return diffeq, init, solution


def A5():
    diffeq = lambda t, y: (y - t) / (y + t)
    init = lambda: (jnp.asarray(0.), jnp.asarray(4.))
    return diffeq, init, None


# --------------------------- Class B: small systems ------------------------

def B1():
    def diffeq(t, y):
        return jnp.stack([2 * (y[0] - y[0] * y[1]),
                          -(y[1] - y[0] * y[1])])
    init = lambda: (jnp.asarray(0.), jnp.asarray([1., 3.]))
    return diffeq, init, None


def B2():
    A = jnp.asarray([[-1., 1., 0.], [1., -2., 1.], [0., 1., -1.]])
    diffeq = lambda t, y: A @ y
    init = lambda: (jnp.asarray(0.), jnp.asarray([2., 0., 1.]))
    return diffeq, init, None


def B3():
    def diffeq(t, y):
        return jnp.stack([-y[0], y[0] - y[1] ** 2, y[1] ** 2])
    init = lambda: (jnp.asarray(0.), jnp.asarray([1., 0., 0.]))
    return diffeq, init, None


def B4():
    def diffeq(t, y):
        a = jnp.sqrt(y[0] ** 2 + y[1] ** 2)
        return jnp.stack([-y[1] - y[0] * y[2] / a,
                          y[0] - y[1] * y[2] / a,
                          y[0] / a])
    init = lambda: (jnp.asarray(0.), jnp.asarray([3., 0., 0.]))
    return diffeq, init, None


def B5():
    def diffeq(t, y):
        return jnp.stack([y[1] * y[2], -y[0] * y[2], -0.51 * y[0] * y[1]])
    init = lambda: (jnp.asarray(0.), jnp.asarray([0., 1., 1.]))
    return diffeq, init, None


# --------------------------- Class C: moderate systems ---------------------

def _bidiagonal(n, diag, sub):
    A = np.zeros((n, n))
    np.fill_diagonal(A, diag)
    A[np.arange(1, n), np.arange(n - 1)] = sub
    return A


def C1():
    A = _bidiagonal(10, -1.0, 1.0)
    A[-1, -1] = 0.0  # radioactive decay chain: final species accumulates
    A = jnp.asarray(A)
    diffeq = lambda t, y: A @ y
    init = lambda: (jnp.asarray(0.), jnp.zeros(10).at[0].set(1.))
    return diffeq, init, None


def C2():
    A = np.zeros((10, 10))
    np.fill_diagonal(A[:9, :9], -np.arange(1, 10))
    A[np.arange(1, 10), np.arange(9)] = np.arange(1, 10)
    A = jnp.asarray(A)
    diffeq = lambda t, y: A @ y
    init = lambda: (jnp.asarray(0.), jnp.zeros(10).at[0].set(1.))
    return diffeq, init, None


def _tridiagonal(n):
    A = np.zeros((n, n))
    np.fill_diagonal(A, -2.0)
    A[np.arange(1, n), np.arange(n - 1)] = 1.0
    A[np.arange(n - 1), np.arange(1, n)] = 1.0
    return jnp.asarray(A)


def C3():
    A = _tridiagonal(10)
    diffeq = lambda t, y: A @ y
    init = lambda: (jnp.asarray(0.), jnp.zeros(10).at[0].set(1.))
    return diffeq, init, None


def C4():
    A = _tridiagonal(51)
    diffeq = lambda t, y: A @ y
    init = lambda: (jnp.asarray(0.), jnp.zeros(51).at[0].set(1.))
    return diffeq, init, None


def C5():
    """Five-body problem: the five outer planets about the sun.  Constants
    from Hull et al. (1972).  (Note: the reference harness has a data typo
    in y0 — `165699966404` without the decimal point; we use the published
    16.5699966404.)"""
    k2 = 2.95912208286
    m0 = 1.00000597682
    m = jnp.asarray([0.000954786104043, 0.000285583733151,
                     0.0000437273164546, 0.0000517759138449,
                     0.00000277777777778])  # (5,)

    def diffeq(t, y):
        # y: (2, 3, 5) — positions and velocities of 5 bodies in 3-space
        dy = y[1]
        q = y[0]                                   # (3, 5)
        r3 = jnp.sum(q ** 2, 0) ** 1.5             # (5,)
        diff = q[:, None, :] - q[:, :, None]       # (3, 5, 5): q_k - q_j
        d = jnp.sqrt(jnp.sum(diff ** 2, 0))        # (5, 5)
        d3 = jnp.where(d > 0, d ** 3, 1.0)
        mask = 1.0 - jnp.eye(5)
        # Hull et al. (1972) eq. for the heliocentric 5-body problem:
        #   q_j'' = k2 [ -(m0+m_j) q_j/r_j^3
        #                + sum_{k!=j} m_k ((q_k-q_j)/d_jk^3 - q_k/r_k^3) ]
        # (the reference harness uses "+ q_k/r_k^3"; we follow the paper).
        F = m[None, None, :] * mask[None] * (diff / d3[None]
                                             - q[:, None, :] / r3[None, None, :])
        ddy = k2 * (-(m0 + m)[None, :] * q / r3[None, :] + jnp.sum(F, axis=2))
        return jnp.stack([dy, ddy], 0)

    def init():
        q0 = jnp.asarray([
            [3.42947415189, 3.35386959711, 1.35494901715],
            [6.64145542550, 5.97156957878, 2.18231499728],
            [11.2630437207, 14.6952576794, 6.27960525067],
            [-30.1552268759, 16.5699966404, 1.43785752721],
            [-21.1238353380, 28.4465098142, 15.388265967],
        ]).T                                       # (3, 5)
        v0 = jnp.asarray([
            [-.557160570446, .505696783289, .230578543901],
            [-.415570776342, .365682722812, .169143213293],
            [-.325325669158, .189706021964, .0877265322780],
            [-.0240476254170, -.287659532608, -.117219543175],
            [-.176860753121, -.216393453025, -.0148647893090],
        ]).T
        return jnp.asarray(0.), jnp.stack([q0, v0], 0)

    return diffeq, init, None


# --------------------------- Class D: orbit equations ----------------------

def _DTemplate(eps):
    def diffeq(t, y):
        r = (y[0] ** 2 + y[1] ** 2) ** 1.5
        return jnp.stack([y[2], y[3], -y[0] / r, -y[1] / r])

    def init():
        return (jnp.asarray(0.),
                jnp.asarray([1 - eps, 0., 0.,
                             math.sqrt((1 + eps) / (1 - eps))]))
    return diffeq, init, None


D1 = lambda: _DTemplate(0.1)
D2 = lambda: _DTemplate(0.3)
D3 = lambda: _DTemplate(0.5)
D4 = lambda: _DTemplate(0.7)
D5 = lambda: _DTemplate(0.9)


# ---------------------- Class E: higher-order equations --------------------

def E1():
    def diffeq(t, y):
        return jnp.stack([y[1],
                          -(y[1] / (t + 1) + (1 - 0.25 / (t + 1) ** 2) * y[0])])
    init = lambda: (jnp.asarray(0.),
                    jnp.asarray([.671396707141803, .0954005144474744]))
    return diffeq, init, None


def E2():
    def diffeq(t, y):
        return jnp.stack([y[1], (1 - y[0] ** 2) * y[1] - y[0]])
    init = lambda: (jnp.asarray(0.), jnp.asarray([2., 0.]))
    return diffeq, init, None


def E3():
    def diffeq(t, y):
        return jnp.stack([y[1],
                          y[0] ** 3 / 6 - y[0] + 2 * jnp.sin(2.78535 * t)])
    init = lambda: (jnp.asarray(0.), jnp.asarray([0., 0.]))
    return diffeq, init, None


def E4():
    def diffeq(t, y):
        return jnp.stack([y[1], .32 - .4 * y[1] ** 2])
    init = lambda: (jnp.asarray(0.), jnp.asarray([30., 0.]))
    return diffeq, init, None


def E5():
    def diffeq(t, y):
        return jnp.stack([y[1], jnp.sqrt(1 + y[1] ** 2) / (25 - t)])
    init = lambda: (jnp.asarray(0.), jnp.asarray([0., 0.]))
    return diffeq, init, None


ALL_PROBLEMS = {c + i: globals()[c + i]
                for c in 'ABCDE' for i in '12345'}
