"""Solver registry.

Mirrors the 23-method ``SOLVERS`` registry of the reference
(torchdiffeq/_impl/odeint.py:19-46), but entries are declarative specs
dispatched to functional drivers instead of solver classes.
"""
from __future__ import annotations

from ..ops import tableaus as tb
from . import fixed_grid

# kind:
#   'adaptive' — lax.while_loop adaptive RK driver      (adaptive_rk.py)
#   'fixed'    — lax.scan fixed-grid explicit driver    (fixed_grid.py)
#   'adams'    — lax.scan Adams-Bashforth(-Moulton)     (adams.py)
#   'firk'     — fixed-grid fully-implicit RK           (fixed_grid_implicit.py)
#   'dirk'     — fixed-grid diagonally-implicit RK      (fixed_grid_implicit.py)
#   'scipy'    — host-callback SciPy solve_ivp bridge   (scipy_wrapper.py)
SOLVERS = {
    'dopri8': dict(kind='adaptive', tableau=tb.DOPRI8),
    'dopri5': dict(kind='adaptive', tableau=tb.DOPRI5),
    'tsit5': dict(kind='adaptive', tableau=tb.TSIT5),
    # Local-extrapolation Tsit5 — EXTENSION: the published 5th-order
    # Tsitouras method (the reference propagates the 4th-order embedded
    # combination; see ops/tableaus.py).  FSAL, same 6 evals/step.
    'tsit5_le': dict(kind='adaptive', tableau=tb.TSIT5_LE),
    'bosh3': dict(kind='adaptive', tableau=tb.BOSH3),
    'fehlberg2': dict(kind='adaptive', tableau=tb.FEHLBERG2),
    'adaptive_heun': dict(kind='adaptive', tableau=tb.ADAPTIVE_HEUN),
    'euler': dict(kind='fixed', method=fixed_grid.FIXED_STEP_METHODS['euler']),
    'midpoint': dict(kind='fixed', method=fixed_grid.FIXED_STEP_METHODS['midpoint']),
    'heun2': dict(kind='fixed', method=fixed_grid.FIXED_STEP_METHODS['heun2']),
    'heun3': dict(kind='fixed', method=fixed_grid.FIXED_STEP_METHODS['heun3']),
    'rk4': dict(kind='fixed', method=fixed_grid.FIXED_STEP_METHODS['rk4']),
    'explicit_adams': dict(kind='adams', implicit=False),
    'implicit_adams': dict(kind='adams', implicit=True),
    'implicit_euler': dict(kind='firk', tableau=tb.IMPLICIT_EULER),
    'implicit_midpoint': dict(kind='firk', tableau=tb.IMPLICIT_MIDPOINT),
    'trapezoid': dict(kind='firk', tableau=tb.TRAPEZOID),
    'radauIIA3': dict(kind='firk', tableau=tb.RADAU_IIA_3),
    'gl4': dict(kind='firk', tableau=tb.GAUSS_LEGENDRE_4),
    'radauIIA5': dict(kind='firk', tableau=tb.RADAU_IIA_5),
    'gl6': dict(kind='firk', tableau=tb.GAUSS_LEGENDRE_6),
    'sdirk2': dict(kind='dirk', tableau=tb.SDIRK2),
    'trbdf2': dict(kind='dirk', tableau=tb.TRBDF2),
    # Adaptive implicit (stiff) tier — EXTENSION over the reference's
    # 23 methods, which has no adaptive implicit solver (SURVEY.md §2):
    # ESDIRK with embedded error under the same while_loop driver.
    'kvaerno3': dict(kind='adaptive', tableau=tb.KVAERNO3),
    'kvaerno5': dict(kind='adaptive', tableau=tb.KVAERNO5),
    # Adaptive Radau IIA 5(3) — the stiff-benchmark standard (RADAU5);
    # fully-coupled collocation stages under the adaptive driver.
    'radau5a': dict(kind='adaptive', tableau=tb.RADAU5A),
    # Backward compatibility alias, as in the reference.
    'fixed_adams': dict(kind='adams', implicit=True),
    'scipy_solver': dict(kind='scipy'),
}

# Methods whose plain-`odeint` gradient path is native backprop through the
# lax.scan discretisation (discretise-then-optimise, exactly matching the
# reference's autograd-through-the-solver semantics).  Adaptive methods use
# a continuous-adjoint custom_vjp instead (lax.while_loop is not
# reverse-differentiable; see adjoint.py).
DIRECT_DIFF_KINDS = frozenset({'fixed', 'adams', 'firk', 'dirk'})


def tree_state_capable(method, event=False):
    """Whether `method`'s driver can keep the state as a native-shape
    pytree (no ravel; see ops/treemath.py).  True for the explicit
    adaptive tier and — except in event mode, whose bisection driver
    works on a flat vector — the explicit fixed-grid tier.  Implicit
    stage solves (ESDIRK/FIRK/DIRK), Adams ring buffers, and the
    replay/dense/Pallas paths do linear algebra or buffer writes on a
    flat vector and keep the raveled representation."""
    spec = SOLVERS.get(method if method is not None else 'dopri5')
    if spec is None:
        return False
    if spec['kind'] == 'adaptive' and not spec['tableau'].implicit:
        return True
    return spec['kind'] == 'fixed' and not event
