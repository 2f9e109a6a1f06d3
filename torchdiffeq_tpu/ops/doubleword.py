"""Double-word ("compensated") time arithmetic for f32-only backends.

The reference keeps all timelike values in float64 (rk_common.py:180-195).
On TPU, x64 is unavailable in the default configuration, and a plain f32
running time breaks tight-tolerance solves in two ways:

* the accumulated time `t += dt` drifts by ~ulp(t)/2 per step, so output
  emission and step_t/jump_t windows land at the wrong effective times;
* once `dt < ulp(t)/2`, `t + dt == t` and the driver reports a spurious
  dt-underflow.

The fix is to carry time as an unevaluated double-word sum ``hi + lo`` with
error-free transformations (Knuth two-sum / Dekker renormalisation), giving
~49 effective mantissa bits — beyond the reference's f64-time contract needs
for any realistic solve.  Only the *accumulation* and *comparisons* use the
double word; vector-field evaluation times collapse to ``hi`` (the f32
rounding of the true time), which is the best any f32 kernel input can be.

All functions are shape-polymorphic, jit-safe, and differentiation-free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def two_sum(a, b):
    """Error-free sum: returns (s, e) with s = fl(a+b) and a + b = s + e
    exactly (Knuth's branch-free TwoSum, 6 flops).

    The intermediates are wrapped in `lax.optimization_barrier`: XLA's
    algebraic simplifier otherwise cancels the error term to exactly 0
    (verified on the CPU backend), which would silently disable the
    compensation.  The barriers cost nothing at runtime.
    """
    ob = jax.lax.optimization_barrier
    s = a + b
    b_virt = ob(s - a)
    a_virt = ob(s - b_virt)
    e = (a - a_virt) + (b - b_virt)
    return s, e


def dw_add(hi, lo, x):
    """(hi + lo) + x, renormalised so |lo'| <= ulp(hi')/2."""
    s, e = two_sum(hi, x)
    return two_sum(s, lo + e)


def dw_diff(x, hi, lo):
    """x - (hi + lo), accurate when x is within a few ulps of hi (the
    emission/window tests this backs are exactly that regime: `x - hi` is
    then exact by Sterbenz's lemma and `lo` refines the residual)."""
    return (x - hi) - lo


def dw_gt(x, hi, lo):
    """x > (hi + lo)."""
    return dw_diff(x, hi, lo) > 0


def dw_advanced(t1, t1_lo, t0, t0_lo):
    """(t1 + t1_lo) > (t0 + t0_lo) for renormalised double words
    (lexicographic compare is exact in canonical form)."""
    return (t1 > t0) | ((t1 == t0) & (t1_lo > t0_lo))
