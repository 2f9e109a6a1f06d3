"""Pytree-polymorphic state math for the solver drivers.

The drivers treat ODE state as an opaque value supporting elementwise
arithmetic, norms, and buffer stacking.  Historically that value was a
raveled ``(n,)`` vector; these helpers let the SAME driver code run on an
arbitrary pytree of arrays whose leaves keep their native shapes (a bare
ndarray is itself a one-leaf pytree, so the flat path is unchanged —
``tree_map(f, x)`` on an ndarray is exactly ``f(x)``).

Why native shapes matter on TPU: raveling a ``(batch, d)`` state to
``(batch*d,)`` inserts reshapes around every vector-field call and —
fatally for multi-chip runs — destroys the batch-axis sharding, forcing
XLA to rematerialise/reshard the adjoint carry every step of the backward
while_loop (the SPMD "involuntary full rematerialization" warnings of
round 2).  Tree-native state keeps each leaf's layout and sharding intact
through the whole solve; there is no reference counterpart (the reference
flattens tuple state, torchdiffeq/_impl/misc.py:126-155).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

tmap = jax.tree_util.tree_map


def tleaves(tree):
    return jax.tree_util.tree_leaves(tree)


def twhere(pred, a, b):
    """Scalar-predicate select over matching pytrees."""
    return tmap(lambda x, y: jnp.where(pred, x, y), a, b)


def tall_finite(tree):
    """AND-reduction of isfinite over every element of every leaf."""
    leaves = tleaves(tree)
    out = jnp.all(jnp.isfinite(leaves[0]))
    for l in leaves[1:]:
        out = out & jnp.all(jnp.isfinite(l))
    return out


def state_dtype(tree):
    """Common dtype of the state leaves (the raveled-state dtype)."""
    return jnp.result_type(*tleaves(tree))


def state_real_dtype(tree):
    """Real counterpart of `state_dtype` (timelike values for complex
    state live in the matching real dtype, reference rk_common.py:63)."""
    dt = state_dtype(tree)
    if jnp.issubdtype(dt, jnp.complexfloating):
        return jnp.finfo(dt).dtype
    return dt


def cast_time(t, leaf):
    """Cast a timelike scalar for arithmetic with `leaf`, without
    promoting the leaf's dtype.  Complex leaves keep a real scalar real
    (the multiply promotes, matching the reference's real-time contract);
    an already-complex scalar casts to the leaf dtype."""
    t = jnp.asarray(t)
    dt = jnp.dtype(leaf.dtype)
    if jnp.issubdtype(dt, jnp.complexfloating):
        if jnp.issubdtype(t.dtype, jnp.complexfloating):
            return t.astype(dt)
        return t.astype(jnp.finfo(dt).dtype)
    return t.astype(dt)


def tol_like(tol, tree):
    """Broadcast a tolerance to a tree matching `tree`'s structure.

    A scalar (or an already-matching tree, e.g. the per-leaf tolerance
    trees built by `check_inputs`, or a flat ``(n,)`` vector paired with
    flat state) is paired leaf-by-leaf with the state."""
    if jax.tree_util.tree_structure(tol) == jax.tree_util.tree_structure(tree):
        return tol
    return tmap(lambda _: tol, tree)


def state_size(tree):
    """Total element count across leaves (the raveled length)."""
    return sum(int(jnp.size(l)) for l in tleaves(tree))


def tindex(tree, i):
    """Per-leaf ``leaf[i]`` (drop the leading axis at index i)."""
    return tmap(lambda l: l[i], tree)


def zeros_buffer(tree, length, set0=True):
    """Per-leaf ``(length, *leaf.shape)`` zero buffer, optionally with
    row 0 initialised to the leaf value."""
    if set0:
        return tmap(
            lambda l: jnp.zeros((length,) + jnp.shape(l), l.dtype).at[0].set(l),
            tree)
    return tmap(lambda l: jnp.zeros((length,) + jnp.shape(l), l.dtype), tree)


def bmask(mask, leaf):
    """Reshape a (T,) mask for broadcasting against a (T, *shape) leaf."""
    return mask.reshape(mask.shape + (1,) * (jnp.ndim(leaf) - 1))
