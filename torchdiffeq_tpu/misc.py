"""Shared plumbing: pytree ravelling, time handling, perturbation, input checks.

TPU-native re-design of the input-normalisation layer of torchdiffeq
(reference: torchdiffeq/_impl/misc.py).  Key differences from the reference:

* State is an arbitrary JAX pytree (the reference supports tensors and tuples
  of tensors).  Internally every solver operates on a single flat ``(n,)``
  vector obtained with ``ravel_pytree``; the user's structure is restored at
  the API boundary (reference: ``_flat_to_shape`` / ``_TupleFunc``,
  misc.py:126-155).
* Instead of Python-level asserts (which cannot be data-dependent under
  ``jit``) numerical guards are carried as error codes in the solver state.
* Time ("timelike") values are kept in ``float64`` when jax x64 is enabled,
  otherwise ``float32`` (the reference always promotes time to float64,
  rk_common.py:180-182; on TPU f64 must be explicitly enabled).
"""
from __future__ import annotations

import enum
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree


_ALL_CALLBACK_NAMES = ['callback_step', 'callback_accept_step',
                       'callback_reject_step']
_ALL_ADJOINT_CALLBACK_NAMES = [n + '_adjoint' for n in _ALL_CALLBACK_NAMES]
# per solver kind (reference `valid_callbacks`, solvers.py:24-26,81-83,
# rk_common.py:207-211)
_VALID_CALLBACKS = {
    'adaptive': {'callback_step', 'callback_accept_step',
                 'callback_reject_step'},
    'fixed': {'callback_step'},
    'adams': {'callback_step'},
    'firk': {'callback_step'},
    'dirk': {'callback_step'},
    'scipy': set(),
}


def _solver_kind(solvers, method):
    return solvers[method].get('kind', '')


class Perturb(enum.Enum):
    """Direction to perturb the evaluation time of the vector field.

    Mirrors the semantics of the reference ``Perturb`` enum (misc.py:168-171):
    ``NEXT``/``PREV`` move ``t`` to the next/previous representable float so
    that vector fields with jump discontinuities are evaluated on the correct
    side of the discontinuity.
    """
    NONE = 0
    PREV = 1
    NEXT = 2


def _nextafter_arith(x1, x2):
    """Arithmetic nextafter emulation: bump x1 toward x2 by 1-2 ULP.

    XLA's TPU X64 rewriter cannot lower f64 `nextafter` (the s64
    bitcast-convert inside it is unimplemented), while f64 add/mul are
    native — so f64-on-TPU takes this path.  `|x|*eps` lies in
    [1, 2] ULP(x) for normal x; the `tiny` floor handles x == 0 (where
    exact nextafter would return a denormal that TPU flush-to-zero
    discards anyway, see docs/OPTIONS.md).  The 1-ULP slack vs exact
    nextafter only widens the discontinuity-avoidance margin the
    perturbation exists for (reference misc.py:343-346); deviation
    documented in COVERAGE.md."""
    dt = jnp.result_type(x1)
    bump = jnp.maximum(jnp.abs(x1) * jnp.finfo(dt).eps,
                       jnp.asarray(jnp.finfo(dt).tiny, dt))
    out = x1 + jnp.sign(x2 - x1) * bump
    return jnp.where(x1 == x2, x2, out)


@jax.custom_jvp
def _nextafter(x1, x2):
    if (jnp.result_type(x1, x2) == jnp.float64
            and jax.default_backend() == 'tpu'):
        return _nextafter_arith(x1, x2)
    return jnp.nextafter(x1, x2)


@_nextafter.defjvp
def _nextafter_jvp(primals, tangents):
    # Gradient-stitching: d(nextafter(x1, x2))/dx1 == 1 (reference
    # ``_StitchGradient``, misc.py:348-357).
    x1, x2 = primals
    dx1, _ = tangents
    return _nextafter(x1, x2), dx1


def nextafter_up(t):
    return _nextafter(t, t + 1)


def nextafter_down(t):
    return _nextafter(t, t - 1)


def real_dtype(dtype):
    """The real floating dtype corresponding to `dtype` (timelike values for
    complex state live in the matching real dtype — reference
    `y0.abs().dtype`, rk_common.py:63)."""
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        return jnp.finfo(dtype).dtype
    return dtype


def time_dtype_like(default=None):
    """The dtype used for 'timelike' quantities (t, dt, tolerances)."""
    if default is not None:
        return jnp.dtype(default)
    return jnp.dtype(jnp.float64) if jax.config.jax_enable_x64 else jnp.dtype(jnp.float32)


class FlatProblem(NamedTuple):
    """A normalised ODE problem on flat state."""
    func: Callable        # func(t, y_flat, perturb=Perturb.NONE) -> f_flat
    y0: jnp.ndarray       # (n,) flat initial state
    unravel: Callable     # flat (n,) -> user pytree
    rtol: Any             # scalar or (n,) flat vector
    atol: Any             # scalar or (n,) flat vector
    norm: Callable        # norm(flat (n,)) -> scalar
    n_leaves: int         # number of leaves in the user state pytree


def rms_norm(x):
    """RMS norm over all elements (reference ``_rms_norm``, misc.py:22-23)."""
    x = jnp.asarray(x)
    return jnp.sqrt(jnp.mean(jnp.abs(x) ** 2))


def linf_norm(x):
    return jnp.max(jnp.abs(jnp.asarray(x)))


def zero_norm(x):
    return jnp.zeros((), dtype=jnp.result_type(float))


def mixed_norm(tree):
    """Max over per-leaf RMS norms (reference ``_mixed_norm``, misc.py:30-33)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if len(leaves) == 0:
        return jnp.zeros((), dtype=jnp.result_type(float))
    return jnp.max(jnp.stack([rms_norm(leaf) for leaf in leaves]))


def _tree_tol(name, tol, y0_tree, flat_template):
    """Broadcast a (possibly per-leaf) tolerance to the flat state layout.

    Mirrors ``_tuple_tol`` (reference misc.py:115-123): a scalar stays a
    scalar; a sequence must have one entry per state leaf and is expanded to a
    flat ``(n,)`` vector.
    """
    if np.isscalar(tol) or (isinstance(tol, (jnp.ndarray, np.ndarray)) and np.ndim(tol) == 0):
        return tol
    leaves = jax.tree_util.tree_leaves(y0_tree)
    tol = list(tol)
    if len(tol) != len(leaves):
        raise ValueError(
            f"If using per-leaf {name} it must have the same length as the state "
            f"pytree leaves ({len(leaves)}), got {len(tol)}.")
    parts = [jnp.full((leaf.size,), t, dtype=flat_template.dtype)
             for t, leaf in zip(tol, leaves)]
    return jnp.concatenate(parts)


def _tree_tol_tree(name, tol, y0_tree):
    """Tree-state analogue of `_tree_tol`: a scalar passes through
    unchanged; a per-leaf sequence becomes a pytree of scalars matching
    the state structure (reference ``_tuple_tol``, misc.py:115-123)."""
    if np.isscalar(tol) or (isinstance(tol, (jnp.ndarray, np.ndarray))
                            and np.ndim(tol) == 0):
        return tol
    leaves, treedef = jax.tree_util.tree_flatten(y0_tree)
    tol = list(tol)
    if len(tol) != len(leaves):
        raise ValueError(
            f"If using per-leaf {name} it must have the same length as the "
            f"state pytree leaves ({len(leaves)}), got {len(tol)}.")
    return jax.tree_util.tree_unflatten(treedef, tol)


def _is_single_array(y0):
    return isinstance(y0, (jnp.ndarray, np.ndarray)) or np.isscalar(y0)


class NormalisedProblem(NamedTuple):
    func: Callable            # normalised perturb-aware vector field
    y0: Any                   # (n,) flat vector, or the state pytree itself
    t: jnp.ndarray            # (T,) increasing, time dtype
    rtol: Any
    atol: Any
    method: str
    options: dict
    event_fn: Any             # normalised event fn or None
    t_sign: Any               # +1/-1 scalar: t_internal = t_sign * t_user
    unravel: Callable         # flat (n,) -> user pytree; None in tree mode
    norm: Callable            # norm on the internal state representation
    single_array_state: bool  # user state was a plain array (not a container)
    state_shape: Any          # shape of user state if single array
    tree_state: bool = False  # state kept as a native-shape pytree


def check_inputs(func, y0, t, rtol, atol, method, options, event_fn, solvers,
                 args=(), time_direction='auto', ravel_state=True):
    """Normalise user inputs to solver form.

    The JAX analogue of ``_check_inputs`` (reference misc.py:200-345):
    broadcasts tolerances, handles reversed time by negation, selects the
    default norm, and wraps the vector field with perturbation support.

    With ``ravel_state=True`` the state pytree is flattened to one ``(n,)``
    vector (the reference's ``_flat_to_shape``/``_TupleFunc`` design,
    misc.py:126-155) — required by drivers doing linear algebra on the
    state (implicit stage solves, replay buffers, the dense-output and
    Pallas paths).  With ``ravel_state=False`` the state stays a pytree of
    native-shape leaves end-to-end (the explicit adaptive driver is
    tree-polymorphic): no reshapes around vector-field calls, and — the
    point, on TPU — leaf shardings (e.g. a batch axis over a device mesh)
    survive the whole solve; see ops/treemath.py.
    """
    from .events import combine_event_functions  # local import to avoid cycle

    if event_fn is not None:
        t = jnp.asarray(t)
        if t.shape[0] != 2:
            raise ValueError(
                f"We require len(t) == 2 when in event handling mode, but got len(t)={t.shape[0]}.")

    # --- flatten state ---------------------------------------------------
    single_array = _is_single_array(y0)
    y0_tree = y0
    leaves = jax.tree_util.tree_leaves(y0_tree)
    for leaf in leaves:
        ldt = jnp.asarray(leaf).dtype
        if not (jnp.issubdtype(ldt, jnp.floating)
                or jnp.issubdtype(ldt, jnp.complexfloating)):
            raise TypeError(f"y0 must be floating point, got {ldt}")
    state_shape = jnp.shape(y0) if single_array else None
    n_leaves = len(leaves)

    if ravel_state:
        y0_flat, unravel = ravel_pytree(y0)
        rtol = _tree_tol('rtol', rtol, y0_tree, y0_flat)
        atol = _tree_tol('atol', atol, y0_tree, y0_flat)
    else:
        y0_flat = jax.tree_util.tree_map(jnp.asarray, y0_tree)
        unravel = None
        rtol = _tree_tol_tree('rtol', rtol, y0_flat)
        atol = _tree_tol_tree('atol', atol, y0_flat)

    if args:
        base_func = lambda tt, yy: func(tt, yy, *args)
    else:
        base_func = func

    if ravel_state:
        def flat_func(tt, y_flat):
            f = base_func(tt, unravel(y_flat))
            f_flat, _ = ravel_pytree(f)
            return f_flat
    else:
        flat_func = base_func

    flat_event_fn = None
    if event_fn is not None:
        if ravel_state:
            def flat_event_fn_(tt, y_flat):
                return event_fn(tt, unravel(y_flat))
            flat_event_fn = flat_event_fn_
        else:
            flat_event_fn = event_fn

    # --- method / options -------------------------------------------------
    options = {} if options is None else dict(options)
    if method is None:
        method = 'dopri5'
    if method not in solvers:
        raise ValueError('Invalid method "{}". Must be one of {}'.format(
            method, '{"' + '", "'.join(solvers.keys()) + '"}.'))

    # --- norm -------------------------------------------------------------
    user_norm = options.pop('norm', None)
    if user_norm is None:
        if single_array:
            norm = rms_norm          # RMS over all elements, any shape
        elif ravel_state:
            def norm(x_flat):
                return mixed_norm(unravel(x_flat))
        else:
            norm = mixed_norm        # max of per-leaf RMS, directly on trees
    elif ravel_state:
        # The user's norm sees the state in its own structure
        # (reference misc.py:236-259).
        def norm(x_flat):
            return user_norm(unravel(x_flat))
    else:
        norm = user_norm

    # --- time handling ----------------------------------------------------
    # TPU-native redesign of the reference's time reversal (misc.py:270-296):
    # instead of a trace-time branch that negates everything, integration
    # always runs over `t_sign * t` with the vector field conjugated by the
    # sign.  For forward time t_sign == 1 and XLA folds the multiplies away;
    # for reversed time this is exactly the reference's negation — but it
    # also works when `t` is traced (e.g. closed over under `jit`), where
    # the direction cannot be known statically.
    t = jnp.asarray(t)
    if t.ndim != 1:
        raise ValueError("t must be one dimensional")
    _check_monotonic(t)
    tdt = time_dtype_like(options.get('dtype'))
    t = t.astype(tdt)

    if time_direction == 'forward':
        t_sign = jnp.ones((), dtype=tdt)
    elif time_direction == 'reverse':
        t_sign = -jnp.ones((), dtype=tdt)
    elif t.shape[0] < 2:
        t_sign = jnp.ones((), dtype=tdt)
    else:
        t_sign = jnp.where(t[-1] >= t[0], 1.0, -1.0).astype(tdt)

    t = t_sign * t

    def _sgn(x):
        # dtype-preserving sign multiply (t_sign lives in the time dtype and
        # must not promote f32 state computations); tree-wise so the
        # vector-field output may be a pytree in tree-state mode.
        return jax.tree_util.tree_map(
            lambda l: t_sign.astype(jnp.asarray(l).dtype) * l, x)

    _base_flat_func = flat_func
    flat_func = lambda tt, y_flat: _sgn(_base_flat_func(_sgn(tt), y_flat))
    if flat_event_fn is not None:
        _base_event = flat_event_fn
        flat_event_fn = lambda tt, y_flat: _base_event(_sgn(tt), y_flat)
    grid_constructor = options.get('grid_constructor')
    if grid_constructor is not None:
        options['grid_constructor'] = \
            lambda f, y0_, t_: t_sign * grid_constructor(f, y0_, t_sign * t_)
    for name in ('step_t', 'jump_t'):
        if options.get(name) is not None:
            options[name] = t_sign * jnp.asarray(options[name])

    if event_fn is not None:
        flat_event_fn = combine_event_functions(flat_event_fn, t[0], y0_flat)

    # --- perturbation wrapper --------------------------------------------
    wrapped = PerturbedFunc(flat_func)

    # --- callbacks ---------------------------------------------------------
    # The reference attaches `callback_step` / `callback_accept_step` /
    # `callback_reject_step` as attributes of `func` and invokes them inside
    # the solve (misc.py:313-343).  Python cannot run inside a compiled
    # while_loop, so present callbacks are re-wrapped through
    # `jax.debug.callback` (fired per executed step) with arguments mapped
    # back to the user frame: un-negated time and user-structured state.
    callback_names = set()
    for name in _ALL_CALLBACK_NAMES:
        cb = getattr(func, name, None)
        if cb is None:
            setattr(wrapped, name, None)
            continue
        callback_names.add(name)

        def fire(t0_, y0_flat_, dt_, _cb=cb):
            def host(t0v, y0v, dtv):
                if unravel is None:
                    _cb(t0v, jax.tree_util.tree_map(jnp.asarray, y0v), dtv)
                else:
                    _cb(t0v, unravel(jnp.asarray(y0v)), dtv)
            jax.debug.callback(host, t_sign * t0_, y0_flat_, dt_)

        setattr(wrapped, name, fire)
    for name in _ALL_ADJOINT_CALLBACK_NAMES:
        cb = getattr(func, name, None)
        setattr(wrapped, name, cb)

    valid = _VALID_CALLBACKS.get(_solver_kind(solvers, method), set())
    invalid = callback_names - valid
    if invalid:
        import warnings
        warnings.warn("Solver '{}' does not support callbacks {}".format(
            method, sorted(invalid)))
        for name in invalid:
            setattr(wrapped, name, None)

    return NormalisedProblem(
        func=wrapped, y0=y0_flat, t=t, rtol=rtol, atol=atol, method=method,
        options=options, event_fn=flat_event_fn, t_sign=t_sign,
        unravel=unravel, norm=norm, single_array_state=single_array,
        state_shape=state_shape, tree_state=not ravel_state)


def _check_monotonic(t):
    """Strict monotonicity check (reference `_check_timelike`,
    misc.py:376-383) — only enforceable for concrete (non-traced) `t`."""
    try:
        t_np = np.asarray(t)
    except Exception:
        return  # traced under jit: monotonicity is the caller's contract
    if t_np.shape[0] > 1:
        diff = np.diff(t_np)
        if not (np.all(diff > 0) or np.all(diff < 0)):
            raise ValueError(
                "t must be strictly increasing or decreasing")


def time_sign(t):
    """Runtime integration-direction sign for a (possibly traced) time array:
    +1 for increasing, -1 for decreasing."""
    t = jnp.asarray(t)
    if t.shape[0] < 2:
        return jnp.ones((), dtype=t.dtype)
    return jnp.where(t[-1] >= t[0], 1.0, -1.0).astype(t.dtype)


class PerturbedFunc:
    """Wraps a flat vector field with `perturb` keyword support.

    Mirrors ``_PerturbFunc`` (reference misc.py:174-197): the evaluation time
    is cast to the state dtype and optionally nudged by one ULP.
    """

    # solver-visible callback slots (wired by check_inputs when present)
    callback_step = None
    callback_accept_step = None
    callback_reject_step = None
    callback_step_adjoint = None
    callback_accept_step_adjoint = None
    callback_reject_step_adjoint = None

    def __init__(self, base_func):
        self.base_func = base_func

    def __call__(self, t, y, perturb=Perturb.NONE):
        assert isinstance(perturb, Perturb), "perturb argument must be of type Perturb enum"
        t = jnp.asarray(t)
        if jnp.issubdtype(t.dtype, jnp.complexfloating):
            t = t.real
        t = t.astype(real_dtype(
            jnp.result_type(*jax.tree_util.tree_leaves(y))))
        if perturb is Perturb.NEXT:
            t = nextafter_up(t)
        elif perturb is Perturb.PREV:
            t = nextafter_down(t)
        return self.base_func(t, y)


def flat_to_tree(unravel, ys_flat):
    """Map a stacked flat solution (T, n) back to the user pytree with a
    leading time axis on every leaf (reference ``_flat_to_shape``,
    misc.py:126-134).  Tree-state solutions (unravel is None) are already
    in the user structure."""
    if unravel is None:
        return ys_flat
    return jax.vmap(unravel)(ys_flat)
