"""Device-mesh parallelism for ODE solves.

The reference has no distributed runtime at all (SURVEY.md §5: the only
multi-device artifact is a DataParallel workaround in parameter discovery,
torchdiffeq/_impl/adjoint.py:226-240).  The TPU-native design gets
parallelism from `jax.sharding`: solvers are pure sharding-transparent
functions, so

* **data parallelism**: shard the batch dimension of `y0` over the mesh;
  the shared-norm reduction inside the step controller becomes a global
  reduction that XLA lowers to an ICI all-reduce.
* **model parallelism**: shard the vector field's parameters; XLA inserts
  the collectives inside the compiled while_loop body.
* **fully independent per-shard solves**: `shard_map` the whole solve so
  each shard runs its own adaptive step sequence (no cross-shard syncing —
  one stiff sample only slows its own shard).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict, devices=None) -> Mesh:
    """Build a Mesh from {'axis': size}.  Sizes must multiply to the device
    count (use -1 for one wildcard axis)."""
    devices = jax.devices() if devices is None else devices
    names = tuple(axis_sizes)
    sizes = list(axis_sizes.values())
    n = len(devices)
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def data_parallel_odeint(odeint_fn, mesh: Mesh, axis: str = 'data'):
    """Wrap an odeint-like callable so the leading batch axis of y0 (and the
    output) is sharded over `mesh[axis]`.  The solve itself is
    sharding-transparent; XLA partitions the while_loop and inserts an
    all-reduce for the error-norm reduction."""
    batch_sharding = NamedSharding(mesh, P(axis))

    def wrapped(func, y0, t, **kwargs):
        y0 = jax.lax.with_sharding_constraint(
            y0, jax.tree_util.tree_map(lambda _: batch_sharding, y0)
            if not isinstance(y0, jnp.ndarray) else batch_sharding)
        return odeint_fn(func, y0, t, **kwargs)

    return wrapped


def sharded_independent_odeint(odeint_fn, mesh: Mesh, axis: str = 'data'):
    """Solve independent batches per mesh shard with `shard_map`: each shard
    runs its own adaptive step-size controller, so a stiff sample slows only
    its shard (the reference's shared RMS norm couples the whole batch,
    torchdiffeq misc.py:22-23).

    `y0` must have a leading batch axis divisible by the mesh axis size.
    Returns ys with shape (T, batch, ...) sharded over `axis` on the batch
    dimension.
    """
    def solve(func, y0, t, **kwargs):
        # check_vma=False: the solver carry mixes mesh-invariant scalars
        # (times, counters) with varying state, which the varying-axes type
        # checker rejects even though the program is correct per-shard.
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(axis),), out_specs=P(None, axis),
                 check_vma=False)
        def _run(y0_shard):
            return odeint_fn(func, y0_shard, t, **kwargs)
        return _run(y0)

    return solve


def shard_params(params, mesh: Mesh, axis: str = 'model', min_size=2 ** 14):
    """Annotate large 2-D parameter leaves with a column sharding over the
    model axis (simple tensor parallelism for MLP vector fields)."""
    def spec(leaf):
        if leaf.ndim == 2 and leaf.size >= min_size and \
                leaf.shape[-1] % mesh.shape[axis] == 0:
            return NamedSharding(mesh, P(None, axis))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda l: jax.device_put(l, spec(l)), params)
