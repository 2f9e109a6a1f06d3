"""Dispatch-free training loops: scan many optimizer steps inside one jit.

The reference's training loops dispatch one graph per step from Python
(reference examples/ode_demo.py:156-170, examples/odenet_mnist.py:333-350).
On TPU every dispatch pays a host round trip, which for small/medium
neural-ODE steps exceeds the device time of the step itself (measured in
benchmarks/PERF.md; this container's tunnel makes it ~3-30 ms).  The
TPU-native loop inverts control: `jax.lax.scan` chains K optimizer steps
into ONE compiled program, so the round trip amortises 1/K and XLA can
keep parameters resident on-chip across steps.

This module packages that pattern (previously a documented recipe in
bench.py / README) as a library surface:

* `make_sgd_step(loss_fn, lr)` / `make_optax_step(loss_fn, optimizer)` —
  build a `(carry, batch) -> (carry, loss)` step function from a loss.
* `scan_steps(step_fn, carry, xs=None, length=None)` — run the step under
  `lax.scan` inside jit.  Compilation is cached on the identity of
  `step_fn` (build it ONCE outside the loop, not per call).
* `fit(step_fn, carry, batches, num_steps, steps_per_dispatch=32)` — a
  host-side chunked driver for data pipelines: stacks each chunk of
  batches and scans it in one dispatch.

Works with any step function, not just ODE losses — but the loss functions
used here may freely close over `odeint` / `odeint_adjoint` solves (the
adaptive `while_loop` and the adjoint `custom_vjp` both nest under `scan`).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax


def make_sgd_step(loss_fn, lr=1e-3, has_aux=False):
    """Build a plain-SGD `(params, batch) -> (params, loss)` step.

    `loss_fn(params, batch)` must return a scalar loss (or `(loss, aux)`
    with `has_aux=True`).  The carry is the params pytree itself.
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=has_aux)

    def step(params, batch):
        out, grads = grad_fn(params, batch)
        params = jax.tree_util.tree_map(
            lambda p, g: p - jnp.asarray(lr, p.dtype) * g, params, grads)
        return params, out

    return step


def make_optax_step(loss_fn, optimizer, has_aux=False):
    """Build an optax-based step; carry is `(params, opt_state)`.

    Returns `(init, step)`: `init(params)` builds the carry,
    `step(carry, batch)` returns `(carry, loss)` (or `(carry, (loss, aux))`
    with `has_aux=True`).
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=has_aux)

    def init(params):
        return (params, optimizer.init(params))

    def step(carry, batch):
        params, opt_state = carry
        out, grads = grad_fn(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        # optax.apply_updates casts updates to each param's dtype, so bf16
        # params stay bf16 even when a transform emits f32 updates — raw
        # `p + u` would promote the carry and break lax.scan dtype stability.
        params = optax.apply_updates(params, updates)
        return (params, opt_state), out

    return init, step


@partial(jax.jit, static_argnums=(0, 3), donate_argnums=(1,))
def _scan_run_donated(step_fn, carry, xs, length):
    return jax.lax.scan(step_fn, carry, xs, length=length)


@partial(jax.jit, static_argnums=(0, 3))
def _scan_run(step_fn, carry, xs, length):
    return jax.lax.scan(step_fn, carry, xs, length=length)


def scan_steps(step_fn, carry, xs=None, *, length=None, donate=False):
    """Run `length` (or `len(xs)`) steps of `step_fn` in ONE jit dispatch.

    `step_fn(carry, x) -> (carry, out)` is scanned over `xs` (a pytree of
    arrays with a leading steps axis, e.g. a stacked chunk of batches) or,
    with `xs=None`, over `length` steps with `x=None` each step.  Returns
    `(final_carry, stacked_outs)`.

    Compilation is cached on `step_fn`'s identity plus the usual shape
    key — build the step once and reuse it; a lambda recreated per call
    recompiles per call.

    With `donate=True` the input carry's device buffers are donated to the
    output (in-place parameter updates on-chip — halves peak parameter
    memory for large models).  The caller's pre-call `carry` arrays become
    invalid afterwards; keep `donate=False` (default) if you still need
    them (e.g. to diff against the initial params).
    """
    if xs is None and length is None:
        raise ValueError("scan_steps: provide xs and/or length")
    run = _scan_run_donated if donate else _scan_run
    return run(step_fn, carry, xs, length)


def fit(step_fn, carry, batches=None, *, num_steps, steps_per_dispatch=32,
        donate=False):
    """Chunked training driver: scan `steps_per_dispatch` steps per dispatch.

    `batches` is an iterable yielding one batch pytree per step (a data
    pipeline), or None for batch-free losses.  Each chunk of batches is
    stacked on a leading axis and scanned in one compiled call, so the
    per-dispatch host round trip is paid once per `steps_per_dispatch`
    steps instead of once per step.  All chunks share one compilation as
    long as batch shapes are constant (the last, shorter chunk compiles
    once more).

    Returns `(carry, losses)` with `losses` a host numpy array of the
    per-step scan outputs (requires the step's second output to be a
    scalar; use `scan_steps` directly for structured outputs).
    """
    if num_steps <= 0:
        raise ValueError("fit: num_steps must be positive")
    if steps_per_dispatch <= 0:
        raise ValueError("fit: steps_per_dispatch must be positive")
    it = iter(batches) if batches is not None else None
    losses = []
    done = 0
    while done < num_steps:
        k = min(steps_per_dispatch, num_steps - done)
        if it is None:
            xs, n = None, k
        else:
            chunk = []
            for _ in range(k):
                try:
                    chunk.append(next(it))
                except StopIteration:
                    break
            if not chunk:
                break  # data pipeline exhausted
            xs = jax.tree_util.tree_map(
                lambda *leaves: jnp.stack(leaves), *chunk)
            n = None  # length comes from xs' leading axis
            k = len(chunk)
        carry, out = scan_steps(step_fn, carry, xs, length=n, donate=donate)
        losses.append(np.asarray(out))
        done += k
    if not losses:  # pipeline empty/exhausted before the first step
        return carry, np.zeros((0,))
    return carry, np.concatenate(losses)
