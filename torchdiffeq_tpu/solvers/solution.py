"""Solve statistics and error codes.

The reference surfaces solver telemetry through Python callbacks and
data-dependent asserts (torchdiffeq/_impl/rk_common.py:272,286-287,339,354).
Neither works inside a compiled ``lax.while_loop``, so the TPU build carries
counters and an error code in the loop state and returns them as a `Stats`
pytree alongside the solution.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# Error codes (0 == success).
OK = 0
ERR_DT_UNDERFLOW = 1     # reference: `assert t0 + dt > t0` (rk_common.py:286)
ERR_NONFINITE_STATE = 2  # reference: `assert torch.isfinite(y0).all()` (rk_common.py:287)
ERR_MAX_NUM_STEPS = 3    # reference: `assert n_steps < max_num_steps` (rk_common.py:245)
ERR_IMPLICIT_NO_CONVERGENCE = 4  # reference: warning (rk_common.py:461-462)
ERR_SEGMENT_OVERFLOW = 5         # replay/dense recording buffer exhausted

ERROR_MESSAGES = {
    OK: "success",
    ERR_DT_UNDERFLOW: "underflow in dt",
    ERR_NONFINITE_STATE: "non-finite values in state `y`",
    ERR_MAX_NUM_STEPS: "max_num_steps exceeded",
    ERR_IMPLICIT_NO_CONVERGENCE: "implicit solve did not converge",
    ERR_SEGMENT_OVERFLOW: ("recording buffer exhausted — raise "
                           "max_segments (replay/dense capacity)"),
}


class Stats(NamedTuple):
    """Telemetry for one solve.  Count fields are int32 scalars (possibly
    traced).  `nfe` counts vector-field evaluations, matching the NFE
    bookkeeping convention of the reference tests (tests/problems.py:41).
    `final_dt` is the controller's proposed next step size at the end of an
    adaptive solve (0 for fixed-grid kinds) — used to warm-start chained
    solves, e.g. the interval-by-interval adjoint backward sweep."""
    nfe: jnp.ndarray
    n_steps: jnp.ndarray
    n_accepted: jnp.ndarray
    n_rejected: jnp.ndarray
    error_code: jnp.ndarray
    final_dt: jnp.ndarray

    @staticmethod
    def make(nfe=0, n_steps=0, n_accepted=0, n_rejected=0, error_code=OK,
             final_dt=0.0):
        i32 = lambda v: jnp.asarray(v, dtype=jnp.int32)
        return Stats(i32(nfe), i32(n_steps), i32(n_accepted), i32(n_rejected),
                     i32(error_code), jnp.asarray(final_dt))

    def raise_if_error(self):
        """Host-side check (blocks on the device value): raise on a nonzero
        error code — the eager-mode equivalent of the reference's asserts
        (rk_common.py:286-287).  Do not call inside jit."""
        code = int(self.error_code)
        if code != OK:
            raise RuntimeError(
                f"ODE solve failed: {ERROR_MESSAGES.get(code, code)} "
                f"(error_code={code}, after {int(self.n_steps)} steps)")
        return self
