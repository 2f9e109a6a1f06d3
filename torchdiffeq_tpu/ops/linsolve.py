"""Mixed-precision linear solves: f64 stage systems on f32-LU-only TPUs.

TPU capability reality (probed on a v5 lite chip): f64 *elementwise* and
*matmul* execute natively, but the LU decomposition (`jnp.linalg.solve`,
`lu_factor`) only compiles for f32.  The reference runs its stiff stage
solves in whatever dtype torch offers everywhere
(/root/reference/torchdiffeq/_impl/rk_common.py:425-462, tol 1e-8 for f64)
— so without this module, f64 stiff solves had to fall off the TPU to the
host CPU.

`solve(J, b)` keeps them on-chip with the classic mixed-precision
iterative-refinement scheme (Wilkinson; Carson & Higham's GMRES-IR is the
modern heavy-duty variant — plain IR suffices at stage-system condition
numbers):

    factor   P L U = J_f32            (one f32 LU — the only O(n^3) step)
    x_0      = U^-1 L^-1 b            (f32 triangular solves, f64 carry)
    x_{k+1}  = x_k + U^-1 L^-1 (b - J x_k)     (residual in NATIVE f64)

Each sweep multiplies the error by O(eps_f32 * cond(J)); for stage systems
J ~ I - dt*gamma*df/dy this converges to f64 accuracy in a few sweeps
whenever cond(J) << 1/eps_f32 ~ 1.7e7.  Beyond that the refinement stalls
— and the OUTER Newton iteration then reports non-convergence, which the
adaptive stiff tier converts into a step rejection and a smaller dt
(shrinking dt directly improves cond(J)), so ill-conditioning self-heals
at the stepper level instead of erroring.

The refinement loop is a fixed-length `lax.scan` whose body is LINEAR in
`b` and in the carry (J and the LU factors are fixed), so the whole solve
is a linear function of `b` — exactly what `lax.custom_root`'s
`tangent_solve` transposition and the IFT backward require.

Dispatch is static (trace-time): f64 inputs on a backend without native
f64 LU take the refined path; everything else is `jnp.linalg.solve`.

Platform caveat (measured, not this module's doing): XLA's f64 `cos` on
the TPU is only ~4e-12 accurate (vs ~4e-15 for sin/exp/div/sqrt).  A
stiff field containing cos(t) scaled by a large lambda carries that noise
into the stage residual; when it exceeds the stage tolerance, Newton
reports non-convergence, the controller rejects and shrinks dt, and step
counts inflate (measured ~70x for radau5a at lambda=1e4, rtol=1e-8, while
transcendental-free fields match CPU step counts exactly: 262/262, 92/93,
1666/1666 for radau5a/kvaerno5/kvaerno3).  The solve still completes with
error_code 0 and full accuracy — it is a cost, not a correctness, effect.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsp_linalg

# Test hook: force the refined path regardless of backend (lets the CPU
# test suite exercise exactly what runs on the TPU).
FORCE_REFINED = False

# Number of refinement sweeps.  Error contraction per sweep is
# ~eps_f32*cond(J); 10 sweeps reach f64 accuracy for cond up to ~1e4 and
# the best achievable (~eps_f32*cond residual-limited) beyond.  Each sweep
# is O(n^2) — noise next to the O(n^3) factorization.
REFINE_SWEEPS = 10


@functools.lru_cache(maxsize=None)
def _native_f64_lu(platform: str) -> bool:
    """Whether `platform` can compile an f64 LU.  CPU/GPU link LAPACK /
    cuSOLVER; TPU (incl. this container's experimental 'axon' tunnel,
    which reports platform 'tpu') has no f64 linalg."""
    return platform not in ('tpu',)


def solve_refined(J, b, sweeps: int = REFINE_SWEEPS):
    """Solve J x = b via f32 LU + iterative refinement with residuals in
    J's own dtype (see module docstring).  J: (n, n); b: (n,) or (n, k).
    Linear in `b` (transposable); differentiable in both arguments through
    the factorization's f32 cast."""
    out_dtype = jnp.promote_types(J.dtype, b.dtype)
    lu, piv = jsp_linalg.lu_factor(J.astype(jnp.float32))

    def coarse_solve(r):
        return jsp_linalg.lu_solve((lu, piv),
                                   r.astype(jnp.float32)).astype(out_dtype)

    b = b.astype(out_dtype)
    Jp = J.astype(out_dtype)
    x0 = coarse_solve(b)

    def body(x, _):
        r = b - Jp @ x          # residual in native f64 (TPU-supported)
        return x + coarse_solve(r), ()

    x, _ = jax.lax.scan(body, x0, None, length=sweeps)
    return x


def solve(J, b):
    """`jnp.linalg.solve(J, b)` that stays on-device for f64 on backends
    without f64 LU (static trace-time dispatch on dtype + default
    backend).  Under `jax.default_device(cpu)` inside a TPU-default
    process the refined path is still used for f64 — it returns the same
    solution to f64 accuracy, just via IR instead of one LAPACK call."""
    refined = FORCE_REFINED or (
        jnp.promote_types(J.dtype, b.dtype) == jnp.float64
        and not _native_f64_lu(jax.default_backend()))
    if refined:
        return solve_refined(J, b)
    return jnp.linalg.solve(J, b)
