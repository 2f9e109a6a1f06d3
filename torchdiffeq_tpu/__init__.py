"""torchdiffeq_tpu: a TPU-native JAX library of differentiable ODE solvers.

A ground-up rebuild of the capabilities of `torchdiffeq` (reference
/root/reference, v0.2.5) designed for XLA/TPU: adaptive solvers run as
compiled `lax.while_loop`s, fixed-grid solvers as `lax.scan`s, gradients via
`custom_vjp` continuous adjoints / implicit-function-theorem reroutes, and
state as arbitrary JAX pytrees.

Public API (mirroring torchdiffeq/__init__.py:1-5):
    odeint, odeint_adjoint, odeint_event, odeint_dense
plus `odeint_with_stats` for compiled-loop telemetry (NFE / step counts).
"""

from .odeint import odeint, odeint_with_stats
from .adjoint import odeint_adjoint
from .events import odeint_event
from .dense import odeint_dense
from .misc import Perturb
from .solvers import SOLVERS
from .solvers.solution import Stats

__version__ = "0.1.0"

__all__ = ["odeint", "odeint_adjoint", "odeint_event", "odeint_dense",
           "odeint_with_stats", "Perturb", "SOLVERS", "Stats", "__version__"]
