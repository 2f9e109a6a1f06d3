from .neural_ode import (init_mlp, mlp_apply, mlp_vector_field,
                         spiral_field, init_spiral_model, ode_block)  # noqa: F401
