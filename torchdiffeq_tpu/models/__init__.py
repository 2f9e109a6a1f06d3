from .neural_ode import (init_mlp, mlp_apply, mlp_vector_field,
                         spiral_field, init_spiral_model, ode_block)  # noqa: F401
from .conv_ode import (init_conv_field, conv_field, conv_field_flops,
                       init_conv, conv_apply, group_norm, concat_time,
                       conv_apply_packed, conv_field_packed,
                       conv_apply_foldt, conv_field_foldt)  # noqa: F401
