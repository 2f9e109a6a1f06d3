from .sharding import (make_mesh, data_parallel_odeint,
                       sharded_independent_odeint, shard_params)  # noqa: F401
from .batched import (odeint_per_sample,
                      odeint_per_sample_with_stats)  # noqa: F401
from .parareal import (odeint_parareal,
                       odeint_parareal_with_info)  # noqa: F401
