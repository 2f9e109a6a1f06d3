from .sharding import (make_mesh, data_parallel_odeint,
                       sharded_independent_odeint, shard_params)  # noqa: F401
