from .sharding import (make_mesh, track_batch_sharded,  # noqa: F401
                       shard_feature_state, multichip_track_step)
from .scaling import measure_scaling  # noqa: F401
