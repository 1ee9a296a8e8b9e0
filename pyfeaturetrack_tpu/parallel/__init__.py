from .sharding import (make_mesh, track_batch_sharded,  # noqa: F401
                       shard_feature_state, multichip_track_step)
from .scaling import measure_scaling  # noqa: F401
from .multihost import (initialize_cluster,  # noqa: F401
                        host_chunk_assignment, allgather_boundary_states)
