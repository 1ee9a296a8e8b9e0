"""Multi-host deployment helpers.

SURVEY.md section 5.8: across hosts the framework uses standard JAX
multi-controller SPMD — every host runs the same program,
``jax.distributed.initialize`` wires the slice together, and the mesh in
parallel/sharding.py then spans all hosts' devices (collectives ride ICI
within a slice, DCN across slices).

Work placement for the tracker:

* frame-pair / feature sharding: just build the mesh over
  ``jax.devices()`` after ``initialize_cluster`` — jit shardings do the
  rest (data must be loaded per-host with
  ``jax.make_array_from_process_local_data``).
* chunked sequences (models/chunked.py): each host tracks the chunks in
  ``host_chunk_assignment`` locally (the serial per-chunk path or the
  batched lockstep path), then the [N, 3] boundary feature lists are
  gathered host-to-host (process_allgather) and stitched once.
* distributed BA: shard landmarks over the global mesh
  (sfm/ba.py bundle_adjust(mesh=...)) — the camera-block psum is the
  only cross-host collective per iteration.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize_cluster(coordinator_address: str | None = None,
                       num_processes: int | None = None,
                       process_id: int | None = None) -> dict:
    """Bring up JAX multi-controller mode (no-op on a single process).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters. Returns a summary dict.
    """
    if num_processes is not None and num_processes > 1 or \
            coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def host_chunk_assignment(n_chunks: int) -> list[int]:
    """Chunk indices this host owns (contiguous block partition)."""
    p, n = jax.process_index(), jax.process_count()
    per = n_chunks // n
    extra = n_chunks % n
    start = p * per + min(p, extra)
    count = per + (1 if p < extra else 0)
    return list(range(start, start + count))


def allgather_boundary_states(local_states: np.ndarray):
    """All-gather per-chunk boundary feature arrays across hosts.

    ``local_states``: [n_local_chunks, N, 3] float32. Returns the
    concatenated [n_chunks_total, N, 3] array on every host (chunk order
    follows host_chunk_assignment's contiguous partition).
    """
    if jax.process_count() == 1:
        return np.asarray(local_states)
    from jax.experimental import multihost_utils
    return np.asarray(
        multihost_utils.process_allgather(np.asarray(local_states),
                                          tiled=True))
