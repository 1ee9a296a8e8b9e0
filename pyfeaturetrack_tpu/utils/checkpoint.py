"""Checkpoint / resume.

SURVEY.md section 5.4: the reference's persistence layer is its feature
list/table file formats (utils/io.py reproduces those for interop). For
the distributed framework state — tracker sequence state, feature tables,
BA/pose state — checkpoints are Orbax pytree checkpoints, the standard JAX
practice for multi-host jobs.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path, pytree: Any) -> None:
    """Save any pytree (FeatureTable, FeatureState, BA state, ...)."""
    path = Path(path).absolute()
    # Orbax refuses to overwrite; mirror the common force-save pattern.
    ckpt = _checkpointer()
    ckpt.save(path, jax.tree.map(np.asarray, pytree), force=True)


def restore_checkpoint(path, template: Any = None) -> Any:
    """Restore a pytree checkpoint; ``template`` (optional) provides the
    tree structure + dtypes to restore into."""
    path = Path(path).absolute()
    ckpt = _checkpointer()
    if template is None:
        return ckpt.restore(path)
    target = jax.tree.map(np.asarray, template)
    return ckpt.restore(path, item=target)


def sequence_state(tracker) -> dict:
    """Snapshot a models.sequence.SequenceTracker for resume.

    The per-frame metrics history is NOT checkpointed (host-side
    observability only); ``n_frames_seen`` records how many frames the
    tracker had processed."""
    if tracker.fl is None or not hasattr(tracker, "_prev"):
        raise ValueError(
            "sequence_state: tracker has not processed any frame yet")
    state = {
        "fl": tracker.fl,
        "prev": np.asarray(tracker._prev),
        "n_frames_seen": np.asarray(tracker.n_frames_seen),
    }
    if tracker._cache is not None:
        state["cache"] = tracker._cache
    return state


def resume_sequence(tracker, state: dict) -> None:
    """Restore a SequenceTracker from sequence_state output."""
    from ..features import AffineState, FeatureState
    fl = state["fl"]
    if isinstance(fl, dict):  # restored as raw pytree
        aff = fl.get("aff", None)
        if isinstance(aff, dict):
            aff = AffineState(**aff)
        fl = FeatureState(x=fl["x"], y=fl["y"], val=fl["val"], aff=aff)
    tracker.fl = fl
    tracker._prev = np.asarray(state["prev"])
    # metrics are not checkpointed; restore the frame counter so a
    # resumed-then-checkpointed tracker does not undercount.
    tracker.n_frames_seen = int(state.get("n_frames_seen", 0))
    cache = state.get("cache")
    if cache is not None:
        tracker._cache = _pyramids_from(cache)


def _pyramids_from(obj):
    from ..ops.track import TrackPyramids
    if isinstance(obj, dict):
        return TrackPyramids(img=tuple(obj["img"]),
                             gradx=tuple(obj["gradx"]),
                             grady=tuple(obj["grady"]))
    return obj


def streaming_state(tracker) -> dict:
    """Snapshot a serving.StreamingTracker / BatchedStreamingTracker
    for resume (the long-running-serving failure-recovery path).

    Buffered partial chains are flushed into the snapshot; the row
    HISTORY is not included — call ``drain()`` and persist its output
    alongside if the accumulated table matters across the restart."""
    if tracker._state is None:
        raise ValueError(
            "streaming_state: tracker has not processed any frame yet")
    tracker.flush()
    x, y, val = tracker._state
    state = {
        "pyr": tracker._pyr,
        "x": x, "y": y, "val": val,
        "n_frames": np.asarray(tracker.n_frames),
        # selection-exhaustion flag survives the restart (the warning
        # must still fire on the next pull after a resume)
        "exhausted": np.asarray(
            False if tracker._exhausted is None
            else bool(tracker._exhausted)),
    }
    if tracker._aff is not None:
        state["aff"] = tracker._aff
    return state


def resume_streaming(tracker, state: dict) -> None:
    """Restore a StreamingTracker/BatchedStreamingTracker from
    streaming_state output (tracker must be constructed with the same
    config/feature-count arguments)."""
    import jax.numpy as jnp

    from ..features import AffineState
    tracker._pyr = _pyramids_from(state["pyr"])
    tracker._state = (jnp.asarray(state["x"]), jnp.asarray(state["y"]),
                      jnp.asarray(state["val"]))
    aff = state.get("aff")
    if isinstance(aff, dict):
        aff = AffineState(**aff)
    tracker._aff = aff
    tracker.n_frames = int(state["n_frames"])
    tracker._pending = []
    tracker._chunks = []
    tracker._host_chunks = []   # rows from the abandoned timeline
    tracker._exhausted = (jnp.asarray(True)
                          if bool(np.asarray(state.get("exhausted",
                                                       False)))
                          else None)
