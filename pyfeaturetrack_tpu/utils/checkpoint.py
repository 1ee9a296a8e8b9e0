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


def vo_state(vo) -> dict:
    """Snapshot a sfm.vo.VisualOdometry for resume (long-stream
    failure recovery — SURVEY.md section 5.4 applied to the VO driver).

    Everything the next keyframe needs is captured: per-slot generation
    counters, keyframe snapshots, poses, the landmark map, and the
    tracker's own state (sequence_state for the host loop; the device
    pyramids + feature arrays for device_loop — pending sub-interval
    frames are NOT checkpointed, matching the keyframe-grained output).
    The events log is observability-only and excluded."""
    st = {
        "gen": vo.gen.copy(),
        "n_frames": np.asarray(vo.n_frames),
        "initialized": np.asarray(vo.initialized),
        "kf_frames": np.asarray([k["frame"] for k in vo.kf], np.int64),
        "kf_x": np.stack([k["x"] for k in vo.kf]) if vo.kf else
        np.zeros((0, vo.n_features)),
        "kf_y": np.stack([k["y"] for k in vo.kf]) if vo.kf else
        np.zeros((0, vo.n_features)),
        "kf_gen": np.stack([k["gen"] for k in vo.kf]) if vo.kf else
        np.zeros((0, vo.n_features), np.int64),
        "kf_live": np.stack([k["live"] for k in vo.kf]) if vo.kf else
        np.zeros((0, vo.n_features), bool),
        "pose_R": np.stack([p[0] for p in vo.poses]) if vo.poses else
        np.zeros((0, 3, 3)),
        "pose_t": np.stack([p[1] for p in vo.poses]) if vo.poses else
        np.zeros((0, 3)),
        "lm_keys": np.asarray(sorted(vo.landmarks), np.int64).reshape(
            -1, 2),
        "pose_held": np.asarray(getattr(vo, "_pose_held", False)),
    }
    st["lm_X"] = (np.stack([vo.landmarks[tuple(k)] for k in
                            st["lm_keys"]])
                  if len(st["lm_keys"]) else np.zeros((0, 3)))
    if getattr(vo, "loops_closed", None):
        # zero-size arrays are not checkpointable (Orbax restriction);
        # empty logs simply stay absent and restore to their defaults
        st["loops_closed"] = np.asarray(vo.loops_closed,
                                        np.int64).reshape(-1, 2)
    if vo.kf and any(k.get("held") for k in vo.kf):
        st["kf_held"] = np.asarray(
            [bool(k.get("held")) for k in vo.kf], bool)
    if vo.kf and all(k.get("img") is not None for k in vo.kf):
        # loop-closure mode retains keyframe images (re-observation
        # needs the old pixels); carry them so closure still works
        # against pre-resume keyframes
        st["kf_img"] = np.stack([k["img"] for k in vo.kf]).astype(
            np.float32)
    if vo.device_loop:
        if vo._dev_state is not None:
            pyr, x, y, val, aff = vo._dev_state
            st["dev"] = {"pyr": pyr, "x": x, "y": y, "val": val}
            if aff is not None:
                st["dev"]["aff"] = aff
        st["n_pending"] = np.asarray(len(vo._dev_buf))
    elif vo._tr.fl is not None:
        st["tracker"] = sequence_state(vo._tr)
    return st


def resume_vo(vo, state: dict) -> None:
    """Restore a VisualOdometry from vo_state output (vo must be
    constructed with the same K/config/feature-count arguments and the
    same device_loop mode)."""
    import jax.numpy as jnp

    from ..features import AffineState
    vo.gen = np.asarray(state["gen"], np.int64).copy()
    vo.n_frames = int(state["n_frames"])
    # device-loop sub-interval frames are not checkpointed: rewind the
    # frame counter to the last interval boundary so cadence lines up
    vo.n_frames -= int(np.asarray(state.get("n_pending", 0)))
    vo.initialized = bool(np.asarray(state["initialized"]))
    vo._pose_held = bool(np.asarray(state.get("pose_held", False)))
    frames = np.asarray(state["kf_frames"], np.int64)
    imgs = state.get("kf_img")
    held = np.asarray(state.get("kf_held",
                                np.zeros(len(frames), bool)), bool)
    vo.kf = [{"frame": int(frames[i]),
              "x": np.asarray(state["kf_x"][i], np.float64),
              "y": np.asarray(state["kf_y"][i], np.float64),
              "gen": np.asarray(state["kf_gen"][i], np.int64),
              "live": np.asarray(state["kf_live"][i], bool),
              "held": bool(held[i]),
              "img": (np.asarray(imgs[i], np.float32)
                      if imgs is not None else None)}
             for i in range(len(frames))]
    vo.loops_closed = [tuple(int(v) for v in row) for row in
                       np.asarray(state.get("loops_closed",
                                            np.zeros((0, 2)))).reshape(
                                                -1, 2)]
    vo.poses = [(np.asarray(state["pose_R"][i], np.float64),
                 np.asarray(state["pose_t"][i], np.float64))
                for i in range(len(np.asarray(state["pose_R"])))]
    keys = np.asarray(state["lm_keys"], np.int64).reshape(-1, 2)
    X = np.asarray(state["lm_X"], np.float64).reshape(-1, 3)
    vo.landmarks = {(int(k[0]), int(k[1])): X[i].copy()
                    for i, k in enumerate(keys)}
    if vo.device_loop:
        dev = state.get("dev")
        if dev is not None:
            aff = dev.get("aff")
            if isinstance(aff, dict):
                aff = AffineState(**aff)
            vo._dev_state = (_pyramids_from(dev["pyr"]),
                             jnp.asarray(dev["x"]),
                             jnp.asarray(dev["y"]),
                             jnp.asarray(dev["val"]), aff)
        vo._dev_buf = []
    elif "tracker" in state:
        resume_sequence(vo._tr, state["tracker"])
