"""Loop closure for the monocular VO front-end.

Greenfield (no reference counterpart; the reference is a tracker only).
Completes the SLAM-shaped story of sfm/vo.py: when the camera revisits a
mapped region, drift accumulated over the loop is measured and corrected.

The pipeline is built from the framework's own primitives — no new
estimators:

1. **Re-observe** (guided wide-baseline matching): the old keyframe's
   mapped features are re-tracked into the new keyframe with
   ops/track.track_features_pyramids' guided init — the search starts at
   each landmark's PROJECTION through the new keyframe's (drifty) pose
   estimate, so LK only has to close the residual drift, not the full
   baseline. A guided forward-backward round trip gates appearance
   consistency (see guided_retrack).
2. **Measure** (metric relative pose): PnP-RANSAC (sfm/pnp) of the new
   keyframe against the old keyframe's WORLD landmarks — metric in the
   map's gauge, so the loop edge carries scale, sidestepping the
   essential-matrix scale ambiguity entirely.
3. **Correct** (pose graph): one loop edge between the keyframes joins
   the odometry chain built from the current pose estimates;
   sfm/posegraph Gauss-Newton redistributes the drift over the chain
   (close_loop_poses). The caller then re-converges landmarks with a
   global bundle adjustment (VisualOdometry._window_ba over all
   keyframes).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops.track import track_features_pyramids
from .posegraph import odometry_graph, optimize_pose_graph


def guided_retrack(pyr_a, pyr_b, x_a, y_a, x_init, y_init, cfg,
                   fb_max_displacement: float = 1.0):
    """Track features anchored in frame A into frame B, starting the
    search at (x_init, y_init) (an external motion prior — e.g.
    landmark projections). Appearance is verified with a guided
    round trip: the B-anchored template is tracked back with the search
    started at the original (x_a, y_a); the round-trip miss distance
    gates acceptance. (The plain FB gate of ops/track.fb_reject would
    re-search the full baseline unguided and reject everything a
    wide-baseline prior made possible.)

    Returns (x_b, y_b, ok, err): positions in B, the acceptance mask,
    and the round-trip miss distance (inf where either track failed).
    """
    n = x_a.shape[0]
    val = jnp.zeros((n,), jnp.int32)
    x_a = jnp.asarray(x_a, jnp.float32)
    y_a = jnp.asarray(y_a, jnp.float32)
    nx, ny, nv = track_features_pyramids(
        pyr_a, pyr_b, x_a, y_a, val, cfg,
        x_init=jnp.asarray(x_init, jnp.float32),
        y_init=jnp.asarray(y_init, jnp.float32))
    bx, by, bv = track_features_pyramids(
        pyr_b, pyr_a, nx, ny, nv, cfg, x_init=x_a, y_init=y_a)
    err = np.hypot(np.asarray(bx) - np.asarray(x_a),
                   np.asarray(by) - np.asarray(y_a))
    err = np.where((np.asarray(nv) == 0) & (np.asarray(bv) == 0),
                   err, np.inf)
    ok = err <= fb_max_displacement
    return np.asarray(nx), np.asarray(ny), ok, err


def close_loop_poses(R, t, i: int, j: int, R_j_meas, t_j_meas,
                     n_iters: int = 20, w_loop: float = 4.0):
    """Pose-graph drift redistribution for one loop closure.

    ``R``/``t``: current keyframe poses [M, 3, 3]/[M, 3] (world->cam).
    The chain edges are the CURRENT consecutive relative transforms
    (odometry as estimated); the loop edge i->j is measured from the
    trusted old pose i and the PnP-measured pose of keyframe j. The
    loop edge is up-weighted (``w_loop``): it is a direct map-metric
    measurement while chain edges carry accumulated drift.

    Returns corrected (R, t) with pose 0 pinned.
    """
    R = np.asarray(R, np.float64)
    t = np.asarray(t, np.float64)
    m = R.shape[0]
    R_rel = np.stack([R[k + 1] @ R[k].T for k in range(m - 1)])
    t_rel = np.stack([t[k + 1] - R_rel[k] @ t[k] for k in range(m - 1)])
    R_ij = np.asarray(R_j_meas, np.float64) @ R[i].T
    t_ij = np.asarray(t_j_meas, np.float64) - R_ij @ t[i]
    graph = odometry_graph(
        R_rel.astype(np.float32), t_rel.astype(np.float32),
        loop_edges=[(i, j, R_ij.astype(np.float32),
                     t_ij.astype(np.float32))])
    graph = graph._replace(
        w_rot=graph.w_rot.at[-1].set(w_loop),
        w_trans=graph.w_trans.at[-1].set(w_loop))
    Rn, tn, _ = optimize_pose_graph(graph, R.astype(np.float32),
                                    t.astype(np.float32),
                                    n_iters=n_iters)
    return np.asarray(Rn, np.float64), np.asarray(tn, np.float64)
