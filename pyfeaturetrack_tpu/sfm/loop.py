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


def close_loop_sim3(R, t, i: int, j: int, R_j_meas, t_j_meas):
    """Closed-form Sim(3)-style loop correction for MONOCULAR chains.

    The rigid pose graph (close_loop_poses) has no scale degree of
    freedom, so when the accumulated drift is dominated by monocular
    SCALE drift (measured on the 520-frame circuit: a genuine 92-inlier
    loop edge with 19.5 units of drift made ATE WORSE, 4.7% -> 15%,
    with the optimizer twisting rotations by ~106° to satisfy the rigid
    edge), redistribution must scale the chain. This applies the
    classic similarity correction geodesically: anchor at keyframe
    ``i`` (trusted old pose), full correction at ``j`` (the PnP-
    measured pose in the OLD map's gauge), each keyframe k in (i..j]
    corrected by the fraction w_k of cumulative path length:

      centers:      c_k' = c_i + s^{w_k} Rot(u, w_k θ) (c_k - c_i)
                           + w_k d
      orientations: R_k' = R_k Rot(u, w_k θ)^T

    with (u, θ) the axis-angle of the world rotation R_meas^T R_j,
    s the chord-length ratio |c_meas - c_i| / |c_j - c_i|, and d the
    translation shim that makes the j correction exact. Landmarks are
    re-converged by the caller's windowed BA against the corrected
    chain (as with close_loop_poses). Poses before ``i`` are untouched.
    """
    R = np.asarray(R, np.float64)
    t = np.asarray(t, np.float64)
    m = R.shape[0]
    c = np.einsum("kij,kj->ki", -np.transpose(R, (0, 2, 1)), t)
    R_m = np.asarray(R_j_meas, np.float64)
    c_m = -R_m.T @ np.asarray(t_j_meas, np.float64)

    dR = R_m.T @ R[j]                      # world-side full rotation
    # axis-angle of dR
    tr = np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0)
    th = float(np.arccos(tr))
    if th > 1e-9:
        u = np.array([dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0],
                      dR[1, 0] - dR[0, 1]], np.float64)
        n = np.linalg.norm(u)
        u = u / n if n > 1e-12 else np.array([0.0, 1.0, 0.0])
    else:
        u = np.array([0.0, 1.0, 0.0])

    def rot(w):
        a = w * th
        ux, uy, uz = u
        Kx = np.array([[0, -uz, uy], [uz, 0, -ux], [-uy, ux, 0]],
                      np.float64)
        return (np.eye(3) + np.sin(a) * Kx +
                (1.0 - np.cos(a)) * (Kx @ Kx))

    # chord-ratio scale estimate, CLAMPED: at a true revisit the
    # measured chord |c_m - c_i| tends to zero, which would collapse
    # the whole chain (measured: s ~ 0.1 NaN'd the downstream BA).
    # Monocular scale drift over a window-BA'd chain is gentle (the
    # per-window re-anchor bounds it), so clamp to ±25% and let the
    # translation shim d absorb the remainder of the endpoint gap.
    chord_est = float(np.linalg.norm(c[j] - c[i]))
    chord_meas = float(np.linalg.norm(c_m - c[i]))
    s = chord_meas / chord_est if chord_est > 1e-9 else 1.0
    s = float(np.clip(s, 0.8, 1.25))
    d = c_m - (c[i] + s * rot(1.0) @ (c[j] - c[i]))

    seg = np.linalg.norm(np.diff(c[i:j + 1], axis=0), axis=1)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = cum[-1] if cum[-1] > 1e-12 else 1.0

    Rn, tn = R.copy(), t.copy()
    # per-keyframe POINT correction p' = A_k p + b_k (the same warp the
    # centers get): the caller applies it to each landmark using the
    # keyframe that anchors it, so the MAP moves with the chain and the
    # post-closure global BA starts consistent (leaving landmarks in
    # the old gauge measured as BA divergence: rot RPE ~112 deg).
    A = np.tile(np.eye(3), (m, 1, 1))
    b = np.zeros((m, 3))
    for k in range(i + 1, m):
        w = float(cum[min(k - i, j - i)] / total) if k <= j else 1.0
        Wr = rot(w)
        Ak = (s ** w) * Wr
        bk = c[i] - Ak @ c[i] + w * d
        ck = Ak @ c[k] + bk
        Rk = R[k] @ Wr.T
        Rn[k] = Rk
        tn[k] = -Rk @ ck
        A[k] = Ak
        b[k] = bk
    return Rn, tn, A, b


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
