"""Rectified-stereo matching and metric depth from the LK tracker.

Beyond-reference modality (the reference is monocular-only): on a
rectified stereo pair the correspondence is a pure horizontal shift
(disparity), so the framework's own pyramidal LK *is* the stereo
matcher — the pyramid depth is derived from the disparity search range
(config.change_pyramid), matches are gated by the epipolar constraint
(|dy| small), a disparity-sign/range check, and the guided
forward-backward round trip (sfm/loop.guided_retrack). Depth is then
metric: z = fx * baseline / disparity.

This gives the SfM stack a metric-scale source: stereo_triangulate
returns left-camera-frame points whose scale is the physical baseline,
not the monocular first-baseline gauge.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config import TrackerConfig
from ..ops.track import build_track_pyramids_jit
from ..utils.staging import stage_f32
from .loop import guided_retrack


def stereo_match(img_left, img_right, x, y,
                 cfg: TrackerConfig | None = None,
                 max_disparity: float = 64.0,
                 y_tolerance: float = 0.75,
                 min_disparity: float = 0.25,
                 fb_max_displacement: float = 0.75,
                 hypothesis_stride: float = 10.0):
    """Match left-image features into the right image of a rectified
    pair. Returns (disparity [N], valid [N]) — disparity = x_L - x_R
    (positive for points in front of the camera with the right camera
    at +baseline along x).

    Rather than inflating the pyramid to cover ``max_disparity`` (the
    derived-parameter route shrinks coarse levels below the smoothing
    kernel on modest images), the matcher sweeps MULTI-HYPOTHESIS
    guided inits: LK runs from candidate disparities spaced
    ``hypothesis_stride`` apart (each within the default pyramid's
    search range of the truth for some candidate) and keeps, per
    feature, the hypothesis with the smallest guided round-trip error.
    Matches must then satisfy the epipolar constraint
    (|y_R - y_L| <= y_tolerance) and the disparity range.
    """
    from ..config import create_config
    cfg = (cfg or create_config()).validated_window()
    pyr_l = build_track_pyramids_jit(stage_f32(img_left), cfg)
    pyr_r = build_track_pyramids_jit(stage_f32(img_right), cfg)
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)

    n = x.shape[0]
    best_err = np.full((n,), np.inf)
    best_xr = np.zeros((n,))
    best_yr = np.zeros((n,))
    for d0 in np.arange(0.0, max_disparity + 1e-6, hypothesis_stride):
        xr, yr, _, err = guided_retrack(
            pyr_l, pyr_r, x, y, x - float(d0), y, cfg,
            fb_max_displacement=fb_max_displacement)
        upd = err < best_err
        best_err = np.where(upd, err, best_err)
        best_xr = np.where(upd, xr, best_xr)
        best_yr = np.where(upd, yr, best_yr)

    disparity = np.asarray(x) - best_xr
    valid = ((best_err <= fb_max_displacement) &
             (np.abs(best_yr - np.asarray(y)) <= y_tolerance) &
             (disparity >= min_disparity) & (disparity <= max_disparity))
    return disparity, valid


def stereo_depth(disparity, fx: float, baseline: float):
    """Metric depth z = fx * baseline / disparity (invalid lanes of a
    gated disparity array should be masked by the caller)."""
    d = np.asarray(disparity, np.float64)
    return fx * baseline / np.maximum(d, 1e-9)


def stereo_triangulate(K, baseline: float, x, y, disparity):
    """Left-camera-frame 3D points [N, 3] from pixel positions and
    disparity — metric scale set by the physical ``baseline``."""
    K = np.asarray(K, np.float64)
    z = stereo_depth(disparity, K[0, 0], baseline)
    X = (np.asarray(x, np.float64) - K[0, 2]) * z / K[0, 0]
    Y = (np.asarray(y, np.float64) - K[1, 2]) * z / K[1, 1]
    return np.stack([X, Y, z], -1)
