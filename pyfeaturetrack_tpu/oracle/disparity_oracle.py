"""Float64 NumPy executable spec for dense rectified-stereo disparity.

Mirrors ops/disparity.py step for step (1-D LK specialization of the
track-level spec in flow_oracle.py, the SSD hypothesis sweep, and the
coarse-to-fine driver). The golden source for tests/test_disparity.py,
following the oracle protocol of SURVEY.md §0 (dense stereo has no
reference counterpart; this file IS its spec). Test-only: never on the
compute path.
"""

from __future__ import annotations

import numpy as np

from ..features import (KLT_LARGE_RESIDUE, KLT_MAX_ITERATIONS, KLT_OOB,
                        KLT_SMALL_DET, KLT_TRACKED)
from .flow_oracle import _bounds_ok, gather_window, upsample_flow


def box_sum(a, hw, hh):
    """ops/disparity._box_sum in float64 (zero-padded window sum)."""
    pad = np.pad(a, ((hh + 1, hh), (hw + 1, hw)))
    c = np.cumsum(np.cumsum(pad, axis=0), axis=1)
    wh, ww = 2 * hh + 1, 2 * hw + 1
    return (c[wh:, ww:] - c[:-wh, ww:] - c[wh:, :-ww] + c[:-wh, :-ww])


def hypothesis_init(img1, img2, hypotheses, hw, hh):
    """ops/disparity._hypothesis_init in float64."""
    h_img, w_img = img1.shape
    xs = np.arange(w_img, dtype=np.float64)[None, :]
    ssds = []
    for h in hypotheses:
        shifted = np.pad(img2, ((0, 0), (h, 0)))[:, :w_img]
        ssd = box_sum((img1 - shifted) ** 2, hw, hh)
        ssds.append(np.where(xs < h + hw, np.inf, 0.0) + ssd)
    best = np.argmin(np.stack(ssds), axis=0)
    return np.asarray(hypotheses, np.float64)[best]


def disparity_level(img1, gx1, gy1, img2, gx2, gy2, d, cfg):
    """ops/disparity.disparity_level in float64: masked fixed-trip 1-D
    LK over the pixel grid. Returns (d, status) maps."""
    nrows, ncols = img1.shape
    hw, hh = cfg.window_width // 2, cfg.window_height // 2
    npix = float(cfg.window_width * cfg.window_height)

    xg, yg = np.meshgrid(np.arange(ncols, dtype=np.float64),
                         np.arange(nrows, dtype=np.float64))
    x1 = xg.ravel()
    y1 = yg.ravel()
    x2 = x1 - np.asarray(d, np.float64).ravel()

    w1 = gather_window(img1, x1, y1, hw, hh)
    g1x = gather_window(gx1, x1, y1, hw, hh)
    ok1 = _bounds_ok(x1, y1, hw, hh, ncols, nrows)

    status = np.full(x2.shape, KLT_TRACKED, np.int32)
    iteration = np.zeros(x2.shape, np.int32)
    live = np.ones(x2.shape, bool)

    for _ in range(cfg.max_iterations):
        ok = ok1 & _bounds_ok(x2, y1, hw, hh, ncols, nrows)
        status = np.where(live & ~ok, KLT_OOB, status)
        cur = live & ok

        w2 = gather_window(img2, x2, y1, hw, hh)
        g2x = gather_window(gx2, x2, y1, hw, hh)
        diff = w1 - w2
        gx = g1x + g2x
        gxx = np.sum(gx * gx, axis=(-2, -1))
        ex = cfg.step_factor * np.sum(diff * gx, axis=(-2, -1))

        small = gxx < cfg.min_determinant
        status = np.where(cur & small, KLT_SMALL_DET, status)
        cur = cur & ~small
        du = ex / np.where(small, 1.0, gxx)

        x2 = np.where(cur, x2 + du, x2)
        iteration = np.where(cur, iteration + 1, iteration)
        moving = np.abs(du) >= cfg.min_displacement
        live = cur & moving & (iteration < cfg.max_iterations)

    final_ok = _bounds_ok(x2, y1, hw, hh, ncols, nrows)
    status = np.where(~final_ok, KLT_OOB, status)
    w2 = gather_window(img2, x2, y1, hw, hh)
    residue = np.sum(np.abs(w1 - w2), axis=(-2, -1)) / npix
    tracked = status == KLT_TRACKED
    status = np.where(tracked & (residue > cfg.max_residue),
                      KLT_LARGE_RESIDUE, status)
    tracked = status == KLT_TRACKED
    status = np.where(tracked & (iteration >= cfg.max_iterations),
                      KLT_MAX_ITERATIONS, status)
    return ((x1 - x2).reshape(nrows, ncols),
            status.reshape(nrows, ncols))


def dense_disparity(pyr_l_img, pyr_l_gx, pyr_l_gy,
                    pyr_r_img, pyr_r_gx, pyr_r_gy, cfg,
                    max_disparity=64.0, hypothesis_stride=None):
    """ops/disparity.dense_disparity_pyramids in float64 over pyramid
    level lists (coarsest last)."""
    s = float(cfg.subsampling)
    n_levels = cfg.nPyramidLevels
    hw, hh = cfg.window_width // 2, cfg.window_height // 2
    if hypothesis_stride is None:
        hypothesis_stride = hw + 1

    cl = np.asarray(pyr_l_img[n_levels - 1], np.float64)
    cr = np.asarray(pyr_r_img[n_levels - 1], np.float64)
    max_d_coarse = int(max_disparity / s ** (n_levels - 1))
    hypotheses = tuple(range(0, max_d_coarse + 1, int(hypothesis_stride)))
    if len(hypotheses) > 1:
        d = hypothesis_init(cl, cr, hypotheses, hw, hh)
    else:
        d = np.zeros(cl.shape, np.float64)

    status = None
    for r in range(n_levels - 1, -1, -1):
        shape = pyr_l_img[r].shape
        if shape != d.shape:
            d = upsample_flow(d, shape, s)
        d, status = disparity_level(
            np.asarray(pyr_l_img[r], np.float64),
            np.asarray(pyr_l_gx[r], np.float64),
            np.asarray(pyr_l_gy[r], np.float64),
            np.asarray(pyr_r_img[r], np.float64),
            np.asarray(pyr_r_gx[r], np.float64),
            np.asarray(pyr_r_gy[r], np.float64), d, cfg)
    return d, status
