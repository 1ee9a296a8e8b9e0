"""Float64 NumPy executable spec for dense pyramidal LK optical flow.

Mirrors ops/flow.py step for step: a vectorized float64 transcription of
ops/track.track_feature_level (gather_patch clamping, masked fixed-trip
iteration, status priorities) applied to the pixel grid, plus the same
upsample convention. The golden source for tests/test_flow.py, following
the oracle protocol of SURVEY.md §0 (the dense-flow extension has no
reference counterpart; this file IS its spec). Test-only: never on the
compute path.
"""

from __future__ import annotations

import numpy as np

from ..features import (KLT_LARGE_RESIDUE, KLT_MAX_ITERATIONS, KLT_OOB,
                        KLT_SMALL_DET, KLT_TRACKED)

_ONE_PLUS_EPS = 1.001  # ops/track._ONE_PLUS_EPS


def bilinear(img, xs, ys):
    """ops/interp.bilinear in float64 (same rim clamp)."""
    h, w = img.shape
    xt = np.floor(xs).astype(np.int64)
    yt = np.floor(ys).astype(np.int64)
    ax = xs - xt
    ay = ys - yt
    x0 = np.clip(xt, 0, w - 2)
    y0 = np.clip(yt, 0, h - 2)
    p00 = img[y0, x0]
    p01 = img[y0, x0 + 1]
    p10 = img[y0 + 1, x0]
    p11 = img[y0 + 1, x0 + 1]
    return ((1.0 - ax) * (1.0 - ay) * p00 + ax * (1.0 - ay) * p01 +
            (1.0 - ax) * ay * p10 + ax * ay * p11)


def gather_window(img, x, y, hw, hh):
    """ops/interp.gather_patch + window_from_patch in float64: one
    integer (h+1)x(w+1) patch per point, clamped in-bounds, blended with
    the shared fractional offsets. Returns [N, 2*hh+1, 2*hw+1]."""
    hsz, wsz = img.shape
    xt = np.floor(x).astype(np.int64)
    yt = np.floor(y).astype(np.int64)
    ax = (x - xt)[:, None, None]
    ay = (y - yt)[:, None, None]
    x0 = np.clip(xt - hw, 0, wsz - 2 - 2 * hw)
    y0 = np.clip(yt - hh, 0, hsz - 2 - 2 * hh)
    rows = y0[:, None, None] + np.arange(2 * hh + 2)[None, :, None]
    cols = x0[:, None, None] + np.arange(2 * hw + 2)[None, None, :]
    patch = img[rows, cols]
    p00 = patch[:, :-1, :-1]
    p01 = patch[:, :-1, 1:]
    p10 = patch[:, 1:, :-1]
    p11 = patch[:, 1:, 1:]
    return ((1.0 - ax) * (1.0 - ay) * p00 + ax * (1.0 - ay) * p01 +
            (1.0 - ax) * ay * p10 + ax * ay * p11)


def upsample_flow(u, shape, scale):
    """ops/flow.upsample_flow in float64 (same half-pixel convention)."""
    h_out, w_out = shape
    h_in, w_in = u.shape
    ys = (np.arange(h_out, dtype=np.float64) + 0.5) * (h_in / h_out) - 0.5
    xs = (np.arange(w_out, dtype=np.float64) + 0.5) * (w_in / w_out) - 0.5
    ys = np.clip(ys, 0.0, h_in - 1.0)
    xs = np.clip(xs, 0.0, w_in - 1.0)
    gx, gy = np.meshgrid(xs, ys)
    return bilinear(u, gx, gy) * scale


def _bounds_ok(x, y, hw, hh, ncols, nrows):
    return ((x - hw >= 0.0) & (ncols - (x + hw) >= _ONE_PLUS_EPS) &
            (y - hh >= 0.0) & (nrows - (y + hh) >= _ONE_PLUS_EPS))


def track_level(x1, y1, x2, y2, img1, gx1, gy1, img2, gx2, gy2, cfg,
                active):
    """Vectorized float64 mirror of ops/track.track_feature_level
    (translational path; lighting_insensitive unsupported here — the
    dense driver does not use it). Returns (x2, y2, status, iteration).
    """
    assert not cfg.lighting_insensitive
    nrows, ncols = img1.shape
    hw, hh = cfg.window_width // 2, cfg.window_height // 2
    npix = float(cfg.window_width * cfg.window_height)

    w1 = gather_window(img1, x1, y1, hw, hh)
    g1x = gather_window(gx1, x1, y1, hw, hh)
    g1y = gather_window(gy1, x1, y1, hw, hh)
    ok1 = _bounds_ok(x1, y1, hw, hh, ncols, nrows)

    x2 = x2.astype(np.float64).copy()
    y2 = y2.astype(np.float64).copy()
    status = np.full(x2.shape, KLT_TRACKED, np.int32)
    iteration = np.zeros(x2.shape, np.int32)
    live = np.asarray(active, bool).copy()

    for _ in range(cfg.max_iterations):
        ok = ok1 & _bounds_ok(x2, y2, hw, hh, ncols, nrows)
        status = np.where(live & ~ok, KLT_OOB, status)
        cur = live & ok

        w2 = gather_window(img2, x2, y2, hw, hh)
        g2x = gather_window(gx2, x2, y2, hw, hh)
        g2y = gather_window(gy2, x2, y2, hw, hh)
        diff = w1 - w2
        gx = g1x + g2x
        gy = g1y + g2y

        gxx = np.sum(gx * gx, axis=(-2, -1))
        gxy = np.sum(gx * gy, axis=(-2, -1))
        gyy = np.sum(gy * gy, axis=(-2, -1))
        ex = cfg.step_factor * np.sum(diff * gx, axis=(-2, -1))
        ey = cfg.step_factor * np.sum(diff * gy, axis=(-2, -1))

        det = gxx * gyy - gxy * gxy
        small = det < cfg.min_determinant
        status = np.where(cur & small, KLT_SMALL_DET, status)
        cur = cur & ~small

        safe = np.where(small, 1.0, det)
        dx = (gyy * ex - gxy * ey) / safe
        dy = (gxx * ey - gxy * ex) / safe

        x2 = np.where(cur, x2 + dx, x2)
        y2 = np.where(cur, y2 + dy, y2)
        iteration = np.where(cur, iteration + 1, iteration)
        moving = (np.abs(dx) >= cfg.min_displacement) | (
            np.abs(dy) >= cfg.min_displacement)
        live = cur & moving & (iteration < cfg.max_iterations)

    active = np.asarray(active, bool)
    final_ok = _bounds_ok(x2, y2, hw, hh, ncols, nrows)
    status = np.where(active & ~final_ok, KLT_OOB, status)

    w2 = gather_window(img2, x2, y2, hw, hh)
    residue = np.sum(np.abs(w1 - w2), axis=(-2, -1)) / npix
    tracked = active & (status == KLT_TRACKED)
    status = np.where(tracked & (residue > cfg.max_residue),
                      KLT_LARGE_RESIDUE, status)
    tracked = active & (status == KLT_TRACKED)
    status = np.where(tracked & (iteration >= cfg.max_iterations),
                      KLT_MAX_ITERATIONS, status)
    return x2, y2, status, iteration


def flow_level(img1, gx1, gy1, img2, gx2, gy2, u, v, cfg):
    """ops/flow.flow_level in float64: track_level over the pixel grid."""
    nrows, ncols = img1.shape
    xg, yg = np.meshgrid(np.arange(ncols, dtype=np.float64),
                         np.arange(nrows, dtype=np.float64))
    x1 = xg.ravel()
    y1 = yg.ravel()
    x2 = x1 + np.asarray(u, np.float64).ravel()
    y2 = y1 + np.asarray(v, np.float64).ravel()
    active = np.ones(x1.shape, bool)
    nx, ny, status, _ = track_level(x1, y1, x2, y2, img1, gx1, gy1,
                                    img2, gx2, gy2, cfg, active)
    return ((nx - x1).reshape(nrows, ncols),
            (ny - y1).reshape(nrows, ncols),
            status.reshape(nrows, ncols))


def dense_flow(pyr1_img, pyr1_gx, pyr1_gy, pyr2_img, pyr2_gx, pyr2_gy,
               cfg):
    """ops/flow.dense_flow_pyramids in float64 over pyramid level lists
    (coarsest last)."""
    s = float(cfg.subsampling)
    n_levels = cfg.nPyramidLevels
    hc, wc = pyr1_img[n_levels - 1].shape
    u = np.zeros((hc, wc), np.float64)
    v = np.zeros((hc, wc), np.float64)
    status = np.full((hc, wc), KLT_TRACKED, np.int32)
    for r in range(n_levels - 1, -1, -1):
        shape = pyr1_img[r].shape
        if shape != u.shape:
            u = upsample_flow(u, shape, s)
            v = upsample_flow(v, shape, s)
        u, v, status = flow_level(
            np.asarray(pyr1_img[r], np.float64),
            np.asarray(pyr1_gx[r], np.float64),
            np.asarray(pyr1_gy[r], np.float64),
            np.asarray(pyr2_img[r], np.float64),
            np.asarray(pyr2_gx[r], np.float64),
            np.asarray(pyr2_gy[r], np.float64), u, v, cfg)
    return u, v, status
