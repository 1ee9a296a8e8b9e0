"""Float64 oracle for the affine-consistency check — TEST-ONLY golden source.

Reference parity: trackFeatures.py -> _am_trackFeatureAffine family
(SURVEY.md section 3.3). The reference repo being unavailable (SURVEY.md
section 0), this oracle is the executable spec: a per-feature, float64
Gauss-Newton matching of the feature's FIRST-frame template against the
current frame under a warp, in three modes:

  mode 0 (affineConsistencyCheck=0): translation only   (2 params)
  mode 1: similarity — scale+rotation+translation        (4 params)
  mode 2: full affine                                    (6 params)

Template capture: bilinear windows of the smoothed first frame (and its
derivative-of-Gaussian gradients) centered at the feature's first tracked
position — so the template grid is exactly feature-aligned and needs no
stored subpixel offset.

Update model (forward additive): sample the current frame at
(x + Axx*i + Axy*j, y + Ayx*i + Ayy*j); minimize sum (I2w - T)^2 over the
warp parameters; solve the 6x6/4x4/2x2 normal equations (the reference's
Gauss-Jordan) and accumulate into (A, x, y). Statuses: KLT_OOB when the
warped window exits the image or the final position drifts more than
affine_max_displacement_differ from the translation track; KLT_SMALL_DET on
a singular system; KLT_LARGE_RESIDUE on a high final residue.
"""

from __future__ import annotations

import numpy as np

from .klt_oracle import (KLT_LARGE_RESIDUE, KLT_OOB, KLT_SMALL_DET,
                         KLT_TRACKED)

_ONE_PLUS_EPS = 1.001


def _bilinear_grid(img, xs, ys):
    """Vectorized 4-tap bilinear at float coord grids (same truncation
    semantics as scalar interpolate)."""
    xt = xs.astype(np.int64)
    yt = ys.astype(np.int64)
    ax, ay = xs - xt, ys - yt
    return ((1 - ax) * (1 - ay) * img[yt, xt] +
            ax * (1 - ay) * img[yt, xt + 1] +
            (1 - ax) * ay * img[yt + 1, xt] +
            ax * ay * img[yt + 1, xt + 1])


def get_template(img, gradx, grady, x, y, width, height):
    """Bilinear template windows centered at (x, y)."""
    hw, hh = width // 2, height // 2
    xs = x + np.arange(-hw, hw + 1, dtype=np.float64)[None, :]
    ys = y + np.arange(-hh, hh + 1, dtype=np.float64)[:, None]
    xs, ys = np.broadcast_arrays(xs + 0.0 * ys, ys + 0.0 * xs)
    return (_bilinear_grid(img, xs, ys), _bilinear_grid(gradx, xs, ys),
            _bilinear_grid(grady, xs, ys))


def _warp_windows(img2, gx2, gy2, x, y, A, hw, hh):
    """Sample current frame + gradients at affine-warped window coords.
    Returns (I2w, gxw, gyw, oob)."""
    nrows, ncols = img2.shape
    ii = np.arange(-hw, hw + 1, dtype=np.float64)[None, :]
    jj = np.arange(-hh, hh + 1, dtype=np.float64)[:, None]
    xs = x + A[0, 0] * ii + A[0, 1] * jj
    ys = y + A[1, 0] * ii + A[1, 1] * jj
    xs, ys = np.broadcast_arrays(xs, ys)
    if ((xs < 0.0) | (ncols - xs < _ONE_PLUS_EPS) |
            (ys < 0.0) | (nrows - ys < _ONE_PLUS_EPS)).any():
        z = np.zeros_like(xs)
        return z, z.copy(), z.copy(), True
    return (_bilinear_grid(img2, xs, ys), _bilinear_grid(gx2, xs, ys),
            _bilinear_grid(gy2, xs, ys), False)


def _jacobian(gxw, gyw, hw, hh, mode):
    """Rows of the Gauss-Newton Jacobian, flattened over the window.

    Parameter order: mode 0 -> (dx, dy); mode 1 -> (a, b, dx, dy) with
    A += [[a, -b], [b, a]]; mode 2 -> (Axx, Ayx, Axy, Ayy, dx, dy)."""
    h, w = 2 * hh + 1, 2 * hw + 1
    ii = np.tile(np.arange(-hw, hw + 1, dtype=np.float64), (h, 1))
    jj = np.tile(np.arange(-hh, hh + 1, dtype=np.float64)[:, None], (1, w))
    gx, gy = gxw, gyw
    if mode == 0:
        rows = [gx, gy]
    elif mode == 1:
        rows = [gx * ii + gy * jj, -gx * jj + gy * ii, gx, gy]
    else:
        rows = [gx * ii, gy * ii, gx * jj, gy * jj, gx, gy]
    return np.stack([r.ravel() for r in rows], axis=0)


def am_track_feature_affine(x_trans, y_trans, tmpl, img2, gx2, gy2, A0,
                            cfg, mode):
    """Gauss-Newton affine template matching for one feature.

    ``tmpl`` is (t, tx, ty) from get_template (tx, ty unused by the
    forward-additive model but kept for spec completeness). Returns
    (x, y, A, status).
    """
    t, _, _ = tmpl
    hh = cfg.affine_window_height // 2
    hw = cfg.affine_window_width // 2
    x, y = float(x_trans), float(y_trans)
    A = A0.astype(np.float64).copy()
    status = KLT_TRACKED
    diff = None

    for _ in range(cfg.affine_max_iterations):
        I2w, gxw, gyw, oob = _warp_windows(img2, gx2, gy2, x, y, A, hw, hh)
        if oob:
            status = KLT_OOB
            break
        diff = t - I2w
        J = _jacobian(gxw, gyw, hw, hh, mode)
        T = J @ J.T
        e = J @ diff.ravel()
        det = np.linalg.det(T)
        if abs(det) < cfg.min_determinant:
            status = KLT_SMALL_DET
            break
        d = np.linalg.solve(T, e)
        if mode == 0:
            dx, dy = d[0], d[1]
        elif mode == 1:
            A += np.array([[d[0], -d[1]], [d[1], d[0]]])
            dx, dy = d[2], d[3]
        else:
            A += np.array([[d[0], d[2]], [d[1], d[3]]])
            dx, dy = d[4], d[5]
        x += dx
        y += dy
        if (abs(dx) < cfg.affine_min_displacement and
                abs(dy) < cfg.affine_min_displacement):
            break

    if status == KLT_TRACKED:
        I2w, _, _, oob = _warp_windows(img2, gx2, gy2, x, y, A, hw, hh)
        if oob:
            status = KLT_OOB
        else:
            diff = t - I2w
            residue = np.abs(diff).sum() / (
                cfg.affine_window_width * cfg.affine_window_height)
            if residue > cfg.affine_max_residue:
                status = KLT_LARGE_RESIDUE
    if status == KLT_TRACKED:
        drift = max(abs(x - x_trans), abs(y - y_trans))
        if drift > cfg.affine_max_displacement_differ:
            status = KLT_OOB
    return x, y, A, status
