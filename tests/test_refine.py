"""Sub-pixel corner refinement (ops/refine.py) vs a float64 NumPy
mirror, plus recovery of rendered corners with known sub-pixel
positions (the module's two verification claims)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.features import create_feature_list
from pyfeaturetrack_tpu.ops.convolve import compute_gradients
from pyfeaturetrack_tpu.ops.refine import (refine_corners,
                                           refine_features_subpixel)

from conftest import make_textured_image


def _mirror_refine(gradx, grady, x, y, half_win=5, n_iters=5,
                   min_displacement=0.01, eps=1e-6):
    """float64 NumPy mirror of ops/refine.refine_corners."""
    gradx = np.asarray(gradx, np.float64)
    grady = np.asarray(grady, np.float64)
    nrows, ncols = gradx.shape
    hw = half_win

    def bilin(img, xs, ys):
        x0 = np.floor(xs).astype(int)
        y0 = np.floor(ys).astype(int)
        ax, ay = xs - x0, ys - y0
        return ((1 - ax) * (1 - ay) * img[y0, x0] +
                ax * (1 - ay) * img[y0, x0 + 1] +
                (1 - ax) * ay * img[y0 + 1, x0] +
                ax * ay * img[y0 + 1, x0 + 1])

    out = []
    for cx, cy in zip(np.asarray(x, np.float64),
                      np.asarray(y, np.float64)):
        active = True
        for _ in range(n_iters):
            ok = (cx - hw >= 0.0 and cx + hw + 1.001 <= ncols - 1 and
                  cy - hw >= 0.0 and cy + hw + 1.001 <= nrows - 1)
            if not (active and ok):
                active = False
                continue
            offs = np.arange(-hw, hw + 1, dtype=np.float64)
            xs = cx + offs[None, :]
            ys = cy + offs[:, None]
            xs, ys = np.broadcast_arrays(xs, ys)
            gxw = bilin(gradx, xs, ys)
            gyw = bilin(grady, xs, ys)
            gxx = np.sum(gxw * gxw)
            gxy = np.sum(gxw * gyw)
            gyy = np.sum(gyw * gyw)
            bx = np.sum(gxw * gxw * xs + gxw * gyw * ys)
            by = np.sum(gxw * gyw * xs + gyw * gyw * ys)
            det = gxx * gyy - gxy * gxy
            if abs(det) < eps:
                active = False
                continue
            qx = (gyy * bx - gxy * by) / det
            qy = (gxx * by - gxy * bx) / det
            dx = np.clip(qx - cx, -hw, hw)
            dy = np.clip(qy - cy, -hw, hw)
            cx, cy = cx + dx, cy + dy
            if abs(dx) < min_displacement and abs(dy) < min_displacement:
                active = False
        out.append((cx, cy))
    return np.array(out)


def _corner_image(cx, cy, h=64, w=80, sharp=1.5):
    """Analytic blurred checkerboard corner at sub-pixel (cx, cy)."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    img = 128.0 + 100.0 * np.tanh((xs - cx) / sharp) * np.tanh(
        (ys - cy) / sharp)
    return img.astype(np.float32)


def test_refine_matches_float64_mirror():
    img = make_textured_image(96, 128, seed=11)
    gx, gy = compute_gradients(jnp.asarray(img, jnp.float32), 1.0)
    rng = np.random.default_rng(3)
    n = 40
    x = rng.uniform(8, 119, n).astype(np.float32)
    y = rng.uniform(8, 87, n).astype(np.float32)
    rx, ry = refine_corners(gx, gy, jnp.asarray(x), jnp.asarray(y))
    mirror = _mirror_refine(gx, gy, x, y)
    # f32 pipeline vs f64 mirror: same fixed point to ~1e-2 px (the
    # normal equations are well-conditioned on textured input)
    np.testing.assert_allclose(np.asarray(rx), mirror[:, 0], atol=2e-2)
    np.testing.assert_allclose(np.asarray(ry), mirror[:, 1], atol=2e-2)


@pytest.mark.parametrize("corner", [(20.3, 15.7), (40.62, 31.18),
                                    (55.0, 44.5)])
def test_refine_recovers_known_subpixel_corner(corner):
    cx, cy = corner
    img = _corner_image(cx, cy)
    gx, gy = compute_gradients(jnp.asarray(img), 1.0)
    # start from the integer-pixel selection position (round)
    x0 = jnp.asarray([round(cx)], jnp.float32)
    y0 = jnp.asarray([round(cy)], jnp.float32)
    rx, ry = refine_corners(gx, gy, x0, y0)
    assert abs(float(rx[0]) - cx) < 0.03
    assert abs(float(ry[0]) - cy) < 0.03


def test_refine_oob_and_degenerate_lanes_keep_input():
    img = np.full((48, 64), 100.0, np.float32)  # flat: det ~ 0
    gx, gy = compute_gradients(jnp.asarray(img), 1.0)
    x = jnp.asarray([2.0, 30.0], jnp.float32)   # lane 0: window OOB
    y = jnp.asarray([2.0, 20.0], jnp.float32)
    rx, ry = refine_corners(gx, gy, x, y)
    np.testing.assert_array_equal(np.asarray(rx), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(ry), np.asarray(y))


def test_refine_features_subpixel_wrapper():
    cfg = create_config()
    cx, cy = 33.4, 27.8
    img = _corner_image(cx, cy, h=64, w=80)
    fl = create_feature_list(3)
    fl = fl._replace(
        x=jnp.asarray([33.0, 28.0, -1.0], jnp.float32),
        y=jnp.asarray([28.0, 22.0, -1.0], jnp.float32),
        val=jnp.asarray([0, 0, -1], jnp.int32))  # lane 2 dead
    out = refine_features_subpixel(img, fl, cfg)
    # live lane near the corner converges to it (cfg smoothing keeps the
    # pattern symmetric, so the fixed point is unchanged)
    assert abs(float(out.x[0]) - cx) < 0.1
    assert abs(float(out.y[0]) - cy) < 0.1
    # dead lane untouched
    assert float(out.x[2]) == -1.0 and float(out.y[2]) == -1.0
