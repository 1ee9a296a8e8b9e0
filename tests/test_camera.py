"""Lens distortion models (sfm/camera.py): radtan + fisheye round
trips, pixel-level maps, and VO on synthetically distorted footage."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyfeaturetrack_tpu.sfm.camera import (distort_fisheye,
                                           distort_pixels,
                                           distort_radtan,
                                           project_distorted,
                                           undistort_fisheye,
                                           undistort_pixels,
                                           undistort_radtan)
from pyfeaturetrack_tpu.sfm.geometry import project, so3_exp

RADTAN = np.array([-0.28, 0.07, 1e-3, -2e-4, 0.02])
FISHEYE = np.array([-0.012, 0.006, -0.002, 0.001])


def _grid(lim, n=21):
    g = np.linspace(-lim, lim, n)
    return np.stack(np.meshgrid(g, g), -1).reshape(-1, 2).astype(np.float32)


def test_radtan_round_trip():
    x = _grid(0.6)
    xd = np.asarray(distort_radtan(jnp.asarray(x), RADTAN))
    xr = np.asarray(undistort_radtan(jnp.asarray(xd), RADTAN))
    assert np.abs(xr - x).max() < 1e-6


def test_fisheye_round_trip_wide_angle():
    x = _grid(1.5)  # up to ~65 degrees off-axis
    xd = np.asarray(distort_fisheye(jnp.asarray(x), FISHEYE))
    xr = np.asarray(undistort_fisheye(jnp.asarray(xd), FISHEYE))
    assert np.abs(xr - x).max() < 1e-5


def test_zero_coefficients():
    x = _grid(0.8)
    # radtan with zero coefficients IS the identity
    z5 = np.zeros(5)
    assert np.abs(np.asarray(distort_radtan(jnp.asarray(x), z5))
                  - x).max() < 1e-6
    assert np.abs(np.asarray(undistort_radtan(jnp.asarray(x), z5))
                  - x).max() < 1e-6
    # fisheye with zero coefficients is the PURE EQUIDISTANT map
    # (r_d = atan(r)), not the identity — check the closed form and
    # that the inverse still round-trips it
    z4 = np.zeros(4)
    xd = np.asarray(distort_fisheye(jnp.asarray(x), z4))
    r = np.linalg.norm(x, axis=-1, keepdims=True)
    expect = np.where(r < 1e-9, x, x * np.arctan(r) / np.maximum(r, 1e-9))
    np.testing.assert_allclose(xd, expect, atol=1e-6)
    xr = np.asarray(undistort_fisheye(jnp.asarray(xd), z4))
    assert np.abs(xr - x).max() < 1e-6


def test_short_coefficient_vectors_zero_pad():
    x = _grid(0.5)
    full = np.asarray(distort_radtan(jnp.asarray(x),
                                     np.array([-0.2, 0.05, 0, 0, 0])))
    short = np.asarray(distort_radtan(jnp.asarray(x),
                                      np.array([-0.2, 0.05])))
    np.testing.assert_allclose(short, full, atol=1e-7)


K = np.array([[260.0, 0, 160.0], [0, 260.0, 120.0], [0, 0, 1.0]])


def test_pixel_round_trip():
    rng = np.random.default_rng(0)
    uv = np.stack([rng.uniform(10, 310, 200),
                   rng.uniform(10, 230, 200)], -1)
    raw = np.asarray(distort_pixels(K, RADTAN, uv))
    back = np.asarray(undistort_pixels(K, RADTAN, raw))
    assert np.abs(back - uv).max() < 5e-4  # px


def test_distortion_is_substantial_at_the_edge():
    """Sanity on the test lens: the corner moves by tens of pixels, so
    the VO test below genuinely needs the correction."""
    uv = np.array([[20.0, 20.0]])
    raw = np.asarray(distort_pixels(K, RADTAN, uv))
    assert np.abs(raw - uv).max() > 10.0


def test_project_distorted_composes():
    rng = np.random.default_rng(1)
    X = np.stack([rng.uniform(-3, 3, 50), rng.uniform(-2, 2, 50),
                  rng.uniform(4, 10, 50)], -1).astype(np.float32)
    R = np.asarray(so3_exp(jnp.asarray([0.02, -0.03, 0.01])))
    t = np.array([0.3, -0.1, 0.2], np.float32)
    uv_ideal, d1 = project(jnp.asarray(K, jnp.float32), jnp.asarray(R),
                           jnp.asarray(t), jnp.asarray(X))
    uv_raw, d2 = project_distorted(K, RADTAN, R, t, X)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(uv_raw),
        np.asarray(distort_pixels(K, RADTAN, np.asarray(uv_ideal))),
        atol=1e-3)


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        undistort_pixels(K, RADTAN, np.zeros((1, 2)), model="division")


# ------------------------------------------------------- VO integration

H, W = 240, 320
N_FRAMES = 16
N_POINTS = 260


def _distorted_scene(seed=21):
    """The test_vo blob-field scene rendered through the RADTAN lens:
    blob centers land where the real sensor would see them."""
    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-8.0, 8.0, N_POINTS),
        rng.uniform(-5.0, 5.0, N_POINTS),
        rng.uniform(7.0, 24.0, N_POINTS),
    ], -1).astype(np.float32)
    Rs, ts, cs = [], [], []
    for i in range(N_FRAMES):
        w = np.array([0.0012 * i, 0.003 * i, 0.001 * i], np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w[None])))[0].astype(np.float32)
        c = np.array([0.22 * i, 0.03 * i, 0.12 * i], np.float32)
        Rs.append(R)
        ts.append((-R @ c).astype(np.float32))
        cs.append(c)
    Rs, ts, cs = np.stack(Rs), np.stack(ts), np.stack(cs)
    amp = np.random.default_rng(1).uniform(120, 255, N_POINTS)
    frames = []
    for Rk, tk in zip(Rs, ts):
        uv, depth = project_distorted(K, RADTAN, Rk, tk, pts)
        uv, depth = np.asarray(uv), np.asarray(depth)
        img = np.full((H, W), 20.0)
        rad = 6
        for j in range(N_POINTS):
            if depth[j] <= 1.0:
                continue
            u, v = uv[j]
            if not (rad < u < W - rad - 1 and rad < v < H - rad - 1):
                continue
            cu, cv = int(u), int(v)
            yy, xx = np.mgrid[cv - rad:cv + rad + 1,
                              cu - rad:cu + rad + 1]
            img[cv - rad:cv + rad + 1, cu - rad:cu + rad + 1] += (
                amp[j] * np.exp(-((xx - u) ** 2 + (yy - v) ** 2) / 6.48))
        frames.append(np.clip(img, 0, 255))
    return cs, frames


def test_vo_with_lens_model_beats_uncorrected():
    """VO fed raw fisheye-free but radially distorted frames: with
    dist= the trajectory lands in the usual accuracy regime; ignoring
    the lens degrades it (the distortion bends straight-line motion)."""
    from pyfeaturetrack_tpu.sfm.pipeline import ate_rmse_aligned
    from pyfeaturetrack_tpu.sfm.vo import VisualOdometry

    cs, frames = _distorted_scene()
    kw = dict(n_features=120, kf_every=2, window=6, min_parallax_px=10.0)
    corrected = VisualOdometry(K, dist=RADTAN, **kw)
    naive = VisualOdometry(K, **kw)
    for f in frames:
        corrected.feed(f)
        naive.feed(f)
    assert corrected.initialized
    fi, _, _, c = corrected.trajectory()
    gt = cs[fi]
    travel = np.linalg.norm(gt[-1] - gt[0])
    ate_c = ate_rmse_aligned(c, gt)
    assert ate_c < 0.035 * travel, (ate_c, travel)
    if naive.initialized:
        fi_n, _, _, c_n = naive.trajectory()
        ate_n = ate_rmse_aligned(c_n, cs[fi_n])
        assert ate_c < ate_n, (ate_c, ate_n)


def test_vo_dist_mode_gates():
    from pyfeaturetrack_tpu.sfm.vo import VisualOdometry
    with pytest.raises(ValueError):
        VisualOdometry(K, dist=RADTAN, loop_closure=True)
    with pytest.raises(ValueError):
        VisualOdometry(K, dist=RADTAN, stereo_baseline=0.2)
    with pytest.raises(ValueError):
        VisualOdometry(K, dist=RADTAN, dist_model="division")
