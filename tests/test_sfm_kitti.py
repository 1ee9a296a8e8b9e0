"""KITTI-style forward-motion sequence: tracker + SfM under scale change.

BASELINE.md config 5 names a KITTI-style sequence. A single textured plane
is degenerate for bundle adjustment (pose/plane ambiguity family), so the
synthetic scene here is TRUE 3D: a cloud of Gaussian blob landmarks at
varied depths, rendered by exact pinhole projection each frame. Forward
ego-motion makes flow radiate from the epipole and feature windows change
scale — the essential KITTI challenge — while every blob is a real 3D
point the reconstruction can be checked against.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyfeaturetrack_tpu.models.sequence import track_sequence
from pyfeaturetrack_tpu.sfm import run_sfm
from pyfeaturetrack_tpu.sfm.geometry import project, so3_exp
from pyfeaturetrack_tpu.sfm.pipeline import ate_rmse_aligned

H, W = 240, 320
K = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1]])
N_FRAMES = 10
N_POINTS = 220


def _gt_scene(seed=13):
    """Forward-translating camera with mild yaw through a 3D blob field."""
    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-7.0, 7.0, N_POINTS),
        rng.uniform(-4.0, 4.0, N_POINTS),
        rng.uniform(6.0, 26.0, N_POINTS),
    ], -1).astype(np.float32)

    Rs, ts = [], []
    for i in range(N_FRAMES):
        w = np.array([0.001 * i, 0.004 * i, 0.0015 * i], np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w[None])))[0].astype(np.float32)
        # camera advances +0.35/frame along z (world->cam: t = -R c)
        c = np.array([0.02 * i, 0.01 * i, 0.35 * i], np.float32)
        ts.append((-R @ c).astype(np.float32))
        Rs.append(R)
    return np.stack(Rs), np.stack(ts), pts


def _render(Rs, ts, pts):
    """Splat each 3D point as a Gaussian blob at its exact projection."""
    rng = np.random.default_rng(1)
    amp = rng.uniform(120, 255, pts.shape[0])
    frames = []
    for Rk, tk in zip(Rs, ts):
        uv, depth = project(jnp.asarray(K, jnp.float32), jnp.asarray(Rk),
                            jnp.asarray(tk), jnp.asarray(pts))
        uv = np.asarray(uv)
        depth = np.asarray(depth)
        img = np.full((H, W), 20.0)
        rad = 6
        for j in range(pts.shape[0]):
            if depth[j] <= 1.0:
                continue
            u, v = uv[j]
            if not (rad < u < W - rad - 1 and rad < v < H - rad - 1):
                continue
            cu, cv = int(u), int(v)
            yy, xx = np.mgrid[cv - rad:cv + rad + 1, cu - rad:cu + rad + 1]
            sigma = 1.8
            img[cv - rad:cv + rad + 1, cu - rad:cu + rad + 1] += (
                amp[j] * np.exp(-((xx - u) ** 2 + (yy - v) ** 2) /
                                (2 * sigma ** 2)))
        frames.append(np.clip(img, 0, 255))
    return frames


@pytest.fixture(scope="module")
def scene():
    Rs, ts, pts = _gt_scene()
    return Rs, ts, pts, _render(Rs, ts, pts)


def test_forward_motion_tracking(scene):
    _, _, _, frames = scene
    ft, _ = track_sequence(frames, n_features=80, replace_lost=False)
    v = np.asarray(ft.val, np.int64)
    assert (v[0] >= 0).sum() >= 40
    assert (v >= 0).all(axis=0).sum() >= 25  # tracks survive the approach


def test_forward_motion_sfm_ate(scene):
    Rs, ts, pts, frames = scene
    ft, _ = track_sequence(frames, n_features=80, replace_lost=False)

    rng = np.random.default_rng(9)
    dw = 0.003 * rng.standard_normal((N_FRAMES, 3)).astype(np.float32)
    dw[0] = 0
    R0 = np.asarray(so3_exp(jnp.asarray(dw))) @ Rs.astype(np.float32)
    t0 = ts.astype(np.float32) + \
        0.02 * rng.standard_normal(ts.shape).astype(np.float32)
    t0[0] = ts[0]

    out = run_sfm(ft, K.astype(np.float32), R0.astype(np.float32), t0,
                  n_iters=20, min_track_len=3,
                  huber_delta=2.0, max_init_reproj_error=8.0)
    costs = np.asarray(out["costs"])
    assert costs[-1] < 0.7 * costs[0]
    ate0 = ate_rmse_aligned(t0, ts)
    ate1 = ate_rmse_aligned(out["t"], ts)
    assert ate1 < ate0
    assert ate1 < 0.03  # within 3 cm over a ~3.2 m approach
