"""End-to-end SfM: rendered scene -> tracker -> triangulate -> BA -> ATE.

The BASELINE.md config-5 shape as an integration test: frames are rendered
with FULL perspective consistency (a tilted textured plane under known
camera motion, via per-camera plane homographies), features are tracked
with the real tracker, and bundle adjustment refines noisy initial poses
back toward ground truth.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyfeaturetrack_tpu.models.sequence import track_sequence
from pyfeaturetrack_tpu.sfm import run_sfm
from pyfeaturetrack_tpu.sfm.geometry import so3_exp
from pyfeaturetrack_tpu.sfm.pipeline import ate_rmse_aligned

from conftest import make_textured_image

H, W = 240, 320
K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]])
N_FRAMES = 8


def _gt_cameras():
    """World->camera poses: lateral track with slight rotation, looking at
    the z=0 plane from z ~ -5 (so plane depth ~5 in camera frame)."""
    Rs, ts = [], []
    for i in range(N_FRAMES):
        w = np.array([0.004 * i, -0.006 * i, 0.002 * i], np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w[None])))[0]
        t = np.array([-0.12 * i, 0.06 * i, 5.0], np.float32)
        Rs.append(R)
        ts.append(t)
    return np.stack(Rs), np.stack(ts)


def _render(Rs, ts):
    """Render each frame by sampling a big texture through the plane
    homography H_k = K [r1 r2 t] (plane z=0). The plane is effectively
    tilted relative to the moving, rotating cameras -> true perspective."""
    tex = make_textured_image(720, 960, seed=77)
    # plane coords (X, Y) in [-2.4, 2.4] x [-1.8, 1.8] map to texture px
    sx, sy = 960 / 4.8, 720 / 3.6

    frames = []
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1)  # [H, W, 3]
    for Rk, tk in zip(Rs, ts):
        Hk = K @ np.stack([Rk[:, 0], Rk[:, 1], tk], axis=1)
        Hinv = np.linalg.inv(Hk)
        plane = pix @ Hinv.T
        X = plane[..., 0] / plane[..., 2]
        Y = plane[..., 1] / plane[..., 2]
        u = np.clip((X + 2.4) * sx, 0, 960 - 1.001)
        v = np.clip((Y + 1.8) * sy, 0, 720 - 1.001)
        u0, v0 = u.astype(np.int64), v.astype(np.int64)
        au, av = u - u0, v - v0
        img = ((1 - au) * (1 - av) * tex[v0, u0] +
               au * (1 - av) * tex[v0, u0 + 1] +
               (1 - au) * av * tex[v0 + 1, u0] +
               au * av * tex[v0 + 1, u0 + 1])
        frames.append(img)
    return frames


@pytest.fixture(scope="module")
def scene():
    Rs, ts = _gt_cameras()
    return Rs, ts, _render(Rs, ts)


def test_tracker_on_rendered_scene(scene):
    _, _, frames = scene
    ft, _ = track_sequence(frames, n_features=80, replace_lost=False)
    v = np.asarray(ft.val, np.int64)
    assert (v[0] >= 0).sum() >= 40
    assert ((v >= 0).all(axis=0)).sum() >= 20  # plenty of full tracks


def test_sfm_end_to_end(scene):
    Rs, ts, frames = scene
    ft, _ = track_sequence(frames, n_features=80, replace_lost=False)

    rng = np.random.default_rng(3)
    dw = 0.004 * rng.standard_normal((N_FRAMES, 3)).astype(np.float32)
    dw[0] = 0
    R0 = np.asarray(so3_exp(jnp.asarray(dw))) @ Rs.astype(np.float32)
    t0 = ts.astype(np.float32) + \
        0.02 * rng.standard_normal(ts.shape).astype(np.float32)
    t0[0] = ts[0]

    out = run_sfm(ft, K.astype(np.float32), R0.astype(np.float32), t0,
                  n_iters=15, min_track_len=3)
    assert out["costs"][-1] < 0.5 * out["costs"][0]

    ate_init = ate_rmse_aligned(t0, ts)
    ate_final = ate_rmse_aligned(out["t"], ts)
    # BA must improve the trajectory and land within a tight ATE bound
    assert ate_final < ate_init
    assert ate_final < 0.02  # meters, on a ~1m trajectory at depth 5


def test_run_sfm_windowed_end_to_end(scene):
    """The windowed pipeline recipe on the rendered scene (with
    replacement-created runs) beats the initial trajectory."""
    from pyfeaturetrack_tpu.sfm import run_sfm_windowed
    Rs, ts, frames = scene
    ft, _ = track_sequence(frames, n_features=80, replace_lost=True)

    rng = np.random.default_rng(3)
    dw = 0.004 * rng.standard_normal((N_FRAMES, 3)).astype(np.float32)
    dw[0] = 0
    R0 = np.asarray(so3_exp(jnp.asarray(dw))) @ Rs.astype(np.float32)
    t0 = ts.astype(np.float32) + \
        0.02 * rng.standard_normal(ts.shape).astype(np.float32)
    t0[0] = ts[0]

    out = run_sfm_windowed(ft, K.astype(np.float32),
                           R0.astype(np.float32), t0, n_iters=15)
    costs = np.asarray(out["costs"])
    assert costs[-1] < 0.5 * costs[0]
    assert ate_rmse_aligned(out["t"], ts) < ate_rmse_aligned(t0, ts)
    assert ate_rmse_aligned(out["t"], ts) < 0.02
