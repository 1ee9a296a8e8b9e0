"""Pose from 3D-2D correspondences (sfm/pnp.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyfeaturetrack_tpu.sfm.geometry import so3_exp
from pyfeaturetrack_tpu.sfm.pnp import pnp_ransac, refine_pose

K = np.array([[500.0, 0.0, 320.0],
              [0.0, 500.0, 240.0],
              [0.0, 0.0, 1.0]])


def _scene(n=80, seed=0, rot=(0.1, -0.2, 0.15), t=(0.4, -0.2, 0.6),
           noise_px=0.0, n_outliers=0):
    rng = np.random.default_rng(seed)
    X = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                  rng.uniform(5, 14, n)], -1)
    R = np.asarray(so3_exp(jnp.asarray(rot, jnp.float32)), np.float64)
    t = np.asarray(t, np.float64)
    Y = X @ R.T + t
    uv = (Y[:, :2] / Y[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    if noise_px:
        uv = uv + rng.normal(0, noise_px, uv.shape)
    bad = np.array([], np.int64)
    if n_outliers:
        bad = rng.choice(n, n_outliers, replace=False)
        uv[bad] = np.stack([rng.uniform(0, 640, n_outliers),
                            rng.uniform(0, 480, n_outliers)], -1)
    return X, uv, R, t, bad


def test_refine_pose_converges_from_perturbed_start():
    X, uv, R, t, _ = _scene(noise_px=0.0)
    dR = np.asarray(so3_exp(jnp.asarray([0.03, -0.02, 0.04],
                                        jnp.float32)), np.float64)
    R0, t0 = dR @ R, t + [0.08, -0.05, 0.1]
    R_est, t_est, cost = refine_pose(
        jnp.asarray(K, jnp.float32), jnp.asarray(R0, jnp.float32),
        jnp.asarray(t0, jnp.float32), jnp.asarray(X, jnp.float32),
        jnp.asarray(uv, jnp.float32), jnp.ones(len(X), jnp.float32),
        n_iters=15)
    assert np.abs(np.asarray(R_est) - R).max() < 1e-4
    assert np.abs(np.asarray(t_est) - t).max() < 1e-3
    assert float(cost) < 1e-2


def test_refine_pose_huber_resists_outliers():
    X, uv, R, t, bad = _scene(noise_px=0.2, n_outliers=10, seed=3)
    R_est, t_est, _ = refine_pose(
        jnp.asarray(K, jnp.float32), jnp.asarray(R, jnp.float32),
        jnp.asarray(t, jnp.float32), jnp.asarray(X, jnp.float32),
        jnp.asarray(uv, jnp.float32), jnp.ones(len(X), jnp.float32),
        n_iters=15, huber_delta=2.0)
    assert np.abs(np.asarray(R_est) - R).max() < 5e-3
    assert np.abs(np.asarray(t_est) - t).max() < 2e-2


def test_refine_pose_respects_weights():
    """Zero-weight observations (dead lanes) must not move the pose."""
    X, uv, R, t, _ = _scene()
    uv2 = uv.copy()
    uv2[:20] = -1000.0  # garbage in masked lanes
    w = np.ones(len(X), np.float32)
    w[:20] = 0.0
    R_est, t_est, _ = refine_pose(
        jnp.asarray(K, jnp.float32), jnp.asarray(R, jnp.float32),
        jnp.asarray(t, jnp.float32), jnp.asarray(X, jnp.float32),
        jnp.asarray(uv2, jnp.float32), jnp.asarray(w), n_iters=8)
    assert np.abs(np.asarray(R_est) - R).max() < 1e-4
    assert np.abs(np.asarray(t_est) - t).max() < 1e-3


@pytest.mark.parametrize("seed", [0, 1])
def test_pnp_ransac_no_prior(seed):
    X, uv, R, t, bad = _scene(n=100, noise_px=0.4, n_outliers=25,
                              seed=seed)
    R_est, t_est, inliers = pnp_ransac(K, X, uv, seed=seed)
    assert np.abs(R_est - R).max() < 5e-3
    assert np.abs(t_est - t).max() < 2e-2
    assert inliers.sum() >= 65
    assert inliers[bad].sum() <= 2  # chance-consistent only


def test_pnp_ransac_requires_six():
    X, uv, *_ = _scene(n=5)
    with pytest.raises(ValueError):
        pnp_ransac(K, X, uv)
