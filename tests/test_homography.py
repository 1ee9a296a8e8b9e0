"""Planar homography bootstrap (sfm/homography.py): batched 4-point
DLT, RANSAC, analytic decomposition, H/E model selection — synthetic
scenes with known geometry."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyfeaturetrack_tpu.sfm.epipolar import normalize_points
from pyfeaturetrack_tpu.sfm.geometry import so3_exp
from pyfeaturetrack_tpu.sfm.homography import (decompose_homography,
                                               homography_from_matches,
                                               ransac_homography,
                                               recover_pose_homography,
                                               transfer_errors,
                                               two_view_bootstrap_auto)

K = np.array([[500.0, 0.0, 320.0],
              [0.0, 500.0, 240.0],
              [0.0, 0.0, 1.0]])


def _proj(R_, t_, X_):
    Y = X_ @ R_.T + t_
    return (Y[:, :2] / Y[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]


def _planar_scene(n=120, seed=0, rot=(0.03, -0.06, 0.02),
                  t=(0.8, 0.1, 0.25), normal=(0.1, -0.2, 1.0), d=6.0,
                  noise_px=0.0, n_outliers=0):
    """Random points on the plane normal . X = d (camera-1 frame),
    viewed by two cameras. Returns matches, the gt pose, and the gt
    normalized-coordinate homography H = R + t n^T / d."""
    rng = np.random.default_rng(seed)
    nrm = np.asarray(normal, np.float64)
    nrm = nrm / np.linalg.norm(nrm)
    # span the plane with two orthonormal tangents
    a = np.cross(nrm, [1.0, 0.0, 0.0])
    a = a / np.linalg.norm(a)
    b = np.cross(nrm, a)
    c0 = nrm * d                                   # plane point closest to O
    X = (c0[None] + rng.uniform(-4, 4, (n, 1)) * a[None]
         + rng.uniform(-3, 3, (n, 1)) * b[None])
    R = np.asarray(so3_exp(jnp.asarray(rot, jnp.float64)))
    t = np.asarray(t, np.float64)
    uv1 = _proj(np.eye(3), np.zeros(3), X)
    uv2 = _proj(R, t, X)
    if noise_px:
        uv1 = uv1 + rng.normal(0, noise_px, uv1.shape)
        uv2 = uv2 + rng.normal(0, noise_px, uv2.shape)
    if n_outliers:
        bad = rng.choice(n, n_outliers, replace=False)
        uv2[bad] = np.stack([rng.uniform(0, 640, n_outliers),
                             rng.uniform(0, 480, n_outliers)], -1)
    else:
        bad = np.array([], np.int64)
    H_gt = R + np.outer(t, nrm) / d
    return uv1, uv2, R, t, nrm, X, H_gt, bad


def _general_scene(n=140, seed=0, noise_px=0.3, n_outliers=20):
    rng = np.random.default_rng(seed)
    X = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                  rng.uniform(4, 12, n)], -1)
    R = np.asarray(so3_exp(jnp.asarray([0.02, -0.05, 0.01], jnp.float64)))
    t = np.asarray([1.0, 0.15, 0.3])
    uv1 = _proj(np.eye(3), np.zeros(3), X)
    uv2 = _proj(R, t, X)
    uv1 = uv1 + rng.normal(0, noise_px, uv1.shape)
    uv2 = uv2 + rng.normal(0, noise_px, uv2.shape)
    if n_outliers:
        bad = rng.choice(n, n_outliers, replace=False)
        uv2[bad] = np.stack([rng.uniform(0, 640, n_outliers),
                             rng.uniform(0, 480, n_outliers)], -1)
    return uv1, uv2, R, t


def _assert_H_close(H, H_gt, atol):
    H = np.asarray(H, np.float64)
    H = H / np.linalg.norm(H)
    H_gt = H_gt / np.linalg.norm(H_gt)
    err = min(np.abs(H - H_gt).max(), np.abs(H + H_gt).max())
    assert err < atol, err


def test_dlt_exact_matches():
    uv1, uv2, _, _, _, _, H_gt, _ = _planar_scene()
    x1 = normalize_points(K, jnp.asarray(uv1, jnp.float32))
    x2 = normalize_points(K, jnp.asarray(uv2, jnp.float32))
    H = homography_from_matches(x1, x2)
    _assert_H_close(H, H_gt, 2e-4)
    ef, eb = transfer_errors(jnp.asarray(np.asarray(H)), x1, x2)
    assert float(jnp.maximum(ef, eb).max()) < 1e-9


def test_ransac_rejects_outliers():
    uv1, uv2, _, _, _, _, H_gt, bad = _planar_scene(
        n=150, noise_px=0.3, n_outliers=40, seed=5)
    x1 = normalize_points(K, jnp.asarray(uv1, jnp.float32))
    x2 = normalize_points(K, jnp.asarray(uv2, jnp.float32))
    H, inliers, count = ransac_homography(x1, x2, thresh=2.0 / 500.0,
                                          seed=1)
    inliers = np.asarray(inliers)
    assert not inliers[bad].any()          # every outlier rejected
    assert inliers.sum() >= 95             # most true matches kept
    _assert_H_close(H, H_gt, 5e-3)


def test_decomposition_contains_truth():
    uv1, uv2, R, t, nrm, _, H_gt, _ = _planar_scene(seed=3)
    Rs, ts, ns, degen = decompose_homography(
        H_gt,
        np.asarray(normalize_points(K, jnp.asarray(uv1, jnp.float32))),
        np.asarray(normalize_points(K, jnp.asarray(uv2, jnp.float32))))
    assert not degen
    t_dir = t / np.linalg.norm(t)
    errs = []
    for Rc, tc, nc in zip(Rs, ts, ns):
        tn = np.linalg.norm(tc)
        tc = tc / tn if tn > 1e-12 else tc
        errs.append(max(np.abs(Rc - R).max(), np.abs(tc - t_dir).max(),
                        np.abs(nc - nrm).max()))
    assert min(errs) < 1e-6, errs


def test_recover_pose_picks_right_candidate():
    uv1, uv2, R, t, nrm, X_gt, H_gt, _ = _planar_scene(seed=7)
    x1 = normalize_points(K, jnp.asarray(uv1, jnp.float32))
    x2 = normalize_points(K, jnp.asarray(uv2, jnp.float32))
    H = homography_from_matches(x1, x2)
    R_est, t_est, n_est, X, good, degen = recover_pose_homography(
        np.asarray(H), x1, x2, np.ones(len(uv1), bool))
    assert not degen
    assert np.abs(R_est - R).max() < 5e-3
    t_dir = t / np.linalg.norm(t)
    assert np.abs(t_est - t_dir).max() < 5e-3
    assert np.abs(n_est - nrm).max() < 5e-3
    assert good.sum() >= 0.95 * len(uv1)
    scale = np.linalg.norm(t)
    err = np.linalg.norm(X[good] * scale - X_gt[good], axis=-1)
    assert np.median(err) < 0.1


def test_pure_rotation_flagged_degenerate():
    uv1, uv2, R, _, _, _, _, _ = _planar_scene(t=(0.0, 0.0, 0.0), seed=9)
    x1 = normalize_points(K, jnp.asarray(uv1, jnp.float32))
    x2 = normalize_points(K, jnp.asarray(uv2, jnp.float32))
    H = homography_from_matches(x1, x2)
    Rs, ts, ns, degen = decompose_homography(np.asarray(H),
                                             np.asarray(x1),
                                             np.asarray(x2))
    assert degen
    assert np.abs(Rs[0] - R).max() < 1e-3   # rotation still recovered
    assert np.linalg.norm(ts[0]) == 0.0


@pytest.mark.parametrize("seed", [0, 1])
def test_auto_bootstrap_planar_picks_h(seed):
    uv1, uv2, R, t, nrm, X_gt, _, bad = _planar_scene(
        n=140, noise_px=0.3, n_outliers=20, seed=seed)
    out = two_view_bootstrap_auto(K, uv1, uv2, thresh_px=2.0, seed=seed)
    assert out["model"] == "H"
    assert not out["degenerate"]
    assert np.abs(out["R"] - R).max() < 2e-2
    t_dir = t / np.linalg.norm(t)
    assert np.abs(out["t"] - t_dir).max() < 2e-2
    assert out["good"][bad].sum() <= 2
    good = out["good"]
    scale = np.linalg.norm(t)
    err = np.linalg.norm(out["X"][good] * scale - X_gt[good], axis=-1)
    assert np.median(err) < 0.25


def test_auto_bootstrap_general_picks_e():
    uv1, uv2, R, t = _general_scene(seed=2)
    out = two_view_bootstrap_auto(K, uv1, uv2, thresh_px=2.0, seed=2)
    assert out["model"] == "E"
    assert np.abs(out["R"] - R).max() < 2e-2
    t_dir = t / np.linalg.norm(t)
    assert np.abs(out["t"] - t_dir).max() < 2e-2


def test_auto_bootstrap_pure_rotation_rejected():
    """Pure rotation: the homography wins the model score and its
    decomposition is degenerate — 'good' comes back all-False so VO
    keeps waiting for parallax instead of seeding fake landmarks."""
    uv1, uv2, _, _, _, _, _, _ = _planar_scene(
        t=(0.0, 0.0, 0.0), seed=4, noise_px=0.1)
    out = two_view_bootstrap_auto(K, uv1, uv2, thresh_px=2.0, seed=4)
    assert out["model"] == "H"
    assert out["degenerate"]
    assert out["good"].sum() == 0


def test_ransac_requires_four():
    uv1 = np.random.default_rng(0).uniform(0, 640, (3, 2))
    x = normalize_points(K, jnp.asarray(uv1, jnp.float32))
    with pytest.raises(ValueError):
        ransac_homography(x, x)
