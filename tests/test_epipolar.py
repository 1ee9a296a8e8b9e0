"""Two-view bootstrap (sfm/epipolar.py): 8-point essential, batched
RANSAC, pose recovery — synthetic scenes with known geometry."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyfeaturetrack_tpu.sfm.epipolar import (essential_from_matches,
                                             normalize_points,
                                             ransac_essential,
                                             recover_pose, sampson_error,
                                             smallest_eigvec,
                                             two_view_bootstrap)
from pyfeaturetrack_tpu.sfm.geometry import so3_exp


K = np.array([[500.0, 0.0, 320.0],
              [0.0, 500.0, 240.0],
              [0.0, 0.0, 1.0]])


def _scene(n=120, seed=0, rot=(0.02, -0.05, 0.01), t=(1.0, 0.15, 0.3),
           noise_px=0.0, n_outliers=0):
    """Random 3D points in front of two cameras; returns pixel matches
    and the ground-truth relative pose (world = cam1 frame)."""
    rng = np.random.default_rng(seed)
    X = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                  rng.uniform(4, 12, n)], -1)
    R = np.asarray(so3_exp(jnp.asarray(rot, jnp.float64)))
    t = np.asarray(t, np.float64)

    def proj(R_, t_, X_):
        Y = X_ @ R_.T + t_
        return (Y[:, :2] / Y[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2],
                                                             K[1, 2]]

    uv1 = proj(np.eye(3), np.zeros(3), X)
    uv2 = proj(R, t, X)
    if noise_px:
        uv1 = uv1 + rng.normal(0, noise_px, uv1.shape)
        uv2 = uv2 + rng.normal(0, noise_px, uv2.shape)
    if n_outliers:
        bad = rng.choice(n, n_outliers, replace=False)
        uv2[bad] = np.stack([rng.uniform(0, 640, n_outliers),
                             rng.uniform(0, 480, n_outliers)], -1)
    else:
        bad = np.array([], np.int64)
    return uv1, uv2, R, t, X, bad


def _essential_gt(R, t):
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    return E / np.linalg.norm(E)


def _assert_E_close(E, E_gt, atol):
    E = np.asarray(E, np.float64)
    E = E / np.linalg.norm(E)
    # sign/scale ambiguity: compare up to sign
    err = min(np.abs(E - E_gt).max(), np.abs(E + E_gt).max())
    assert err < atol, err


def test_smallest_eigvec_known_matrix():
    rng = np.random.default_rng(3)
    q, _ = np.linalg.qr(rng.normal(size=(9, 9)))
    lam = np.array([5.0, 4, 3.5, 3, 2.5, 2, 1.5, 1, 1e-6])
    M = (q * lam) @ q.T
    v = np.asarray(smallest_eigvec(jnp.asarray(M, jnp.float32)))
    dot = abs(float(v @ q[:, 8]))
    assert dot > 0.9999


def test_eight_point_exact_matches():
    uv1, uv2, R, t, _, _ = _scene()
    x1 = normalize_points(K, jnp.asarray(uv1, jnp.float32))
    x2 = normalize_points(K, jnp.asarray(uv2, jnp.float32))
    E = essential_from_matches(x1, x2)
    _assert_E_close(E, _essential_gt(R, t), 2e-3)
    err = np.asarray(sampson_error(E, x1, x2))
    assert err.max() < 1e-7  # noise-free: epipolar constraint holds


def test_ransac_rejects_outliers():
    uv1, uv2, R, t, _, bad = _scene(n=150, noise_px=0.3, n_outliers=40,
                                    seed=5)
    x1 = normalize_points(K, jnp.asarray(uv1, jnp.float32))
    x2 = normalize_points(K, jnp.asarray(uv2, jnp.float32))
    E, inliers, count = ransac_essential(x1, x2, thresh=2.0 / 500.0,
                                         seed=1)
    inliers = np.asarray(inliers)
    assert not inliers[bad].any()          # every outlier rejected
    assert inliers.sum() >= 100            # most true matches kept
    _assert_E_close(E, _essential_gt(R, t), 2e-2)


def test_recover_pose_picks_right_candidate():
    uv1, uv2, R, t, X_gt, _ = _scene(seed=7)
    x1 = normalize_points(K, jnp.asarray(uv1, jnp.float32))
    x2 = normalize_points(K, jnp.asarray(uv2, jnp.float32))
    E = essential_from_matches(x1, x2)
    R_est, t_est, X, good = recover_pose(np.asarray(E), x1, x2,
                                         np.ones(len(uv1), bool))
    assert np.abs(R_est - R).max() < 5e-3
    t_dir = t / np.linalg.norm(t)
    assert np.abs(t_est - t_dir).max() < 5e-3
    assert good.all()
    # triangulated structure matches gt up to the baseline scale
    scale = np.linalg.norm(t)
    np.testing.assert_allclose(X * scale, X_gt, rtol=0.02, atol=0.05)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_two_view_bootstrap_end_to_end(seed):
    uv1, uv2, R, t, X_gt, bad = _scene(n=140, noise_px=0.4,
                                       n_outliers=25, seed=seed)
    out = two_view_bootstrap(K, uv1, uv2, thresh_px=2.0, seed=seed)
    assert np.abs(out["R"] - R).max() < 2e-2
    t_dir = t / np.linalg.norm(t)
    assert np.abs(out["t"] - t_dir).max() < 2e-2
    # a random outlier can land on the epipolar line by chance (~1%
    # each — the constraint is a 1-D locus); nearly all must be gone
    assert out["good"][bad].sum() <= 2
    good = out["good"]
    scale = np.linalg.norm(t)
    err = np.linalg.norm(out["X"][good] * scale - X_gt[good], axis=-1)
    # 0.4 px noise at 4-12 unit depths -> ~0.05-0.2 unit DLT error
    assert np.median(err) < 0.25


def test_bootstrap_requires_eight():
    uv1 = np.random.default_rng(0).uniform(0, 640, (6, 2))
    with pytest.raises(ValueError):
        two_view_bootstrap(K, uv1, uv1 + 1.0)


def test_degenerate_pure_rotation_low_parallax_flagged():
    """Pure rotation (no baseline): E is degenerate; cheirality count
    collapses because triangulation has no parallax — the bootstrap
    must not return a confidently 'good' full set."""
    uv1, uv2, R, t, _, _ = _scene(t=(1e-5, 0.0, 0.0), seed=11,
                                  noise_px=0.2)
    out = two_view_bootstrap(K, uv1, uv2, thresh_px=2.0)
    # epipolar inliers may be many (any E fits pure rotation) but the
    # recovered structure cannot be consistently in front of both
    # cameras at unit baseline — 'good' is the honesty signal callers
    # gate bootstraps on
    assert out["good"].sum() < len(uv1)
