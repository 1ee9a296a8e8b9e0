"""SfM back-end: geometry, triangulation, BA (dense + sharded), pose graph."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyfeaturetrack_tpu.features import FeatureTable
from pyfeaturetrack_tpu.sfm import (BAProblem, PoseGraph, ate_rmse,
                                    bundle_adjust, observations_from_feature_table,
                                    optimize_pose_graph, project, run_sfm,
                                    se3_apply, so3_exp, so3_log,
                                    triangulate_dlt)
from pyfeaturetrack_tpu.sfm.ba import pad_problem_for_mesh
from pyfeaturetrack_tpu.sfm.posegraph import odometry_graph


# ---------------------------------------------------------------------------
# synthetic scene helpers
# ---------------------------------------------------------------------------

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)


def make_scene(n_cams=6, n_pts=64, seed=0):
    """Cameras on a slow lateral track looking at a point cloud at z~6."""
    r = np.random.default_rng(seed)
    ws = 0.02 * r.standard_normal((n_cams, 3))
    ws[0] = 0
    Rs = np.stack([np.asarray(so3_exp(jnp.asarray(w, jnp.float32)))
                   for w in ws])
    ts = np.stack([np.array([-0.3 * i, 0.02 * i, 0.0]) for i in range(n_cams)]
                  ).astype(np.float32)
    X = np.stack([r.uniform(-2.5, 2.5, n_pts), r.uniform(-1.8, 1.8, n_pts),
                  r.uniform(5.0, 9.0, n_pts)], axis=-1).astype(np.float32)
    return Rs.astype(np.float32), ts, X


def project_scene(Rs, ts, X, noise=0.0, seed=1):
    n_cams, n_pts = Rs.shape[0], X.shape[0]
    uv = np.zeros((n_cams, n_pts, 2), np.float32)
    for c in range(n_cams):
        p, _ = project(jnp.asarray(K), jnp.asarray(Rs[c]),
                       jnp.asarray(ts[c]), jnp.asarray(X))
        uv[c] = np.asarray(p)
    if noise:
        uv += noise * np.random.default_rng(seed).standard_normal(uv.shape)
    return uv


def obs_arrays(uv):
    n_cams, n_pts, _ = uv.shape
    cam_idx = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    pt_idx = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    return cam_idx, pt_idx, uv.reshape(-1, 2), np.ones(n_cams * n_pts,
                                                       np.float32)


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def test_so3_exp_log_roundtrip():
    r = np.random.default_rng(2)
    w = r.uniform(-1.5, 1.5, (20, 3)).astype(np.float32)
    R = so3_exp(jnp.asarray(w))
    w2 = np.asarray(so3_log(R))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_so3_orthonormal():
    w = jnp.asarray([[0.3, -0.2, 0.9]], jnp.float32)
    R = np.asarray(so3_exp(w))[0]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert abs(np.linalg.det(R) - 1) < 1e-5


def test_projection_center():
    R = jnp.eye(3)
    t = jnp.zeros(3)
    uv, z = project(jnp.asarray(K), R, t, jnp.asarray([0.0, 0.0, 5.0]))
    np.testing.assert_allclose(np.asarray(uv), [320.0, 240.0], atol=1e-4)
    assert abs(float(z) - 5.0) < 1e-6


# ---------------------------------------------------------------------------
# triangulation
# ---------------------------------------------------------------------------

def test_triangulate_recovers_points():
    Rs, ts, X = make_scene()
    uv = project_scene(Rs, ts, X)
    uvs = uv.transpose(1, 0, 2)  # [L, C, 2]
    mask = np.ones(uvs.shape[:2], bool)
    Xh = np.asarray(triangulate_dlt(jnp.asarray(K), jnp.asarray(Rs),
                                    jnp.asarray(ts), jnp.asarray(uvs),
                                    jnp.asarray(mask)))
    np.testing.assert_allclose(Xh, X, atol=2e-2)


# ---------------------------------------------------------------------------
# bundle adjustment
# ---------------------------------------------------------------------------

def _perturbed_init(Rs, ts, X, seed=3, pose_noise=0.01, pt_noise=0.05):
    r = np.random.default_rng(seed)
    dw = pose_noise * r.standard_normal((Rs.shape[0], 3)).astype(np.float32)
    dw[0] = 0
    R0 = np.asarray(so3_exp(jnp.asarray(dw))) @ Rs
    t0 = ts + pose_noise * r.standard_normal(ts.shape).astype(np.float32)
    t0[0] = ts[0]
    X0 = X + pt_noise * r.standard_normal(X.shape).astype(np.float32)
    return R0.astype(np.float32), t0.astype(np.float32), X0


def test_ba_converges_dense():
    Rs, ts, X = make_scene()
    uv = project_scene(Rs, ts, X)
    ci, pi, uvf, w = obs_arrays(uv)
    problem = BAProblem(jnp.asarray(K), jnp.asarray(ci), jnp.asarray(pi),
                        jnp.asarray(uvf), jnp.asarray(w))
    R0, t0, X0 = _perturbed_init(Rs, ts, X)
    R, t, Xh, costs = bundle_adjust(problem, R0, t0, X0, n_iters=12)
    assert costs[-1] < 1e-2 * costs[0]
    assert ate_rmse(t, ts) < 5e-3


def test_ba_with_noise_stays_sane():
    Rs, ts, X = make_scene()
    uv = project_scene(Rs, ts, X, noise=0.3)
    ci, pi, uvf, w = obs_arrays(uv)
    problem = BAProblem(jnp.asarray(K), jnp.asarray(ci), jnp.asarray(pi),
                        jnp.asarray(uvf), jnp.asarray(w))
    R0, t0, X0 = _perturbed_init(Rs, ts, X)
    R, t, Xh, costs = bundle_adjust(problem, R0, t0, X0, n_iters=12)
    assert costs[-1] < costs[0]
    assert ate_rmse(t, ts) < 0.05


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_ba_sharded_matches_dense():
    Rs, ts, X = make_scene(n_cams=5, n_pts=64)
    uv = project_scene(Rs, ts, X)
    ci, pi, uvf, w = obs_arrays(uv)
    problem = BAProblem(jnp.asarray(K), jnp.asarray(ci), jnp.asarray(pi),
                        jnp.asarray(uvf), jnp.asarray(w))
    R0, t0, X0 = _perturbed_init(Rs, ts, X)

    Rd, td, Xd, costs_d = bundle_adjust(problem, R0, t0, X0, n_iters=6)

    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("landmark",))
    sharded, l_pad, _ = pad_problem_for_mesh(problem, X0.shape[0], 8)
    X0s = np.concatenate([X0, np.ones((l_pad, 3), np.float32)]) \
        if l_pad else X0
    Rsh, tsh, Xsh, costs_s = bundle_adjust(sharded, R0, t0, X0s,
                                           n_iters=6, mesh=mesh)
    np.testing.assert_allclose(np.asarray(tsh), np.asarray(td), atol=1e-3)
    np.testing.assert_allclose(np.asarray(Xsh)[:X0.shape[0]],
                               np.asarray(Xd), atol=1e-2)
    np.testing.assert_allclose(costs_s[0], costs_d[0], rtol=1e-3)


# ---------------------------------------------------------------------------
# pose graph
# ---------------------------------------------------------------------------

def test_pose_graph_chain_with_loop():
    Rs, ts, _ = make_scene(n_cams=8)
    r = np.random.default_rng(5)
    # exact relative measurements along the chain + one loop closure
    R_rel, t_rel = [], []
    for i in range(7):
        Rij = Rs[i + 1] @ Rs[i].T
        t_rel.append(ts[i + 1] - Rij @ ts[i])
        R_rel.append(Rij)
    R07 = Rs[7] @ Rs[0].T
    t07 = ts[7] - R07 @ ts[0]
    graph = odometry_graph(np.stack(R_rel), np.stack(t_rel),
                           loop_edges=[(0, 7, R07, t07)])

    # noisy initial poses
    dw = 0.03 * r.standard_normal((8, 3)).astype(np.float32)
    dw[0] = 0
    R0 = np.asarray(so3_exp(jnp.asarray(dw))) @ Rs
    t0 = ts + 0.05 * r.standard_normal(ts.shape).astype(np.float32)
    t0[0] = ts[0]

    R, t, costs = optimize_pose_graph(graph, R0, t0, n_iters=10)
    assert costs[-1] < 1e-3 * max(costs[0], 1e-9)
    assert ate_rmse(t, ts) < 1e-3


# ---------------------------------------------------------------------------
# pipeline: tracks -> BA
# ---------------------------------------------------------------------------

def test_run_sfm_from_feature_table():
    Rs, ts, X = make_scene(n_cams=6, n_pts=48)
    uv = project_scene(Rs, ts, X, noise=0.1)
    # build a FeatureTable as the tracker would: val=0 (tracked)
    ft = FeatureTable(
        x=jnp.asarray(uv[..., 0]),
        y=jnp.asarray(uv[..., 1]),
        val=jnp.zeros(uv.shape[:2], jnp.int32),
    )
    R0, t0, _ = _perturbed_init(Rs, ts, X, pose_noise=0.005)
    out = run_sfm(ft, K, R0, t0, n_iters=10)
    # a few points project off-image under the camera motion and are
    # dropped by the x>=0 liveness rule; most observations must survive
    assert 0.9 * 6 * 48 <= out["n_observations"] <= 6 * 48
    assert out["costs"][-1] < out["costs"][0]
    assert ate_rmse(out["t"], ts) < 0.02


def test_observations_min_track_len():
    x = np.full((3, 4), 10.0, np.float32)
    val = np.zeros((3, 4), np.int32)
    val[1:, 0] = -1  # feature 0 seen only once
    ft = FeatureTable(x=jnp.asarray(x), y=jnp.asarray(x),
                      val=jnp.asarray(val))
    ci, pi, uv, w = observations_from_feature_table(ft, min_track_len=2)
    assert (w[pi == 0] == 0).all()
    assert (w[pi != 0] == 1).all()
