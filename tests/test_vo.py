"""Monocular visual odometry end-to-end (sfm/vo.py): frames in, poses
out, NO external initialization — the full BASELINE config-5 front-end
chain (track -> bootstrap -> localize -> triangulate -> windowed BA)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyfeaturetrack_tpu.sfm.geometry import project, so3_exp
from pyfeaturetrack_tpu.sfm.pipeline import ate_rmse_aligned, umeyama_align
from pyfeaturetrack_tpu.sfm.vo import VisualOdometry

H, W = 240, 320
K = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1]])
N_FRAMES = 16
N_POINTS = 260


def _gt_scene(seed=21):
    """Sideways-dominant motion through a true-3D blob field (sideways
    baseline gives the two-view bootstrap strong parallax)."""
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
    return np.stack(Rs), np.stack(ts), np.stack(cs), pts


def _render(Rs, ts, pts):
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
            yy, xx = np.mgrid[cv - rad:cv + rad + 1,
                              cu - rad:cu + rad + 1]
            img[cv - rad:cv + rad + 1, cu - rad:cu + rad + 1] += (
                amp[j] * np.exp(-((xx - u) ** 2 + (yy - v) ** 2) / 6.48))
        frames.append(np.clip(img, 0, 255))
    return frames


@pytest.fixture(scope="module")
def scene():
    Rs, ts, cs, pts = _gt_scene()
    return Rs, ts, cs, pts, _render(Rs, ts, pts)


@pytest.fixture(scope="module")
def vo_run(scene):
    _, _, _, _, frames = scene
    vo = VisualOdometry(K, n_features=120, kf_every=2, window=6,
                        min_parallax_px=10.0)
    for f in frames:
        vo.feed(f)
    return vo


def test_vo_initializes(vo_run):
    assert vo_run.initialized
    assert any("bootstrap at" in e for e in vo_run.events)


def test_vo_trajectory_ate(vo_run, scene):
    _, _, cs, _, _ = scene
    frames_idx, R, t, c = vo_run.trajectory()
    gt_c = cs[frames_idx]
    # monocular: similarity-aligned ATE; camera travels ~3.9 units
    ate = ate_rmse_aligned(c, gt_c)
    travel = np.linalg.norm(gt_c[-1] - gt_c[0])
    assert ate < 0.03 * travel, (ate, travel)


def test_vo_rotations_match_gt(vo_run, scene):
    Rs_gt, _, cs, _, _ = scene
    frames_idx, R, t, c = vo_run.trajectory()
    # align estimated world frame to gt: world = first keyframe camera,
    # and the first keyframe IS frame 0 with R0 = I, so R estimates map
    # directly (gt R0 = I as well)
    for k in range(len(frames_idx)):
        err = np.abs(R[k] @ Rs_gt[frames_idx[k]].T - np.eye(3)).max()
        assert err < 0.02, (k, err)


def test_vo_map_reprojects(vo_run):
    """Internal consistency: stored landmarks reproject onto their
    tracked pixels in the final keyframe under the final VO pose."""
    X = vo_run.map_points()
    assert len(X) >= 60 and np.isfinite(X).all()
    kf = vo_run.kf[-1]
    R, t = vo_run.poses[-1]
    errs = []
    for s in np.nonzero(kf["live"])[0]:
        lm = vo_run.landmarks.get((int(s), int(kf["gen"][s])))
        if lm is None:
            continue
        Y = R @ lm + t
        u = K[0, 0] * Y[0] / Y[2] + K[0, 2]
        v = K[1, 1] * Y[1] / Y[2] + K[1, 2]
        errs.append(np.hypot(u - kf["x"][s], v - kf["y"][s]))
    assert len(errs) >= 30
    assert np.median(errs) < 1.5  # px


def test_vo_trajectory_before_init_raises():
    vo = VisualOdometry(K)
    with pytest.raises(RuntimeError):
        vo.trajectory()


def test_vo_device_loop_matches_host(scene):
    """device_loop=True (chained device tracking, one history pull per
    keyframe) reproduces the host-driven VO: same keyframes, same
    bootstrap, trajectory within tight tolerance (device selection is
    bit-equal to the host greedy whenever slots fill; LK math is the
    same program)."""
    _, _, cs, _, frames = scene
    kw = dict(n_features=120, kf_every=2, window=6, min_parallax_px=10.0)
    host = VisualOdometry(K, **kw)
    dev = VisualOdometry(K, device_loop=True, **kw)
    for f in frames:
        host.feed(f)
        dev.feed(f)
    assert dev.initialized
    fi_h, _, _, c_h = host.trajectory()
    fi_d, _, _, c_d = dev.trajectory()
    np.testing.assert_array_equal(fi_h, fi_d)
    gt = cs[fi_h]
    ate_h = ate_rmse_aligned(c_h, gt)
    ate_d = ate_rmse_aligned(c_d, gt)
    assert ate_d < 0.03 * np.linalg.norm(gt[-1] - gt[0])
    # both drivers land in the same accuracy regime
    assert abs(ate_d - ate_h) < 0.02


def test_vo_checkpoint_resume_matches_uninterrupted(scene, tmp_path):
    """Checkpoint mid-stream (orbax round-trip), resume into a fresh VO,
    finish the stream: trajectory identical to the uninterrupted run."""
    from pyfeaturetrack_tpu.utils.checkpoint import (restore_checkpoint,
                                                     resume_vo,
                                                     save_checkpoint,
                                                     vo_state)
    _, _, _, _, frames = scene
    kw = dict(n_features=120, kf_every=2, window=6, min_parallax_px=10.0)
    full = VisualOdometry(K, **kw)
    for f in frames:
        full.feed(f)

    first = VisualOdometry(K, **kw)
    cut = 9
    for f in frames[:cut]:
        first.feed(f)
    save_checkpoint(tmp_path / "vo_ckpt", vo_state(first))
    state = restore_checkpoint(tmp_path / "vo_ckpt")

    resumed = VisualOdometry(K, **kw)
    resume_vo(resumed, state)
    assert resumed.n_frames == cut
    for f in frames[cut:]:
        resumed.feed(f)

    fi_a, R_a, t_a, c_a = full.trajectory()
    fi_b, R_b, t_b, c_b = resumed.trajectory()
    np.testing.assert_array_equal(fi_a, fi_b)
    np.testing.assert_allclose(c_a, c_b, atol=1e-5)
    np.testing.assert_allclose(R_a, R_b, atol=1e-5)
    assert set(full.landmarks) == set(resumed.landmarks)


def test_vo_auto_bootstrap_matches_essential(scene):
    """bootstrap_model='auto' on a true-3D scene selects the essential
    model and lands in the same accuracy regime as the default."""
    _, _, cs, _, frames = scene
    vo = VisualOdometry(K, n_features=120, kf_every=2, window=6,
                        min_parallax_px=10.0, bootstrap_model="auto")
    for f in frames:
        vo.feed(f)
    assert vo.initialized
    assert any("bootstrap [E]" in e for e in vo.events), vo.events
    fi, _, _, c = vo.trajectory()
    gt = cs[fi]
    ate = ate_rmse_aligned(c, gt)
    assert ate < 0.03 * np.linalg.norm(gt[-1] - gt[0])


def test_vo_auto_bootstrap_planar_scene():
    """A fully PLANAR scene (all texture on one wall): the 8-point
    essential is ill-conditioned there, the homography route must win
    the model score and still initialize a usable trajectory."""
    rng = np.random.default_rng(5)
    nrm = np.array([0.05, -0.08, 1.0])
    nrm = nrm / np.linalg.norm(nrm)
    a = np.cross(nrm, [1.0, 0, 0])
    a /= np.linalg.norm(a)
    b = np.cross(nrm, a)
    pts = (nrm * 14.0 + rng.uniform(-9, 9, (N_POINTS, 1)) * a
           + rng.uniform(-6.5, 6.5, (N_POINTS, 1)) * b).astype(np.float32)
    Rs, ts, cs = [], [], []
    for i in range(N_FRAMES):
        w = np.array([0.0012 * i, 0.003 * i, 0.001 * i], np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w[None])))[0].astype(np.float32)
        c = np.array([0.22 * i, 0.03 * i, 0.12 * i], np.float32)
        Rs.append(R)
        ts.append((-R @ c).astype(np.float32))
        cs.append(c)
    Rs, ts, cs = np.stack(Rs), np.stack(ts), np.stack(cs)
    frames = _render(Rs, ts, pts)
    vo = VisualOdometry(K, n_features=120, kf_every=2, window=6,
                        min_parallax_px=10.0, bootstrap_model="auto")
    for f in frames:
        vo.feed(f)
    assert vo.initialized
    assert any("bootstrap [H]" in e for e in vo.events), vo.events
    fi, _, _, c = vo.trajectory()
    gt = cs[fi]
    ate = ate_rmse_aligned(c, gt)
    assert ate < 0.04 * np.linalg.norm(gt[-1] - gt[0]), ate


def test_vo_bad_bootstrap_model_raises():
    with pytest.raises(ValueError):
        VisualOdometry(K, bootstrap_model="fundamental")
