"""Loop closure (sfm/loop.py): guided wide-baseline re-tracking, the
pose-graph drift correction, and the VO-integrated end-to-end loop."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.ops.track import (build_track_pyramids_jit,
                                          track_features_pyramids)
from pyfeaturetrack_tpu.sfm.loop import close_loop_poses, guided_retrack

from conftest import make_textured_image, shift_image_bilinear


def _pyr(img, cfg):
    return build_track_pyramids_jit(jnp.asarray(img, jnp.float32), cfg)


def test_guided_tracking_crosses_large_displacement():
    """A 25 px shift defeats the default search range (15 px); a guided
    init near the true position recovers it."""
    cfg = create_config()
    h, w, dx = 96, 160, 25.0
    base = make_textured_image(h, w, seed=40)
    img2 = shift_image_bilinear(base, dx, 0.0)
    p1 = _pyr(base, cfg)
    p2 = _pyr(img2, cfg)
    rng = np.random.default_rng(41)
    n = 30
    x = jnp.asarray(rng.uniform(20, w - 50, n), jnp.float32)
    y = jnp.asarray(rng.uniform(20, h - 21, n), jnp.float32)
    val = jnp.zeros((n,), jnp.int32)

    ux, uy, uv = track_features_pyramids(p1, p2, x, y, val, cfg)
    unguided_ok = np.asarray(uv) == 0
    unguided_correct = unguided_ok & (
        np.abs(np.asarray(ux) - (np.asarray(x) + dx)) < 0.5)

    gx, gy, gv = track_features_pyramids(
        p1, p2, x, y, val, cfg,
        x_init=x + dx + 2.0, y_init=y - 1.0)  # prior within ~2 px
    guided_ok = np.asarray(gv) == 0
    err = np.abs(np.asarray(gx) - (np.asarray(x) + dx))
    assert guided_ok.sum() > 20
    assert np.median(err[guided_ok]) < 0.1
    assert guided_ok.sum() > 2 * max(unguided_correct.sum(), 1)


def test_guided_retrack_accepts_true_rejects_occluded():
    cfg = create_config()
    h, w, dx = 96, 160, 18.0
    base = make_textured_image(h, w, seed=42)
    img2 = shift_image_bilinear(base, dx, 0.0).copy()
    img2[30:70, 90:130] = make_textured_image(40, 40, seed=43)
    p1 = _pyr(base, cfg)
    p2 = _pyr(img2, cfg)
    rng = np.random.default_rng(44)
    n = 40
    x = np.concatenate([rng.uniform(20, 60, n // 2),        # clean dest
                        rng.uniform(78, 105, n - n // 2)])  # dest occluded
    y = rng.uniform(36, 60, n)
    xb, yb, ok, _ = guided_retrack(
        p1, p2, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(x + dx, jnp.float32), jnp.asarray(y, jnp.float32),
        cfg, fb_max_displacement=1.0)
    clean = np.arange(n) < n // 2
    assert ok[clean].mean() > 0.7
    assert ok[~clean].mean() < 0.3
    assert np.abs(xb[ok & clean] - (x[ok & clean] + dx)).max() < 0.5


def test_close_loop_poses_redistributes_drift():
    """A drifted odometry chain + one exact loop measurement: the
    endpoint snaps to the measurement and intermediate error shrinks."""
    m = 12
    rng = np.random.default_rng(45)
    c_gt = np.stack([np.linspace(0, 2.0, m), np.zeros(m),
                     np.zeros(m)], -1)
    R_gt = np.tile(np.eye(3), (m, 1, 1))
    t_gt = -c_gt  # R = I
    # drift: growing lateral error
    c_dr = c_gt + np.stack([np.zeros(m),
                            0.04 * np.arange(m),
                            0.02 * np.arange(m)], -1)
    t_dr = -c_dr
    before = np.linalg.norm(c_dr - c_gt, axis=-1)
    Rn, tn = close_loop_poses(R_gt, t_dr, 0, m - 1,
                              R_gt[m - 1], t_gt[m - 1])
    c_new = np.einsum("kij,kj->ki", -np.transpose(Rn, (0, 2, 1)), tn)
    after = np.linalg.norm(c_new - c_gt, axis=-1)
    assert after[-1] < 0.25 * before[-1]     # endpoint pulled to the edge
    assert after.mean() < 0.6 * before.mean()  # chain-wide improvement
    assert np.linalg.norm(c_new[0] - c_gt[0]) < 1e-5  # pose 0 pinned


# ---------------------------------------------------------------- e2e

H, W = 240, 320
K = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1]])


def _loop_scene(seed=50):
    """Rectangular loop (right, down, left, up back to the start): the
    camera revisits the mapped start region with the same orientation.
    (The 180-degree out-and-back reversal case is covered separately in
    test_vo_out_and_back_reversal — it used to destabilize the windowed
    monocular gauge until the re-anchor switched from the window-first
    camera-pair baseline to the median landmark distance.)"""
    from pyfeaturetrack_tpu.sfm.geometry import project

    rng = np.random.default_rng(seed)
    n_pts = 300
    pts = np.stack([
        rng.uniform(-9.0, 9.0, n_pts),
        rng.uniform(-6.0, 6.0, n_pts),
        rng.uniform(7.0, 22.0, n_pts),
    ], -1).astype(np.float32)
    cs = []
    p = np.zeros(3)
    for _ in range(8):
        cs.append(p.copy())
        p += [0.22, 0.02, 0]
    for _ in range(4):
        cs.append(p.copy())
        p += [0, 0.18, 0]
    for _ in range(8):
        cs.append(p.copy())
        p += [-0.22, -0.02, 0]
    for _ in range(4):
        cs.append(p.copy())
        p += [0, -0.18, 0]
    cs.append(p.copy())
    Rs = np.tile(np.eye(3, dtype=np.float32), (len(cs), 1, 1))
    ts = np.stack([(-R @ c) for R, c in zip(Rs, cs)]).astype(np.float32)

    amp = rng.uniform(120, 255, n_pts)
    frames = []
    for Rk, tk in zip(Rs, ts):
        uv, depth = project(jnp.asarray(K, jnp.float32), jnp.asarray(Rk),
                            jnp.asarray(tk), jnp.asarray(pts))
        uv = np.asarray(uv)
        depth = np.asarray(depth)
        img = np.full((H, W), 20.0)
        rad = 6
        for j in range(n_pts):
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
    return Rs, ts, np.stack(cs), frames


def test_vo_out_and_back_reversal():
    """Motion reversal regression: the camera sweeps out and returns
    along the same path. The window-first-baseline gauge re-anchor
    diverged here (the anchor pair's baseline tends to zero as the
    camera re-passes it, amplifying noise into runaway scale: ATE was
    0.33); the median-landmark-distance anchor holds the gauge."""
    from pyfeaturetrack_tpu.sfm.geometry import project
    from pyfeaturetrack_tpu.sfm.pipeline import ate_rmse_aligned
    from pyfeaturetrack_tpu.sfm.vo import VisualOdometry

    rng = np.random.default_rng(50)
    n_pts = 300
    pts = np.stack([rng.uniform(-9, 9, n_pts), rng.uniform(-5, 5, n_pts),
                    rng.uniform(7, 22, n_pts)], -1).astype(np.float32)
    n_out = 10
    cs = ([np.array([0.22 * i, 0.02 * i, 0.0]) for i in range(n_out)] +
          [np.array([0.22 * (n_out - 1 - i), 0.02 * (n_out - 1 - i), 0.0])
           for i in range(1, n_out + 1)])
    Rs = np.tile(np.eye(3, dtype=np.float32), (len(cs), 1, 1))
    ts = np.stack([(-R @ c) for R, c in zip(Rs, cs)]).astype(np.float32)
    amp = rng.uniform(120, 255, n_pts)
    frames = []
    for Rk, tk in zip(Rs, ts):
        uv, depth = project(jnp.asarray(K, jnp.float32),
                            jnp.asarray(Rk), jnp.asarray(tk),
                            jnp.asarray(pts))
        uv = np.asarray(uv)
        depth = np.asarray(depth)
        img = np.full((H, W), 20.0)
        rad = 6
        for j in range(n_pts):
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

    vo = VisualOdometry(K, n_features=120, kf_every=2, window=6,
                        min_parallax_px=10.0)
    for f in frames:
        vo.feed(f)
    fi, R, t, c = vo.trajectory()
    ate = ate_rmse_aligned(t, ts[fi])
    travel = float(np.linalg.norm(np.diff(np.stack(cs), axis=0),
                                  axis=-1).sum())
    assert ate < 0.01 * travel, ate
    # trajectory actually returns to the start
    assert np.linalg.norm(c[-1] - c[0]) < 0.15


def test_vo_relocalizes_after_total_occlusion():
    """Kidnapped-camera recovery: a few fully-occluded frames destroy
    every track (and thus every landmark association); once the scene
    reappears, the VO re-observes a retained keyframe's landmarks and
    snaps back to a metric pose, re-associating the map."""
    from pyfeaturetrack_tpu.sfm.vo import VisualOdometry

    Rs, ts, cs, frames = _loop_scene()
    rng = np.random.default_rng(60)
    blank = rng.uniform(0, 60, frames[0].shape)  # texture-free noise
    occluded = list(frames)
    for k in (12, 13, 14):
        occluded[k] = blank
    vo = VisualOdometry(K, n_features=120, kf_every=2, window=6,
                        min_parallax_px=10.0, loop_closure=True,
                        loop_min_gap=6, loop_radius=0.6,
                        loop_min_inliers=12)
    for f in occluded:
        vo.feed(f)
    assert vo.initialized
    held = [e for e in vo.events if "pose held" in e]
    reloc = [e for e in vo.events if "relocalized against" in e]
    assert held, vo.events       # the blackout really broke localization
    assert reloc, vo.events      # ...and recovery fired
    fi, R, t, c = vo.trajectory()
    # after recovery the trajectory is metric again: the final keyframe
    # center matches ground truth in the map gauge (first-keyframe-pair
    # baseline) within a small tolerance
    gauge = np.linalg.norm(cs[fi[1]] - cs[fi[0]])
    err_end = np.linalg.norm(c[-1] - cs[fi[-1]] / gauge)
    assert err_end < 0.25, (err_end, vo.events)


def test_vo_loop_closure_survives_checkpoint_resume():
    """vo_state/resume_vo carry keyframe images and the closed-loop log,
    so closure still works against pre-resume keyframes."""
    from pyfeaturetrack_tpu.sfm.vo import VisualOdometry
    from pyfeaturetrack_tpu.utils.checkpoint import resume_vo, vo_state

    Rs, ts, cs, frames = _loop_scene()
    kwargs = dict(n_features=120, kf_every=2, window=6,
                  min_parallax_px=10.0, loop_closure=True,
                  loop_min_gap=6, loop_radius=0.6, loop_min_inliers=12)
    vo = VisualOdometry(K, **kwargs)
    half = len(frames) // 2
    for f in frames[:half]:
        vo.feed(f)
    st = vo_state(vo)
    assert "kf_img" in st  # images captured for closure

    vo2 = VisualOdometry(K, **kwargs)
    resume_vo(vo2, st)
    assert all(k["img"] is not None for k in vo2.kf)
    for f in frames[half:]:
        vo2.feed(f)
    assert vo2.loops_closed  # closure matched a pre-resume keyframe
    assert vo2.loops_closed[0][0] < len(vo.kf)


def test_vo_loop_closure_end_to_end():
    from pyfeaturetrack_tpu.sfm.pipeline import ate_rmse_aligned
    from pyfeaturetrack_tpu.sfm.vo import VisualOdometry

    Rs, ts, cs, frames = _loop_scene()
    vo = VisualOdometry(K, n_features=120, kf_every=2, window=6,
                        min_parallax_px=10.0, loop_closure=True,
                        loop_min_gap=6, loop_radius=0.6,
                        loop_min_inliers=12)
    for f in frames:
        vo.feed(f)
    assert vo.initialized
    assert vo.loops_closed, f"no loop closed; events: {vo.events}"
    i, j = vo.loops_closed[0]
    assert j - i >= 6  # a genuine revisit, not a near-neighbor match
    fi, R, t, c = vo.trajectory()
    ate = ate_rmse_aligned(t, ts[fi])
    travel = float(np.linalg.norm(np.diff(cs, axis=0), axis=-1).sum())
    assert ate < 0.02 * travel, (ate, travel, vo.events)


def test_close_loop_sim3_restores_known_drift():
    """Synthetic chain with KNOWN progressive yaw + scale drift about
    the anchor: the Sim(3) geodesic correction must restore
    orientations to well under a degree and substantially shrink the
    center error (scale clamp caps the rest), with the endpoint exact."""
    from pyfeaturetrack_tpu.sfm.loop import close_loop_sim3

    def yaw(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])

    m = 30
    ths = np.linspace(0, 2 * np.pi, m)
    c_true = np.stack([10 * np.cos(ths), 0 * ths, 10 * np.sin(ths)], -1)
    R_true = np.stack([yaw(-ths[k]) for k in range(m)])
    t_true = np.stack([-R_true[k] @ c_true[k] for k in range(m)])

    drift_yaw = np.deg2rad(25)
    drift_s = 1.2
    c_est = np.zeros_like(c_true)
    R_est = R_true.copy()
    for k in range(m):
        w = k / (m - 1)
        W = yaw(w * drift_yaw)
        c_est[k] = c_true[0] + (drift_s ** w) * (W @ (c_true[k] -
                                                      c_true[0]))
        R_est[k] = R_true[k] @ W.T
    t_est = np.stack([-R_est[k] @ c_est[k] for k in range(m)])

    Rn, tn, A, b = close_loop_sim3(R_est, t_est, 0, m - 1,
                                   R_true[-1], t_true[-1])
    cn = np.einsum("kij,kj->ki", -np.transpose(Rn, (0, 2, 1)), tn)
    err_before = np.linalg.norm(c_est - c_true, axis=1).max()
    err_after = np.linalg.norm(cn - c_true, axis=1).max()
    assert err_after < 0.5 * err_before
    # endpoint pinned to the measurement exactly
    np.testing.assert_allclose(cn[-1], c_true[-1], atol=1e-9)
    rot_err = [np.degrees(np.arccos(np.clip(
        (np.trace(Rn[k] @ R_true[k].T) - 1) / 2, -1, 1)))
        for k in range(m)]
    assert max(rot_err) < 1.0
    # the exported point affines move a point exactly like the
    # keyframe centers (landmark co-warp contract)
    for k in (5, 15, m - 1):
        np.testing.assert_allclose(A[k] @ c_est[k] + b[k], cn[k],
                                   atol=1e-9)


def test_place_signature_exposure_invariant():
    """The loop-closure place signature must be invariant to the
    gain/bias drift the robust tracker tolerates, and discriminative
    between different views."""
    from pyfeaturetrack_tpu.sfm.vo import _place_signature
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (240, 320))
    s0 = _place_signature(img)
    s1 = _place_signature(np.clip(1.3 * img + 17.0, 0, 255))
    # 0.98 measured (the 255 clip breaks pure linearity slightly);
    # the loop gate is 0.7
    assert float(s0 @ s1) > 0.95
    other = _place_signature(rng.uniform(0, 255, (240, 320)))
    assert float(s0 @ other) < 0.5
    assert abs(float(np.linalg.norm(s0)) - 1.0) < 1e-5
