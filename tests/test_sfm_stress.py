"""SfM under photometric nuisance (VERDICT r2 item 7): per-frame
gain/bias drift, sensor noise, a moving occluder, and lens distortion
applied-then-corrected, for monocular, stereo, and loop-closure VO.

Real benchmark sequences are unobtainable in this environment (no
network, empty reference mount — PARITY.md header), so hardened
synthetic scenes are the available proxy for BASELINE.md's "within ATE
bound on standard benchmark sequences". Measured ATE (% of travel,
2026-08-19, the table mirrored in DESIGN.md):

    clean                 0.15%
    gain/bias drift      19.79%   -> 0.15% with lighting_insensitive
    sensor noise (s=3)    0.13%
    moving occluder       0.33%   -> 0.20% with the 0.5 px FB gate
    distortion corrected  0.23%   (ignored: 0.43%)
    combined + robust     0.11%   (VisualOdometry(robust=True) preset)

Bounds below pin each number with ~2-3x headroom.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.sfm.camera import undistort_radtan
from pyfeaturetrack_tpu.sfm.pipeline import ate_rmse_aligned
from pyfeaturetrack_tpu.sfm.vo import VisualOdometry

from test_vo import H, W, K, _gt_scene, _render

DIST = np.array([-0.12, 0.0, 0.0, 0.0, 0.0])


# ---------------- nuisance generators (seeded, deterministic) ----------

def gain_bias(frames):
    """Per-frame exposure drift: gain +-12%, bias +-10 DN."""
    return [np.clip((1.0 + 0.12 * np.sin(0.7 * i)) * f
                    + 10.0 * np.sin(1.3 * i + 1.0), 0, 255)
            for i, f in enumerate(frames)]


def noisy(frames, sigma=3.0, seed=7):
    r = np.random.default_rng(seed)
    return [np.clip(f + r.normal(0, sigma, f.shape), 0, 255)
            for f in frames]


def occluded(frames, start=6, stop=9, size=70):
    """A flat moving occluder covering ~9% of the view for 3 frames."""
    out = [f.copy() for f in frames]
    h, w = frames[0].shape
    for i in range(start, stop):
        cy, cx = h // 2 + 5 * (i - start), w // 2 + 12 * (i - start)
        out[i][cy - size // 2:cy + size // 2,
               cx - size // 2:cx + size // 2] = 140.0
    return out


def distorted(frames, kmat):
    """Simulate capture through a radial lens: output pixel p_d shows
    the ideal-pinhole ray at K*undistort(K^-1 p_d)."""
    h, w = frames[0].shape
    fy, fx = kmat[1, 1], kmat[0, 0]
    cx, cy = kmat[0, 2], kmat[1, 2]
    vv, uu = np.mgrid[0:h, 0:w].astype(np.float64)
    xd = np.stack([(uu - cx) / fx, (vv - cy) / fy], -1).reshape(-1, 2)
    xi = np.asarray(undistort_radtan(jnp.asarray(xd), jnp.asarray(DIST)))
    ui = (xi[:, 0] * fx + cx).reshape(h, w)
    vi = (xi[:, 1] * fy + cy).reshape(h, w)
    u0 = np.clip(np.floor(ui).astype(int), 0, w - 2)
    v0 = np.clip(np.floor(vi).astype(int), 0, h - 2)
    au = np.clip(ui - u0, 0, 1)
    av = np.clip(vi - v0, 0, 1)
    out = []
    for f in frames:
        s = ((1 - au) * (1 - av) * f[v0, u0]
             + au * (1 - av) * f[v0, u0 + 1]
             + (1 - au) * av * f[v0 + 1, u0]
             + au * av * f[v0 + 1, u0 + 1])
        out.append(np.clip(s, 0, 255))
    return out


# ---------------- monocular -------------------------------------------

@pytest.fixture(scope="module")
def mono_scene():
    Rs, ts, cs, pts = _gt_scene()
    frames = _render(Rs, ts, pts)
    travel = float(np.linalg.norm(np.diff(cs, axis=0), axis=1).sum())
    return ts, cs, frames, travel


def _mono_ate(frames, ts, **kw):
    vo = VisualOdometry(K, n_features=120, kf_every=2, window=6,
                        min_parallax_px=10.0, **kw)
    for f in frames:
        vo.feed(f)
    assert vo.initialized
    idx, _, t, _ = vo.trajectory()
    return float(ate_rmse_aligned(jnp.asarray(t, jnp.float32),
                                  jnp.asarray(ts[idx], jnp.float32)))


def test_mono_gain_bias_drift_needs_lighting_insensitive(mono_scene):
    ts, _, frames, travel = mono_scene
    stressed = gain_bias(frames)
    plain = _mono_ate(stressed, ts)
    li = _mono_ate(stressed, ts,
                   cfg=create_config(lighting_insensitive=True))
    assert plain > 0.05 * travel     # exposure drift breaks plain LK
    assert li < 0.005 * travel       # LI restores the clean bound
    assert li < plain / 10


def test_mono_sensor_noise(mono_scene):
    ts, _, frames, travel = mono_scene
    assert _mono_ate(noisy(frames), ts) < 0.005 * travel


def test_mono_occluder_fb_gate_wins(mono_scene):
    ts, _, frames, travel = mono_scene
    stressed = occluded(frames)
    plain = _mono_ate(stressed, ts)
    fb = _mono_ate(stressed, ts, fb_max_displacement=0.5)
    assert plain < 0.01 * travel     # occluder degrades but survives
    assert fb < 0.006 * travel
    assert fb < plain                # the gate prunes corrupted tracks


def test_mono_distortion_corrected(mono_scene):
    ts, _, frames, travel = mono_scene
    stressed = distorted(frames, K)
    corrected = _mono_ate(stressed, ts, dist=DIST)
    ignored = _mono_ate(stressed, ts)
    assert corrected < 0.006 * travel
    assert corrected < ignored


def test_mono_combined_robust_preset(mono_scene):
    ts, _, frames, travel = mono_scene
    stressed = noisy(gain_bias(frames))
    assert _mono_ate(stressed, ts, robust=True) < 0.005 * travel


# ---------------- stereo ----------------------------------------------

def test_stereo_gain_noise_stress():
    """Metric stereo VO with per-eye gain mismatch + drift + noise —
    the hardest case for left/right patch matching. robust=True keeps
    the RAW metric error bounded (no alignment or scale fit)."""
    from test_stereo import BASELINE, _render as stereo_render

    rng = np.random.default_rng(80)
    n_pts = 300
    pts = np.stack([
        rng.uniform(-9.0, 9.0, n_pts),
        rng.uniform(-6.0, 6.0, n_pts),
        rng.uniform(6.0, 20.0, n_pts),
    ], -1).astype(np.float32)
    amp = rng.uniform(120, 255, n_pts)
    cs = [np.array([0.2 * i, 0.03 * i, 0.08 * i]) for i in range(12)]
    R = np.eye(3, dtype=np.float32)
    lefts, rights = [], []
    for c in cs:
        lefts.append(stereo_render(R, (-R @ c).astype(np.float32), pts,
                                   amp))
        c_r = c + np.array([BASELINE, 0, 0])
        rights.append(stereo_render(R, (-R @ c_r).astype(np.float32),
                                    pts, amp))
    lefts = noisy(gain_bias(lefts), seed=3)
    # per-eye mismatch: the right camera runs 6% hotter with +5 DN
    rights = [np.clip(1.06 * f + 5.0, 0, 255)
              for f in noisy(gain_bias(rights), seed=4)]

    vo = VisualOdometry(K, n_features=120, kf_every=2, window=6,
                        stereo_baseline=BASELINE, max_disparity=40.0,
                        robust=True)
    for fl_img, fr_img in zip(lefts, rights):
        vo.feed(fl_img, right=fr_img)
    assert vo.initialized
    fi, _, _, c = vo.trajectory()
    gt_c = np.stack(cs)[fi]
    err = np.linalg.norm(c - gt_c, axis=-1)
    travel = float(np.linalg.norm(np.diff(np.stack(cs), axis=0),
                                  axis=-1).sum())
    assert err.max() < 0.06 * travel, (err.max(), travel, vo.events)


# ---------------- loop closure ----------------------------------------

def test_loop_closure_under_gain_noise():
    """The rectangle-loop revisit still closes (and helps) with
    exposure drift + noise on every frame under robust=True."""
    from test_loop import _loop_scene

    _, ts, cs, frames = _loop_scene()
    stressed = noisy(gain_bias(frames), seed=11)
    vo = VisualOdometry(K, n_features=140, kf_every=2, window=6,
                        min_parallax_px=8.0, loop_closure=True,
                        robust=True)
    for f in stressed:
        vo.feed(f)
    assert vo.initialized
    assert any("loop" in e for e in vo.events), vo.events
    idx, _, t, _ = vo.trajectory()
    ate = float(ate_rmse_aligned(jnp.asarray(t, jnp.float32),
                                 jnp.asarray(ts[idx], jnp.float32)))
    travel = float(np.linalg.norm(np.diff(cs, axis=0), axis=-1).sum())
    assert ate < 0.04 * travel, (ate, travel, vo.events)
