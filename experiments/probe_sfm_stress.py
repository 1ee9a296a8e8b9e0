"""Measure monocular-VO ATE under photometric nuisances (VERDICT r2
item 7) to pin bounds for tests/test_sfm_stress.py.

Run: PYTHONPATH=/root/repo:/root/repo/tests JAX_PLATFORMS=cpu \
    python experiments/probe_sfm_stress.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from test_vo import H, W, K, _gt_scene, _render  # noqa: E402

from pyfeaturetrack_tpu.config import create_config  # noqa: E402
from pyfeaturetrack_tpu.sfm.camera import undistort_radtan  # noqa: E402
from pyfeaturetrack_tpu.sfm.pipeline import ate_rmse_aligned  # noqa
from pyfeaturetrack_tpu.sfm.vo import VisualOdometry  # noqa: E402

import jax.numpy as jnp  # noqa: E402

Rs, ts, cs, pts = _gt_scene()
clean = _render(Rs, ts, pts)
rng = np.random.default_rng(99)


def gain_bias(frames):
    out = []
    for i, f in enumerate(frames):
        g = 1.0 + 0.12 * np.sin(0.7 * i)
        b = 10.0 * np.sin(1.3 * i + 1.0)
        out.append(np.clip(g * f + b, 0, 255))
    return out


def noisy(frames, sigma=3.0):
    r = np.random.default_rng(7)
    return [np.clip(f + r.normal(0, sigma, f.shape), 0, 255)
            for f in frames]


def occluded(frames, start=6, stop=9, size=70):
    out = [f.copy() for f in frames]
    for i in range(start, stop):
        cy, cx = H // 2 + 5 * (i - start), W // 2 + 12 * (i - start)
        out[i][cy - size // 2:cy + size // 2,
               cx - size // 2:cx + size // 2] = 140.0
    return out


DIST = np.array([-0.12, 0.0, 0.0, 0.0, 0.0])


def distorted(frames):
    """Simulate capture through a radial lens: output pixel p_d shows
    the ideal-pinhole ray at K*undistort(K^-1 p_d)."""
    fy, fx = K[1, 1], K[0, 0]
    cx, cy = K[0, 2], K[1, 2]
    vv, uu = np.mgrid[0:H, 0:W].astype(np.float64)
    xd = np.stack([(uu - cx) / fx, (vv - cy) / fy], -1).reshape(-1, 2)
    xi = np.asarray(undistort_radtan(jnp.asarray(xd), jnp.asarray(DIST)))
    ui = (xi[:, 0] * fx + cx).reshape(H, W)
    vi = (xi[:, 1] * fy + cy).reshape(H, W)
    u0 = np.clip(np.floor(ui).astype(int), 0, W - 2)
    v0 = np.clip(np.floor(vi).astype(int), 0, H - 2)
    au = np.clip(ui - u0, 0, 1)
    av = np.clip(vi - v0, 0, 1)
    out = []
    for f in frames:
        s = ((1 - au) * (1 - av) * f[v0, u0] + au * (1 - av) * f[v0, u0 + 1]
             + (1 - au) * av * f[v0 + 1, u0] + au * av * f[v0 + 1, u0 + 1])
        out.append(np.clip(s, 0, 255))
    return out


def run(frames, **kw):
    vo = VisualOdometry(K, n_features=120, kf_every=2, window=6,
                        min_parallax_px=10.0, **kw)
    for f in frames:
        vo.feed(f)
    if not vo.initialized:
        return None
    idx, R, t, c = vo.trajectory()
    return float(ate_rmse_aligned(
        jnp.asarray(t, jnp.float32), jnp.asarray(ts[idx], jnp.float32)))


travel = float(np.linalg.norm(np.diff(cs, axis=0), axis=1).sum())
print(f"travel {travel:.3f} units")
cases = {
    "clean": (clean, {}),
    "gain_bias": (gain_bias(clean), {}),
    "gain_bias_LI": (gain_bias(clean),
                     {"cfg": create_config(lighting_insensitive=True)}),
    "noise3": (noisy(clean), {}),
    "occluder": (occluded(clean), {}),
    "occluder_FB": (occluded(clean), {"fb_max_displacement": 0.5}),
    "distorted_corrected": (distorted(clean), {"dist": DIST}),
    "distorted_ignored": (distorted(clean), {}),
    "combined": (noisy(gain_bias(clean)),
                 {"cfg": create_config(lighting_insensitive=True),
                  "fb_max_displacement": 0.5}),
}
for name, (frames, kw) in cases.items():
    try:
        ate = run(frames, **kw)
        print(f"{name:22s} ATE {ate if ate is None else round(ate, 4)}"
              f"  ({'-' if ate is None else f'{100*ate/travel:.2f}% travel'})")
    except Exception as e:
        print(f"{name:22s} FAILED {type(e).__name__}: {e}")
