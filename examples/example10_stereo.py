"""Metric stereo VO demo: rendered rectified pairs -> physical-unit
trajectory, initialized from frame 0 (no bootstrap, no monocular gauge).

Beyond-reference extension: the reference is a monocular tracker; here
the same LK tracker doubles as the stereo matcher (sfm/stereo.py) and
the VO driver consumes the metric landmarks directly.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pyfeaturetrack_tpu.sfm.geometry import project  # noqa: E402
from pyfeaturetrack_tpu.sfm.vo import VisualOdometry  # noqa: E402

H, W = 240, 320
K = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1]])
BASELINE = 0.3  # world units (e.g. meters)


def _render(R, t, pts, amp):
    uv, depth = project(jnp.asarray(K, jnp.float32),
                        jnp.asarray(R, jnp.float32),
                        jnp.asarray(t, jnp.float32),
                        jnp.asarray(pts, jnp.float32))
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
        img[cv - rad:cv + rad + 1, cu - rad:cu + rad + 1] += (
            amp[j] * np.exp(-((xx - u) ** 2 + (yy - v) ** 2) / 6.48))
    return np.clip(img, 0, 255)


def main(out_dir="."):
    rng = np.random.default_rng(80)
    n_pts = 300
    pts = np.stack([rng.uniform(-9, 9, n_pts), rng.uniform(-6, 6, n_pts),
                    rng.uniform(6, 20, n_pts)], -1).astype(np.float32)
    amp = rng.uniform(120, 255, n_pts)
    cs = [np.array([0.2 * i, 0.03 * i, 0.08 * i]) for i in range(12)]
    R = np.eye(3, dtype=np.float32)

    vo = VisualOdometry(K, n_features=120, kf_every=2, window=6,
                        stereo_baseline=BASELINE, max_disparity=40.0)
    for c in cs:
        left = _render(R, (-R @ c).astype(np.float32), pts, amp)
        right = _render(
            R, (-R @ (c + np.array([BASELINE, 0, 0]))).astype(np.float32),
            pts, amp)
        vo.feed(left, right=right)

    for e in vo.events:
        print(e)
    fi, Rt, t, c_est = vo.trajectory()
    gt = np.stack(cs)[fi]
    err = np.linalg.norm(c_est - gt, axis=-1)
    print(f"{len(fi)} keyframes, {len(vo.map_points())} metric landmarks")
    print("per-keyframe metric error (world units, NO alignment/scale "
          f"fit): max {err.max():.3f}, mean {err.mean():.3f}")
    np.savez(os.path.join(out_dir, "stereo_trajectory.npz"),
             keyframe_frames=fi, centers=c_est, gt_centers=gt)
    print(f"wrote {os.path.join(out_dir, 'stereo_trajectory.npz')}")


if __name__ == "__main__":
    main()
