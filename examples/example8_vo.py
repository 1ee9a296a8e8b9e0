"""Monocular visual odometry demo: frames in, trajectory out — no
ground-truth poses anywhere in the pipeline.

Beyond the reference (no SfM layer): renders a true-3D blob-field scene
(KITTI-style parallax), feeds the frames to sfm.VisualOdometry (track ->
two-view essential bootstrap -> motion-only localization -> incremental
triangulation -> windowed BA), and reports the similarity-aligned ATE
against the synthetic ground truth.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from pyfeaturetrack_tpu.sfm import VisualOdometry  # noqa: E402
from pyfeaturetrack_tpu.sfm.geometry import project, so3_exp  # noqa: E402
from pyfeaturetrack_tpu.sfm.pipeline import ate_rmse_aligned  # noqa: E402

H, W, N_FRAMES, N_POINTS = 240, 320, 16, 260
K = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1]])


def make_scene(seed=21):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-8, 8, N_POINTS),
                    rng.uniform(-5, 5, N_POINTS),
                    rng.uniform(7, 24, N_POINTS)], -1).astype(np.float32)
    Rs, ts, cs = [], [], []
    for i in range(N_FRAMES):
        w = np.array([0.0012 * i, 0.003 * i, 0.001 * i], np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w[None])))[0].astype(np.float32)
        c = np.array([0.22 * i, 0.03 * i, 0.12 * i], np.float32)
        Rs.append(R)
        ts.append((-R @ c).astype(np.float32))
        cs.append(c)
    return np.stack(Rs), np.stack(ts), np.stack(cs), pts


def render(Rs, ts, pts):
    rng = np.random.default_rng(1)
    amp = rng.uniform(120, 255, pts.shape[0])
    frames = []
    for Rk, tk in zip(Rs, ts):
        uv, depth = project(jnp.asarray(K, jnp.float32), jnp.asarray(Rk),
                            jnp.asarray(tk), jnp.asarray(pts))
        uv, depth = np.asarray(uv), np.asarray(depth)
        img = np.full((H, W), 20.0)
        rad = 6
        for j in range(pts.shape[0]):
            u, v = uv[j]
            if depth[j] <= 1.0 or not (rad < u < W - rad - 1
                                       and rad < v < H - rad - 1):
                continue
            cu, cv = int(u), int(v)
            yy, xx = np.mgrid[cv - rad:cv + rad + 1, cu - rad:cu + rad + 1]
            img[cv - rad:cv + rad + 1, cu - rad:cu + rad + 1] += (
                amp[j] * np.exp(-((xx - u) ** 2 + (yy - v) ** 2) / 6.48))
        frames.append(np.clip(img, 0, 255))
    return frames


def main():
    Rs, ts, cs, pts = make_scene()
    frames = render(Rs, ts, pts)
    vo = VisualOdometry(K, n_features=120, kf_every=2, window=6,
                        min_parallax_px=10.0)
    for f in frames:
        vo.feed(f)
    for e in vo.events:
        print(e)
    fi, R, t, c = vo.trajectory()
    gt = cs[fi]
    travel = float(np.linalg.norm(gt[-1] - gt[0]))
    ate = ate_rmse_aligned(c, gt)
    print(f"{len(fi)} keyframes, {len(vo.map_points())} landmarks")
    print(f"ATE {ate * 1000:.1f} mm over {travel:.2f} units travel "
          f"({ate / travel * 100:.2f}%)")
    return ate, travel


if __name__ == "__main__":
    main()
