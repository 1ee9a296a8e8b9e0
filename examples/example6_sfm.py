"""SfM demo: rendered perspective sequence -> KLT tracks -> bundle
adjustment -> trajectory error.

Beyond the reference (which has no SfM back-end): this is the
BASELINE.md config-5 pipeline on a synthetic but fully perspective-
consistent scene (a tilted textured plane observed by a moving,
rotating camera).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from pyfeaturetrack_tpu.models.sequence import track_sequence  # noqa: E402
from pyfeaturetrack_tpu.sfm import run_sfm  # noqa: E402
from pyfeaturetrack_tpu.sfm.geometry import so3_exp  # noqa: E402
from pyfeaturetrack_tpu.sfm.pipeline import ate_rmse_aligned  # noqa: E402

H, W, N_FRAMES = 240, 320, 8
K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)


def make_scene(seed=77):
    rng = np.random.default_rng(seed)
    tex = rng.uniform(0, 255, (720, 960))
    k = np.array([1.0, 4, 6, 4, 1]) / 16.0
    for axis in (0, 1):
        tex = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, tex)
    tex = (tex - tex.min()) / (tex.max() - tex.min()) * 255.0

    Rs, ts, frames = [], [], []
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1)
    sx, sy = 960 / 4.8, 720 / 3.6
    for i in range(N_FRAMES):
        w = np.array([0.004 * i, -0.006 * i, 0.002 * i], np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w[None])))[0]
        t = np.array([-0.12 * i, 0.06 * i, 5.0], np.float32)
        Hk = K @ np.stack([R[:, 0], R[:, 1], t], axis=1)
        plane = pix @ np.linalg.inv(Hk).T
        X = plane[..., 0] / plane[..., 2]
        Y = plane[..., 1] / plane[..., 2]
        u = np.clip((X + 2.4) * sx, 0, 960 - 1.001)
        v = np.clip((Y + 1.8) * sy, 0, 720 - 1.001)
        u0, v0 = u.astype(np.int64), v.astype(np.int64)
        au, av = u - u0, v - v0
        img = ((1 - au) * (1 - av) * tex[v0, u0] +
               au * (1 - av) * tex[v0, u0 + 1] +
               (1 - au) * av * tex[v0 + 1, u0] +
               au * av * tex[v0 + 1, u0 + 1])
        Rs.append(R)
        ts.append(t)
        frames.append(img)
    return np.stack(Rs), np.stack(ts), frames


def main():
    Rs, ts, frames = make_scene()
    print(f"rendered {len(frames)} frames of a tilted-plane scene")

    ft, metrics = track_sequence(frames, n_features=80, replace_lost=False)
    full = (np.asarray(ft.val) >= 0).all(axis=0).sum()
    print(f"tracked: {full} features survive all {N_FRAMES} frames")

    rng = np.random.default_rng(3)
    dw = 0.004 * rng.standard_normal((N_FRAMES, 3)).astype(np.float32)
    dw[0] = 0
    R0 = np.asarray(so3_exp(jnp.asarray(dw))) @ Rs
    t0 = ts + 0.02 * rng.standard_normal(ts.shape).astype(np.float32)
    t0[0] = ts[0]
    print(f"initial ATE (aligned): {ate_rmse_aligned(t0, ts) * 1000:.2f} mm")

    out = run_sfm(ft, K, R0.astype(np.float32), t0, n_iters=15,
                  min_track_len=3)
    print(f"BA: cost {out['costs'][0]:.1f} -> {out['costs'][-1]:.1f} over "
          f"{len(out['costs'])} iterations, "
          f"{out['n_observations']} observations")
    print(f"final ATE (aligned): "
          f"{ate_rmse_aligned(out['t'], ts) * 1000:.2f} mm")


if __name__ == "__main__":
    main()
