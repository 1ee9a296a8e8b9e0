"""Example 11: dense metric depth maps from a rectified stereo pair.

Beyond-reference demo (the reference is monocular sparse tracking):
renders a two-plane scene into a rectified left/right pair, runs the
dense 1-D KLT disparity matcher with the left-right occlusion gate
(ops/disparity.py), and reports recovered metric depths per plane.

Run from any directory: python example11_depth.py [outdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyfeaturetrack_tpu.ops.disparity import dense_depth  # noqa: E402
from pyfeaturetrack_tpu.utils.io import ppm_write  # noqa: E402

FX = 200.0
BASELINE = 0.4
H, W = 120, 200


def make_pair():
    """Rectified pair of two fronto-parallel textured planes: background
    at depth fx*B/4 = 20 units (d=4), a raised box at fx*B/16 = 5 units
    (d=16), composited with real visibility (the band left of the box is
    occluded in the right view)."""
    rng = np.random.default_rng(11)

    def tex(seed):
        img = np.random.default_rng(seed).uniform(0, 255, (H, W + 32))
        k = np.array([1.0, 4, 6, 4, 1]) / 16.0
        for axis in (0, 1):
            img = np.apply_along_axis(
                lambda m: np.convolve(m, k, mode="same"), axis, img)
        return img

    B, F = tex(1), tex(2)
    xs = np.arange(W)[None, :]
    ys = np.arange(H)[:, None]
    b0, b1, y0, y1 = 70, 150, 30, 90
    in_box_r = (xs >= b0) & (xs < b1) & (ys >= y0) & (ys < y1)
    right = np.where(in_box_r, F[:, 16:W + 16], B[:, 4:W + 4])
    in_box_l = (xs >= b0 + 16) & (xs < b1 + 16) & (ys >= y0) & (ys < y1)
    left = np.where(in_box_l, F[:, :W], B[:, :W])
    return left, right, (b0, b1, y0, y1)


def main(outdir="."):
    left, right, (b0, b1, y0, y1) = make_pair()
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    depth, disp, valid = dense_depth(left, right, K, BASELINE,
                                     max_disparity=24.0)

    bg = np.zeros_like(valid)
    bg[10:-10, 10:b0] = True
    box = np.zeros_like(valid)
    box[y0 + 8:y1 - 8, b0 + 24:b1 + 8] = True
    print(f"valid pixels: {100 * valid.mean():.1f}%")
    print(f"background depth: {np.median(depth[bg & valid]):.2f} "
          f"(true {FX * BASELINE / 4:.2f})")
    print(f"box depth:        {np.median(depth[box & valid]):.2f} "
          f"(true {FX * BASELINE / 16:.2f})")
    occ = np.zeros_like(valid)
    occ[y0 + 8:y1 - 8, b0 + 5:b0 + 15] = True
    print(f"occlusion band flagged invalid: "
          f"{100 * (1 - valid[occ].mean()):.1f}%")

    g = np.where(valid, disp, 0.0) / 24.0
    g8 = (np.clip(g, 0, 1) * 255).astype(np.uint8)
    out = os.path.join(outdir, "disparity.ppm")
    ppm_write(out, np.stack([g8, g8, g8], -1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
