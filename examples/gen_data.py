"""Generate the bundled 10-frame sample sequence (img0.pgm .. img9.pgm).

The reference ships a real 10-frame greyscale sequence; its repo was
unavailable at build time (SURVEY.md section 0), so the examples run on a
deterministic synthetic stand-in: a textured 320x240 scene under a slow
constant drift, written as binary PGM. Regenerate with
``python examples/gen_data.py``.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyfeaturetrack_tpu.utils.io import pgm_write  # noqa: E402

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
NROWS, NCOLS, NFRAMES = 240, 320, 10
DX, DY = 1.1, -0.7  # per-frame drift in pixels


def make_scene(nrows=NROWS, ncols=NCOLS, seed=12345):
    r = np.random.default_rng(seed)
    pad = 32
    img = r.uniform(0, 255, size=(nrows + 2 * pad, ncols + 2 * pad))
    k = np.array([1.0, 4, 6, 4, 1])
    k /= k.sum()
    for axis in (0, 1):
        img = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, img)
    # add some larger-scale structure so coarse pyramid levels see gradients
    yy, xx = np.mgrid[0:img.shape[0], 0:img.shape[1]]
    img = img + 60 * np.sin(xx / 23.0) * np.cos(yy / 17.0)
    lo, hi = img.min(), img.max()
    return (img - lo) / (hi - lo) * 255.0, pad


def sample_frame(scene, pad, dx, dy):
    nrows, ncols = NROWS, NCOLS
    ys, xs = np.mgrid[0:nrows, 0:ncols].astype(np.float64)
    sx = xs + pad - dx
    sy = ys + pad - dy
    x0, y0 = sx.astype(np.int64), sy.astype(np.int64)
    ax, ay = sx - x0, sy - y0
    return ((1 - ax) * (1 - ay) * scene[y0, x0] +
            ax * (1 - ay) * scene[y0, x0 + 1] +
            (1 - ax) * ay * scene[y0 + 1, x0] +
            ax * ay * scene[y0 + 1, x0 + 1])


def main():
    os.makedirs(HERE, exist_ok=True)
    scene, pad = make_scene()
    for i in range(NFRAMES):
        frame = sample_frame(scene, pad, DX * i, DY * i)
        pgm_write(os.path.join(HERE, f"img{i}.pgm"), np.floor(frame))
    print(f"wrote {NFRAMES} frames to {HERE}")


if __name__ == "__main__":
    main()
