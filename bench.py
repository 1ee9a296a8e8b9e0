"""Headline benchmark: frames/s tracking 1000 features at 640x480.

BASELINE.md north star: >= 1000 features tracked at >= 500 frames/s on one
TPU chip (config 4-style batched LK throughput). Per-frame work is the
honest sequential-mode cost: build the NEW frame's pyramid + gradients,
then run batched pyramidal LK for all features (the previous frame's
pyramids are the cached carry). Prints ONE JSON line.

Usage: python bench.py [--frames N] [--features N] [--size HxW]
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--features", type=int, default=1000)
    ap.add_argument("--size", type=str, default="480x640")
    ap.add_argument("--warmup", type=int, default=5)
    args = ap.parse_args()
    h, w = map(int, args.size.split("x"))

    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                              track_features_pyramids)

    cfg = create_config()

    @jax.jit
    def frame_step(pyr_prev, img_new, x, y, val):
        pyr_new = build_track_pyramids(img_new, cfg)
        nx, ny, nval = track_features_pyramids(pyr_prev, pyr_new, x, y, val,
                                               cfg)
        return pyr_new, nx, ny, nval

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (h + 8, w + 8))
    k = np.array([1.0, 4, 6, 4, 1]) / 16.0
    for axis in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, base)
    frames = [jnp.asarray(base[i % 4:i % 4 + h, i % 4:i % 4 + w],
                          jnp.float32) for i in range(4)]

    n = args.features
    x = jnp.asarray(rng.uniform(cfg.borderx + 1, w - cfg.borderx - 2, n),
                    jnp.float32)
    y = jnp.asarray(rng.uniform(cfg.bordery + 1, h - cfg.bordery - 2, n),
                    jnp.float32)
    val = jnp.ones((n,), jnp.int32)

    pyr = build_track_pyramids(frames[0], cfg)
    # warmup / compile
    for i in range(args.warmup):
        pyr2, nx, ny, nval = frame_step(pyr, frames[(i + 1) % 4], x, y, val)
    jax.block_until_ready(nval)

    t0 = time.perf_counter()
    cur = pyr
    for i in range(args.frames):
        cur, nx, ny, nval = frame_step(cur, frames[(i + 1) % 4], x, y, val)
    jax.block_until_ready(nval)
    elapsed = time.perf_counter() - t0

    fps = args.frames / elapsed
    print(json.dumps({
        "metric": f"frames_per_s_{n}feat_{h}x{w}",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 500.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
