"""Multi-device scaling-efficiency harness.

North-star target (BASELINE.md): >= 80% scaling efficiency at N >= 2
hosts. This harness measures weak scaling of the batched two-frame
tracking step over the ``frame`` mesh axis: each device tracks its own
frame pair (B = n_devices), so perfect scaling keeps wall time flat as
devices double.

On a real slice this measures ICI/compiler overheads; on the virtual CPU
mesh it validates the harness and the sharded program (XLA emulates the
devices on host cores, so reported efficiency is not hardware-meaningful
there — the driver's real-slice run is the number that counts).
"""

from __future__ import annotations

import time

import jax
import numpy as np

from ..config import create_config
from .sharding import make_mesh, track_batch_sharded


def measure_scaling(device_counts=None, image_shape=(240, 320),
                    n_features: int = 256, iters: int = 10,
                    cfg=None) -> dict:
    """Weak-scaling sweep. Returns {n_devices: seconds_per_step} plus
    efficiency relative to the smallest count."""
    if cfg is None:
        cfg = create_config()
    devices = jax.devices()
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32)
                         if d <= len(devices)]

    h, w = image_shape
    rng = np.random.default_rng(0)
    results = {}
    for d in device_counts:
        mesh = make_mesh(n_frame=d, n_feature=1, devices=devices[:d])
        imgs1 = rng.uniform(0, 255, (d, h, w)).astype(np.float32)
        imgs2 = np.roll(imgs1, 1, axis=-1)
        xs = rng.uniform(cfg.borderx + 1, w - cfg.borderx - 2,
                         (d, n_features)).astype(np.float32)
        ys = rng.uniform(cfg.bordery + 1, h - cfg.bordery - 2,
                         (d, n_features)).astype(np.float32)
        vals = np.ones((d, n_features), np.int32)

        with mesh:
            out = track_batch_sharded(imgs1, imgs2, xs, ys, vals, cfg, mesh)
            jax.block_until_ready(out)  # compile
            t0 = time.perf_counter()
            for _ in range(iters):
                out = track_batch_sharded(imgs1, imgs2, xs, ys, vals,
                                          cfg, mesh)
            jax.block_until_ready(out)
            results[d] = (time.perf_counter() - t0) / iters

    base = device_counts[0]
    efficiency = {d: results[base] / results[d] for d in device_counts}
    return {"seconds_per_step": results, "efficiency_vs_smallest": efficiency,
            "device_counts": device_counts}
