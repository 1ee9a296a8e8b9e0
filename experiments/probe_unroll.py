"""fc x unroll scan for the vec LK level: attacks the measured
per-TRIP floor (DESIGN.md §8) within the Mosaic VMEM-stack bound
(transients scale with fc x unroll).

Run: PYTHONPATH=/root/repo python experiments/probe_unroll.py
"""
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.ops.convolve import (compute_gradients,
                                             compute_smoothed_image)
from pyfeaturetrack_tpu.ops.pallas_lk_vec import vec_track_level
from pyfeaturetrack_tpu.utils.traceview import capture_device_trace

h, w, n = 480, 640, 1000
cfg = create_config()
rng = np.random.default_rng(0)
base = rng.uniform(0, 255, (h + 8, w + 8))
k = np.array([1.0, 4, 6, 4, 1]) / 16.0
for ax in (0, 1):
    base = np.apply_along_axis(
        lambda m: np.convolve(m, k, mode="same"), ax, base)
base = base.astype(np.float32)
img1 = jnp.asarray(base[:h, :w])
img2 = jnp.asarray(base[2:h + 2, 2:w + 2])
s1 = compute_smoothed_image(img1, cfg.smooth_sigma)
s2 = compute_smoothed_image(img2, cfg.smooth_sigma)
gx1, gy1 = compute_gradients(s1, cfg.grad_sigma)
gx2, gy2 = compute_gradients(s2, cfg.grad_sigma)
x = jnp.asarray(rng.uniform(12, w - 13, n), jnp.float32)
y = jnp.asarray(rng.uniform(12, h - 13, n), jnp.float32)
act = jnp.ones((n,), bool)
args = (x, y, x, y, s1, gx1, gy1, s2, gx2, gy2)

out = {}
for fc, unroll in ((32, 1), (16, 1), (16, 2), (8, 2), (8, 4), (32, 2)):
    try:
        fn = jax.jit(functools.partial(vec_track_level, cfg=cfg, fc=fc,
                                       unroll=unroll))
        r = fn(*args, active=act)
        jax.block_until_ready(r)
        tr = capture_device_trace(
            lambda: jax.block_until_ready(fn(*args, active=act)),
            n_calls=4)
        out[f"fc{fc}_u{unroll}"] = tr["per_call_ms"]
    except Exception as e:
        out[f"fc{fc}_u{unroll}"] = str(e)[:120]
print(json.dumps(out, indent=1))
