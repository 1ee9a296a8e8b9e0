"""Phase split of the vectorized affine kernel on the honest clock.

Scans affine_max_iterations (the GN loop trip budget) and fc (tile
size): the slope over iterations is the per-iteration vector cost, the
intercept is fetch + post-loop; fc tells whether the kernel is
issue-bound or total-work-bound at this tile size.

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/probe_affine_vec_phases.py
"""
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.ops.convolve import (compute_gradients,
                                             compute_smoothed_image)
from pyfeaturetrack_tpu.ops.interp import gather_window
from pyfeaturetrack_tpu.ops.pallas_affine_vec import vec_affine_track_batch
from pyfeaturetrack_tpu.utils.traceview import capture_device_trace

h, w, n = 480, 640, 1000
rng = np.random.default_rng(0)
base = rng.uniform(0, 255, (h + 8, w + 8)).astype(np.float32)
k = np.array([1.0, 4, 6, 4, 1], np.float32) / 16.0
for axis in (0, 1):
    base = np.apply_along_axis(
        lambda m: np.convolve(m, k, mode="same"), axis, base)
cfg0 = create_config(affineConsistencyCheck=2)
img1 = jnp.asarray(base[:h, :w])
img2 = jnp.asarray(base[1:h + 1, 2:w + 2])
s1 = compute_smoothed_image(img1, cfg0.smooth_sigma)
s2 = compute_smoothed_image(img2, cfg0.smooth_sigma)
gx2, gy2 = compute_gradients(s2, cfg0.grad_sigma)
hw, hh = cfg0.affine_window_width // 2, cfg0.affine_window_height // 2
b = max(hw, hh) + 2
x = jnp.asarray(rng.uniform(b, w - b - 1, n), jnp.float32)
y = jnp.asarray(rng.uniform(b, h - b - 1, n), jnp.float32)
tmpl = gather_window(s1, x, y, hw, hh)
A0 = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (n, 2, 2))
check = jnp.ones((n,), bool)
args = (tmpl, s2, gx2, gy2, x + 2.0, y + 1.0, A0, check)

out = {}
for mi in (1, 4, 10):
    for fc in (8, 16, 32):
        cfg = cfg0.replace(affine_max_iterations=mi)
        try:
            fn = jax.jit(functools.partial(vec_affine_track_batch,
                                           cfg=cfg, fc=fc))
            r = fn(*args)
            jax.block_until_ready(r)
            tr = capture_device_trace(
                lambda: jax.block_until_ready(fn(*args)), n_calls=3)
            out[f"mi{mi}_fc{fc}"] = tr["per_call_ms"]
        except Exception as e:
            out[f"mi{mi}_fc{fc}"] = str(e)[:200]
print(json.dumps(out, indent=1, default=str))
