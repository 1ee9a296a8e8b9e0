"""Scan the vec LK kernel's feature-tile size fc on the honest clock.

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/probe_vec_fc_scan.py
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

cfg = create_config()
h, w, n = 480, 640, 1000
rng = np.random.default_rng(0)
base = rng.uniform(0, 255, (h + 8, w + 8)).astype(np.float32)
img1 = jnp.asarray(base[:h, :w])
img2 = jnp.asarray(base[1:h + 1, 2:w + 2])
s1 = compute_smoothed_image(img1, cfg.smooth_sigma)
s2 = compute_smoothed_image(img2, cfg.smooth_sigma)
gx1, gy1 = compute_gradients(s1, cfg.grad_sigma)
gx2, gy2 = compute_gradients(s2, cfg.grad_sigma)
x = jnp.asarray(rng.uniform(8, w - 9, n), jnp.float32)
y = jnp.asarray(rng.uniform(8, h - 9, n), jnp.float32)
active = jnp.ones((n,), bool)
args = (x, y, x, y, s1, gx1, gy1, s2, gx2, gy2)

out = {}
for fc in (8, 16, 32, 64):
    try:
        fn = jax.jit(functools.partial(vec_track_level, cfg=cfg,
                                       fc=fc))
        r = fn(*args, active=active)
        jax.block_until_ready(r)
        tr = capture_device_trace(
            lambda: jax.block_until_ready(fn(*args, active=active)),
            n_calls=3)
        out[f"fc{fc}"] = {"per_call_ms": tr["per_call_ms"],
                          "top": tr["top_ops"][:2]}
    except Exception as e:
        out[f"fc{fc}"] = {"error": str(e)[:300]}
print(json.dumps(out, indent=1, default=str))
