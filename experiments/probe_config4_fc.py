"""Config-4 tile-size scan: 1080p level-0 (HBM-images mode) honest
clock at fc in {16, 32, 64}. fc trades per-tile fixed cost (fewer
tiles) against straggler waste (each tile iterates to its slowest
lane); HBM mode has no VMEM-image pressure, so fc=64 is admissible
there.

Run: PYTHONPATH=/root/repo python experiments/probe_config4_fc.py
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

h, w, n = 1088, 1920, 4096
cfg = create_config().replace(nPyramidLevels=4, subsampling=2)
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
x = jnp.asarray(rng.uniform(20, w - 21, n), jnp.float32)
y = jnp.asarray(rng.uniform(20, h - 21, n), jnp.float32)
act = jnp.ones((n,), bool)
args = (x, y, x, y, s1, gx1, gy1, s2, gx2, gy2)

out = {}
for fc in (16, 32, 64):
    try:
        fn = jax.jit(functools.partial(vec_track_level, cfg=cfg, fc=fc,
                                       force_hbm=True))
        r = fn(*args, active=act)
        jax.block_until_ready(r)
        tr = capture_device_trace(
            lambda: jax.block_until_ready(fn(*args, active=act)),
            n_calls=3)
        stale = float(np.asarray(r[4]).mean())
        out[f"fc{fc}"] = {"per_call_ms": tr["per_call_ms"],
                          "stale_frac": round(stale, 4)}
    except Exception as e:
        out[f"fc{fc}"] = str(e)[:200]
print(json.dumps(out, indent=1))
