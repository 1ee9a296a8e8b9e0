"""Per-op breakdown of the headline frame step (vec LK lane).

Run: PFT_PALLAS_LK=vec PFT_PALLAS=1 PYTHONPATH=/root/repo python \
    experiments/probe_frame_breakdown.py
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                          track_features_pyramids)
from pyfeaturetrack_tpu.utils.traceview import capture_device_trace

h, w, n_features = 480, 640, 1000
cfg = create_config()


@jax.jit
def frame_step(pyr_prev, img_new, x, y, val):
    pyr_new = build_track_pyramids(img_new, cfg)
    return pyr_new, track_features_pyramids(pyr_prev, pyr_new, x, y,
                                            val, cfg)


rng = np.random.default_rng(0)
base = np.floor(np.clip(
    np.cumsum(np.cumsum(rng.normal(size=(h + 8, w + 8)), 0), 1)
    % 255, 0, 255)).astype(np.float32)
frames = [jnp.asarray(base[i:i + h, i:i + w]) for i in range(4)]
x = jnp.asarray(rng.uniform(cfg.borderx + 1, w - cfg.borderx - 2,
                            n_features), jnp.float32)
y = jnp.asarray(rng.uniform(cfg.bordery + 1, h - cfg.bordery - 2,
                            n_features), jnp.float32)
val = jnp.ones((n_features,), jnp.int32)
pyr = jax.jit(build_track_pyramids, static_argnames=("cfg",))(
    frames[0], cfg)
p2, out = frame_step(pyr, frames[1], x, y, val)
jax.block_until_ready(out)

state = {"cur": pyr, "i": 0}


def one():
    state["i"] += 1
    state["cur"], o = frame_step(state["cur"],
                                 frames[state["i"] % 4], x, y, val)
    return o


import tempfile

from pyfeaturetrack_tpu.utils import traceview

d = tempfile.mkdtemp(prefix="pft_frame_")
r = capture_device_trace(one, n_calls=4, trace_dir=d)
print(json.dumps(r, indent=1, default=str))

# full op census (not just top-8), device lane only
import collections
import glob
import gzip
import os

files = sorted(glob.glob(os.path.join(d, "**", "*.trace.json.gz"),
                         recursive=True))
with gzip.open(files[-1], "rt") as f:
    tr = json.load(f)
ev = tr.get("traceEvents", [])
lanes = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        lanes[e["pid"]] = e["args"].get("name", "")
device_pids = {p for p, name in lanes.items()
               if "TPU" in name or "GPU" in name
               or "device" in name.lower()}
by = collections.Counter()
for e in ev:
    if (e.get("ph") == "X" and e.get("pid") in device_pids
            and not e["name"].startswith("jit_")):
        by[e["name"]] += float(e.get("dur", 0.0))
print("\nFULL CENSUS (us total over 4 calls):")
for k, v in by.most_common(60):
    print(f"{v:10.0f}  {k}")

