"""Honest-clock breakdown of the config-2 device-resident step
(track + cond-gated refill), vec LK lane.

Run: PFT_PALLAS_LK=vec PFT_PALLAS=1 PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/probe_config2_breakdown.py
"""
import collections
import glob
import gzip
import json
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.models.device_sequence import (
    select_step_device, sequence_step_device)
from pyfeaturetrack_tpu.utils.traceview import capture_device_trace

h, w, n_features = 480, 640, 1000
cfg = create_config().replace(sequentialMode=True).validated_window()
rng = np.random.default_rng(4)
base = np.floor(rng.uniform(0, 255, (h, w))).astype(np.float32)
k = np.array([1.0, 4, 6, 4, 1]) / 16.0
for axis in (0, 1):
    base = np.apply_along_axis(
        lambda m: np.convolve(m, k, mode="same"), axis, base)
n_cycle = 16
cyc = [jnp.asarray(np.roll(base, 2 * i, axis=1)) for i in range(n_cycle)]
frames = cyc + cyc[-2:0:-1]

pyr, x, y, val, _, _ = select_step_device(frames[0], cfg, n_features)
for i in range(1, 3):
    pyr, x, y, val, *_ = sequence_step_device(
        pyr, frames[i], x, y, val, cfg, True)
jax.block_until_ready(val)

state = {"pyr": pyr, "x": x, "y": y, "val": val, "i": 3}


def one():
    s = state
    s["pyr"], s["x"], s["y"], s["val"], *_ = sequence_step_device(
        s["pyr"], frames[s["i"] % len(frames)], s["x"], s["y"],
        s["val"], cfg, True)
    s["i"] += 1
    return s["val"]


d = tempfile.mkdtemp(prefix="pft_cfg2_")
r = capture_device_trace(one, n_calls=6, trace_dir=d)
print(json.dumps(r, indent=1, default=str))

files = sorted(glob.glob(d + "/**/*.trace.json.gz", recursive=True))
with gzip.open(files[-1], "rt") as f:
    tr = json.load(f)
ev = tr.get("traceEvents", [])
lanes = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        lanes[e["pid"]] = e["args"].get("name", "")
device_pids = {p for p, name in lanes.items()
               if "TPU" in name or "device" in name.lower()}
by = collections.Counter()
for e in ev:
    if (e.get("ph") == "X" and e.get("pid") in device_pids
            and not e["name"].startswith("jit_")):
        by[e["name"]] += float(e.get("dur", 0.0))
print("\nFULL CENSUS (us total over 6 calls):")
for kk, v in by.most_common(40):
    print(f"{v:10.0f}  {kk}")
