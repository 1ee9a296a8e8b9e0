"""Op breakdown of the BENCH config-3 lane (same frames/warm/16-call
window as bench.bench_config3_trace) — where do the 3.9 ms/frame go?

Run: PFT_PALLAS_LK=vec PFT_PALLAS=1 PFT_PALLAS_AFFINE=vec \
    PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/probe_config3_window.py
"""
import collections
import glob
import gzip
import json
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.features import create_feature_list
from pyfeaturetrack_tpu.models.tracker import KLTTrackFeatures
from pyfeaturetrack_tpu.utils.traceview import capture_device_trace
import bench

h, w, n, n_calls = 480, 640, 1000, 16
cfg = create_config(affineConsistencyCheck=2, sequentialMode=True)
base = bench._textured(h, w, seed=2)
frames = [np.asarray(base[i:i + h, i:i + w], np.float32)
          for i in range(4)]
rng = np.random.default_rng(0)
fl = create_feature_list(n, with_affine=True)
fl = fl._replace(
    x=jnp.asarray(rng.uniform(40, w - 40, n), jnp.float32),
    y=jnp.asarray(rng.uniform(40, h - 40, n), jnp.float32),
    val=jnp.zeros((n,), jnp.int32))
state = {"fl": fl, "cache": None, "i": 0}
for _ in range(4):
    state["fl"], state["cache"] = KLTTrackFeatures(
        cfg, frames[state["i"] % 4], frames[(state["i"] + 1) % 4],
        state["fl"], pyramid_last=state["cache"])
    state["i"] += 1
jax.block_until_ready(state["fl"].x)


def one():
    state["fl"], state["cache"] = KLTTrackFeatures(
        cfg, frames[state["i"] % 4], frames[(state["i"] + 1) % 4],
        state["fl"], pyramid_last=state["cache"])
    state["i"] += 1
    return state["fl"].x


d = tempfile.mkdtemp(prefix="pft_cfg3w_")
r = capture_device_trace(one, n_calls=n_calls, trace_dir=d)
print(json.dumps({k: r[k] for k in ("per_call_ms", "ops_per_call")}))

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
cnt = collections.Counter()
for e in ev:
    if (e.get("ph") == "X" and e.get("pid") in device_pids
            and not e["name"].startswith("jit_")):
        by[e["name"]] += float(e.get("dur", 0.0))
        cnt[e["name"]] += 1
print(f"\nTOP OPS (us total over {n_calls} calls; count):")
for kk, v in by.most_common(30):
    print(f"{v:10.0f}  {cnt[kk]:5d}  {kk}")
