"""Straggler anatomy of the config-3 vec affine kernel.

Replicates bench.bench_config3_trace's 16-call window and, at each
frame, re-runs the affine stage through
vec_affine_track_batch_with_iters to read per-lane GN iteration
counts. Reports, per frame and summed:
  * sum(nit)                 — ideal compacted work (lane-iterations)
  * sum_tiles fc*max(nit)    — what the tile-synchronous kernel pays
  * for fc in {8, 16, 32}    — tile-size sensitivity
The ratio tile/ideal is the straggler waste VERDICT r4 item 1/2 names.

Run: PFT_PALLAS_LK=vec PFT_PALLAS=1 PFT_PALLAS_AFFINE=vec \
    PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/probe_affine_iters.py
"""
import json

import numpy as np
import jax
import jax.numpy as jnp

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.features import KLT_TRACKED, create_feature_list
from pyfeaturetrack_tpu.models.tracker import KLTTrackFeatures
from pyfeaturetrack_tpu.ops.affine import make_affine_state
from pyfeaturetrack_tpu.ops.interp import gather_window
from pyfeaturetrack_tpu.ops.pallas_affine_vec import (
    vec_affine_track_batch_with_iters)
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


def step():
    """One KLTTrackFeatures step; returns (fl_before, fl_after_track,
    pyr1, pyr2) reconstructed so the affine stage can be re-run."""
    from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                              track_features_pyramids)
    fl_before = state["fl"]
    i = state["i"]
    img1 = jnp.asarray(frames[i % 4])
    img2 = jnp.asarray(frames[(i + 1) % 4])
    pyr1 = (state["cache"] if state["cache"] is not None
            else build_track_pyramids(img1, cfg))
    pyr2 = build_track_pyramids(img2, cfg)
    state["fl"], state["cache"] = KLTTrackFeatures(
        cfg, frames[i % 4], frames[(i + 1) % 4], fl_before,
        pyramid_last=state["cache"])
    state["i"] += 1
    nx, ny, nval = track_features_pyramids(
        pyr1, pyr2, fl_before.x, fl_before.y, fl_before.val, cfg)
    return fl_before, (nx, ny, nval), pyr1, pyr2


for _ in range(4):
    step()
jax.block_until_ready(state["fl"].x)

hw, hh = cfg.affine_window_width // 2, cfg.affine_window_height // 2
tot = {8: 0, 16: 0, 32: 0}
ideal = 0
frames_out = []
for _ in range(n_calls):
    fl_before, (nx, ny, nval), pyr1, pyr2 = step()
    aff = fl_before.aff
    if aff is None:
        aff = make_affine_state(n, cfg)
    tracked = nval == KLT_TRACKED
    lost = (fl_before.val >= 0) & ~tracked
    valid = aff.valid & ~lost
    need_capture = tracked & ~valid
    check = tracked & valid & ~need_capture
    *_, nit = vec_affine_track_batch_with_iters(
        aff.img, pyr2.img[0], pyr2.gradx[0], pyr2.grady[0],
        nx, ny, aff.A, check, cfg)
    nit = np.asarray(nit)
    checkh = np.asarray(check)
    nit = np.where(checkh, nit, 0)
    row = {"n_check": int(checkh.sum()), "sum_nit": int(nit.sum()),
           "max_nit": int(nit.max()),
           "hist": np.bincount(nit[checkh], minlength=11)[:11].tolist()}
    for fc in (8, 16, 32):
        pad = -(-n // fc) * fc
        tiles = np.pad(nit, (0, pad - n)).reshape(-1, fc)
        row[f"tile_work_fc{fc}"] = int((tiles.max(axis=1) * fc).sum())
        tot[fc] += row[f"tile_work_fc{fc}"]
    ideal += row["sum_nit"]
    frames_out.append(row)

print(json.dumps(frames_out, indent=1))
print(json.dumps({"ideal_lane_iters": ideal,
                  **{f"tile_lane_iters_fc{fc}": tot[fc] for fc in tot},
                  **{f"waste_fc{fc}": round(tot[fc] / max(ideal, 1), 2)
                     for fc in tot}}))
