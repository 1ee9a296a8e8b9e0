"""Do the config-3 affine stragglers persist frame-to-frame?

If yes, ordering tiles by the PREVIOUS frame's GN iteration count
clusters stragglers into few tiles — predicted tile work is computed
below with exactly that (one-frame-stale) predictor.

Run: PFT_PALLAS_LK=vec PFT_PALLAS=1 PFT_PALLAS_AFFINE=vec \
    PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/probe_affine_persistence.py
"""
import json

import numpy as np
import jax
import jax.numpy as jnp

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.features import KLT_TRACKED, create_feature_list
from pyfeaturetrack_tpu.models.tracker import KLTTrackFeatures
from pyfeaturetrack_tpu.ops.affine import make_affine_state
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
    from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                              track_features_pyramids)
    fl_before = state["fl"]
    i = state["i"]
    pyr1 = (state["cache"] if state["cache"] is not None
            else build_track_pyramids(jnp.asarray(frames[i % 4]), cfg))
    pyr2 = build_track_pyramids(jnp.asarray(frames[(i + 1) % 4]), cfg)
    state["fl"], state["cache"] = KLTTrackFeatures(
        cfg, frames[i % 4], frames[(i + 1) % 4], fl_before,
        pyramid_last=state["cache"])
    state["i"] += 1
    nx, ny, nval = track_features_pyramids(
        pyr1, pyr2, fl_before.x, fl_before.y, fl_before.val, cfg)
    return fl_before, (nx, ny, nval), pyr2


for _ in range(4):
    step()
jax.block_until_ready(state["fl"].x)

prev_nit = None
nit_hist = []
rows = []
tot_pred, tot_unsorted, tot_oracle = 0, 0, 0
FC = 16
for _ in range(n_calls):
    fl_before, (nx, ny, nval), pyr2 = step()
    aff = fl_before.aff if fl_before.aff is not None else \
        make_affine_state(n, cfg)
    tracked = nval == KLT_TRACKED
    lost = (fl_before.val >= 0) & ~tracked
    valid = aff.valid & ~lost
    check = tracked & valid
    *_, nit = vec_affine_track_batch_with_iters(
        aff.img, pyr2.img[0], pyr2.gradx[0], pyr2.grady[0],
        nx, ny, aff.A, check, cfg)
    nit = np.where(np.asarray(check), np.asarray(nit), 0)

    def tile_work(order):
        pad = -(-n // FC) * FC
        t = np.pad(nit[order], (0, pad - len(order))).reshape(-1, FC)
        return int((t.max(axis=1) * FC).sum())

    unsorted = tile_work(np.arange(n))
    oracle = tile_work(np.argsort(-nit, kind="stable"))
    if prev_nit is not None:
        pred = tile_work(np.argsort(-prev_nit, kind="stable"))
        cap_now = set(np.flatnonzero(nit >= 10))
        cap_prev = set(np.flatnonzero(prev_nit >= 10))
        ov = (len(cap_now & cap_prev) / max(1, len(cap_now)))
        rows.append({"unsorted": unsorted, "prev_sorted": pred,
                     "oracle_sorted": oracle,
                     "cap_overlap": round(ov, 2),
                     "n_cap": len(cap_now)})
        tot_pred += pred
        tot_unsorted += unsorted
        tot_oracle += oracle
    nit_hist.append(nit)
    prev_nit = nit

print(json.dumps(rows, indent=1))
np.save("/tmp/affine_nit_hist.npy", np.stack(nit_hist))
print(json.dumps({"sum_unsorted": tot_unsorted,
                  "sum_prev_sorted": tot_pred,
                  "sum_oracle_sorted": tot_oracle,
                  "speedup_prev": round(tot_unsorted / max(tot_pred, 1),
                                        2)}))
