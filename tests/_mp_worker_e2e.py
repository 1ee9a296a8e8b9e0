"""Worker for the 4-process chunk-and-stitch e2e test (run via
subprocess from test_multiprocess.py — NOT collected by pytest).

Each of the 4 processes brings up jax.distributed over CPU (2 virtual
local devices, 8 global), tracks ONLY its assigned chunks of a shared
synthetic sequence, all-gathers the per-chunk tables, stitches the
global table, and compares it bit-for-bit against the single-process
track_sequence_chunked result computed locally (same math, so exact).
"""

import hashlib
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def _frames(n_frames=9, h=64, w=96):
    rng = np.random.default_rng(5)
    base = np.zeros((h + 16, w + 16))
    yy, xx = np.mgrid[0:h + 16, 0:w + 16]
    for _ in range(60):
        cx, cy = rng.uniform(4, w + 12), rng.uniform(4, h + 12)
        base += rng.uniform(30, 80) * np.exp(
            -((xx - cx) ** 2 + (yy - cy) ** 2) / rng.uniform(3, 12))
    base = np.clip(base, 0, 255)[:h, :w]
    # pure 1 px/frame horizontal roll: content never leaves the view,
    # so the last frame still holds most tracks (the assertions below
    # need live features, not a survival stress test)
    return [np.floor(np.roll(base, i, axis=1)).astype(np.float64)
            for i in range(n_frames)]


def main(port: str, pid: int, nprocs: int, out_path: str) -> int:
    from pyfeaturetrack_tpu.models.chunked import track_sequence_chunked
    from pyfeaturetrack_tpu.parallel.multihost import (
        initialize_cluster, track_sequence_multiprocess)

    info = initialize_cluster(coordinator_address=f"localhost:{port}",
                              num_processes=nprocs, process_id=pid)
    assert info["process_count"] == nprocs, info

    from pyfeaturetrack_tpu.config import create_config

    frames = _frames()
    cfg = create_config(mindist=5)  # the 64x96 scene seats 20 at md=5
    n_feat, n_chunks = 20, 5  # 5 chunks over 4 procs: uneven pad path
    table, col_ids = track_sequence_multiprocess(
        frames, cfg=cfg, n_features=n_feat, n_chunks=n_chunks)

    # single-process reference (identical per-chunk math -> exact)
    ref, ref_ids, _ = track_sequence_chunked(
        frames, cfg=cfg, n_features=n_feat, n_chunks=n_chunks)
    np.testing.assert_array_equal(table["val"], ref["val"])
    np.testing.assert_array_equal(table["x"], ref["x"])
    np.testing.assert_array_equal(table["y"], ref["y"])
    for a, b in zip(col_ids, ref_ids):
        np.testing.assert_array_equal(a, b)

    digest = hashlib.sha256(
        table["x"].tobytes() + table["y"].tobytes()
        + table["val"].tobytes()).hexdigest()
    live_last = int((table["val"][-1] >= 0).sum())
    with open(out_path, "w") as f:
        json.dump({"ok": True, "pid": pid, "digest": digest,
                   "n_tracks": int(table["val"].shape[1]),
                   "live_last": live_last}, f)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                  sys.argv[4]))
