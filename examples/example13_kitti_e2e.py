"""Config-5 end-to-end demo: a 120-frame KITTI-style corridor through
the complete front-end — tracking, bootstrap, localization,
triangulation, windowed BA — with trajectory export in KITTI odometry
format and drift metrics (ATE + RPE) against the exact synthetic
ground truth.

Beyond the reference (no SfM layer there): this is the workload
BASELINE.md config 5 names, at a length where feature churn, scale
re-anchoring, and map growth all matter (the short demos never leave
the first landmark neighbourhood).

Run: PYTHONPATH=/root/repo python examples/example13_kitti_e2e.py [outdir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main(outdir="."):
    from pyfeaturetrack_tpu.utils.synthscene import (corridor_scene,
                                                     render_blobs)
    from pyfeaturetrack_tpu.sfm import VisualOdometry
    from pyfeaturetrack_tpu.sfm.pipeline import ate_rmse_aligned
    from pyfeaturetrack_tpu.utils.trajectory import rpe, write_kitti

    n_frames = 120
    K, Rs, ts, cs, pts = corridor_scene(n_frames=n_frames)
    frames = render_blobs(K, Rs, ts, pts, 240, 320)
    vo = VisualOdometry(K, n_features=120, kf_every=2, window=6,
                        min_parallax_px=10.0)
    for f in frames:
        vo.feed(f)
    fi, R, t, c = vo.trajectory()
    gt_c = cs[fi]
    travel = float(np.linalg.norm(np.diff(gt_c, axis=0), axis=1).sum())
    ate = float(ate_rmse_aligned(c, gt_c))
    est_len = float(np.linalg.norm(np.diff(c, axis=0), axis=1).sum())
    s = travel / max(est_len, 1e-9)
    te, re = rpe(np.asarray(R, np.float64),
                 np.asarray(t, np.float64) * s,
                 np.asarray(Rs, np.float64)[fi],
                 np.asarray(ts, np.float64)[fi])
    est_path = os.path.join(outdir, "corridor_est.kitti")
    gt_path = os.path.join(outdir, "corridor_gt.kitti")
    write_kitti(est_path, np.asarray(R), np.asarray(t) * s)
    write_kitti(gt_path, np.asarray(Rs)[fi], np.asarray(ts)[fi])
    out = {
        "frames": n_frames,
        "keyframes": len(fi),
        "landmarks": int(len(vo.map_points())),
        "travel_units": round(travel, 2),
        "ate_pct_travel": round(100 * ate / travel, 3),
        "rpe_trans_median_units": round(float(np.median(te)), 4),
        "rpe_rot_median_deg": round(
            float(np.degrees(np.median(re))), 4),
        "trajectories": [est_path, gt_path],
    }
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
