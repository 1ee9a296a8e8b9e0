"""Example 14: long-horizon loop closure under exposure drift.

Drives the round-5 config-5 stress end-to-end: a closed-circuit camera
path (utils/synthscene.circuit_scene) whose lap brings the camera back
into mapped territory, rendered with slowly drifting exposure
gain/bias, tracked by the robust (lighting-insensitive + FB-gated)
monocular VO with appearance-gated loop closure and the Sim(3)
geodesic drift correction (sfm/loop.close_loop_sim3).

Beyond-reference capability (SURVEY.md north star: KITTI-style
sequences with drift correction); the tracking core underneath is the
reference-parity KLT.

Run: PYTHONPATH=. python examples/example14_loop_closure.py [outdir]
"""
import json
import os
import sys


def main(outdir=".", n_frames=260):
    import numpy as np

    from pyfeaturetrack_tpu.sfm import VisualOdometry
    from pyfeaturetrack_tpu.sfm.pipeline import ate_rmse_aligned
    from pyfeaturetrack_tpu.utils.synthscene import (
        apply_photometric_drift, circuit_scene, render_blobs)
    from pyfeaturetrack_tpu.utils.trajectory import write_kitti

    K, Rs, ts, cs, pts = circuit_scene(n_frames, 240, 320)
    frames = apply_photometric_drift(render_blobs(K, Rs, ts, pts, 240,
                                                  320))
    vo = VisualOdometry(K, n_features=120, kf_every=4, window=6,
                        min_parallax_px=10.0, robust=True,
                        loop_closure=True, loop_min_gap=25,
                        loop_radius=8.0)
    for f in frames:
        vo.feed(f)
    fi, R, t, c = vo.trajectory()
    gt_c = cs[fi]
    travel = float(np.linalg.norm(np.diff(gt_c, axis=0), axis=1).sum())
    ate_pct = 100.0 * float(ate_rmse_aligned(c, gt_c)) / travel
    out = {"n_frames": n_frames, "keyframes": len(fi),
           "loop_closures": len(vo.loops_closed),
           "ate_pct_travel": round(ate_pct, 3),
           "events_tail": vo.events[-2:]}
    print(json.dumps(out, indent=1))
    assert len(vo.loops_closed) >= 1, "revisit was not closed"
    assert ate_pct < 1.5

    write_kitti(os.path.join(outdir, "circuit_est.kitti"),
                np.asarray(R), np.asarray(t))
    write_kitti(os.path.join(outdir, "circuit_gt.kitti"),
                np.asarray(Rs)[fi], np.asarray(ts)[fi])
    print(f"closed loops: {vo.loops_closed}; trajectories written to "
          f"{outdir}/circuit_{{est,gt}}.kitti")
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
