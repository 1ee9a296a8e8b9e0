"""Tracking with the full affine consistency check.

Reference parity: example5 of the KLT C lineage (SURVEY.md section 2.1) —
affineConsistencyCheck = 2 (6-parameter warp verification against each
feature's first-frame template). This is BASELINE.md config 3's shape.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyfeaturetrack_tpu as pft  # noqa: E402
from pyfeaturetrack_tpu.utils.io import pgm_read  # noqa: E402
from pyfeaturetrack_tpu.utils.viz import write_feature_list_to_ppm  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def main(out_dir="."):
    if not os.path.exists(os.path.join(DATA, "img0.pgm")):
        import gen_data
        gen_data.main()

    frames = [pgm_read(os.path.join(DATA, f"img{i}.pgm")) for i in range(4)]

    tc = pft.KLTCreateTrackingContext(affineConsistencyCheck=2,
                                      sequentialMode=True)
    tracker = pft.Tracker(tc)
    fl = tracker.select(frames[0], 100)
    print(f"selected {pft.KLTCountRemainingFeatures(fl)} features")

    for i in range(1, len(frames)):
        fl = tracker.track(frames[i], fl)
        n_valid = int(fl.aff.valid.sum()) if fl.aff is not None else 0
        print(f"frame {i}: {pft.KLTCountRemainingFeatures(fl)} live, "
              f"{n_valid} affine templates held")
        write_feature_list_to_ppm(
            fl, frames[i], os.path.join(out_dir, f"afffeat{i}.ppm"))


if __name__ == "__main__":
    main()
