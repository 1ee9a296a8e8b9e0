"""Read a feature table back and manipulate it.

Reference parity: example4 of the KLT C lineage (SURVEY.md section 2.1) —
read features.ft, extract a frame's feature list, inspect trajectories.
Run example3.py first (this script runs it automatically if needed).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyfeaturetrack_tpu as pft  # noqa: E402
from pyfeaturetrack_tpu.utils.io import (read_feature_table,  # noqa: E402
                                         write_feature_list)


def main(out_dir="."):
    table_path = os.path.join(out_dir, "features.ft")
    if not os.path.exists(table_path):
        import example3
        example3.main(out_dir)

    ft = read_feature_table(table_path)
    print(f"table: {ft.nFrames} frames x {ft.nFeatures} features")

    fl = pft.KLTExtractFeatureList(ft, 1)
    print(f"frame 1: {pft.KLTCountRemainingFeatures(fl)} live features")
    write_feature_list(fl, os.path.join(out_dir, "feat1_from_table.txt"),
                       fmt="%5.1f")

    val = np.asarray(ft.val)
    full_tracks = (val >= 0).all(axis=0)
    print(f"{int(full_tracks.sum())} features survive all "
          f"{ft.nFrames} frames")
    x = np.asarray(ft.x)[:, full_tracks]
    y = np.asarray(ft.y)[:, full_tracks]
    if full_tracks.any():
        dx = np.median(np.diff(x, axis=0))
        dy = np.median(np.diff(y, axis=0))
        print(f"median per-frame flow of full tracks: ({dx:+.2f}, {dy:+.2f})")


if __name__ == "__main__":
    main()
