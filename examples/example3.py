"""10-frame sequential tracking with a feature table.

Reference parity: example3.py (SURVEY.md section 3.5) — sequentialMode
tracking of 150 features through img0..img9.pgm with lost-feature
replacement, per-frame overlays, and text+binary feature-table output.
This is BASELINE.md config 2.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyfeaturetrack_tpu as pft  # noqa: E402
from pyfeaturetrack_tpu.models.sequence import track_sequence  # noqa: E402
from pyfeaturetrack_tpu.utils.io import (pgm_read,  # noqa: E402
                                         write_feature_table)
from pyfeaturetrack_tpu.utils.viz import write_feature_list_to_ppm  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
N_FEATURES = 150
N_FRAMES = 10


def main(out_dir="."):
    if not os.path.exists(os.path.join(DATA, "img0.pgm")):
        import gen_data
        gen_data.main()

    frames = [pgm_read(os.path.join(DATA, f"img{i}.pgm"))
              for i in range(N_FRAMES)]

    tc = pft.KLTCreateTrackingContext(sequentialMode=True)

    def on_frame(i, fl):
        write_feature_list_to_ppm(
            fl, frames[i], os.path.join(out_dir, f"feat{i}.ppm"))
        print(f"frame {i}: {pft.KLTCountRemainingFeatures(fl)} live")

    ft, metrics = track_sequence(frames, cfg=tc, n_features=N_FEATURES,
                                 replace_lost=True, on_frame=on_frame)

    write_feature_table(ft, os.path.join(out_dir, "features.txt"), fmt="%5.1f")
    write_feature_table(ft, os.path.join(out_dir, "features.ft"))  # binary
    print("wrote features.txt and features.ft")


if __name__ == "__main__":
    main()
