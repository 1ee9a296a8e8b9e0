"""Two-frame demo: select 100 features on img0, track to img1.

Reference parity: example1.py (SURVEY.md section 2.1) — the stock demo
named in BASELINE.md config 1. Writes feat1.ppm/feat2.ppm overlays plus a
text and a binary feature list.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyfeaturetrack_tpu as pft  # noqa: E402
from pyfeaturetrack_tpu.utils.io import (pgm_read,  # noqa: E402
                                         write_feature_list)
from pyfeaturetrack_tpu.utils.viz import write_feature_list_to_ppm  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def main(out_dir="."):
    if not os.path.exists(os.path.join(DATA, "img0.pgm")):
        import gen_data
        gen_data.main()

    img1 = pgm_read(os.path.join(DATA, "img0.pgm"))
    img2 = pgm_read(os.path.join(DATA, "img1.pgm"))

    tc = pft.KLTCreateTrackingContext()
    fl = pft.KLTSelectGoodFeatures(tc, img1, 100)

    print("\nIn first image:")
    for i in range(min(10, 100)):
        print(f"Feature #{i}:  ({float(fl.x[i]):f},{float(fl.y[i]):f}) "
              f"with value of {int(fl.val[i])}")

    write_feature_list_to_ppm(fl, img1, os.path.join(out_dir, "feat1.ppm"))
    write_feature_list(fl, os.path.join(out_dir, "feat1.txt"), fmt="%3d")

    fl, _ = pft.KLTTrackFeatures(tc, img1, img2, fl)

    print("\nIn second image:")
    for i in range(min(10, 100)):
        print(f"Feature #{i}:  ({float(fl.x[i]):f},{float(fl.y[i]):f}) "
              f"with value of {int(fl.val[i])}")

    write_feature_list_to_ppm(fl, img2, os.path.join(out_dir, "feat2.ppm"))
    write_feature_list(fl, os.path.join(out_dir, "feat2.fl"))        # binary
    write_feature_list(fl, os.path.join(out_dir, "feat2.txt"), fmt="%5.1f")
    print(f"\nRemaining: {pft.KLTCountRemainingFeatures(fl)} / 100")


if __name__ == "__main__":
    main()
