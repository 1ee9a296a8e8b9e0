"""Two-frame demo with lost-feature replacement.

Reference parity: example2.py (SURVEY.md section 2.1) — same as example1
plus KLTReplaceLostFeatures on the second frame before writing.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyfeaturetrack_tpu as pft  # noqa: E402
from pyfeaturetrack_tpu.utils.io import pgm_read, write_feature_list  # noqa: E402
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
    write_feature_list_to_ppm(fl, img1, os.path.join(out_dir, "feat1.ppm"))

    fl, _ = pft.KLTTrackFeatures(tc, img1, img2, fl)
    lost = 100 - pft.KLTCountRemainingFeatures(fl)
    fl = pft.KLTReplaceLostFeatures(tc, img2, fl)
    print(f"Lost {lost} features; after replacement "
          f"{pft.KLTCountRemainingFeatures(fl)} / 100 are live")

    write_feature_list_to_ppm(fl, img2, os.path.join(out_dir, "feat2.ppm"))
    write_feature_list(fl, os.path.join(out_dir, "feat2.txt"), fmt="%5.1f")


if __name__ == "__main__":
    main()
