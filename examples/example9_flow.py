"""Dense optical flow demo: per-pixel KLT between img0 and img1.

Beyond-reference extension (the reference tracks sparse features only):
dense_flow_pyramids runs the tracker's exact level math at every pixel
center. Writes a flow-wheel PPM and prints agreement with the sparse
tracker's median displacement on the same pair.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import pyfeaturetrack_tpu as pft  # noqa: E402
from pyfeaturetrack_tpu.utils.io import pgm_read, ppm_write  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def main(out_dir="."):
    if not os.path.exists(os.path.join(DATA, "img0.pgm")):
        import gen_data
        gen_data.main()

    img1 = pgm_read(os.path.join(DATA, "img0.pgm"))
    img2 = pgm_read(os.path.join(DATA, "img1.pgm"))

    fl = pft.compute_dense_flow(img1, img2)
    u, v, st = (np.asarray(fl.u), np.asarray(fl.v),
                np.asarray(fl.status))
    tracked = st == 0
    print(f"dense flow: {tracked.mean():.1%} of pixels tracked")
    print(f"median flow (tracked): ({np.median(u[tracked]):+.2f}, "
          f"{np.median(v[tracked]):+.2f})")

    # sparse cross-check on the same pair
    tc = pft.KLTCreateTrackingContext()
    feats = pft.KLTSelectGoodFeatures(tc, img1, 100)
    x0, y0 = np.asarray(feats.x), np.asarray(feats.y)
    feats, _ = pft.KLTTrackFeatures(tc, img1, img2, feats)
    ok = np.asarray(feats.val) == 0
    print(f"sparse median displacement ({ok.sum()} features): "
          f"({np.median(np.asarray(feats.x)[ok] - x0[ok]):+.2f}, "
          f"{np.median(np.asarray(feats.y)[ok] - y0[ok]):+.2f})")

    ppm_write(os.path.join(out_dir, "flow01.ppm"),
              pft.flow_to_rgb(u, v))
    print(f"wrote {os.path.join(out_dir, 'flow01.ppm')}")


if __name__ == "__main__":
    main()
