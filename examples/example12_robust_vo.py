"""Robust visual odometry under photometric nuisance.

Beyond the reference: replays the example8 monocular-VO scene with
per-frame exposure drift (gain ±12%, bias ±10 DN) and sensor noise —
the conditions real cameras produce — and compares plain VO against
``VisualOdometry(robust=True)`` (the reference's lighting-insensitive
residual + a forward-backward track gate; DESIGN.md §7). Expected:
plain VO blows up to ~20% of travel, robust stays at the clean ~0.15%.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from pyfeaturetrack_tpu.sfm import VisualOdometry  # noqa: E402
from pyfeaturetrack_tpu.sfm.pipeline import ate_rmse_aligned  # noqa: E402

import example8_vo as E  # noqa: E402


def degrade(frames, sigma=3.0, seed=7):
    r = np.random.default_rng(seed)
    out = []
    for i, f in enumerate(frames):
        g = 1.0 + 0.12 * np.sin(0.7 * i)
        b = 10.0 * np.sin(1.3 * i + 1.0)
        out.append(np.clip(g * f + b + r.normal(0, sigma, f.shape),
                           0, 255))
    return out


def run(frames, ts, label, **kw):
    vo = VisualOdometry(E.K, n_features=120, kf_every=2, window=6,
                        min_parallax_px=10.0, **kw)
    for f in frames:
        vo.feed(f)
    if not vo.initialized:
        print(f"{label:10s} failed to initialize")
        return None
    idx, _, t, _ = vo.trajectory()
    ate = float(ate_rmse_aligned(jnp.asarray(t, jnp.float32),
                                 jnp.asarray(ts[idx], jnp.float32)))
    return ate


def main(outdir="."):
    Rs, ts, cs, pts = E.make_scene()
    frames = E.render(Rs, ts, pts)
    travel = float(np.linalg.norm(np.diff(cs, axis=0), axis=1).sum())
    stressed = degrade(frames)

    print(f"scene: {len(frames)} frames, travel {travel:.2f} units, "
          "exposure drift +-12% gain / +-10 DN bias + sigma=3 noise")
    for label, fr, kw in (("clean", frames, {}),
                          ("plain", stressed, {}),
                          ("robust", stressed, {"robust": True})):
        ate = run(fr, ts, label, **kw)
        if ate is not None:
            print(f"{label:10s} ATE {ate:.4f}  "
                  f"({100 * ate / travel:.2f}% of travel)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
