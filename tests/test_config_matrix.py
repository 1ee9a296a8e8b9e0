"""Oracle parity across non-default configurations.

The default-config path is covered in test_select/test_track; this matrix
exercises deeper pyramids, different subsampling, asymmetric windows, and
selection striding — the knobs the reference exposes (SURVEY.md §2.3).
"""

import numpy as np
import pytest

import pyfeaturetrack_tpu as pft
from pyfeaturetrack_tpu.features import feature_state_from_numpy
from pyfeaturetrack_tpu.ops.select import select_good_features_arrays
from pyfeaturetrack_tpu.oracle import klt_oracle as oracle

from conftest import make_textured_image, shift_image_bilinear


@pytest.fixture(scope="module")
def pair():
    img1 = make_textured_image(128, 160, seed=91)
    return img1, shift_image_bilinear(img1, 1.2, -0.8)


CONFIGS = [
    dict(nPyramidLevels=3, subsampling=2),
    dict(nPyramidLevels=1, subsampling=4),
    dict(window_width=9, window_height=5),
    dict(window_width=5, window_height=5, mindist=6),
    dict(max_iterations=4),
    dict(step_factor=0.5),
]


@pytest.mark.parametrize("overrides", CONFIGS)
def test_track_matches_oracle_config(pair, overrides):
    img1, img2 = pair
    cfg = pft.create_config(**overrides)
    feats = oracle.select_good_features(img1, 25, cfg)
    fl = feature_state_from_numpy(feats)
    fl2, _ = pft.KLTTrackFeatures(cfg, img1, img2, fl)
    want, _ = oracle.track_features(img1, img2, feats, cfg)

    got_v = np.asarray(fl2.val, np.int64)
    # exact status parity (VERDICT r1 item 1 — no f32/f64 lane straddles
    # observed across the matrix; tightened from 90%)
    np.testing.assert_array_equal(got_v, want[:, 2])
    both = (got_v == 0) & (want[:, 2] == 0)
    if both.any():
        np.testing.assert_allclose(
            np.stack([np.asarray(fl2.x)[both], np.asarray(fl2.y)[both]], 1),
            want[both, :2], atol=1e-4)


@pytest.mark.parametrize("overrides", [
    dict(nSkippedPixels=2),
    dict(nSkippedPixels=5, mindist=4),
    dict(window_width=9, window_height=5),
    dict(mindist=3),
])
def test_select_matches_oracle_config(pair, overrides):
    img1, _ = pair
    cfg = pft.create_config(**overrides)
    got = select_good_features_arrays(img1, 30, cfg)
    want = oracle.select_good_features(img1, 30, cfg)
    # exact selection parity, row for row (tightened from 85%)
    np.testing.assert_array_equal(got, want)


def test_search_range_derivation_matrix():
    """KLTChangeTCPyramid threshold table (SURVEY.md §2.3)."""
    for sr, (lv, sub) in {
        2: (1, None),      # ss < 1 -> 1 level, subsampling untouched
        15: (2, 4),        # the default: ss = 15/3.5 ~ 4.3
        7: (2, 2),
        25: (2, 8),
        40: (3, 8),
    }.items():
        cfg = pft.create_config(search_range=sr)
        assert cfg.nPyramidLevels == lv, (sr, cfg.nPyramidLevels)
        if sub is not None:
            assert cfg.subsampling == sub, (sr, cfg.subsampling)
