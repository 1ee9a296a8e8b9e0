"""Feature selection vs the float64 oracle (SURVEY.md sections 3.1, 3.4)."""

import numpy as np
import pytest

import pyfeaturetrack_tpu as pft
from pyfeaturetrack_tpu.features import feature_state_to_numpy
from pyfeaturetrack_tpu.ops.select import (replace_lost_features_arrays,
                                           select_good_features_arrays)
from pyfeaturetrack_tpu.oracle import klt_oracle as oracle

from conftest import make_textured_image


@pytest.fixture(scope="module")
def cfg():
    return pft.create_config()


@pytest.fixture(scope="module")
def img():
    return make_textured_image(96, 128, seed=7)


def test_min_eig_map_matches_oracle(cfg, img):
    from pyfeaturetrack_tpu.ops.convolve import (compute_gradients,
                                                 compute_smoothed_image)
    from pyfeaturetrack_tpu.ops.select import compute_min_eig_map
    import jax.numpy as jnp

    fimg = oracle.compute_smoothed_image(
        img, cfg.smooth_sigma_fact * max(cfg.window_width, cfg.window_height))
    ogx, ogy = oracle.compute_gradients(fimg, cfg.grad_sigma)
    oeig = oracle.min_eig_map(ogx, ogy, cfg.window_width, cfg.window_height)

    jimg = compute_smoothed_image(jnp.asarray(img, jnp.float32),
                                  cfg.smooth_sigma)
    gx, gy = compute_gradients(jimg, cfg.grad_sigma)
    eig = np.asarray(compute_min_eig_map(gx, gy, cfg.window_width,
                                         cfg.window_height), np.float64)
    # compare interior (borders are zeroed on both sides)
    b = 8
    interior = (slice(b, -b), slice(b, -b))
    np.testing.assert_allclose(eig[interior], oeig[interior],
                               rtol=2e-4, atol=2.0)


def test_select_matches_oracle(cfg, img):
    got = select_good_features_arrays(img, 60, cfg)
    want = oracle.select_good_features(img, 60, cfg)
    live_g, live_w = got[:, 2] >= 0, want[:, 2] >= 0
    assert live_g.sum() == live_w.sum()
    # positions agree exactly, row for row (tightened from 90% — no
    # float32 tie flips observed; VERDICT r1 item 1)
    np.testing.assert_array_equal(got, want)


def test_select_respects_mindist(cfg, img):
    got = select_good_features_arrays(img, 60, cfg)
    live = got[got[:, 2] >= 0]
    for i in range(len(live)):
        for j in range(i + 1, len(live)):
            dx = abs(live[i, 0] - live[j, 0])
            dy = abs(live[i, 1] - live[j, 1])
            assert max(dx, dy) >= cfg.mindist - 1


def test_select_respects_border(cfg, img):
    got = select_good_features_arrays(img, 60, cfg)
    live = got[got[:, 2] >= 0]
    nrows, ncols = img.shape
    assert (live[:, 0] >= cfg.borderx).all()
    assert (live[:, 0] < ncols - cfg.borderx).all()
    assert (live[:, 1] >= cfg.bordery).all()
    assert (live[:, 1] < nrows - cfg.bordery).all()


def test_select_min_eigenvalue_threshold(img):
    cfg = pft.create_config(min_eigenvalue=10 ** 9)
    got = select_good_features_arrays(img, 10, cfg)
    assert (got[:, 2] < 0).all()  # nothing passes an absurd threshold


def test_replace_lost_preserves_survivors(cfg, img):
    feats = select_good_features_arrays(img, 40, cfg)
    lost = feats.copy()
    lost[::3, :] = (-1.0, -1.0, pft.KLT_OOB)
    got = replace_lost_features_arrays(img, lost, cfg)
    want = oracle.select_good_features(img, 40, cfg, existing=lost.copy())
    # survivors untouched
    keep = lost[:, 2] >= 0
    np.testing.assert_array_equal(got[keep], lost[keep])
    # refills match the oracle exactly, row for row
    np.testing.assert_array_equal(got, want)
    # refilled features keep mindist from survivors
    live = got[got[:, 2] >= 0]
    for i in range(len(live)):
        for j in range(i + 1, len(live)):
            d = max(abs(live[i, 0] - live[j, 0]), abs(live[i, 1] - live[j, 1]))
            assert d >= cfg.mindist - 1


def test_replace_noop_when_all_alive(cfg, img):
    feats = select_good_features_arrays(img, 20, cfg)
    assert (feats[:, 2] >= 0).all()
    got = replace_lost_features_arrays(img, feats, cfg)
    np.testing.assert_array_equal(got, feats)


def test_feature_state_roundtrip(cfg, img):
    fl = pft.KLTSelectGoodFeatures(cfg, img, 30)
    arr = feature_state_to_numpy(fl)
    assert arr.shape == (30, 3)
    assert pft.KLTCountRemainingFeatures(fl) == int((arr[:, 2] >= 0).sum())
