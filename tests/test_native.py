"""Native C++ greedy suppression == NumPy implementation."""

import numpy as np
import pytest

import pyfeaturetrack_tpu as pft
from pyfeaturetrack_tpu.ops.select import _enforce_minimum_distance
from pyfeaturetrack_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _case(seed, n_cand=500, n_features=40, shape=(80, 120),
          existing=False):
    r = np.random.default_rng(seed)
    xs = r.integers(5, shape[1] - 5, n_cand).astype(np.int64)
    ys = r.integers(5, shape[0] - 5, n_cand).astype(np.int64)
    vals = r.integers(0, 5000, n_cand).astype(np.int64)
    order = np.argsort(-vals, kind="stable")
    feats = np.full((n_features, 3), -1.0)
    feats[:, 2] = pft.KLT_NOT_FOUND
    if existing:
        live = r.integers(0, 2, n_features).astype(bool)
        feats[live, 0] = r.integers(5, shape[1] - 5, live.sum())
        feats[live, 1] = r.integers(5, shape[0] - 5, live.sum())
        feats[live, 2] = 0.0
    return xs, ys, vals, order, feats, shape


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("existing", [False, True])
@pytest.mark.parametrize("mindist", [1, 7, 10])
def test_native_matches_numpy(seed, existing, mindist):
    xs, ys, vals, order, feats, shape = _case(seed, existing=existing)
    overwrite_all = not existing
    a = _enforce_minimum_distance(xs, ys, vals, order, feats.copy(), shape,
                                  mindist, 1, overwrite_all)
    b = native.enforce_min_distance(xs, ys, vals, order, feats.copy(), shape,
                                    mindist, 1, overwrite_all)
    np.testing.assert_array_equal(a, b)


def test_native_min_eigenvalue_threshold():
    xs, ys, vals, order, feats, shape = _case(7)
    a = _enforce_minimum_distance(xs, ys, vals, order, feats.copy(), shape,
                                  10, 4000, True)
    b = native.enforce_min_distance(xs, ys, vals, order, feats.copy(), shape,
                                    10, 4000, True)
    np.testing.assert_array_equal(a, b)
    live = a[:, 2] >= 0
    assert (a[live, 2] >= 4000).all()


def test_select_uses_native_transparently():
    """End-to-end selection gives identical results with and without the
    native path."""
    import os
    from conftest import make_textured_image
    from pyfeaturetrack_tpu.ops.select import select_good_features_arrays
    img = make_textured_image(96, 128, seed=13)
    cfg = pft.create_config()
    with_native = select_good_features_arrays(img, 40, cfg)
    os.environ["PFT_NO_NATIVE"] = "1"
    try:
        import pyfeaturetrack_tpu.utils.native as nat
        nat._tried, nat._lib = True, None  # force fallback
        without = select_good_features_arrays(img, 40, cfg)
    finally:
        del os.environ["PFT_NO_NATIVE"]
        nat._tried, nat._lib = False, None
    np.testing.assert_array_equal(with_native, without)
