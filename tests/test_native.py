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


# ---------------------------------------------------------------------------
# Native PNM codec == Python parser (valid files, malformed corpus)
# ---------------------------------------------------------------------------

from pyfeaturetrack_tpu.errors import KLTError
from pyfeaturetrack_tpu.utils import io


def _python_path(monkeypatch):
    monkeypatch.setattr(native, "available", lambda: False)


def _write(tmp_path, payload: bytes):
    p = tmp_path / "f.pnm"
    p.write_bytes(payload)
    return p


VALID_PGMS = [
    b"P5\n4 3\n255\n" + bytes(range(12)),
    b"P5 # binary\n# full-line comment\n 4\t3 255# abutting\n" + bytes(range(12)),
    b"P2\n3 2\n255\n0 255 17\n128 7 9\n",
    b"P2   3 2 255  0 255 17 128 7 9   ",
    b"P5\n1 1\n255\n\x2a",
]


@pytest.mark.parametrize("payload", VALID_PGMS)
def test_pnm_native_matches_python_valid(tmp_path, monkeypatch, payload):
    p = _write(tmp_path, payload)
    got_native = io.pgm_read(p)
    _python_path(monkeypatch)
    got_python = io.pgm_read(p)
    np.testing.assert_array_equal(got_native, got_python)


MALFORMED_PNMS = [
    b"",                                   # empty
    b"P5",                                 # header EOF
    b"P5\n4\n",                            # missing dims
    b"P7\n4 3\n255\n",                     # bad magic
    b"Px\n4 3\n255\n",                     # bad magic
    b"P5\n4 x3\n255\n" + bytes(12),        # malformed width
    b"P5\n-4 3\n255\n" + bytes(12),        # negative dim
    b"P5\n4 3\n70000\n" + bytes(12),       # maxval > 255
    b"P5\n4 3\n255\n\x00\x01",             # truncated binary payload
    b"P2\n4 3\n255\n1 2 3",                # truncated ascii payload
    b"P2\n2 2\n255\n1 2 3 999",            # ascii value out of range
    b"P2\n2 2\n255\n1 2 -3 4",             # ascii negative value
    b"P2\n2 2\n255\n1 2 zz 4",             # ascii non-numeric
    b"P6\n2 2\n255\n" + bytes(12),         # PPM fed to pgm_read
]


@pytest.mark.parametrize("payload", MALFORMED_PNMS)
def test_pnm_native_matches_python_malformed(tmp_path, monkeypatch,
                                             payload):
    p = _write(tmp_path, payload)
    with pytest.raises(KLTError):
        io.pgm_read(p)
    _python_path(monkeypatch)
    with pytest.raises(KLTError):
        io.pgm_read(p)


def test_ppm_native_matches_python(tmp_path, monkeypatch):
    rgb = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    p = tmp_path / "f.ppm"
    io.ppm_write(p, rgb)
    got_native = io.ppm_read(p)
    got_native[0, 0, 0] = 99  # must be writable, like the Python path
    _python_path(monkeypatch)
    np.testing.assert_array_equal(io.ppm_read(p), rgb)
    for payload in (b"P5\n2 2\n255\n" + bytes(4),  # PGM fed to ppm_read
                    b"P6\n2 2\n255\n\x00"):        # truncated
        q = _write(tmp_path, payload)
        with pytest.raises(KLTError):
            io.ppm_read(q)
