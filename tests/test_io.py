"""PNM + feature-file round trips (SURVEY.md section 5.4)."""

import numpy as np

import pyfeaturetrack_tpu as pft
from pyfeaturetrack_tpu.features import (create_feature_table,
                                         feature_state_from_numpy,
                                         feature_state_to_numpy,
                                         store_feature_list)
from pyfeaturetrack_tpu.utils import io, viz


def _random_feats(n, seed=0):
    r = np.random.default_rng(seed)
    arr = np.zeros((n, 3))
    arr[:, 0] = np.round(r.uniform(0, 100, n), 2)
    arr[:, 1] = np.round(r.uniform(0, 80, n), 2)
    arr[:, 2] = r.choice([0, -1, -2, -3, -4, -5, 5000], n)
    return arr


def test_pgm_roundtrip(tmp_path):
    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    p = tmp_path / "t.pgm"
    io.pgm_write(p, img)
    np.testing.assert_array_equal(io.pgm_read(p), img)


def test_pgm_ascii_read(tmp_path):
    p = tmp_path / "a.pgm"
    p.write_text("P2\n# comment\n3 2\n255\n0 1 2\n3 4 5\n")
    np.testing.assert_array_equal(io.pgm_read(p),
                                  np.arange(6, dtype=np.uint8).reshape(2, 3))


def test_ppm_roundtrip(tmp_path):
    rgb = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    p = tmp_path / "t.ppm"
    io.ppm_write(p, rgb)
    np.testing.assert_array_equal(io.ppm_read(p), rgb)


def test_feature_list_binary_roundtrip(tmp_path):
    arr = _random_feats(17)
    fl = feature_state_from_numpy(arr)
    p = tmp_path / "fl.bin"
    io.write_feature_list(fl, p)
    back = feature_state_to_numpy(io.read_feature_list(p))
    np.testing.assert_allclose(back, arr, atol=1e-5)


def test_feature_list_text_roundtrip(tmp_path):
    arr = _random_feats(9, seed=1)
    fl = feature_state_from_numpy(arr)
    p = tmp_path / "fl.txt"
    io.write_feature_list(fl, p, fmt="%7.2f")
    back = feature_state_to_numpy(io.read_feature_list(p))
    np.testing.assert_allclose(back[:, :2], arr[:, :2], atol=0.01)
    np.testing.assert_array_equal(back[:, 2], arr[:, 2])


def test_feature_table_binary_roundtrip(tmp_path):
    ft = create_feature_table(4, 6)
    for i in range(4):
        ft = store_feature_list(feature_state_from_numpy(
            _random_feats(6, seed=i)), ft, i)
    p = tmp_path / "ft.bin"
    io.write_feature_table(ft, p)
    back = io.read_feature_table(p)
    np.testing.assert_allclose(np.asarray(back.x), np.asarray(ft.x), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(back.val), np.asarray(ft.val))


def test_feature_table_text_roundtrip(tmp_path):
    ft = create_feature_table(3, 5)
    for i in range(3):
        ft = store_feature_list(feature_state_from_numpy(
            _random_feats(5, seed=10 + i)), ft, i)
    p = tmp_path / "ft.txt"
    io.write_feature_table(ft, p, fmt="%7.2f")
    back = io.read_feature_table(p)
    np.testing.assert_allclose(np.asarray(back.x), np.asarray(ft.x), atol=0.01)
    np.testing.assert_array_equal(np.asarray(back.val), np.asarray(ft.val))


def test_overlay_marks_live_features():
    img = np.zeros((20, 30))
    arr = np.array([[10.0, 5.0, 0.0], [20.0, 15.0, -1.0]])
    rgb = viz.overlay_features(img, feature_state_from_numpy(arr))
    assert tuple(rgb[5, 10]) == (255, 0, 0)       # live -> red
    assert tuple(rgb[15, 20]) == (0, 0, 0)        # lost -> untouched


def test_float_image_debug_dump(tmp_path):
    img = np.linspace(-1, 1, 24).reshape(4, 6)
    p = tmp_path / "dbg.pgm"
    io.float_image_to_pgm(p, img)
    back = io.pgm_read(p)
    assert back.shape == (4, 6)
    assert back.max() == 255


def test_overlay_skips_offscreen_marks():
    img = np.zeros((50, 60))
    arr = np.array([[10.0, -4.0, 5.0], [-5.0, 10.0, 5.0]])
    rgb = viz.overlay_features(img, feature_state_from_numpy(arr))
    assert (rgb == 0).all()  # nothing painted for offscreen features


def test_pgm_comment_abutting_token(tmp_path):
    p = tmp_path / "c.pgm"
    p.write_bytes(b"P2\n3# trailing comment\n2\n255\n0 1 2 3 4 5\n")
    img = io.pgm_read(p)
    assert img.shape == (2, 3)


# ---------------------------------------------------------------------------
# Malformed-input hardening (VERDICT r1 item 10): every parser failure
# mode raises KLTError, never a bare ValueError/struct.error/IndexError.
# ---------------------------------------------------------------------------

import pytest

from pyfeaturetrack_tpu.errors import KLTError
from pyfeaturetrack_tpu.features import create_feature_table


def _expect_klt_error(fn, *args):
    with pytest.raises(KLTError):
        fn(*args)


@pytest.mark.parametrize("payload", [
    b"",                                   # empty file
    b"P7\n2 2\n255\n\x00\x00\x00\x00",     # wrong magic
    b"P5\nxx 2\n255\n\x00\x00\x00\x00",    # non-numeric width
    b"P5\n2 -2\n255\n\x00\x00\x00\x00",    # negative height
    b"P5\n2 2\n70000\n\x00\x00\x00\x00",   # 16-bit maxval (by design)
    b"P5\n4 4\n255\n\x00\x00",             # truncated binary pixels
    b"P2\n4 4\n255\n0 1 2 3",              # truncated ascii pixels
    b"P2\n2 2\n255\n0 1 two 3",            # non-numeric ascii pixel
    b"P5\n2 2\n255",                       # EOF inside header
])
def test_pgm_read_malformed_raises_klt_error(tmp_path, payload):
    p = tmp_path / "bad.pgm"
    p.write_bytes(payload)
    _expect_klt_error(io.pgm_read, p)


@pytest.mark.parametrize("payload", [
    b"P5\n2 2\n255\n\x00\x00\x00\x00",     # PGM fed to ppm_read
    b"P6\n2 2\n255\n\x00\x00\x00",         # truncated rgb data
    b"P6\n2 2\n65535\n" + b"\x00" * 12,    # deep maxval
])
def test_ppm_read_malformed_raises_klt_error(tmp_path, payload):
    p = tmp_path / "bad.ppm"
    p.write_bytes(payload)
    _expect_klt_error(io.ppm_read, p)


def test_feature_list_binary_truncated(tmp_path):
    fl = feature_state_from_numpy(
        np.array([[1.0, 2.0, 0.0], [3.0, 4.0, 0.0]]))
    p = tmp_path / "fl.bin"
    io.write_feature_list(fl, p)
    good = p.read_bytes()
    for cut in (7, 12, len(good) - 4):
        p.write_bytes(good[:cut])
        _expect_klt_error(io.read_feature_list, p)


def test_feature_list_text_bad_index(tmp_path):
    p = tmp_path / "fl.txt"
    p.write_text("nFeatures = 1\n\n"
                 "      5 | (1.0,2.0) = 0\n")
    _expect_klt_error(io.read_feature_list, p)


def test_feature_list_text_row_count_mismatch(tmp_path):
    p = tmp_path / "fl.txt"
    p.write_text("nFeatures = 3\n\n"
                 "      0 | (1.0,2.0) = 0\n")
    _expect_klt_error(io.read_feature_list, p)


def test_feature_table_binary_truncated(tmp_path):
    ft = create_feature_table(3, 4)
    p = tmp_path / "ft.bin"
    io.write_feature_table(ft, p)
    good = p.read_bytes()
    for cut in (9, 13, len(good) - 6):
        p.write_bytes(good[:cut])
        _expect_klt_error(io.read_feature_table, p)


def test_feature_table_text_bad_header(tmp_path):
    p = tmp_path / "ft.txt"
    p.write_text("this is not a feature table\n")
    _expect_klt_error(io.read_feature_table, p)


@pytest.mark.parametrize("token", ["300", "-3"])
def test_pgm_ascii_out_of_range_pixel_raises_klt_error(tmp_path, token):
    p = tmp_path / "range.pgm"
    p.write_bytes(f"P2\n2 2\n255\n0 1 {token} 3".encode())
    _expect_klt_error(io.pgm_read, p)


# ---- read_image / write_image: the any-format surface (PIL-backed) ----

def _gray(seed=0, h=24, w=32):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w), dtype=np.uint8)


def test_read_image_pgm_matches_pgm_read(tmp_path):
    img = _gray(1)
    p = tmp_path / "a.pgm"
    io.pgm_write(p, img)
    np.testing.assert_array_equal(io.read_image(p), io.pgm_read(p))


def test_read_image_png_roundtrip_exact(tmp_path):
    img = _gray(2)
    p = tmp_path / "a.png"
    io.write_image(p, img)
    np.testing.assert_array_equal(io.read_image(p), img)


def test_write_read_image_rgb_png(tmp_path):
    rgb = np.random.default_rng(3).integers(0, 256, (16, 20, 3),
                                            dtype=np.uint8)
    p = tmp_path / "rgb.png"
    io.write_image(p, rgb)
    from PIL import Image
    np.testing.assert_array_equal(np.asarray(Image.open(p)), rgb)


def test_read_image_ppm_luma_matches_pil(tmp_path):
    rgb = np.random.default_rng(4).integers(0, 256, (16, 20, 3),
                                            dtype=np.uint8)
    p = tmp_path / "c.ppm"
    io.ppm_write(p, rgb)
    got = io.read_image(p)
    from PIL import Image
    pil = np.asarray(Image.fromarray(rgb).convert("L"), np.int16)
    # both are rounded ITU-R 601 luma; integer arithmetic may differ
    # by one code value on ties
    assert np.abs(got.astype(np.int16) - pil).max() <= 1


def test_read_image_corrupt_file_raises_klt_error(tmp_path):
    p = tmp_path / "bad.png"
    p.write_bytes(b"\x89PNG\r\n\x1a\n not actually a png")
    _expect_klt_error(io.read_image, p)


def test_write_image_pgm_routes_to_reference_writer(tmp_path):
    img = _gray(5)
    p = tmp_path / "w.pgm"
    io.write_image(p, img)
    assert p.read_bytes().startswith(b"P5\n")
    np.testing.assert_array_equal(io.pgm_read(p), img)


def test_frame_loader_mixed_formats(tmp_path):
    from pyfeaturetrack_tpu.utils.loader import load_frames
    imgs = [_gray(10 + i) for i in range(3)]
    paths = [tmp_path / "f0.pgm", tmp_path / "f1.png", tmp_path / "f2.ppm"]
    io.pgm_write(paths[0], imgs[0])
    io.write_image(paths[1], imgs[1])
    io.ppm_write(paths[2], np.stack([imgs[2]] * 3, -1))  # gray RGB
    out = load_frames(paths)
    for got, want in zip(out, imgs):
        np.testing.assert_array_equal(got, want)


def test_read_image_pnm_dispatches_on_magic(tmp_path):
    """.pnm is a superset extension: P5 gray and P6 color both decode
    (ADVICE r2: a color .pnm used to hit pgm_read's header error)."""
    gray = _gray(7)
    p5 = tmp_path / "g.pnm"
    io.pgm_write(p5, gray)
    np.testing.assert_array_equal(io.read_image(p5), gray)

    rgb = np.stack([_gray(8), _gray(9), _gray(10)], axis=-1)
    p6 = tmp_path / "c.pnm"
    io.ppm_write(p6, rgb)
    np.testing.assert_array_equal(io.read_image(p6),
                                  io.rgb_to_gray(io.ppm_read(p6)))
