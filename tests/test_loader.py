"""FrameLoader: ordered decode-ahead ingestion (utils/loader.py)."""

import numpy as np
import pytest

from pyfeaturetrack_tpu.errors import KLTError
from pyfeaturetrack_tpu.utils import io
from pyfeaturetrack_tpu.utils.loader import FrameLoader, load_frames


@pytest.fixture
def pgm_seq(tmp_path):
    rng = np.random.default_rng(0)
    paths, imgs = [], []
    for i in range(12):
        img = rng.integers(0, 256, (24, 32), np.uint8)
        p = tmp_path / f"img{i}.pgm"
        io.pgm_write(p, img)
        paths.append(p)
        imgs.append(img)
    return paths, imgs


@pytest.mark.parametrize("workers,readahead", [(1, 1), (2, 3), (4, 16)])
def test_frames_in_order(pgm_seq, workers, readahead):
    paths, imgs = pgm_seq
    got = list(FrameLoader(paths, readahead=readahead, workers=workers))
    assert len(got) == len(imgs)
    for g, want in zip(got, imgs):
        np.testing.assert_array_equal(g, want)


def test_load_frames_convenience(pgm_seq):
    paths, imgs = pgm_seq
    got = load_frames(paths, workers=3)
    for g, want in zip(got, imgs):
        np.testing.assert_array_equal(g, want)


def test_reader_error_surfaces_at_failed_frame(pgm_seq, tmp_path):
    paths, imgs = pgm_seq
    bad = tmp_path / "bad.pgm"
    bad.write_bytes(b"P5\n4 4\n255\n\x00")  # truncated
    seq = paths[:3] + [bad] + paths[3:]
    it = iter(FrameLoader(seq, readahead=4, workers=2))
    for want in imgs[:3]:
        np.testing.assert_array_equal(next(it), want)
    with pytest.raises(KLTError):
        next(it)


def test_missing_file_raises(pgm_seq):
    paths, _ = pgm_seq
    with pytest.raises(FileNotFoundError):
        list(FrameLoader([paths[0], paths[0].parent / "nope.pgm"]))


def test_single_pass_guard(pgm_seq):
    paths, _ = pgm_seq
    ld = FrameLoader(paths[:2])
    list(ld)
    with pytest.raises(KLTError):
        list(ld)


def test_early_break_releases_workers(pgm_seq):
    paths, imgs = pgm_seq
    ld = FrameLoader(paths, readahead=2, workers=2)
    for i, frame in enumerate(ld):
        np.testing.assert_array_equal(frame, imgs[i])
        if i == 2:
            break  # generator close must cancel pending decodes cleanly


def test_empty_and_bad_params(pgm_seq):
    assert list(FrameLoader([])) == []
    with pytest.raises(KLTError):
        FrameLoader([], readahead=0)
    with pytest.raises(KLTError):
        FrameLoader([], workers=0)


def test_custom_reader(pgm_seq):
    paths, imgs = pgm_seq
    got = list(FrameLoader(paths[:4],
                           reader=lambda p: io.pgm_read(p).astype(
                               np.float32) / 2))
    for g, want in zip(got, imgs):
        np.testing.assert_allclose(g, want.astype(np.float32) / 2)


def test_feeds_serve_stream(pgm_seq):
    """End-to-end: loader -> serving path == eager list -> serving."""
    rng = np.random.default_rng(7)
    base = np.zeros((64, 96), np.float64)
    yy, xx = np.mgrid[0:64, 0:96]
    for _ in range(40):  # textured scene with gentle drift
        cx, cy = rng.uniform(8, 88), rng.uniform(8, 56)
        base += rng.uniform(40, 90) * np.exp(
            -((xx - cx) ** 2 + (yy - cy) ** 2) / rng.uniform(4, 16))
    frames, paths = [], []
    import pathlib
    import tempfile
    d = pathlib.Path(tempfile.mkdtemp())
    for i in range(5):
        img = np.clip(np.roll(base, (i, -i), axis=(0, 1)), 0, 255
                      ).astype(np.uint8)
        p = d / f"s{i}.pgm"
        io.pgm_write(p, img)
        frames.append(img)
        paths.append(p)
    from pyfeaturetrack_tpu.serving import serve_stream
    via_loader = serve_stream(FrameLoader(paths), n_features=20,
                              stage_uint8=True)
    eager = serve_stream(frames, n_features=20, stage_uint8=True)
    for a, b in zip(via_loader, eager):
        np.testing.assert_array_equal(a, b)
