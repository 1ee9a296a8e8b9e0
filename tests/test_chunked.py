"""Chunk-and-stitch sequence tracking (SURVEY.md section 5.7)."""

import numpy as np

from pyfeaturetrack_tpu.models.chunked import (chunk_bounds,
                                               track_sequence_chunked)
from pyfeaturetrack_tpu.models.sequence import track_sequence

from conftest import make_textured_image, shift_image_bilinear


def _frames(n=9, dx=0.8, dy=-0.5, shape=(96, 128), seed=41):
    base = make_textured_image(*shape, seed=seed)
    return [shift_image_bilinear(base, dx * i, dy * i) for i in range(n)]


def test_chunk_bounds_share_boundary():
    assert chunk_bounds(10, 2) == [(0, 6), (5, 10)]
    b = chunk_bounds(9, 3)
    assert b[0][0] == 0 and b[-1][1] == 9
    for (s0, e0), (s1, e1) in zip(b, b[1:]):
        assert s1 == e0 - 1


def test_chunked_covers_all_frames():
    frames = _frames()
    table, ids, metrics = track_sequence_chunked(frames, n_features=30,
                                                 n_chunks=3)
    assert table["x"].shape[0] == len(frames)
    # every frame has live tracks
    assert ((table["val"] >= 0).sum(axis=1) > 10).all()


def test_chunked_stitches_identities():
    frames = _frames()
    table, ids, _ = track_sequence_chunked(frames, n_features=30,
                                           n_chunks=3)
    v = table["val"]
    x = table["x"]
    # tracks that survive across a boundary must be stitched: a good
    # fraction of tracks span all frames
    full = (v >= 0).all(axis=0)
    assert full.sum() >= 5
    # and stitched tracks still move with the constant flow
    steps = np.diff(x[:, full], axis=0)
    good = steps[np.abs(steps) < 3]
    assert abs(np.median(good) - 0.8) < 0.15


def test_chunked_matches_sequential_for_full_tracks():
    frames = _frames(n=7)
    table, _, _ = track_sequence_chunked(frames, n_features=30, n_chunks=2)
    ft, _ = track_sequence(frames, n_features=30)
    sx = np.asarray(ft.x, np.float64)
    sv = np.asarray(ft.val, np.int64)
    # for each sequential full track, a stitched global track must exist
    # with (nearly) the same trajectory
    cx, cv = table["x"], table["val"]
    full_seq = (sv >= 0).all(axis=0)
    full_chk = (cv >= 0).all(axis=0)
    n_matched = 0
    for j in np.nonzero(full_seq)[0]:
        d = np.abs(cx[:, full_chk] - sx[:, j:j + 1]).max(axis=0)
        if d.size and d.min() < 1.0:
            n_matched += 1
    # independent per-chunk re-selection ranks corners differently, so not
    # every sequential track has a stitched twin; half must
    assert n_matched >= 0.5 * full_seq.sum()


def test_batched_matches_serial_chunked():
    """Lockstep batched chunk tracking == per-chunk serial tracking
    (same math, one vmapped call per frame step)."""
    frames = _frames(n=7)
    t_serial, _, _ = track_sequence_chunked(frames, n_features=25,
                                            n_chunks=2, replace_lost=False)
    t_batch, _, _ = track_sequence_chunked(frames, n_features=25,
                                           n_chunks=2, batched=True,
                                           replace_lost=False)
    assert t_serial["x"].shape == t_batch["x"].shape
    np.testing.assert_array_equal(t_serial["val"], t_batch["val"])
    live = t_serial["val"] >= 0
    np.testing.assert_allclose(t_serial["x"][live], t_batch["x"][live],
                               atol=1e-4)
    np.testing.assert_allclose(t_serial["y"][live], t_batch["y"][live],
                               atol=1e-4)


def test_batched_replace_lost_matches_serial():
    """The lockstep driver's on-device per-frame refill == the serial
    host replace-lost path, table for table (VERDICT r1 item 8: the
    flagship multi-stream path now runs reference-complete semantics)."""
    base = make_textured_image(96, 128, seed=47)
    # scrolling texture: features drift out of the border band and must
    # be replaced inside each chunk
    frames = [np.roll(base, 4 * i, axis=1) for i in range(9)]
    t_serial, _, _ = track_sequence_chunked(frames, n_features=25,
                                            n_chunks=2, replace_lost=True)
    t_batch, _, _ = track_sequence_chunked(frames, n_features=25,
                                           n_chunks=2, batched=True,
                                           replace_lost=True)
    np.testing.assert_array_equal(t_serial["val"], t_batch["val"])
    live = t_serial["val"] >= 0
    np.testing.assert_allclose(t_serial["x"][live], t_batch["x"][live],
                               atol=1e-4)
    np.testing.assert_allclose(t_serial["y"][live], t_batch["y"][live],
                               atol=1e-4)
    # replacement actually happened (fresh positive eigenvalues mid-chunk)
    assert (t_serial["val"][1:] > 0).any()


def test_single_chunk_equals_sequential():
    frames = _frames(n=5)
    table, _, _ = track_sequence_chunked(frames, n_features=20, n_chunks=1)
    ft, _ = track_sequence(frames, n_features=20)
    sx = np.asarray(ft.x, np.float64)
    sv = np.asarray(ft.val, np.int64)
    live_cols = (sv >= 0).any(axis=0)
    # same physics, identical values for live columns (column order may
    # differ because global ids are assigned in liveness order)
    assert table["x"].shape == (5, live_cols.sum())
    for j in np.nonzero(live_cols)[0]:
        d = np.abs(table["x"] - sx[:, j:j + 1])
        dmask = (table["val"] >= 0) == (sv[:, j:j + 1] >= 0)
        assert (d.min(axis=1) < 1e-6).any() or dmask.all(axis=0).any()

def test_batched_chain_matches_per_step():
    """chain>1 (k lockstep steps per dispatched program) is bit-identical
    to the per-step batched driver, including a sub-chain tail and the
    on-device refill."""
    base = make_textured_image(96, 128, seed=53)
    frames = [np.roll(base, 3 * i, axis=1) for i in range(10)]
    t1, _, _ = track_sequence_chunked(frames, n_features=20, n_chunks=2,
                                      batched=True, replace_lost=True)
    # chunk length is 6 incl. boundary -> 5 steps: chain=3 leaves a
    # 2-step tail on the per-step fallback
    t3, _, _ = track_sequence_chunked(frames, n_features=20, n_chunks=2,
                                      batched=True, replace_lost=True,
                                      chain=3)
    np.testing.assert_array_equal(t1["val"], t3["val"])
    live = t1["val"] >= 0
    np.testing.assert_allclose(t1["x"][live], t3["x"][live], atol=1e-5)
    np.testing.assert_allclose(t1["y"][live], t3["y"][live], atol=1e-5)
