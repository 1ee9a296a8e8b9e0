"""Sequence driver: example2/example3-shaped flows (SURVEY.md section 3.5)."""

import numpy as np

import pyfeaturetrack_tpu as pft
from pyfeaturetrack_tpu.models.sequence import track_sequence

from conftest import make_textured_image, shift_image_bilinear


def _make_sequence(n_frames=6, dx=0.9, dy=-0.6, shape=(96, 128), seed=21):
    base = make_textured_image(*shape, seed=seed)
    return [shift_image_bilinear(base, dx * i, dy * i) for i in range(n_frames)]


def test_sequence_tracks_constant_flow():
    frames = _make_sequence()
    ft, metrics = track_sequence(frames, n_features=40)
    assert ft.nFrames == len(frames) and ft.nFeatures == 40
    x = np.asarray(ft.x, np.float64)
    v = np.asarray(ft.val, np.int64)
    # a feature live in all frames moves ~dx per frame
    live_all = (v >= 0).all(axis=0)
    assert live_all.sum() >= 5
    steps = np.diff(x[:, live_all], axis=0)
    tracked_steps = steps[np.abs(steps) < 3]
    assert abs(np.median(tracked_steps) - 0.9) < 0.15


def test_sequence_replaces_lost_features():
    frames = _make_sequence(n_frames=8, dx=2.5, dy=0.0)
    ft, _ = track_sequence(frames, n_features=40, replace_lost=True)
    ft_no, _ = track_sequence(frames, n_features=40, replace_lost=False)
    v = np.asarray(ft.val, np.int64)
    v_no = np.asarray(ft_no.val, np.int64)
    live = (v[-1] >= 0).sum()
    live_no = (v_no[-1] >= 0).sum()
    # replacement sustains the population the drifting scene erodes
    assert live > live_no
    # and the final population stays near the initial selection's capacity
    assert live >= 0.8 * (v[0] >= 0).sum()


def test_sequence_no_replace_keeps_losses():
    frames = _make_sequence(n_frames=5, dx=3.0)
    ft, _ = track_sequence(frames, n_features=30, replace_lost=False)
    v = np.asarray(ft.val, np.int64)
    live_per_frame = (v >= 0).sum(axis=1)
    assert (np.diff(live_per_frame) <= 0).all()  # monotone non-increasing


def test_metrics_shape():
    frames = _make_sequence(n_frames=3)
    _, metrics = track_sequence(frames, n_features=20)
    assert len(metrics) == 3
    for m in metrics:
        assert m["n_features"] == 20
        assert set(m["status_counts"]) == {
            "tracked", "not_found", "small_det", "max_iterations",
            "oob", "large_residue", "fb_inconsistent"}


def test_sequence_runs_affine_check():
    """The sequence driver must route through the affine stage when the
    config asks for it (templates captured and carried)."""
    import pyfeaturetrack_tpu as pft_mod
    frames = _make_sequence(n_frames=4, dx=0.5, dy=0.3)
    cfg = pft_mod.create_config(affineConsistencyCheck=2,
                                sequentialMode=True)
    ft, _ = None, None
    from pyfeaturetrack_tpu.models.sequence import SequenceTracker
    st = SequenceTracker(cfg, n_features=25, replace_lost=True)
    fl = st.step(frames[0])
    assert fl.aff is None  # selection only, no templates yet
    fl = st.step(frames[1])
    assert fl.aff is not None
    n1 = int(np.asarray(fl.aff.valid).sum())
    assert n1 > 0  # templates captured on first successful track
    fl = st.step(frames[2])
    assert int(np.asarray(fl.aff.valid).sum()) > 0


def test_store_extract_roundtrip():
    frames = _make_sequence(n_frames=3)
    ft, _ = track_sequence(frames, n_features=15)
    fl = pft.KLTExtractFeatureList(ft, 1)
    np.testing.assert_array_equal(np.asarray(fl.x), np.asarray(ft.x[1]))
    ft2 = pft.KLTStoreFeatureList(fl, ft, 2)
    np.testing.assert_array_equal(np.asarray(ft2.x[2]), np.asarray(ft.x[1]))


def test_keyframe_tracker_bounds_drift():
    """KeyframeTracker tracks every frame against the last keyframe and
    re-keyframes on schedule, keeping the population alive."""
    from pyfeaturetrack_tpu.models.sequence import KeyframeTracker
    frames = _make_sequence(n_frames=7, dx=0.5, dy=-0.3)
    kt = KeyframeTracker(n_features=30, keyframe_interval=4)
    fl0 = kt.step(frames[0])
    x0 = np.asarray(fl0.x).copy()
    for i in range(1, 4):  # within one keyframe window
        fl = kt.step(frames[i])
        live = np.asarray(fl.val) == 0
        assert live.sum() >= 15
        disp = np.median(np.asarray(fl.x)[live] - x0[live])
        assert abs(disp - 0.5 * i) < 0.15  # absolute flow vs keyframe
    # crossing the interval re-keyframes and refills
    for i in range(4, 7):
        fl = kt.step(frames[i])
    assert int((np.asarray(fl.val) >= 0).sum()) >= 25
