"""Checkpoint / resume (SURVEY.md section 5.4)."""

import numpy as np

from pyfeaturetrack_tpu.features import (create_feature_table,
                                         feature_state_from_numpy,
                                         store_feature_list)
from pyfeaturetrack_tpu.models.sequence import SequenceTracker
from pyfeaturetrack_tpu.utils.checkpoint import (restore_checkpoint,
                                                 resume_sequence,
                                                 save_checkpoint,
                                                 sequence_state)

from conftest import make_textured_image, shift_image_bilinear


def test_feature_table_checkpoint_roundtrip(tmp_path):
    ft = create_feature_table(3, 5)
    arr = np.random.default_rng(0).uniform(0, 50, (5, 3))
    ft = store_feature_list(feature_state_from_numpy(arr), ft, 1)
    p = tmp_path / "ckpt"
    save_checkpoint(p, ft._asdict())
    back = restore_checkpoint(p)
    np.testing.assert_allclose(np.asarray(back["x"]), np.asarray(ft.x),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(back["val"]),
                                  np.asarray(ft.val))


def test_sequence_resume_continues_identically(tmp_path):
    base = make_textured_image(96, 128, seed=51)
    frames = [shift_image_bilinear(base, 0.7 * i, 0.4 * i) for i in range(6)]

    # run 1: all frames straight through
    t1 = SequenceTracker(n_features=25)
    for f in frames:
        t1.step(f)

    # run 2: stop after frame 2, checkpoint, resume in a NEW tracker
    t2a = SequenceTracker(n_features=25)
    for f in frames[:3]:
        t2a.step(f)
    p = tmp_path / "seq"
    save_checkpoint(p, sequence_state(t2a))
    state = restore_checkpoint(p)

    t2b = SequenceTracker(n_features=25)
    resume_sequence(t2b, state)
    for f in frames[3:]:
        t2b.step(f)

    np.testing.assert_allclose(np.asarray(t1.fl.x), np.asarray(t2b.fl.x),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(t1.fl.val),
                                  np.asarray(t2b.fl.val))
