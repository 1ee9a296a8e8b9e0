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


def test_streaming_resume_continues_identically(tmp_path):
    """serving.StreamingTracker checkpoint/resume: a tracker restored
    mid-stream produces the same final state as an uninterrupted run
    (incl. the affine templates)."""
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.serving import StreamingTracker
    from pyfeaturetrack_tpu.utils.checkpoint import (resume_streaming,
                                                     streaming_state)

    base = make_textured_image(96, 128, seed=52)
    frames = [shift_image_bilinear(base, 0.7 * i, 0.4 * i)
              for i in range(6)]
    cfg = create_config(mindist=8, affineConsistencyCheck=2)

    t1 = StreamingTracker(cfg, n_features=20, chain=2)
    for f in frames:
        t1.feed(f)
    x1, _, v1 = t1.drain()

    t2a = StreamingTracker(cfg, n_features=20, chain=2)
    for f in frames[:3]:
        t2a.feed(f)
    p = tmp_path / "stream"
    save_checkpoint(p, streaming_state(t2a))
    state = restore_checkpoint(p)

    t2b = StreamingTracker(cfg, n_features=20, chain=2)
    resume_streaming(t2b, state)
    for f in frames[3:]:
        t2b.feed(f)
    x2, _, v2 = t2b.drain()

    np.testing.assert_array_equal(v2[-1], v1[-1])
    np.testing.assert_allclose(x2[-1], x1[-1], atol=1e-4)


def test_batched_streaming_resume(tmp_path):
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.serving import BatchedStreamingTracker
    from pyfeaturetrack_tpu.utils.checkpoint import (resume_streaming,
                                                     streaming_state)

    base = make_textured_image(96, 128, seed=53)
    ticks = [np.stack([shift_image_bilinear(base, 0.6 * i, 0.3 * i),
                       shift_image_bilinear(base, -0.5 * i, 0.4 * i)])
             for i in range(5)]
    cfg = create_config(mindist=8)

    t1 = BatchedStreamingTracker(cfg, n_streams=2, n_features=15)
    for t in ticks:
        t1.feed(t)
    _, _, v1 = t1.drain()

    t2a = BatchedStreamingTracker(cfg, n_streams=2, n_features=15)
    for t in ticks[:2]:
        t2a.feed(t)
    p = tmp_path / "bstream"
    save_checkpoint(p, streaming_state(t2a))
    t2b = BatchedStreamingTracker(cfg, n_streams=2, n_features=15)
    resume_streaming(t2b, restore_checkpoint(p))
    for t in ticks[2:]:
        t2b.feed(t)
    _, _, v2 = t2b.drain()
    np.testing.assert_array_equal(v2[-1], v1[-1])


def test_streaming_resume_preserves_exhaustion_flag(tmp_path):
    """Selection exhaustion noted before a checkpoint still warns on
    the first pull after resume (and rolled-back host history is
    dropped)."""
    import jax.numpy as jnp
    import pytest
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.errors import KLTWarningCategory
    from pyfeaturetrack_tpu.serving import StreamingTracker
    from pyfeaturetrack_tpu.utils.checkpoint import (resume_streaming,
                                                     streaming_state)

    base = make_textured_image(96, 128, seed=54)
    t = StreamingTracker(create_config(mindist=8), n_features=10)
    t.feed(base)
    t.feed(shift_image_bilinear(base, 0.5, 0.2))
    t._exhausted = jnp.asarray(True)  # simulate a top-K exhaustion
    state = streaming_state(t)

    t2 = StreamingTracker(create_config(mindist=8), n_features=10)
    t2.feed(base)            # a frame from an abandoned timeline
    t2.table()               # ...migrated to host history
    resume_streaming(t2, state)
    assert t2._host_chunks == []   # abandoned rows dropped
    t2.feed(shift_image_bilinear(base, 1.0, 0.4))
    with pytest.warns(KLTWarningCategory):
        t2.drain()
