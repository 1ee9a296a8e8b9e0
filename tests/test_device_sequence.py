"""Device-resident sequence loop == host example3 loop, table-for-table."""

import numpy as np
import pytest

from conftest import make_textured_image

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.models.device_sequence import track_sequence_device
from pyfeaturetrack_tpu.models.sequence import track_sequence


def _rolling_frames(n_frames=6, shift=4, seed=13):
    """Texture scrolls right: features drift toward the border and are
    lost at a steady rate, exercising per-frame replacement."""
    base = make_textured_image(120, 160, seed=seed)
    return [np.roll(base, shift * i, axis=1) for i in range(n_frames)]


@pytest.mark.parametrize("replace_lost", [True, False])
def test_device_sequence_matches_host(replace_lost):
    frames = _rolling_frames()
    cfg = create_config(mindist=8)
    ft, _ = track_sequence(frames, cfg=cfg, n_features=40,
                           replace_lost=replace_lost)
    dx, dy, dv = track_sequence_device(frames, cfg=cfg, n_features=40,
                                       replace_lost=replace_lost)
    np.testing.assert_array_equal(dv, np.asarray(ft.val))
    np.testing.assert_allclose(dx, np.asarray(ft.x), atol=1e-5)
    np.testing.assert_allclose(dy, np.asarray(ft.y), atol=1e-5)


def test_device_sequence_replaces_lost():
    frames = _rolling_frames(n_frames=8, shift=6)
    _, _, dv = track_sequence_device(frames, cfg=create_config(mindist=8),
                                     n_features=40, replace_lost=True)
    # refills happened: some frame stores a fresh (positive) eigenvalue
    assert (dv[1:] > 0).any()
    # and the final frame is fully live
    assert (dv[-1] >= 0).all()


@pytest.mark.parametrize("mode", [0, 2])
def test_device_sequence_affine_matches_host(mode):
    """The device loop's affine-consistency stage == the host loop's,
    table for table (templates + warps carried on device)."""
    frames = _rolling_frames(n_frames=5, shift=3, seed=17)
    cfg = create_config(mindist=8, affineConsistencyCheck=mode)
    ft, _ = track_sequence(frames, cfg=cfg, n_features=30,
                           replace_lost=True)
    dx, dy, dv = track_sequence_device(frames, cfg=cfg, n_features=30,
                                       replace_lost=True)
    np.testing.assert_array_equal(dv, np.asarray(ft.val))
    np.testing.assert_allclose(dx, np.asarray(ft.x), atol=1e-4)
    np.testing.assert_allclose(dy, np.asarray(ft.y), atol=1e-4)


@pytest.mark.parametrize("chain", [3, 4])
def test_chained_matches_per_step(chain):
    """Micro-chained dispatch (k frames per program) == per-step calls."""
    frames = _rolling_frames(n_frames=9, shift=4, seed=29)
    cfg = create_config(mindist=8)
    x1, y1, v1 = track_sequence_device(frames, cfg=cfg, n_features=30,
                                       replace_lost=True)
    x2, y2, v2 = track_sequence_device(frames, cfg=cfg, n_features=30,
                                       replace_lost=True, chain=chain)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_allclose(x1, x2, atol=1e-5)
    np.testing.assert_allclose(y1, y2, atol=1e-5)


def test_exhausted_selection_warns():
    """Candidate exhaustion in the device path is surfaced, not silent."""
    from pyfeaturetrack_tpu.errors import KLTWarningCategory
    frames = _rolling_frames(n_frames=3, shift=4, seed=31)
    # top_k=4 cannot fill 40 slots even at the 4x escalation cap ->
    # exhausted on the initial selection
    with pytest.warns(KLTWarningCategory,
                      match="escalating to 4x top-4"):
        track_sequence_device(frames, cfg=create_config(mindist=8),
                              n_features=40, replace_lost=True, top_k=4)
