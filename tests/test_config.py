"""TrackerConfig defaults + derived-parameter functions (SURVEY.md 2.3)."""

import pytest

from pyfeaturetrack_tpu.config import (
    TrackerConfig, change_pyramid, create_config, update_border)
from pyfeaturetrack_tpu.errors import KLTWarningCategory


def test_defaults_table():
    c = TrackerConfig()
    assert c.mindist == 10
    assert (c.window_width, c.window_height) == (7, 7)
    assert c.min_eigenvalue == 1
    assert c.min_determinant == 0.01
    assert c.min_displacement == 0.1
    assert c.max_iterations == 10
    assert c.max_residue == 10.0
    assert c.grad_sigma == 1.0
    assert c.smooth_sigma_fact == 0.1
    assert c.pyramid_sigma_fact == 0.9
    assert c.step_factor == 1.0
    assert c.nSkippedPixels == 0
    assert (c.nPyramidLevels, c.subsampling) == (2, 4)
    assert c.affineConsistencyCheck == -1
    assert (c.affine_window_width, c.affine_window_height) == (15, 15)
    assert c.affine_max_iterations == 10
    assert c.affine_max_residue == 10.0
    assert c.affine_min_displacement == 0.02
    assert c.affine_max_displacement_differ == 1.5
    assert not c.sequentialMode and c.smoothBeforeSelecting
    assert not c.lighting_insensitive and not c.writeInternalImages


@pytest.mark.parametrize("search_range,levels,sub", [
    (3, 1, 4),     # ss = 3/3.5 < 1 -> 1 level, subsampling untouched
    (10, 2, 2),    # ss = 2.857 <= 3
    (15, 2, 4),    # default: ss = 4.286 <= 5
    (30, 2, 8),    # ss = 8.571 <= 9
    (100, 3, 8),   # ss = 28.57 -> ceil(log(7*28.57+1)/log 8) = ceil(2.55) = 3
])
def test_change_pyramid(search_range, levels, sub):
    c = change_pyramid(TrackerConfig(), search_range)
    assert c.nPyramidLevels == levels
    assert c.subsampling == sub


def test_update_border_default():
    # Defaults: smooth sigma 0.7 -> gauss hw 2; pyramid sigma 3.6 -> hw 10;
    # n_invalid = ceil((2+10)/4) = 3; border = (3+3)*4 = 24.
    c = update_border(TrackerConfig())
    assert (c.borderx, c.bordery) == (24, 24)


def test_create_config_matches_reference_ctor():
    c = create_config()
    assert (c.nPyramidLevels, c.subsampling) == (2, 4)
    assert (c.borderx, c.bordery) == (24, 24)


def test_window_validation_warns():
    with pytest.warns(KLTWarningCategory):
        c = TrackerConfig(window_width=6, window_height=2).validated_window()
    assert c.window_width == 7
    assert c.window_height == 3


def test_config_hashable_static():
    c1, c2 = TrackerConfig(), TrackerConfig()
    assert hash(c1) == hash(c2) and c1 == c2
    assert c1.replace(mindist=5) != c1
    assert c1.smooth_sigma == pytest.approx(0.7)


def test_create_config_honors_explicit_pyramid_overrides():
    import pyfeaturetrack_tpu as pft
    cfg = pft.create_config(nPyramidLevels=3, subsampling=2)
    assert (cfg.nPyramidLevels, cfg.subsampling) == (3, 2)
    cfg = pft.create_config(nPyramidLevels=1)
    assert cfg.nPyramidLevels == 1
    # without explicit overrides the reference derivation still runs
    cfg = pft.create_config()
    assert (cfg.nPyramidLevels, cfg.subsampling) == (2, 4)


def test_tiny_sigma_raises():
    import pytest as _pytest
    from pyfeaturetrack_tpu.errors import KLTError
    from pyfeaturetrack_tpu.ops.kernels import compute_kernels
    with _pytest.raises(KLTError, match="too small"):
        compute_kernels(0.2)
