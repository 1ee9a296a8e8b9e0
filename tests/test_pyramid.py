"""Pyramid construction vs float64 oracle (decimation offset, dims)."""

import numpy as np
import pytest

from pyfeaturetrack_tpu.ops import pyramid as P
from pyfeaturetrack_tpu.oracle import klt_oracle as O


@pytest.mark.parametrize("subsampling,nlevels", [(4, 2), (2, 3), (8, 2)])
def test_pyramid_matches_oracle(textured_image, subsampling, nlevels):
    img = textured_image  # 120x160
    pyr = P.compute_pyramid(img.astype(np.float32), subsampling, nlevels, 0.9)
    gold = O.compute_pyramid(img, subsampling, nlevels, 0.9)
    assert pyr.nLevels == nlevels
    for ours, g in zip(pyr.levels, gold):
        assert ours.shape == g.shape
        np.testing.assert_allclose(np.asarray(ours), g, rtol=1e-5, atol=2e-3)


def test_pyramid_dims_floor_division():
    img = np.zeros((121, 163), np.float32)
    pyr = P.compute_pyramid(img, 4, 3, 0.9)
    assert pyr.levels[1].shape == (30, 40)
    assert pyr.levels[2].shape == (7, 10)


def test_gradient_pyramids(textured_image):
    img = textured_image.astype(np.float32)
    pyr = P.compute_pyramid(img, 4, 2, 0.9)
    gxp, gyp = P.compute_gradient_pyramids(pyr, 1.0)
    gold = O.compute_pyramid(textured_image, 4, 2, 0.9)
    for lvl in range(2):
        ogx, ogy = O.compute_gradients(gold[lvl], 1.0)
        np.testing.assert_allclose(np.asarray(gxp.levels[lvl]), ogx,
                                   rtol=1e-4, atol=5e-3)
        np.testing.assert_allclose(np.asarray(gyp.levels[lvl]), ogy,
                                   rtol=1e-4, atol=5e-3)
