"""Convolution / smoothing / gradients vs float64 oracle, incl. borders."""

import numpy as np
import pytest

from pyfeaturetrack_tpu.ops import convolve as C
from pyfeaturetrack_tpu.ops import kernels as K
from pyfeaturetrack_tpu.oracle import klt_oracle as O


@pytest.mark.parametrize("sigma", [0.7, 1.0, 3.6])
def test_convolve_separate_matches_oracle(textured_image, sigma):
    img = textured_image[:40, :56]
    g, d = K.compute_kernels(sigma)
    ours = np.asarray(C.convolve_separate(img.astype(np.float32), g, d))
    gold = O.convolve_separate(img, g.astype(np.float64), d.astype(np.float64))
    np.testing.assert_allclose(ours, gold, rtol=1e-5, atol=1e-3)


def test_border_zeroing(textured_image):
    img = textured_image[:32, :48].astype(np.float32)
    g, _ = K.compute_kernels(1.0)  # width 7 -> radius 3
    radius = g.shape[0] // 2
    h = np.asarray(C.convolve_horiz(img, g))
    assert (h[:, :radius] == 0).all() and (h[:, -radius:] == 0).all()
    assert (h[:, radius:-radius] != 0).any()
    v = np.asarray(C.convolve_vert(img, g))
    assert (v[:radius, :] == 0).all() and (v[-radius:, :] == 0).all()


def test_gradients_match_oracle(textured_image):
    img = textured_image[:48, :64]
    gx, gy = C.compute_gradients(img.astype(np.float32), 1.0)
    ogx, ogy = O.compute_gradients(img, 1.0)
    np.testing.assert_allclose(np.asarray(gx), ogx, rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(gy), ogy, rtol=1e-4, atol=5e-3)


def test_gradient_sign_on_ramp():
    # increasing-x ramp must give positive gradx ~ 1.0 in the interior
    img = np.tile(np.arange(64, dtype=np.float32), (32, 1))
    gx, gy = C.compute_gradients(img, 1.0)
    gx = np.asarray(gx)
    assert abs(float(gx[16, 32]) - 1.0) < 1e-3
    assert abs(float(np.asarray(gy)[16, 32])) < 1e-3


def test_smoothed_image_matches_oracle(textured_image):
    img = textured_image[:40, :40]
    ours = np.asarray(C.compute_smoothed_image(img.astype(np.float32), 0.7))
    gold = O.compute_smoothed_image(img, 0.7)
    np.testing.assert_allclose(ours, gold, rtol=1e-5, atol=1e-3)


def test_batched_leading_dims(textured_image):
    img = textured_image[:32, :32].astype(np.float32)
    batch = np.stack([img, img * 0.5])
    g, _ = K.compute_kernels(1.0)
    out = np.asarray(C.convolve_horiz(batch, g))
    single = np.asarray(C.convolve_horiz(img, g))
    np.testing.assert_allclose(out[0], single, rtol=1e-6)
    np.testing.assert_allclose(out[1], single * 0.5, rtol=1e-5, atol=1e-4)


def test_conv_kernel_wider_than_image_returns_zeros():
    """Deep KLTChangeTCPyramid configs on small frames produce pyramid
    levels narrower than the smoothing kernel (e.g. search_range 60 at
    240x320 -> subsampling 8, sigma 7.2 on a 30x40 level). The
    reference zeroes a radius-wide border; when the border covers the
    whole image the conv must return zeros instead of crashing
    (round-5 regression: negative-size valid conv)."""
    import numpy as np
    import jax.numpy as jnp

    from pyfeaturetrack_tpu.config import change_pyramid, create_config
    from pyfeaturetrack_tpu.ops.convolve import compute_smoothed_image
    from pyfeaturetrack_tpu.ops.kernels import compute_kernels
    from pyfeaturetrack_tpu.ops.track import build_track_pyramids

    img = jnp.asarray(np.arange(30 * 40, dtype=np.float32
                                ).reshape(30, 40))
    k, _ = compute_kernels(7.2)
    assert k.shape[0] > 40  # the degenerate premise
    out = compute_smoothed_image(img, 7.2)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    # and the whole pyramid build survives the config that hit it
    cfg = change_pyramid(create_config(), search_range=60)
    pyr = build_track_pyramids(jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (240, 320)),
        jnp.float32), cfg)
    assert len(pyr.img) == cfg.nPyramidLevels
