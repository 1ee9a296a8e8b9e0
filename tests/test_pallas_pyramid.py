"""Fused Pallas pyramid kernels == XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.ops.convolve import (compute_gradients,
                                             compute_smoothed_image)
from pyfeaturetrack_tpu.ops.kernels import compute_kernels
from pyfeaturetrack_tpu.ops.pallas_pyramid import (build_track_pyramids_pallas,
                                                   fused_level_build,
                                                   fused_level_build_tiled)
from pyfeaturetrack_tpu.ops.track import build_track_pyramids


@pytest.fixture(scope="module")
def kernels():
    sg, _ = compute_kernels(0.7)
    gg, gd = compute_kernels(1.0)
    pg, _ = compute_kernels(3.6)
    return (tuple(map(float, sg)),
            (tuple(map(float, gg)), tuple(map(float, gd))),
            tuple(map(float, pg)))


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(5)
    return jnp.asarray(rng.uniform(0, 255, (96, 128)), jnp.float32)


def _reference(img, smooth_sigma=0.7, grad_sigma=1.0, pyr_sigma=3.6):
    base = compute_smoothed_image(img, smooth_sigma)
    gx, gy = compute_gradients(base, grad_sigma)
    smp = compute_smoothed_image(base, pyr_sigma)
    return base, gx, gy, smp


def test_single_block_matches_xla(kernels, img):
    sk, gk, pk = kernels
    want = _reference(img)
    got = fused_level_build(img, sk, gk, pk)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-3)


@pytest.mark.parametrize("tile", [16, 32, 64])
def test_tiled_matches_xla(kernels, img, tile):
    sk, gk, pk = kernels
    want = _reference(img)
    got = fused_level_build_tiled(img, sk, gk, pk, tile=tile)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-3)


def test_tiled_no_smooth_no_pyr(kernels, img):
    sk, gk, pk = kernels
    gx_w, gy_w = compute_gradients(img, 1.0)
    base, gx, gy, smp, _ = fused_level_build_tiled(img, None, gk,
                                                   None)
    assert smp is None
    np.testing.assert_allclose(np.asarray(base), np.asarray(img))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_w), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_w), atol=1e-3)


def test_full_pyramid_build_matches(img):
    cfg = create_config()
    a = build_track_pyramids(img, cfg)
    b = build_track_pyramids_pallas(img, cfg)
    for lvl in range(cfg.nPyramidLevels):
        np.testing.assert_allclose(np.asarray(a.img[lvl]),
                                   np.asarray(b.img[lvl]), atol=1e-3)
        np.testing.assert_allclose(np.asarray(a.gradx[lvl]),
                                   np.asarray(b.gradx[lvl]), atol=1e-3)
        np.testing.assert_allclose(np.asarray(a.grady[lvl]),
                                   np.asarray(b.grady[lvl]), atol=1e-3)


def test_odd_sizes(kernels):
    """Non-multiple-of-tile row counts pad and slice correctly."""
    sk, gk, pk = kernels
    rng = np.random.default_rng(6)
    for shape in [(50, 128), (97, 256), (130, 128)]:
        im = jnp.asarray(rng.uniform(0, 255, shape), jnp.float32)
        want = _reference(im)
        got = fused_level_build_tiled(im, sk, gk, pk, tile=32)
        for g, w in zip(got, want):
            assert g.shape == w.shape
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=1e-3)


@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("sub", [2, 4])
def test_in_kernel_decimation_matches_strided_slice(kernels, img, tiled,
                                                    sub):
    """The dec output == smp[subhalf::sub, subhalf::sub][:h2, :w2]
    bitwise (one-hot dots select, never round). This replaces the XLA
    strided slice that lowered to a ~185 us lane gather per frame."""
    sk, gk, pk = kernels
    h, w = img.shape
    subhalf = sub // 2
    h2, w2 = h // sub, w // sub
    dec = (sub, subhalf, h2, w2)
    if tiled:
        *_, smp, decd = fused_level_build_tiled(img, sk, gk, pk,
                                                tile=32, dec=dec)
    else:
        *_, smp, decd = fused_level_build(img, sk, gk, pk, dec=dec)
    want = np.asarray(smp)[subhalf::sub, subhalf::sub][:h2, :w2]
    np.testing.assert_array_equal(np.asarray(decd), want)
