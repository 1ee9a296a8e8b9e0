"""Sanitizer-style checks (SURVEY.md section 5.2): NaN debugging mode,
donation parity, verbosity, and debug image dumps."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pyfeaturetrack_tpu as pft
from pyfeaturetrack_tpu.errors import KLTSetVerbosity
from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                          track_features_pyramids)

from conftest import make_textured_image, shift_image_bilinear


@pytest.fixture(scope="module")
def pair():
    img1 = make_textured_image(96, 128, seed=61)
    return img1, shift_image_bilinear(img1, 0.9, -0.4)


def _inputs(cfg, pair, n=24):
    img1, img2 = pair
    rng = np.random.default_rng(0)
    p1 = build_track_pyramids(jnp.asarray(img1, jnp.float32), cfg)
    p2 = build_track_pyramids(jnp.asarray(img2, jnp.float32), cfg)
    x = jnp.asarray(rng.uniform(cfg.borderx + 1, 128 - cfg.borderx - 2, n),
                    jnp.float32)
    y = jnp.asarray(rng.uniform(cfg.bordery + 1, 96 - cfg.bordery - 2, n),
                    jnp.float32)
    val = jnp.ones((n,), jnp.int32)
    return p1, p2, x, y, val


def test_track_clean_under_debug_nans(pair):
    """The masked-lane design must not produce NaNs anywhere (frozen lanes
    included) — verified under jax_debug_nans."""
    cfg = pft.create_config()
    p1, p2, x, y, val = _inputs(cfg, pair)
    jax.config.update("jax_debug_nans", True)
    try:
        nx, ny, nval = track_features_pyramids(p1, p2, x, y, val, cfg)
        jax.block_until_ready((nx, ny, nval))
    finally:
        jax.config.update("jax_debug_nans", False)
    assert np.isfinite(np.asarray(nx)).all()


@pytest.mark.filterwarnings(
    "ignore:Some donated buffers were not usable")
def test_donation_parity(pair):
    """Donating the input pyramid buffers must not change results
    (SURVEY.md 5.2: donation/aliasing hazard check). The CPU backend
    declines some donations — that warning is the expected situation
    under test, not a defect."""
    cfg = pft.create_config()

    def step(p1, p2, x, y, val):
        return track_features_pyramids(p1, p2, x, y, val, cfg)

    plain = jax.jit(step)
    donating = jax.jit(step, donate_argnums=(0,))

    a = plain(*_inputs(cfg, pair))
    b = donating(*_inputs(cfg, pair))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               atol=1e-6)


def test_verbose_progress_lines(pair, capsys):
    img1, img2 = pair
    cfg = pft.create_config()
    KLTSetVerbosity(1)
    try:
        fl = pft.KLTSelectGoodFeatures(cfg, img1, 20)
        fl, _ = pft.KLTTrackFeatures(cfg, img1, img2, fl)
    finally:
        KLTSetVerbosity(0)
    err = capsys.readouterr().err
    assert "Selecting the 20 best features" in err
    assert "features found." in err
    assert "Tracking 20 features" in err
    assert "successfully tracked." in err


def test_write_internal_images(pair, tmp_path, monkeypatch):
    img1, _ = pair
    monkeypatch.chdir(tmp_path)
    cfg = pft.create_config(writeInternalImages=True)
    pft.KLTSelectGoodFeatures(cfg, img1, 10)
    for name in ("kltimg_sgfrlf.pgm", "kltimg_sgfrlf_gx.pgm",
                 "kltimg_sgfrlf_gy.pgm"):
        assert (tmp_path / name).exists(), name


def test_multihost_helpers_single_process():
    from pyfeaturetrack_tpu.parallel.multihost import (
        allgather_boundary_states, host_chunk_assignment,
        initialize_cluster)
    info = initialize_cluster()
    assert info["process_count"] == 1
    assert host_chunk_assignment(5) == [0, 1, 2, 3, 4]
    states = np.zeros((5, 4, 3), np.float32)
    np.testing.assert_array_equal(allgather_boundary_states(states), states)
