"""Forward-backward consistency gates: sparse tracks + dense occlusion."""

import numpy as np
import jax
import jax.numpy as jnp

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.features import KLT_FB_INCONSISTENT
from pyfeaturetrack_tpu.ops.flow import dense_flow_fb
from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                          track_features_pyramids,
                                          track_features_pyramids_fb)

from conftest import make_textured_image, shift_image_bilinear


def _pyr(img, cfg):
    return jax.jit(build_track_pyramids, static_argnames=("cfg",))(
        jnp.asarray(img, jnp.float32), cfg)


def _grid(h, w, cfg, step=12):
    xs, ys = np.meshgrid(
        np.arange(cfg.borderx + 4, w - cfg.borderx - 4, step,
                  dtype=np.float32),
        np.arange(cfg.bordery + 4, h - cfg.bordery - 4, step,
                  dtype=np.float32))
    x = jnp.asarray(xs.ravel())
    y = jnp.asarray(ys.ravel())
    return x, y, jnp.ones((x.shape[0],), jnp.int32)


def test_fb_clean_translation_keeps_tracks():
    cfg = create_config()
    h, w = 96, 128
    base = make_textured_image(h, w, seed=21)
    p1 = _pyr(base, cfg)
    p2 = _pyr(shift_image_bilinear(base, 1.2, -0.7), cfg)
    x, y, val = _grid(h, w, cfg)
    fx, fy, fval, err = track_features_pyramids_fb(p1, p2, x, y, val,
                                                   cfg)
    nx, ny, nval = track_features_pyramids(p1, p2, x, y, val, cfg)
    v = np.asarray(fval)
    # on a clean pair the FB gate rejects (almost) nothing...
    assert (v == KLT_FB_INCONSISTENT).mean() < 0.05
    keep = v == 0
    assert keep.sum() > 20
    # ...kept lanes equal the plain forward result, with tiny round trip
    np.testing.assert_array_equal(np.asarray(fx)[keep],
                                  np.asarray(nx)[keep])
    assert np.asarray(err)[keep].max() < 0.2


def test_fb_occlusion_flags_covered_features():
    cfg = create_config()
    h, w = 128, 192
    base = make_textured_image(h, w, seed=22)
    img2 = shift_image_bilinear(base, 1.0, -0.5).copy()
    # occlude a block with a DIFFERENT texture: forward tracks landing
    # there either fail outright or come back FB-inconsistent
    img2[48:104, 96:168] = make_textured_image(56, 72, seed=99)
    p1 = _pyr(base, cfg)
    p2 = _pyr(img2, cfg)
    x, y, val = _grid(h, w, cfg, step=8)
    fx, fy, fval, err = track_features_pyramids_fb(p1, p2, x, y, val,
                                                   cfg)
    v = np.asarray(fval)
    inside = (np.asarray(x) > 102) & (np.asarray(x) < 162) & \
             (np.asarray(y) > 54) & (np.asarray(y) < 98)
    # occluded features must not survive as clean tracks
    assert inside.sum() >= 10
    assert (v[inside] == 0).mean() < 0.3
    assert (v == KLT_FB_INCONSISTENT).any()
    # in the interior but clear of the block (and of the borders / the
    # block's coarse-pyramid halo), tracks survive
    outside = ((np.asarray(x) > 25) & (np.asarray(x) < 70) &
               (np.asarray(y) > 25) & (np.asarray(y) < 100))
    assert outside.sum() >= 10
    assert (v[outside] == 0).mean() > 0.6


def test_sequence_tracker_fb_gate():
    """track_sequence(fb_max_displacement=...) keeps clean sequences
    intact and flags occluded tracks (which refill next frame)."""
    from pyfeaturetrack_tpu.models.sequence import track_sequence

    cfg = create_config()
    h, w = 96, 128
    base = make_textured_image(h, w, seed=30)
    frames = [shift_image_bilinear(base, 0.8 * i, -0.4 * i)
              for i in range(4)]
    ft, metrics = track_sequence(frames, cfg=cfg, n_features=30,
                                 replace_lost=True,
                                 fb_max_displacement=0.5)
    v = np.asarray(ft.val)
    assert (v[-1] >= 0).sum() >= 25  # clean sequence keeps its tracks

    occluded = list(frames)
    occluded[2] = occluded[2].copy()
    occluded[2][20:76, 30:100] = make_textured_image(56, 70, seed=31)
    ft2, m2 = track_sequence(occluded, cfg=cfg, n_features=30,
                             replace_lost=False,
                             fb_max_displacement=0.5)
    v2 = np.asarray(ft2.val)
    assert (v2[2] == KLT_FB_INCONSISTENT).any()  # gate fired
    # gate makes the survivor set no larger than the ungated run's
    ft3, _ = track_sequence(occluded, cfg=cfg, n_features=30,
                            replace_lost=False)
    assert (v2[2] >= 0).sum() <= (np.asarray(ft3.val)[2] >= 0).sum()


def test_dense_flow_fb_occlusion_mask():
    cfg = create_config()
    h, w = 96, 128
    base = make_textured_image(h, w, seed=23)
    img2 = shift_image_bilinear(base, 1.0, -0.5).copy()
    img2[30:70, 40:90] = make_textured_image(40, 50, seed=98)
    p1 = _pyr(base, cfg)
    p2 = _pyr(img2, cfg)
    fwd, err, valid = dense_flow_fb(p1, p2, cfg)
    valid = np.asarray(valid)
    inside = np.zeros((h, w), bool)
    inside[38:62, 48:82] = True
    outside = np.zeros((h, w), bool)
    outside[16:80, 12:28] = True
    assert valid[inside].mean() < 0.35  # occluded block mostly invalid
    assert valid[outside].mean() > 0.6  # clean area mostly valid
    e = np.asarray(err)
    assert np.isfinite(e[valid]).all() and e[valid].max() <= 0.5
