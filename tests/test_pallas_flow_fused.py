"""Dense flow through the gridded fused Pallas LK kernel == XLA dense
flow (interpret mode on the CPU backend; TPU honest-clock measurement
in ROOFLINE.md / DESIGN.md).

Two things are pinned here:

1. the feature-axis CHUNKING of ops/pallas_lk_fused.fused_track_level
   (grid over SMEM-blocked chunks, level images VMEM-resident) returns
   bit-equal results to the single-block kernel and to the XLA level —
   including a chunk size that forces padding of a ragged tail;
2. ops/flow.flow_level and dense_flow_pyramids dispatched through the
   fused kernel (PFT_PALLAS_LK=1) match the XLA dense path bit-for-bit
   on statuses and to float tolerance on flow.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.ops.convolve import (compute_gradients,
                                             compute_smoothed_image)
from pyfeaturetrack_tpu.ops.flow import dense_flow_pyramids, flow_level
from pyfeaturetrack_tpu.ops.pallas_lk_fused import (fused_level_available,
                                                    fused_track_level)
from pyfeaturetrack_tpu.ops.track import (build_track_pyramids_jit,
                                          track_feature_level)


def _pair(h, w, shift=(1, 2), seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h + 8, w + 8))
    k = np.array([1.0, 4, 6, 4, 1]) / 16.0
    for axis in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, base)
    dy, dx = shift
    return (jnp.asarray(base[:h, :w], jnp.float32),
            jnp.asarray(base[dy:h + dy, dx:w + dx], jnp.float32))


def _level(cfg, img1, img2):
    s1 = compute_smoothed_image(img1, cfg.smooth_sigma)
    s2 = compute_smoothed_image(img2, cfg.smooth_sigma)
    return (s1, *compute_gradients(s1, cfg.grad_sigma),
            s2, *compute_gradients(s2, cfg.grad_sigma))


def test_chunked_grid_matches_single_block_and_xla():
    """chunk=16 over n=50 (ragged tail -> padded grid) == whole-batch
    kernel == XLA level, statuses bit-equal."""
    cfg = create_config()
    h, w = 96, 128
    assert fused_level_available((h, w), cfg)
    lvl = _level(cfg, *_pair(h, w))
    rng = np.random.default_rng(7)
    n = 50
    x = jnp.asarray(rng.uniform(8, w - 9, n), jnp.float32)
    y = jnp.asarray(rng.uniform(8, h - 9, n), jnp.float32)
    act = jnp.asarray(rng.uniform(size=n) < 0.8)

    cx, cy, cs, ci = fused_track_level(x, y, x, y, *lvl, cfg, act,
                                       interpret=True, chunk=16)
    sx, sy, ss, si = fused_track_level(x, y, x, y, *lvl, cfg, act,
                                       interpret=True)
    rx, ry, rs, ri = track_feature_level(x, y, x, y, *lvl, cfg, act)

    np.testing.assert_array_equal(np.asarray(cs), np.asarray(ss))
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(si))
    np.testing.assert_array_equal(np.asarray(cx), np.asarray(sx))
    np.testing.assert_array_equal(np.asarray(cy), np.asarray(sy))
    np.testing.assert_array_equal(np.asarray(cs), np.asarray(rs))
    np.testing.assert_allclose(np.asarray(cx), np.asarray(rx), atol=1e-3)
    np.testing.assert_allclose(np.asarray(cy), np.asarray(ry), atol=1e-3)


def test_flow_level_fused_matches_xla(monkeypatch):
    """flow_level under PFT_PALLAS_LK=1: every pixel through the gridded
    kernel; status maps bit-equal, flow to float tolerance."""
    cfg = create_config()
    h, w = 40, 56
    assert fused_level_available((h, w), cfg)
    lvl = _level(cfg, *_pair(h, w, shift=(1, 1), seed=3))
    rng = np.random.default_rng(4)
    u0 = jnp.asarray(rng.uniform(-0.5, 0.5, (h, w)), jnp.float32)
    v0 = jnp.asarray(rng.uniform(-0.5, 0.5, (h, w)), jnp.float32)

    monkeypatch.delenv("PFT_PALLAS_LK", raising=False)
    ur, vr, sr = flow_level(*lvl, u0, v0, cfg)
    monkeypatch.setenv("PFT_PALLAS_LK", "1")
    uf, vf, sf = flow_level(*lvl, u0, v0, cfg)

    np.testing.assert_array_equal(np.asarray(sf), np.asarray(sr))
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ur), atol=1e-3)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vr), atol=1e-3)


def test_dense_flow_pyramids_fused_matches_xla(monkeypatch):
    """Full coarse-to-fine dense flow through the fused kernel == XLA
    dense flow (eager __wrapped__ calls so the env dispatch re-resolves
    per call instead of hitting the jit cache)."""
    cfg = create_config().validated_window()
    h, w = 48, 64
    img1, img2 = _pair(h, w, shift=(1, 2), seed=5)
    p1 = build_track_pyramids_jit(img1, cfg)
    p2 = build_track_pyramids_jit(img2, cfg)

    monkeypatch.delenv("PFT_PALLAS_LK", raising=False)
    ref = dense_flow_pyramids.__wrapped__(p1, p2, cfg)
    monkeypatch.setenv("PFT_PALLAS_LK", "1")
    fused = dense_flow_pyramids.__wrapped__(p1, p2, cfg)

    np.testing.assert_array_equal(np.asarray(fused.status),
                                  np.asarray(ref.status))
    tracked = np.asarray(ref.status) == 0
    assert tracked.sum() > 0.5 * tracked.size
    np.testing.assert_allclose(np.asarray(fused.u), np.asarray(ref.u),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(fused.v), np.asarray(ref.v),
                               atol=2e-3)


def test_dense_flow_pyramids_vec_matches_xla(monkeypatch):
    """Full coarse-to-fine dense flow through the feature-VECTORIZED
    kernel (PFT_PALLAS_LK=vec routes every pixel through the 32-lane
    tiled kernel with early exit + exact stale fallback) == XLA dense
    flow."""
    cfg = create_config().validated_window()
    h, w = 48, 64
    img1, img2 = _pair(h, w, shift=(1, 2), seed=5)
    p1 = build_track_pyramids_jit(img1, cfg)
    p2 = build_track_pyramids_jit(img2, cfg)

    monkeypatch.delenv("PFT_PALLAS_LK", raising=False)
    ref = dense_flow_pyramids.__wrapped__(p1, p2, cfg)
    monkeypatch.setenv("PFT_PALLAS_LK", "vec")
    vec = dense_flow_pyramids.__wrapped__(p1, p2, cfg)

    np.testing.assert_array_equal(np.asarray(vec.status),
                                  np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(vec.u), np.asarray(ref.u),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(vec.v), np.asarray(ref.v),
                               atol=2e-3)


def test_dense_disparity_vec_matches_xla(monkeypatch):
    """Dense 1-D disparity through the vec kernel's one_d lane == the
    XLA disparity path."""
    from pyfeaturetrack_tpu.ops.disparity import dense_disparity_pyramids

    cfg = create_config().validated_window()
    h, w = 48, 64
    rng = np.random.default_rng(9)
    base = rng.uniform(0, 255, (h, w + 8))
    k = np.array([1.0, 4, 6, 4, 1]) / 16.0
    for axis in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, base)
    left = np.asarray(base[:, 4:w + 4], np.float32)
    right = np.asarray(base[:, :w], np.float32)  # disparity = 4 px
    p_l = build_track_pyramids_jit(jnp.asarray(left), cfg)
    p_r = build_track_pyramids_jit(jnp.asarray(right), cfg)

    # __wrapped__: the jitted wrapper would cache the first env read
    monkeypatch.delenv("PFT_PALLAS_LK", raising=False)
    ref = dense_disparity_pyramids.__wrapped__(p_l, p_r, cfg,
                                               max_disparity=8.0)
    monkeypatch.setenv("PFT_PALLAS_LK", "vec")
    vec = dense_disparity_pyramids.__wrapped__(p_l, p_r, cfg,
                                               max_disparity=8.0)

    np.testing.assert_array_equal(np.asarray(vec.status),
                                  np.asarray(ref.status))
    ok = np.asarray(ref.status) == 0
    np.testing.assert_allclose(np.asarray(vec.d)[ok],
                               np.asarray(ref.d)[ok], atol=2e-3)
