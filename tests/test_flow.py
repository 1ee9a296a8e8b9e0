"""Dense pyramidal LK optical flow vs its float64 oracle + physics checks."""

import numpy as np
import jax
import jax.numpy as jnp

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.ops.flow import (dense_flow_pyramids, flow_to_rgb,
                                         upsample_flow, warp_image)
from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                          track_features_pyramids)
from pyfeaturetrack_tpu.oracle import flow_oracle


def _textured(h, w, seed=0, passes=2):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h + 16, w + 16))
    k = np.array([1.0, 4, 6, 4, 1]) / 16.0
    for _ in range(passes):
        for axis in (0, 1):
            img = np.apply_along_axis(
                lambda m: np.convolve(m, k, mode="same"), axis, img)
    return img


def _pair(h=96, w=128, shift=(1, 2), seed=0):
    base = _textured(h, w, seed)
    dy, dx = shift
    img1 = jnp.asarray(base[4:4 + h, 4:4 + w], jnp.float32)
    img2 = jnp.asarray(base[4 + dy:4 + h + dy, 4 + dx:4 + w + dx],
                       jnp.float32)
    return img1, img2


def _pyramids(img1, img2, cfg):
    build = jax.jit(build_track_pyramids, static_argnames=("cfg",))
    return build(img1, cfg), build(img2, cfg)


def test_flow_matches_oracle():
    cfg = create_config()
    img1, img2 = _pair()
    p1, p2 = _pyramids(img1, img2, cfg)
    got = dense_flow_pyramids(p1, p2, cfg)

    # identical level data into the oracle: LK parity isolated from
    # pyramid parity (covered in test_pyramid.py)
    lvl = lambda t: [np.asarray(a, np.float64) for a in t]  # noqa: E731
    ou, ov, ost = flow_oracle.dense_flow(
        lvl(p1.img), lvl(p1.gradx), lvl(p1.grady),
        lvl(p2.img), lvl(p2.gradx), lvl(p2.grady), cfg)

    st = np.asarray(got.status)
    np.testing.assert_array_equal(st, ost)
    both = st == 0
    assert both.mean() > 0.5  # scenario tracks most pixels
    np.testing.assert_allclose(np.asarray(got.u)[both], ou[both],
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(got.v)[both], ov[both],
                               atol=2e-2)


import pytest


@pytest.mark.parametrize("cfg_kw", [
    dict(nPyramidLevels=3, subsampling=2),
    dict(window_width=9, window_height=9),
    dict(max_iterations=4, min_displacement=0.05),
])
def test_flow_matches_oracle_config_matrix(cfg_kw):
    cfg = create_config().replace(**cfg_kw)
    img1, img2 = _pair(seed=14)
    p1, p2 = _pyramids(img1, img2, cfg)
    got = dense_flow_pyramids(p1, p2, cfg)
    lvl = lambda t: [np.asarray(a, np.float64) for a in t]  # noqa: E731
    ou, ov, ost = flow_oracle.dense_flow(
        lvl(p1.img), lvl(p1.gradx), lvl(p1.grady),
        lvl(p2.img), lvl(p2.gradx), lvl(p2.grady), cfg)
    st = np.asarray(got.status)
    # At 12k pixels x harder configs, a handful of lanes straddle a
    # float32-vs-float64 decision threshold (residue/convergence). Allow
    # <=0.1% classification straddles, but require the GEOMETRY to agree
    # there — a real algorithmic divergence would move the flow, a
    # threshold straddle does not. (Default config: test above is exact.)
    mism = st != ost
    assert mism.mean() <= 1e-3, f"{mism.sum()} status mismatches"
    if mism.any():
        du = np.abs(np.asarray(got.u)[mism] - ou[mism])
        dv = np.abs(np.asarray(got.v)[mism] - ov[mism])
        assert max(du.max(), dv.max()) < 0.2
    both = (st == 0) & (ost == 0)
    assert both.mean() > 0.25
    np.testing.assert_allclose(np.asarray(got.u)[both], ou[both],
                               atol=3e-2)
    np.testing.assert_allclose(np.asarray(got.v)[both], ov[both],
                               atol=3e-2)


def test_flow_recovers_uniform_translation():
    cfg = create_config()
    # content shifts by (-1, -2): true flow u = -2, v = -1
    img1, img2 = _pair(shift=(1, 2))
    p1, p2 = _pyramids(img1, img2, cfg)
    fl = dense_flow_pyramids(p1, p2, cfg)
    st = np.asarray(fl.status)
    interior = np.zeros_like(st, bool)
    interior[12:-12, 12:-12] = True
    m = interior & (st == 0)
    assert m.mean() > 0.4
    u = np.asarray(fl.u)[m]
    v = np.asarray(fl.v)[m]
    assert abs(np.median(u) + 2.0) < 0.05
    assert abs(np.median(v) + 1.0) < 0.05
    assert np.percentile(np.abs(u + 2.0), 90) < 0.2
    assert np.percentile(np.abs(v + 1.0), 90) < 0.2


def test_flow_matches_sparse_tracker():
    """Dense flow IS the sparse tracker at pixel centers (same level op);
    the only difference is the per-level init (re-gridded upsampled flow
    vs carried feature positions), so agreement is tight."""
    cfg = create_config()
    img1, img2 = _pair(shift=(1, 2), seed=3)
    p1, p2 = _pyramids(img1, img2, cfg)
    fl = dense_flow_pyramids(p1, p2, cfg)

    h, w = img1.shape
    gx, gy = np.meshgrid(np.arange(16, w - 16, 8, dtype=np.float32),
                         np.arange(16, h - 16, 8, dtype=np.float32))
    x = jnp.asarray(gx.ravel())
    y = jnp.asarray(gy.ravel())
    val = jnp.ones((x.shape[0],), jnp.int32)
    nx, ny, nval = track_features_pyramids(p1, p2, x, y, val, cfg)

    st = np.asarray(fl.status)
    u = np.asarray(fl.u)
    v = np.asarray(fl.v)
    ok = 0
    for xi, yi, xo, yo, vo in zip(np.asarray(x), np.asarray(y),
                                  np.asarray(nx), np.asarray(ny),
                                  np.asarray(nval)):
        r, c = int(yi), int(xi)
        if vo != 0 or st[r, c] != 0:
            continue
        assert abs((xo - xi) - u[r, c]) < 0.05
        assert abs((yo - yi) - v[r, c]) < 0.05
        ok += 1
    assert ok > 20  # enough agreeing samples to be meaningful


def test_flow_statuses_flat_and_rim():
    cfg = create_config()
    img = jnp.full((96, 128), 80.0, jnp.float32)
    p1, p2 = _pyramids(img, img, cfg)
    fl = dense_flow_pyramids(p1, p2, cfg)
    st = np.asarray(fl.status)
    assert (st[0, :] == -4).all() and (st[:, 0] == -4).all()  # OOB rim
    assert (st[20:-20, 20:-20] == -2).all()  # SMALL_DET interior


def test_upsample_flow_matches_oracle():
    rng = np.random.default_rng(0)
    u = rng.uniform(-3, 3, (24, 32)).astype(np.float32)
    got = np.asarray(upsample_flow(jnp.asarray(u), (96, 128), 4.0))
    want = flow_oracle.upsample_flow(u.astype(np.float64), (96, 128), 4.0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_warp_zero_flow_is_identity():
    img1, _ = _pair()
    z = jnp.zeros_like(img1)
    got = np.asarray(warp_image(img1, z, z))
    # rim row/col resolve to the previous texel (interp.bilinear clamp)
    np.testing.assert_allclose(got[:-1, :-1],
                               np.asarray(img1)[:-1, :-1], atol=1e-5)


def test_flow_to_rgb_shape_and_range():
    rng = np.random.default_rng(0)
    u = rng.uniform(-2, 2, (32, 48)).astype(np.float32)
    v = rng.uniform(-2, 2, (32, 48)).astype(np.float32)
    rgb = flow_to_rgb(u, v)
    assert rgb.shape == (32, 48, 3) and rgb.dtype == np.uint8
    assert rgb.max() > 200  # saturated hues present


def test_dense_flow_batched_equals_per_pair():
    """B lockstep pairs in one vmapped program == per-pair results."""
    from pyfeaturetrack_tpu.ops.flow import dense_flow_batched

    cfg = create_config()
    pairs = [_pair(h=48, w=64, shift=(1, 1), seed=s) for s in (3, 4, 5)]
    i1 = jnp.stack([p[0] for p in pairs])
    i2 = jnp.stack([p[1] for p in pairs])
    got = dense_flow_batched(i1, i2, cfg)
    assert got.u.shape == (3, 48, 64)
    for b, (a, c) in enumerate(pairs):
        p1, p2 = _pyramids(a, c, cfg)
        want = dense_flow_pyramids(p1, p2, cfg)
        np.testing.assert_array_equal(np.asarray(got.status[b]),
                                      np.asarray(want.status))
        np.testing.assert_allclose(np.asarray(got.u[b]),
                                   np.asarray(want.u), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.v[b]),
                                   np.asarray(want.v), atol=1e-5)
