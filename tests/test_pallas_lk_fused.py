"""Fused full-level Pallas LK kernel == XLA level loop (interpret mode
on the CPU backend; the TPU measurement lives in DESIGN.md §3).

The XLA path (ops/track.track_feature_level) is oracle-parity-tested in
test_track.py; these tests pin the fused kernel to it: bit-equal
statuses and iteration counts, positions to float tolerance (reduction
order inside the kernel differs from the batched XLA reductions).
"""

import functools

import numpy as np
import jax.numpy as jnp
import pytest

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.ops.convolve import (compute_gradients,
                                             compute_smoothed_image)
from pyfeaturetrack_tpu.ops.pallas_lk_fused import (fused_level_available,
                                                    fused_track_level)
from pyfeaturetrack_tpu.ops.track import track_feature_level


def _level_inputs(h, w, shift=(1, 2), seed=0, smooth_passes=1):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h + 8, w + 8))
    k = np.array([1.0, 4, 6, 4, 1]) / 16.0
    for _ in range(smooth_passes):
        for axis in (0, 1):
            base = np.apply_along_axis(
                lambda m: np.convolve(m, k, mode="same"), axis, base)
    dy, dx = shift
    img1 = jnp.asarray(base[:h, :w], jnp.float32)
    img2 = jnp.asarray(base[dy:h + dy, dx:w + dx], jnp.float32)
    return img1, img2


def _prep(cfg, img1, img2):
    s1 = compute_smoothed_image(img1, cfg.smooth_sigma)
    s2 = compute_smoothed_image(img2, cfg.smooth_sigma)
    gx1, gy1 = compute_gradients(s1, cfg.grad_sigma)
    gx2, gy2 = compute_gradients(s2, cfg.grad_sigma)
    return s1, gx1, gy1, s2, gx2, gy2


def _compare(cfg, h=120, w=160, n=64, seed=0, shift=(1, 2),
             active_frac=1.0, near_border=False):
    assert fused_level_available((h, w), cfg)
    img1, img2 = _level_inputs(h, w, shift=shift, seed=seed)
    lvl = _prep(cfg, img1, img2)
    rng = np.random.default_rng(seed + 1)
    if near_border:
        # positions hugging the window-fits boundary -> OOB triggers
        x = jnp.asarray(rng.uniform(3.0, 6.0, n), jnp.float32)
        y = jnp.asarray(rng.uniform(3.0, 6.0, n), jnp.float32)
    else:
        x = jnp.asarray(rng.uniform(8, w - 9, n), jnp.float32)
        y = jnp.asarray(rng.uniform(8, h - 9, n), jnp.float32)
    act = jnp.asarray(rng.uniform(size=n) < active_frac)

    fx, fy, fs, fi = fused_track_level(x, y, x, y, *lvl, cfg, act,
                                       interpret=True)
    rx, ry, rs, ri = track_feature_level(x, y, x, y, *lvl, cfg, act)

    np.testing.assert_array_equal(np.asarray(fs), np.asarray(rs))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(fx), np.asarray(rx), atol=1e-3)
    np.testing.assert_allclose(np.asarray(fy), np.asarray(ry), atol=1e-3)
    return np.asarray(rs), np.asarray(act)


def test_fused_matches_xla_default():
    rs, act = _compare(create_config())
    assert (rs[act] == 0).sum() > 10  # scenario actually tracks


def test_fused_matches_xla_inactive_lanes_pass_through():
    _compare(create_config(), active_frac=0.6, seed=3)


def test_fused_matches_xla_near_border_oob():
    rs, act = _compare(create_config(), near_border=True, seed=4)
    assert (rs[act] == -4).any()  # KLT_OOB exercised


def test_fused_matches_xla_right_bottom_edge_band():
    """Features in the LAST in-bounds window position (x close to
    ncols-hw-1): the patch-origin clamp must match interp.patch_indices
    or the fetched window shifts by one texel (regression: the kernel
    clamped one pixel too tight and mis-tracked the right/bottom band).
    """
    cfg = create_config()
    h, w = 120, 160
    img1, img2 = _level_inputs(h, w, shift=(1, 1), seed=12)
    lvl = _prep(cfg, img1, img2)
    hw = cfg.window_width // 2
    rng = np.random.default_rng(13)
    n = 40
    # hug the high-side bounds_ok limit on x, y, and both
    x = np.concatenate([rng.uniform(w - hw - 2.0, w - hw - 1.01, n // 2),
                        rng.uniform(10, 20, n - n // 2)])
    y = np.concatenate([rng.uniform(10, 20, n // 2),
                        rng.uniform(h - hw - 2.0, h - hw - 1.01,
                                    n - n // 2)])
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    act = jnp.ones((n,), bool)
    fx, fy, fs, fi = fused_track_level(x, y, x, y, *lvl, cfg, act,
                                       interpret=True)
    rx, ry, rs, ri = track_feature_level(x, y, x, y, *lvl, cfg, act)
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(rs))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(fx), np.asarray(rx), atol=1e-3)
    np.testing.assert_allclose(np.asarray(fy), np.asarray(ry), atol=1e-3)


def test_fused_matches_xla_small_det():
    # flat image -> zero gradients -> SMALL_DET everywhere
    cfg = create_config()
    h, w, n = 120, 160, 16
    img = jnp.full((h, w), 100.0, jnp.float32)
    lvl = _prep(cfg, img, img)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(10, w - 11, n), jnp.float32)
    y = jnp.asarray(rng.uniform(10, h - 11, n), jnp.float32)
    act = jnp.ones((n,), bool)
    fx, fy, fs, fi = fused_track_level(x, y, x, y, *lvl, cfg, act,
                                       interpret=True)
    rx, ry, rs, ri = track_feature_level(x, y, x, y, *lvl, cfg, act)
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(rs))
    assert (np.asarray(rs) == -2).all()  # KLT_SMALL_DET


def test_fused_matches_xla_max_iterations_and_residue():
    # unrelated frames -> large residue; tiny min_displacement with few
    # iterations -> MAX_ITERATIONS; both classified identically
    cfg = create_config().replace(max_iterations=3,
                                  min_displacement=1e-6,
                                  max_residue=2.0)
    img1, _ = _level_inputs(120, 160, seed=0)
    _, img2 = _level_inputs(120, 160, seed=9)
    lvl = _prep(cfg, img1, img2)
    rng = np.random.default_rng(2)
    n = 48
    x = jnp.asarray(rng.uniform(10, 149, n), jnp.float32)
    y = jnp.asarray(rng.uniform(10, 109, n), jnp.float32)
    act = jnp.ones((n,), bool)
    fx, fy, fs, fi = fused_track_level(x, y, x, y, *lvl, cfg, act,
                                       interpret=True)
    rx, ry, rs, ri = track_feature_level(x, y, x, y, *lvl, cfg, act)
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(rs))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(ri))
    got = set(np.unique(np.asarray(rs)))
    assert got & {-3, -5}  # MAX_ITERATIONS / LARGE_RESIDUE exercised


def test_fused_matches_xla_lighting_insensitive():
    cfg = create_config().replace(lighting_insensitive=True)
    img1, img2 = _level_inputs(120, 160, seed=5)
    img2 = img2 * 1.3 + 12.0  # gain + bias change
    lvl = _prep(cfg, img1, img2)
    rng = np.random.default_rng(6)
    n = 40
    x = jnp.asarray(rng.uniform(8, 151, n), jnp.float32)
    y = jnp.asarray(rng.uniform(8, 111, n), jnp.float32)
    act = jnp.ones((n,), bool)
    fx, fy, fs, fi = fused_track_level(x, y, x, y, *lvl, cfg, act,
                                       interpret=True)
    rx, ry, rs, ri = track_feature_level(x, y, x, y, *lvl, cfg, act)
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(rs))
    np.testing.assert_allclose(np.asarray(fx), np.asarray(rx), atol=2e-3)
    np.testing.assert_allclose(np.asarray(fy), np.asarray(ry), atol=2e-3)


@pytest.mark.parametrize("wsz", [5, 9, 13])
def test_fused_matches_xla_window_sizes(wsz):
    cfg = create_config().replace(window_width=wsz, window_height=wsz)
    _compare(cfg, seed=wsz)


def test_fused_full_pyramid_env_dispatch(monkeypatch):
    """PFT_PALLAS_LK=1 routes track_features_pyramids through the fused
    kernel; result matches the XLA pyramid path. Unique image dims keep
    the trace-time env read out of other tests' jit cache entries."""
    import jax

    from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                              track_features_pyramids)
    cfg = create_config()
    h, w, n = 112, 208, 30
    img1, img2 = _level_inputs(h, w, seed=7)
    build = jax.jit(build_track_pyramids, static_argnames=("cfg",))
    p1 = build(img1, cfg)
    p2 = build(img2, cfg)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.uniform(cfg.borderx + 1, w - cfg.borderx - 2, n),
                    jnp.float32)
    y = jnp.asarray(rng.uniform(cfg.bordery + 1, h - cfg.bordery - 2, n),
                    jnp.float32)
    val = jnp.ones((n,), jnp.int32)

    monkeypatch.delenv("PFT_PALLAS_LK", raising=False)
    rx, ry, rv = track_features_pyramids(p1, p2, x, y, val, cfg)
    monkeypatch.setenv("PFT_PALLAS_LK", "1")
    # fresh trace (distinct wrapper) so the env read re-executes
    fused_fn = jax.jit(functools.partial(
        track_features_pyramids.__wrapped__, cfg=cfg))
    fx, fy, fv = fused_fn(p1, p2, x, y, val)
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(rv))
    np.testing.assert_allclose(np.asarray(fx), np.asarray(rx), atol=1e-3)
    np.testing.assert_allclose(np.asarray(fy), np.asarray(ry), atol=1e-3)
