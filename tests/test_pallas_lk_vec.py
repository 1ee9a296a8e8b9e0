"""Feature-vectorized fused Pallas LK kernel == XLA level loop
(interpret mode on the CPU backend; under PFT_TEST_PLATFORM=tpu the
REAL kernel runs on the chip and positions get the documented on-chip
tolerance — see _INTERP/_ATOL below and PARITY.md round-4).

The XLA path (ops/track.track_feature_level) is oracle-parity-tested in
test_track.py; these tests pin the vectorized kernel to it. Non-stale
lanes are BITWISE equal (the batched one-hot extraction reproduces the
XLA gather exactly); stale lanes (drifted outside their block corridor)
are recomputed by the serial fused kernel inside
vec_track_level_with_fallback, whose reduction order differs -> float
tolerance on positions, statuses/iterations still exactly equal.
"""

import functools

import numpy as np
import jax.numpy as jnp
import pytest

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.ops.convolve import (compute_gradients,
                                             compute_smoothed_image)
from pyfeaturetrack_tpu.ops.pallas_lk_vec import (
    vec_level_available, vec_track_level, vec_track_level_with_fallback)
from pyfeaturetrack_tpu.ops.track import track_feature_level

import jax

# CPU suite: interpret mode, near-bitwise tolerances. On the real chip
# (PFT_TEST_PLATFORM=tpu) the REAL kernel runs; statuses/iterations
# stay asserted EXACTLY equal, while positions carry the documented
# on-chip tolerance (0.05 px — TPU fusion/FMA rounding differs between
# the kernel's VPU ops and the XLA gather path's fused blends; same
# bar the serial fused kernel met at 0.037 px, DESIGN.md §3).
_INTERP = jax.default_backend() == "cpu"
_ATOL = 1e-3 if _INTERP else 5e-2
_ATOL_TIGHT = 1e-5 if _INTERP else 5e-2


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


def _assert_matches(cfg, lvl, x, y, act, atol=None):
    atol = _ATOL if atol is None else atol
    vx, vy, vs, vi = vec_track_level_with_fallback(
        x, y, x, y, *lvl, cfg, act, interpret=_INTERP)
    rx, ry, rs, ri = track_feature_level(x, y, x, y, *lvl, cfg, act)
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(rs))
    np.testing.assert_array_equal(np.asarray(vi), np.asarray(ri))
    if _INTERP:
        np.testing.assert_allclose(np.asarray(vx), np.asarray(rx),
                                   atol=atol)
        np.testing.assert_allclose(np.asarray(vy), np.asarray(ry),
                                   atol=atol)
        return np.asarray(rs)
    # on-chip: lanes beyond the standard bar are ENUMERATED and
    # CLASSIFIED, not blanket-tolerated (PARITY.md parity discipline).
    # Measured round-4 sweep: the only violators are STALE-fallback
    # lanes in large-shift scenarios (recomputed by the serial kernel
    # and iterated to the cap, compounding per-iteration FMA-rounding
    # differences; worst observed 0.063 px at 1/96 lanes) — so every
    # deviating lane must be stale, few (<=5%), and within 0.25 px.
    *_, stale = vec_track_level(x, y, x, y, *lvl, cfg, act,
                                interpret=False)
    stale = np.asarray(stale)
    dx = np.abs(np.asarray(vx) - np.asarray(rx))
    dy = np.abs(np.asarray(vy) - np.asarray(ry))
    dev = (dx > atol) | (dy > atol)
    assert np.all(~dev | stale), (
        f"non-stale lanes beyond {atol}px: {np.flatnonzero(dev & ~stale)}")
    assert dev.sum() <= max(2, int(0.05 * len(dx))), (
        f"{dev.sum()} stale lanes beyond {atol}px")
    assert float(np.maximum(dx, dy).max(initial=0.0)) <= 0.25
    return np.asarray(rs)


def _compare(cfg, h=120, w=160, n=64, seed=0, shift=(1, 2),
             active_frac=1.0, near_border=False, atol=None):
    assert vec_level_available((h, w), cfg)
    img1, img2 = _level_inputs(h, w, shift=shift, seed=seed)
    lvl = _prep(cfg, img1, img2)
    rng = np.random.default_rng(seed + 1)
    if near_border:
        x = jnp.asarray(rng.uniform(3.0, 6.0, n), jnp.float32)
        y = jnp.asarray(rng.uniform(3.0, 6.0, n), jnp.float32)
    else:
        x = jnp.asarray(rng.uniform(8, w - 9, n), jnp.float32)
        y = jnp.asarray(rng.uniform(8, h - 9, n), jnp.float32)
    act = jnp.asarray(rng.uniform(size=n) < active_frac)
    rs = _assert_matches(cfg, lvl, x, y, act, atol=atol)
    return rs, np.asarray(act)


def test_vec_matches_xla_default():
    rs, act = _compare(create_config())
    assert (rs[act] == 0).sum() > 10


def test_vec_nonstale_lanes_near_bitwise_equal():
    """Without the fallback merge, non-stale lanes reproduce the XLA
    path's arithmetic: statuses/iterations exactly, positions to ulp-
    level tolerance. (On single-device runs positions measured BITWISE
    equal; under the suite's 8-virtual-device CPU mesh XLA re-vectorizes
    its gather reductions and a lane can drift by ~4e-6.)"""
    cfg = create_config()
    h, w, n = 120, 160, 64
    img1, img2 = _level_inputs(h, w, seed=0)
    lvl = _prep(cfg, img1, img2)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(8, w - 9, n), jnp.float32)
    y = jnp.asarray(rng.uniform(8, h - 9, n), jnp.float32)
    act = jnp.ones((n,), bool)
    vx, vy, vs, vi, stale = vec_track_level(
        x, y, x, y, *lvl, cfg, act, interpret=_INTERP)
    rx, ry, rs, ri = track_feature_level(x, y, x, y, *lvl, cfg, act)
    ns = ~np.asarray(stale)
    assert ns.sum() > n // 2  # corridor keeps most lanes vectorized
    np.testing.assert_array_equal(np.asarray(vs)[ns], np.asarray(rs)[ns])
    np.testing.assert_array_equal(np.asarray(vi)[ns], np.asarray(ri)[ns])
    np.testing.assert_allclose(np.asarray(vx)[ns], np.asarray(rx)[ns],
                               atol=_ATOL_TIGHT)
    np.testing.assert_allclose(np.asarray(vy)[ns], np.asarray(ry)[ns],
                               atol=_ATOL_TIGHT)


def test_vec_stale_lanes_recovered_exactly():
    """A large shift drives tracks far from their entry position so
    some lanes leave the block corridor; the fallback must hand exactly
    those lanes to the serial kernel and match the XLA path."""
    cfg = create_config()
    h, w, n = 120, 160, 96
    img1, img2 = _level_inputs(h, w, shift=(5, 9), seed=2)
    lvl = _prep(cfg, img1, img2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(12, w - 13, n), jnp.float32)
    y = jnp.asarray(rng.uniform(12, h - 13, n), jnp.float32)
    act = jnp.ones((n,), bool)
    _, _, _, _, stale = vec_track_level(x, y, x, y, *lvl, cfg, act,
                                        interpret=_INTERP)
    assert np.asarray(stale).any()  # scenario actually exercises stale
    _assert_matches(cfg, lvl, x, y, act)


def test_vec_inactive_lanes_pass_through():
    _compare(create_config(), active_frac=0.6, seed=3)


def test_vec_near_border_oob():
    rs, act = _compare(create_config(), near_border=True, seed=4)
    assert (rs[act] == -4).any()  # KLT_OOB exercised


def test_vec_right_bottom_edge_band():
    cfg = create_config()
    h, w = 120, 160
    img1, img2 = _level_inputs(h, w, shift=(1, 1), seed=12)
    lvl = _prep(cfg, img1, img2)
    hw = cfg.window_width // 2
    rng = np.random.default_rng(13)
    n = 40
    x = np.concatenate([rng.uniform(w - hw - 2.0, w - hw - 1.01, n // 2),
                        rng.uniform(10, 20, n - n // 2)])
    y = np.concatenate([rng.uniform(10, 20, n // 2),
                        rng.uniform(h - hw - 2.0, h - hw - 1.01,
                                    n - n // 2)])
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    act = jnp.ones((n,), bool)
    _assert_matches(cfg, lvl, x, y, act)


def test_vec_small_det():
    cfg = create_config()
    h, w, n = 120, 160, 16
    img = jnp.full((h, w), 100.0, jnp.float32)
    lvl = _prep(cfg, img, img)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(10, w - 11, n), jnp.float32)
    y = jnp.asarray(rng.uniform(10, h - 11, n), jnp.float32)
    act = jnp.ones((n,), bool)
    rs = _assert_matches(cfg, lvl, x, y, act)
    assert (rs == -2).all()  # KLT_SMALL_DET


def test_vec_max_iterations_and_residue():
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
    rs = _assert_matches(cfg, lvl, x, y, act)
    assert set(np.unique(rs)) & {-3, -5}


def test_vec_lighting_insensitive():
    cfg = create_config().replace(lighting_insensitive=True)
    img1, img2 = _level_inputs(120, 160, seed=5)
    img2 = img2 * 1.3 + 12.0
    lvl = _prep(cfg, img1, img2)
    rng = np.random.default_rng(6)
    n = 40
    x = jnp.asarray(rng.uniform(8, 151, n), jnp.float32)
    y = jnp.asarray(rng.uniform(8, 111, n), jnp.float32)
    act = jnp.ones((n,), bool)
    _assert_matches(cfg, lvl, x, y, act, atol=2e-3)


@pytest.mark.parametrize("wsz", [5, 9, 13])
def test_vec_window_sizes(wsz):
    cfg = create_config().replace(window_width=wsz, window_height=wsz)
    _compare(cfg, seed=wsz)


def test_vec_one_d_matches_fused_one_d():
    """1-D (rectified stereo) mode pins dy = 0; compare against the
    serial fused kernel's one_d lane (itself disparity-parity-tested)."""
    from pyfeaturetrack_tpu.ops.pallas_lk_fused import fused_track_level
    cfg = create_config()
    img1, img2 = _level_inputs(120, 160, shift=(0, 2), seed=20)
    lvl = _prep(cfg, img1, img2)
    rng = np.random.default_rng(21)
    n = 40
    x = jnp.asarray(rng.uniform(10, 149, n), jnp.float32)
    y = jnp.asarray(rng.uniform(10, 109, n), jnp.float32)
    act = jnp.ones((n,), bool)
    vx, vy, vs, vi, stale = vec_track_level(
        x, y, x, y, *lvl, cfg, act, interpret=_INTERP, one_d=True)
    fx, fy, fs, fi = fused_track_level(x, y, x, y, *lvl, cfg, act,
                                       interpret=_INTERP, one_d=True)
    ns = ~np.asarray(stale)
    assert ns.sum() > n // 2
    np.testing.assert_array_equal(np.asarray(vs)[ns], np.asarray(fs)[ns])
    np.testing.assert_array_equal(np.asarray(vy)[ns], np.asarray(y)[ns])
    np.testing.assert_allclose(np.asarray(vx)[ns], np.asarray(fx)[ns],
                               atol=_ATOL)


def test_vec_full_pyramid_env_dispatch(monkeypatch):
    """PFT_PALLAS_LK=vec routes track_features_pyramids through the
    vectorized kernel; result matches the XLA pyramid path. Unique image
    dims keep the trace-time env read out of other tests' jit caches."""
    import jax

    from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                              track_features_pyramids)
    cfg = create_config()
    h, w, n = 104, 224, 30
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
    monkeypatch.setenv("PFT_PALLAS_LK", "vec")
    vec_fn = jax.jit(functools.partial(
        track_features_pyramids.__wrapped__, cfg=cfg))
    vx, vy, vv = vec_fn(p1, p2, x, y, val)
    np.testing.assert_array_equal(np.asarray(vv), np.asarray(rv))
    np.testing.assert_allclose(np.asarray(vx), np.asarray(rx), atol=_ATOL)
    np.testing.assert_allclose(np.asarray(vy), np.asarray(ry), atol=_ATOL)


def test_vec_hbm_mode_matches_vmem_mode():
    """force_hbm=True (images in ANY memory, per-feature async-DMA
    fetch — the 1080p config-4 path) is bitwise equal to the
    VMEM-resident form on the same inputs."""
    cfg = create_config()
    h, w, n = 120, 160, 48
    img1, img2 = _level_inputs(h, w, seed=17)
    lvl = _prep(cfg, img1, img2)
    rng = np.random.default_rng(18)
    x = jnp.asarray(rng.uniform(8, w - 9, n), jnp.float32)
    y = jnp.asarray(rng.uniform(8, h - 9, n), jnp.float32)
    act = jnp.asarray(rng.uniform(size=n) < 0.9)
    a = vec_track_level(x, y, x, y, *lvl, cfg, act, interpret=_INTERP,
                        force_hbm=False)
    b = vec_track_level(x, y, x, y, *lvl, cfg, act, interpret=_INTERP,
                        force_hbm=True)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_vec_hbm_gate_and_stale_fallback_beyond_fused():
    """1080p level 0 is beyond the serial fused kernel's VMEM gate but
    (round 5) inside the vec kernel's raised VMEM-resident budget; 4K
    exceeds it and takes the HBM-images mode. The stale fallback beyond
    the fused gate routes through the XLA level loop and still matches
    it exactly. (Small image with forced HBM + a large shift exercises
    the same code path without a 1080p compile in the suite.)"""
    from pyfeaturetrack_tpu.ops.pallas_lk_fused import \
        fused_level_available
    from pyfeaturetrack_tpu.ops.pallas_lk_vec import \
        vec_level_available_hbm
    cfg = create_config()
    assert not fused_level_available((1088, 1920), cfg)
    assert vec_level_available_hbm((1088, 1920), cfg)
    assert vec_level_available((1088, 1920), cfg)      # round-5 budget
    assert not vec_level_available((2176, 3840), cfg)  # 4K -> HBM mode
    assert vec_level_available_hbm((2176, 3840), cfg)

    h, w, n = 120, 160, 64
    img1, img2 = _level_inputs(h, w, shift=(5, 9), seed=2)
    lvl = _prep(cfg, img1, img2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(12, w - 13, n), jnp.float32)
    y = jnp.asarray(rng.uniform(12, h - 13, n), jnp.float32)
    act = jnp.ones((n,), bool)
    _, _, _, _, stale = vec_track_level(x, y, x, y, *lvl, cfg, act,
                                        interpret=_INTERP, force_hbm=True)
    assert np.asarray(stale).any()
    _assert_matches(cfg, lvl, x, y, act)


def test_vec_gate_rejects_window_wider_than_patch_slot(monkeypatch):
    """ADVICE r4 (medium): an asymmetric window with
    ww + 1 > _phs(wh) (e.g. 9x7 -> patch slot 8 lanes/section) would
    silently read across the packed bundle's section boundary. The
    availability gate must reject it so the dispatcher falls back to
    the XLA path — end-to-end results must equal the no-Pallas run
    bitwise."""
    from pyfeaturetrack_tpu.ops.pallas_lk_vec import (
        _phs, vec_level_available_hbm)
    from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                              track_features_pyramids)
    cfg = create_config().replace(window_width=9, window_height=7)
    assert cfg.window_width + 1 > _phs(cfg.window_height)
    assert not vec_level_available((120, 160), cfg)
    assert not vec_level_available_hbm((120, 160), cfg)
    # a taller-than-wide window still fits (slot 16 >= 7+1) — the gate
    # must not over-reject
    cfg_tall = create_config().replace(window_width=7, window_height=9)
    assert vec_level_available((120, 160), cfg_tall)

    h, w, n = 120, 160, 32
    img1, img2 = _level_inputs(h, w, seed=31)
    build = jax.jit(build_track_pyramids, static_argnames=("cfg",))
    p1, p2 = build(img1, cfg), build(img2, cfg)
    rng = np.random.default_rng(32)
    x = jnp.asarray(rng.uniform(cfg.borderx + 1, w - cfg.borderx - 2, n),
                    jnp.float32)
    y = jnp.asarray(rng.uniform(cfg.bordery + 1, h - cfg.bordery - 2, n),
                    jnp.float32)
    val = jnp.ones((n,), jnp.int32)
    monkeypatch.delenv("PFT_PALLAS_LK", raising=False)
    ref = track_features_pyramids(p1, p2, x, y, val, cfg)
    monkeypatch.setenv("PFT_PALLAS_LK", "vec")
    vec_fn = jax.jit(functools.partial(
        track_features_pyramids.__wrapped__, cfg=cfg))
    got = vec_fn(p1, p2, x, y, val)
    for u, v in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_vec_bf16_storage_matches_xla_bf16(monkeypatch):
    """bf16 image storage through the vec lane == the XLA bf16 path:
    both upcast the stored bf16 arrays to f32 before sampling (the vec
    wrapper at its padding copy, XLA at the gather), so values are
    identical. Statuses exact; positions to float tolerance."""
    import jax

    from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                              track_features_pyramids)
    cfg = create_config().replace(image_dtype="bfloat16")
    h, w, n = 112, 208, 30
    img1, img2 = _level_inputs(h, w, seed=23)
    build = jax.jit(build_track_pyramids, static_argnames=("cfg",))
    p1 = build(img1, cfg)
    p2 = build(img2, cfg)
    assert p1.img[0].dtype == jnp.bfloat16
    rng = np.random.default_rng(24)
    x = jnp.asarray(rng.uniform(cfg.borderx + 1, w - cfg.borderx - 2, n),
                    jnp.float32)
    y = jnp.asarray(rng.uniform(cfg.bordery + 1, h - cfg.bordery - 2, n),
                    jnp.float32)
    val = jnp.ones((n,), jnp.int32)

    monkeypatch.delenv("PFT_PALLAS_LK", raising=False)
    rx, ry, rv = track_features_pyramids(p1, p2, x, y, val, cfg)
    monkeypatch.setenv("PFT_PALLAS_LK", "vec")
    vec_fn = jax.jit(functools.partial(
        track_features_pyramids.__wrapped__, cfg=cfg))
    vx, vy, vv = vec_fn(p1, p2, x, y, val)
    np.testing.assert_array_equal(np.asarray(vv), np.asarray(rv))
    np.testing.assert_allclose(np.asarray(vx), np.asarray(rx), atol=_ATOL)
    np.testing.assert_allclose(np.asarray(vy), np.asarray(ry), atol=_ATOL)
