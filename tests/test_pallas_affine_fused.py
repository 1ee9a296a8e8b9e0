"""Fused affine-consistency Pallas kernel == XLA batch (interpret mode
on the CPU backend; the TPU measurement lives in DESIGN.md §3).

The XLA path (ops/affine._affine_track_batch) is oracle-parity-tested
in test_affine.py; these tests pin the fused kernel to it: equal
statuses, positions/warps to float tolerance (reduction order inside
the kernel differs from the batched XLA einsums).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.ops.affine import (_affine_track_batch,
                                           affine_consistency_check)
from pyfeaturetrack_tpu.ops.convolve import (compute_gradients,
                                             compute_smoothed_image)
from pyfeaturetrack_tpu.ops.interp import gather_window
from pyfeaturetrack_tpu.ops.pallas_affine_fused import (
    fused_affine_available, fused_affine_track_batch)


def _scene(h=120, w=160, shift=(1, 2), seed=0):
    """Smoothed frame pair; img2 content sits at img1 position - shift."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h + 8, w + 8))
    k = np.array([1.0, 4, 6, 4, 1]) / 16.0
    for axis in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, base)
    dy, dx = shift
    return (jnp.asarray(base[:h, :w], jnp.float32),
            jnp.asarray(base[dy:h + dy, dx:w + dx], jnp.float32))


def _prep(cfg, img1, img2):
    s1 = compute_smoothed_image(img1, cfg.smooth_sigma)
    s2 = compute_smoothed_image(img2, cfg.smooth_sigma)
    gx2, gy2 = compute_gradients(s2, cfg.grad_sigma)
    return s1, s2, gx2, gy2


def _inputs(cfg, n=50, seed=0, h=120, w=160, shift=(1, 2), margin=14,
            start_err=(0.3, -0.2), tmpl_seed=None, scale_A=1.0):
    img1, img2 = _scene(h, w, shift=shift, seed=seed)
    s1, s2, gx2, gy2 = _prep(cfg, img1, img2)
    hw, hh = cfg.affine_window_width // 2, cfg.affine_window_height // 2
    rng = np.random.default_rng(seed + 1)
    x = jnp.asarray(rng.uniform(margin, w - margin - 1, n), jnp.float32)
    y = jnp.asarray(rng.uniform(margin, h - margin - 1, n), jnp.float32)
    src = s1 if tmpl_seed is None else jnp.asarray(
        np.random.default_rng(tmpl_seed).uniform(0, 255, s1.shape),
        jnp.float32)
    tmpl = gather_window(src, x, y, hw, hh)
    A0 = jnp.broadcast_to(scale_A * jnp.eye(2, dtype=jnp.float32),
                          (n, 2, 2))
    check = jnp.asarray(rng.uniform(size=n) < 0.9)
    # translation-tracked start = true match position + small error
    x2 = x - shift[1] + start_err[0]
    y2 = y - shift[0] + start_err[1]
    return tmpl, s2, gx2, gy2, x2, y2, A0, check


def _compare(cfg, atol=1e-3, **kw):
    assert fused_affine_available((kw.get("h", 120), kw.get("w", 160)),
                                  cfg)
    args = _inputs(cfg, **kw)
    fx, fy, fA, fs = fused_affine_track_batch(*args, cfg, interpret=True)
    rx, ry, rA, rs = _affine_track_batch(*args, cfg)
    check = np.asarray(args[7])
    fs, rs = np.asarray(fs), np.asarray(rs)
    np.testing.assert_array_equal(fs[check], rs[check])
    ok = check & (rs == 0)
    np.testing.assert_allclose(np.asarray(fx)[ok], np.asarray(rx)[ok],
                               atol=atol)
    np.testing.assert_allclose(np.asarray(fy)[ok], np.asarray(ry)[ok],
                               atol=atol)
    np.testing.assert_allclose(np.asarray(fA)[ok], np.asarray(rA)[ok],
                               atol=atol)
    return rs[check]


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_fused_matches_xla_modes(mode):
    rs = _compare(create_config(affineConsistencyCheck=mode))
    assert (rs == 0).sum() > 20  # scenario actually verifies features


def test_fused_unchecked_lanes_pass_through():
    cfg = create_config(affineConsistencyCheck=2)
    args = _inputs(cfg, n=30, seed=3)
    args = args[:7] + (jnp.zeros((30,), bool),)
    fx, fy, fA, fs = fused_affine_track_batch(*args, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(fs), np.zeros(30))
    np.testing.assert_allclose(np.asarray(fx), np.asarray(args[4]))
    np.testing.assert_allclose(np.asarray(fA), np.asarray(args[6]))


def test_fused_oob_trigger():
    # features hugging the border: warped samples leave the image
    rs = _compare(create_config(affineConsistencyCheck=2), margin=7,
                  seed=4)
    assert (rs == -4).any()


def test_fused_small_det_trigger():
    # flat frame 2 -> zero gradients -> singular normal matrix
    cfg = create_config(affineConsistencyCheck=2)
    args = _inputs(cfg, n=20, seed=5)
    flat = jnp.full_like(args[1], 100.0)
    zero = jnp.zeros_like(args[2])
    args = (args[0], flat, zero, zero) + args[4:]
    fx, fy, fA, fs = fused_affine_track_batch(*args, cfg, interpret=True)
    rx, ry, rA, rs = _affine_track_batch(*args, cfg)
    check = np.asarray(args[7])
    np.testing.assert_array_equal(np.asarray(fs)[check],
                                  np.asarray(rs)[check])
    assert (np.asarray(rs)[check] == -2).all()  # KLT_SMALL_DET


def test_fused_large_residue_trigger():
    # templates cut from an unrelated random image never match
    rs = _compare(create_config(affineConsistencyCheck=2), tmpl_seed=99,
                  seed=6)
    assert (rs == -5).any()


def test_fused_drift_trigger():
    # tight drift gate: any converging lane that moved >0.05 px drops
    rs = _compare(create_config(affineConsistencyCheck=2,
                                affine_max_displacement_differ=0.05),
                  start_err=(0.4, -0.3), seed=7)
    assert (rs == -4).any()


@pytest.mark.parametrize("scale", [3.0, 4.0])
def test_fused_fallback_on_extreme_warp(scale):
    """A0 = scale*I outgrows the kernel's static fetch block: flagged
    lanes are recomputed through the XLA path, so the merged result
    must equal the XLA batch bit-for-bit on every checked lane."""
    cfg = create_config(affineConsistencyCheck=2)
    args = _inputs(cfg, n=24, seed=8, margin=30, scale_A=scale)
    fx, fy, fA, fs = fused_affine_track_batch(*args, cfg, interpret=True)
    rx, ry, rA, rs = _affine_track_batch(*args, cfg)
    check = np.asarray(args[7])
    np.testing.assert_array_equal(np.asarray(fs)[check],
                                  np.asarray(rs)[check])
    np.testing.assert_allclose(np.asarray(fx)[check],
                               np.asarray(rx)[check], atol=1e-3)


def test_fused_ragged_tail_padding():
    # n not a multiple of the chunk/8 padding
    _compare(create_config(affineConsistencyCheck=2), n=13, seed=9)


def test_fused_rectangular_window():
    cfg = create_config(affineConsistencyCheck=2,
                        affine_window_width=13, affine_window_height=11)
    _compare(cfg, seed=10)


def test_env_gated_consistency_check(monkeypatch):
    """affine_consistency_check with PFT_PALLAS_AFFINE=1 == default
    path through the full capture->verify flow (two tracked frames)."""
    from pyfeaturetrack_tpu.features import create_feature_list
    from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                              track_features_pyramids)

    cfg = create_config(affineConsistencyCheck=2)
    img1, img2 = _scene(seed=11)
    p1 = build_track_pyramids(img1, cfg)
    p2 = build_track_pyramids(img2, cfg)
    rng = np.random.default_rng(12)
    n = 40
    x = jnp.asarray(rng.uniform(20, 140, n), jnp.float32)
    y = jnp.asarray(rng.uniform(20, 100, n), jnp.float32)
    val = jnp.ones((n,), jnp.int32)
    fl = create_feature_list(n)._replace(x=x, y=y, val=val)

    def run():
        tx, ty, tval = track_features_pyramids(p1, p2, x, y, val, cfg)
        fl_after = fl._replace(x=tx, y=ty, val=tval)
        # frame A->B: captures templates; frame B->B: verifies them
        step1 = affine_consistency_check(p1, p2, fl, fl_after, cfg)
        return affine_consistency_check(p2, p2, step1, step1, cfg)

    base = run()
    monkeypatch.setenv("PFT_PALLAS_AFFINE", "1")
    fused = run()
    np.testing.assert_array_equal(np.asarray(fused.val),
                                  np.asarray(base.val))
    np.testing.assert_allclose(np.asarray(fused.x), np.asarray(base.x),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(fused.aff.A),
                               np.asarray(base.aff.A), atol=1e-3)
