"""Sequential-mode level-0 window carry (ops/pallas_lk_vec.TrackCarry).

The carry must be a pure optimization: threading it through a
sequential run produces BITWISE the same tracks/statuses as the
uncarried vec path (which test_pallas_lk_vec pins to the XLA path,
which test_track pins to the float64 oracle). Covers: the multi-frame
steady state, position-modification invalidation (replace-lost), the
non-power-of-two subsampling gate, and the device-sequence driver
threading.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.ops.track import (_carry_supported,
                                          build_track_pyramids,
                                          track_features_pyramids,
                                          track_features_pyramids_carry)

_INTERP = jax.default_backend() == "cpu"


def _frames(h=120, w=160, n_frames=5, seed=11):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h + 2 * n_frames, w + 2 * n_frames))
    k = np.array([1.0, 4, 6, 4, 1]) / 16.0
    for axis in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, base)
    return [jnp.asarray(base[i:i + h, i + i:w + i + i], jnp.float32)
            for i in range(n_frames)]


def _run_sequence(cfg, frames, x, y, val, *, use_carry):
    build = jax.jit(build_track_pyramids.__wrapped__
                    if hasattr(build_track_pyramids, "__wrapped__")
                    else build_track_pyramids, static_argnames=("cfg",))
    plain = jax.jit(functools.partial(
        track_features_pyramids.__wrapped__, cfg=cfg))
    carrying = jax.jit(functools.partial(
        track_features_pyramids_carry.__wrapped__, cfg=cfg))
    pyr = build(frames[0], cfg)
    hist = []
    carry = None
    for img in frames[1:]:
        pyr2 = build(img, cfg)
        if use_carry:
            x, y, val, carry = carrying(pyr, pyr2, x, y, val,
                                        carry=carry)
        else:
            x, y, val = plain(pyr, pyr2, x, y, val)
        hist.append((np.asarray(x), np.asarray(y), np.asarray(val)))
        pyr = pyr2
    return hist, carry


def _start(cfg, w, h, n, seed=12):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(cfg.borderx + 2, w - cfg.borderx - 3, n),
                    jnp.float32)
    y = jnp.asarray(rng.uniform(cfg.bordery + 2, h - cfg.bordery - 3, n),
                    jnp.float32)
    return x, y, jnp.ones((n,), jnp.int32)


def test_carry_sequence_bitwise_equal(monkeypatch):
    monkeypatch.setenv("PFT_PALLAS_LK", "vec")
    cfg = create_config()
    frames = _frames()
    x, y, val = _start(cfg, 160, 120, 48)
    ref, _ = _run_sequence(cfg, frames, x, y, val, use_carry=False)
    got, carry = _run_sequence(cfg, frames, x, y, val, use_carry=True)
    assert carry is not None and bool(np.asarray(carry.ok).any())
    for (rx, ry, rv), (gx, gy, gv) in zip(ref, got):
        np.testing.assert_array_equal(gv, rv)
        np.testing.assert_array_equal(gx, rx)
        np.testing.assert_array_equal(gy, ry)


def test_carry_position_edit_invalidates(monkeypatch):
    """Editing a lane's position between steps (what replace-lost does)
    must invalidate only that lane's carry and still match the plain
    path bitwise."""
    monkeypatch.setenv("PFT_PALLAS_LK", "vec")
    cfg = create_config()
    frames = _frames(n_frames=4)
    x, y, val = _start(cfg, 160, 120, 40)
    build = jax.jit(build_track_pyramids, static_argnames=("cfg",))
    carrying = jax.jit(functools.partial(
        track_features_pyramids_carry.__wrapped__, cfg=cfg))
    plain = jax.jit(functools.partial(
        track_features_pyramids.__wrapped__, cfg=cfg))
    p0, p1, p2 = build(frames[0], cfg), build(frames[1], cfg), \
        build(frames[2], cfg)
    x1, y1, v1, carry = carrying(p0, p1, x, y, val, carry=None)
    # simulate a replace: move two lanes somewhere new
    x1 = x1.at[5].set(33.25).at[17].set(80.5)
    y1 = y1.at[5].set(41.75).at[17].set(60.25)
    v1 = v1.at[5].set(1).at[17].set(1)
    gx, gy, gv, _ = carrying(p1, p2, x1, y1, v1, carry=carry)
    rx, ry, rv = plain(p1, p2, x1, y1, v1)
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(rx))
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(ry))


def test_carry_gate_non_power_of_two_subsampling(monkeypatch):
    """subsampling=3 breaks the level-scale round-trip exactness: the
    carry must be gated OFF (structure-stable all-invalid carry out)
    and results equal the plain path."""
    monkeypatch.setenv("PFT_PALLAS_LK", "vec")
    cfg = create_config().replace(subsampling=3)
    assert not _carry_supported(cfg)
    assert _carry_supported(create_config())
    frames = _frames(n_frames=3)
    x, y, val = _start(cfg, 160, 120, 32)
    ref, _ = _run_sequence(cfg, frames, x, y, val, use_carry=False)
    got, carry = _run_sequence(cfg, frames, x, y, val, use_carry=True)
    assert carry is None or not bool(np.asarray(carry.ok).any())
    for (rx, ry, rv), (gx, gy, gv) in zip(ref, got):
        np.testing.assert_array_equal(gv, rv)
        np.testing.assert_array_equal(gx, rx)


def test_carry_through_device_sequence_replace_lost(monkeypatch):
    """sequence_step_device threads the carry through the cond-gated
    refill; history must equal the uncarried run bitwise."""
    monkeypatch.setenv("PFT_PALLAS_LK", "vec")
    from pyfeaturetrack_tpu.models.device_sequence import (
        select_step_device, sequence_step_device)
    cfg = create_config().replace(sequentialMode=True).validated_window()
    h, w = 96, 128
    rng = np.random.default_rng(3)
    base = rng.uniform(0, 255, (h, w + 40))
    k = np.array([1.0, 4, 6, 4, 1]) / 16.0
    for axis in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, base)
    frames = [jnp.asarray(base[:, 3 * i:w + 3 * i], jnp.float32)
              for i in range(5)]
    pyr0, x0, y0, v0, _, _ = select_step_device(frames[0], cfg, 32)

    def run(with_carry):
        pyr, x, y, val = pyr0, x0, y0, v0
        carry = None
        hist = []
        for img in frames[1:]:
            pyr, x, y, val, _, _, carry = sequence_step_device(
                pyr, img, x, y, val, cfg, True,
                carry=carry if with_carry else None)
            if not with_carry:
                carry = None
            hist.append((np.asarray(x), np.asarray(y), np.asarray(val)))
        return hist

    ref = run(False)
    got = run(True)
    for (rx, ry, rv), (gx, gy, gv) in zip(ref, got):
        np.testing.assert_array_equal(gv, rv)
        np.testing.assert_array_equal(gx, rx)
        np.testing.assert_array_equal(gy, ry)
