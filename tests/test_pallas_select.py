"""Pallas greedy suppression kernel == MIS fixpoint == host greedy
(interpret mode on the CPU backend; TPU measurement in DESIGN.md)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.ops.pallas_select import (greedy_suppress_pallas,
                                                  pallas_suppress_available)
from pyfeaturetrack_tpu.ops.select_device import (fill_slots,
                                                  suppress_and_fill)



import jax

# CPU suite: interpret mode. Under PFT_TEST_PLATFORM=tpu the REAL
# kernel runs on the chip (PARITY.md round-4 on-chip sweep).
_INTERP = jax.default_backend() == "cpu"


def _numpy_greedy(cx, cy, valid, d, h, w):
    occ = np.zeros((h, w), bool)
    acc = np.zeros(len(cx), bool)
    for j in range(len(cx)):
        if valid[j] and not occ[cy[j], cx[j]]:
            acc[j] = True
            if d >= 0:
                occ[max(cy[j] - d, 0):cy[j] + d + 1,
                    max(cx[j] - d, 0):cx[j] + d + 1] = True
    return acc


@pytest.mark.parametrize("mindist,seed", [(10, 0), (5, 1), (25, 2),
                                          (1, 3), (0, 4)])
def test_kernel_matches_host_greedy(mindist, seed):
    h, w, k = 200, 256, 400
    assert pallas_suppress_available((h, w), mindist)
    rng = np.random.default_rng(seed)
    cx = rng.integers(8, w - 8, k)
    cy = rng.integers(8, h - 8, k)
    valid = rng.uniform(size=k) > 0.1
    got = np.asarray(greedy_suppress_pallas(
        jnp.asarray(cx, jnp.int32), jnp.asarray(cy, jnp.int32),
        jnp.asarray(valid), shape=(h, w), mindist=mindist,
        interpret=_INTERP))
    want = _numpy_greedy(cx, cy, valid, mindist - 1, h, w)
    np.testing.assert_array_equal(got, want)


def test_kernel_plus_fill_matches_suppress_and_fill():
    h, w, k, n = 160, 256, 300, 80
    rng = np.random.default_rng(7)
    cx = jnp.asarray(rng.integers(8, w - 8, k), jnp.int32)
    cy = jnp.asarray(rng.integers(8, h - 8, k), jnp.int32)
    cval = jnp.asarray(np.sort(rng.integers(1, 1 << 20, k))[::-1].copy(),
                       jnp.int32)
    valid = jnp.asarray(rng.uniform(size=k) > 0.1)
    x = jnp.asarray(rng.uniform(8, w - 8, n), jnp.float32)
    y = jnp.asarray(rng.uniform(8, h - 8, n), jnp.float32)
    val = jnp.asarray(rng.integers(-2, 1, n), jnp.int32)
    free = val < 0

    accepted = greedy_suppress_pallas(cx, cy, valid, shape=(h, w),
                                      mindist=10, interpret=_INTERP)
    got = fill_slots(accepted, cx, cy, cval, free, x, y, val)
    want = suppress_and_fill(cx, cy, cval, valid, free, x, y, val, 10)
    for g, wv in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(wv))


def test_env_dispatch_selection_equal(monkeypatch):
    """PFT_PALLAS_SELECT=1 routes select_features_from_eig_device through
    the kernel; full selection result matches the fixpoint path."""
    from pyfeaturetrack_tpu.ops.select import quantized_min_eig_map
    from pyfeaturetrack_tpu.ops.convolve import (compute_gradients,
                                                 compute_smoothed_image)
    from pyfeaturetrack_tpu.ops.select_device import (
        select_features_from_eig_device)

    from conftest import make_textured_image

    cfg = create_config()
    img = jnp.asarray(make_textured_image(104, 136, seed=5), jnp.float32)
    s = compute_smoothed_image(img, cfg.smooth_sigma)
    gx, gy = compute_gradients(s, cfg.grad_sigma)
    eig = quantized_min_eig_map(gx, gy, cfg.window_width,
                                cfg.window_height)
    n = 60
    x = jnp.full((n,), -1.0, jnp.float32)
    y = jnp.full((n,), -1.0, jnp.float32)
    val = jnp.full((n,), -1, jnp.int32)

    monkeypatch.delenv("PFT_PALLAS_SELECT", raising=False)
    want = select_features_from_eig_device(eig, x, y, val, cfg,
                                           replacing=False, top_k=512)
    monkeypatch.setenv("PFT_PALLAS_SELECT", "1")
    got = select_features_from_eig_device(eig, x, y, val, cfg,
                                          replacing=False, top_k=512)
    for g, wv in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(wv))
    # replacing mode too: keep the selected features, lose a third
    kx, ky, kval = want[0], want[1], want[2]
    kval = kval.at[::3].set(-1)
    want_r = select_features_from_eig_device(eig, kx, ky, kval, cfg,
                                             replacing=True, top_k=512)
    got_r = select_features_from_eig_device(eig, kx, ky, kval, cfg,
                                            replacing=True, top_k=512)
    monkeypatch.delenv("PFT_PALLAS_SELECT", raising=False)
    ref_r = select_features_from_eig_device(eig, kx, ky, kval, cfg,
                                            replacing=True, top_k=512)
    for g, wv, rv in zip(got_r, want_r, ref_r):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(wv))
        np.testing.assert_array_equal(np.asarray(g), np.asarray(rv))


def test_budget_early_exit_fill_exact():
    """A budget equal to the free-slot count stops the scan early but
    yields the IDENTICAL fill (greedy is prefix-stable; fill_slots
    consumes only the first `budget` acceptances). Also: the returned
    acceptance flags are a prefix of the unbudgeted flags."""
    h, w, k, n = 160, 256, 400, 60
    rng = np.random.default_rng(11)
    cx = jnp.asarray(rng.integers(8, w - 8, k), jnp.int32)
    cy = jnp.asarray(rng.integers(8, h - 8, k), jnp.int32)
    cval = jnp.asarray(np.sort(rng.integers(1, 1 << 20, k))[::-1].copy(),
                       jnp.int32)
    valid = jnp.asarray(rng.uniform(size=k) > 0.1)
    x = jnp.asarray(rng.uniform(8, w - 8, n), jnp.float32)
    y = jnp.asarray(rng.uniform(8, h - 8, n), jnp.float32)
    val = jnp.asarray(rng.integers(-2, 1, n), jnp.int32)
    free = val < 0
    n_free = int(np.asarray(free).sum())
    assert 0 < n_free < n

    full = greedy_suppress_pallas(cx, cy, valid, shape=(h, w),
                                  mindist=10, interpret=_INTERP)
    budgeted = greedy_suppress_pallas(
        cx, cy, valid, shape=(h, w), mindist=10, interpret=_INTERP,
        budget=jnp.int32(n_free))
    nb = np.asarray(budgeted)
    nf = np.asarray(full)
    assert nb.sum() == min(n_free, nf.sum())
    # prefix property: budgeted acceptances are the first n_free of full
    np.testing.assert_array_equal(np.where(nb)[0],
                                  np.where(nf)[0][:nb.sum()])

    got = fill_slots(budgeted, cx, cy, cval, free, x, y, val)
    want = suppress_and_fill(cx, cy, cval, valid, free, x, y, val, 10)
    for g, wv in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(wv))
