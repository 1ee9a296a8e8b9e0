"""On-device selection (ops.select_device) must reproduce the host
greedy path (ops.select) EXACTLY whenever every slot fills — greedy is
prefix-stable, so top-K equals the full scan in that case."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import make_textured_image

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.features import KLT_NOT_FOUND
from pyfeaturetrack_tpu.ops.select import select_good_features_arrays
from pyfeaturetrack_tpu.ops.select_device import select_features_device


def _device_select(img, n_features, cfg, existing=None, top_k=None):
    if existing is None:
        x = jnp.full((n_features,), -1.0, jnp.float32)
        y = jnp.full((n_features,), -1.0, jnp.float32)
        v = jnp.full((n_features,), KLT_NOT_FOUND, jnp.int32)
        replacing = False
    else:
        x = jnp.asarray(existing[:, 0], jnp.float32)
        y = jnp.asarray(existing[:, 1], jnp.float32)
        v = jnp.asarray(existing[:, 2], jnp.int32)
        replacing = True
    if top_k is None:
        top_k = 1 << 20  # all candidates: exact greedy by construction
    xs, ys, vs, filled, exhausted = select_features_device(
        jnp.asarray(img, jnp.float32), x, y, v, cfg,
        replacing=replacing, top_k=top_k)
    out = np.stack([np.asarray(xs, np.float64), np.asarray(ys, np.float64),
                    np.asarray(vs, np.float64)], axis=-1)
    return out, np.asarray(filled), bool(exhausted)


@pytest.mark.parametrize("mindist", [5, 10])
def test_fresh_selection_matches_host(mindist):
    img = make_textured_image(120, 160, seed=3)
    cfg = create_config(mindist=mindist)
    host = select_good_features_arrays(img, 40, cfg)
    dev, filled, exhausted = _device_select(img, 40, cfg)
    assert not exhausted
    assert filled.all()
    np.testing.assert_array_equal(dev, host)


def test_fresh_selection_small_topk_still_exact():
    img = make_textured_image(120, 160, seed=5)
    cfg = create_config(mindist=6)
    host = select_good_features_arrays(img, 30, cfg)
    dev, filled, exhausted = _device_select(img, 30, cfg, top_k=512)
    assert not exhausted  # slots filled => top-K == full greedy
    np.testing.assert_array_equal(dev, host)


def test_replacement_matches_host():
    img = make_textured_image(120, 160, seed=7)
    cfg = create_config(mindist=7)
    base = select_good_features_arrays(img, 40, cfg)
    # lose a scattered subset (mixed status codes, like real tracking)
    lost = base.copy()
    for i, code in [(0, -1), (3, -2), (7, -4), (12, -5), (21, -3),
                    (33, -1), (39, -4)]:
        lost[i] = (-1.0, -1.0, code)
    host = select_good_features_arrays(img, 40, cfg, existing=lost.copy())
    dev, filled, exhausted = _device_select(img, 40, cfg,
                                            existing=lost.copy())
    assert not exhausted
    np.testing.assert_array_equal(dev, host)
    assert filled.sum() == 7


def test_replacement_nothing_lost_is_identity():
    img = make_textured_image(120, 160, seed=9)
    cfg = create_config()
    base = select_good_features_arrays(img, 25, cfg)
    dev, filled, _ = _device_select(img, 25, cfg, existing=base.copy())
    np.testing.assert_array_equal(dev, base)
    assert filled.sum() == 0


def test_dry_pool_fills_partially_without_divergence_flag():
    # tiny candidate lattice + huge mindist: cannot fill all slots, but
    # the full scan would fail identically -> no divergence flag
    img = make_textured_image(96, 96, seed=11)
    cfg = create_config(mindist=30)
    host = select_good_features_arrays(img, 30, cfg)
    dev, filled, exhausted = _device_select(img, 30, cfg)
    assert not exhausted  # pool ran dry at full depth: exact, no flag
    assert not filled.all()
    np.testing.assert_array_equal(dev, host)


def test_empty_grid_never_flags_divergence():
    """An image too small for any candidate lattice: slots stay unfilled
    but the host full scan sees the same empty lattice, so neither the
    fresh selection nor a nothing-lost replacement flags divergence."""
    cfg = create_config()  # default border exceeds a 12x12 interior
    img = make_textured_image(12, 12, seed=21)
    _, filled, exhausted = _device_select(img, 10, cfg)
    assert not exhausted and not filled.any()
    kept = np.tile([(6.0, 6.0, 1.0)], (10, 1))  # all alive: free is empty
    out, filled, exhausted = _device_select(img, 10, cfg,
                                            existing=kept.copy())
    assert not exhausted and not filled.any()
    np.testing.assert_array_equal(out, kept)


def test_mindist_zero_matches_host():
    """mindist=0 suppresses nothing in the host greedy (the decremented
    radius empties the stamp box); the device pre-mask must skip too."""
    img = make_textured_image(120, 160, seed=15)
    cfg = create_config(mindist=0)
    base = select_good_features_arrays(img, 20, cfg)
    lost = base.copy()
    lost[::4] = (-1.0, -1.0, -1)
    host = select_good_features_arrays(img, 20, cfg, existing=lost.copy())
    dev, _, _ = _device_select(img, 20, cfg, existing=lost.copy())
    np.testing.assert_array_equal(dev, host)


def test_escalation_matches_host_on_crowded_refill():
    """A refill needing more slots than the first escalation rung
    (ops/select_device._REFILL_K0 = 512) can possibly seat: the ladder
    must escalate under lax.cond and land exactly on the host full
    scan (VERDICT r2 item 6)."""
    img = make_textured_image(300, 400, seed=13)
    cfg = create_config(mindist=3)
    n = 800
    base = select_good_features_arrays(img, n, cfg)
    lost = base.copy()
    lost[40:] = (-1.0, -1.0, -1.0)  # 760 free slots > 512
    host = select_good_features_arrays(img, n, cfg,
                                       existing=lost.copy())
    dev, filled, exhausted = _device_select(img, n, cfg,
                                            existing=lost.copy(),
                                            top_k=4096)
    assert filled.sum() > 512  # the first rung alone could not do this
    assert not exhausted
    np.testing.assert_array_equal(dev, host)
