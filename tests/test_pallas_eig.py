"""Fused Pallas min-eig-map kernel (ops/pallas_eig.py).

Two properties, each load-bearing:

1. Value parity vs the conv path is exact except for FMA-contraction
   rounding: int values differ by AT MOST 1 at a vanishing fraction of
   pixels (enumerated, not a blanket tolerance), and the kernel meets
   the same float64-oracle bound the conv path is held to.
2. Lane SELF-consistency: with PFT_PALLAS_SELECT=1 both the host greedy
   and the on-device top-K rank candidates by kernel values, so the two
   selection lanes stay bit-identical e2e — the property that actually
   matters for parity (candidate ranks, not raw floats).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyfeaturetrack_tpu.ops.convolve import compute_gradients
from pyfeaturetrack_tpu.ops.pallas_eig import (min_eig_map_pallas,
                                               pallas_eig_available)
from pyfeaturetrack_tpu.ops.select import quantized_min_eig_map

from conftest import make_textured_image



import jax

# CPU suite: interpret mode. Under PFT_TEST_PLATFORM=tpu the REAL
# kernel runs on the chip (PARITY.md round-4 on-chip sweep).
_INTERP = jax.default_backend() == "cpu"


def _grads(h, w, seed=0):
    img = make_textured_image(h, w, seed=seed)
    return compute_gradients(jnp.asarray(img, jnp.float32), 1.0)


@pytest.mark.parametrize("shape", [(120, 160), (97, 130), (480, 640)])
@pytest.mark.parametrize("win", [(7, 7), (5, 9), (3, 3)])
def test_pallas_eig_matches_conv_within_one_int_step(shape, win):
    h, w = shape
    ww, wh = win
    assert pallas_eig_available(shape)
    gx, gy = _grads(h, w, seed=h + ww)
    ref = np.asarray(quantized_min_eig_map(gx, gy, ww, wh), np.int64)
    got = np.asarray(min_eig_map_pallas(gx, gy, ww, wh, interpret=_INTERP),
                     np.int64)
    diff = np.abs(got - ref)
    # FMA-contraction skew only: never more than ONE quantization step,
    # and at a vanishing fraction of pixels (measured ~1e-4)
    assert diff.max() <= 1, diff.max()
    assert (diff != 0).mean() < 1e-3, (diff != 0).mean()


def test_pallas_eig_meets_oracle_bound():
    """Same float64-oracle bound the conv path passes in
    test_select.py::test_min_eig_map_matches_oracle."""
    from pyfeaturetrack_tpu.oracle import klt_oracle as oracle
    img = make_textured_image(120, 160, seed=3)
    ogx, ogy = oracle.compute_gradients(img, 1.0)
    oeig = oracle.min_eig_map(ogx, ogy, 7, 7)
    gx, gy = compute_gradients(jnp.asarray(img, jnp.float32), 1.0)
    got = np.asarray(min_eig_map_pallas(gx, gy, 7, 7, interpret=_INTERP),
                     np.float64)
    hh = 3 + 4  # window half + gradient kernel support margin
    interior = np.zeros_like(oeig, bool)
    interior[hh:-hh, hh:-hh] = True
    np.testing.assert_allclose(got[interior], oeig[interior],
                               rtol=5e-4, atol=2.0)


def test_pallas_eig_border_zeroed():
    gx, gy = _grads(64, 128, seed=3)
    out = np.asarray(min_eig_map_pallas(gx, gy, 7, 7, interpret=_INTERP))
    assert (out[:3] == 0).all() and (out[-3:] == 0).all()
    assert (out[:, :3] == 0).all() and (out[:, -3:] == 0).all()
    assert (out[10:-10, 10:-10] != 0).any()


def test_pallas_eig_budget_gate():
    assert not pallas_eig_available((1088, 1920))  # 1080p -> XLA path


def test_selection_lane_parity_under_knob(monkeypatch):
    """PFT_PALLAS_SELECT=1: host greedy selection == device top-K
    selection, bit-identical (both rank by kernel values)."""
    import jax

    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.ops.select import (select_good_features,
                                               selection_eig_map_core)
    from pyfeaturetrack_tpu.ops.select_device import (
        select_features_from_eig_device)

    monkeypatch.setenv("PFT_PALLAS_SELECT", "1")
    # the host path's module-level jit may hold a knob-off trace from
    # an earlier test with the same image shape — flush so BOTH lanes
    # trace under the knob
    jax.clear_caches()
    cfg = create_config()
    img = make_textured_image(120, 160, seed=5)
    n = 40

    # fresh traces so the env knob is read (unique shapes not needed:
    # selection_eig_map_core is retraced per call via __wrapped__)
    eig = selection_eig_map_core(
        jnp.asarray(img, jnp.float32),
        window_width=cfg.window_width, window_height=cfg.window_height,
        smooth_before=cfg.smoothBeforeSelecting,
        smooth_sigma=cfg.smooth_sigma, grad_sigma=cfg.grad_sigma)

    host = select_good_features(img, n, cfg)

    x0 = jnp.full((n,), -1.0, jnp.float32)
    y0 = jnp.full((n,), -1.0, jnp.float32)
    v0 = jnp.full((n,), -1, jnp.int32)
    dx, dy, dv, _, _ = jax.jit(
        select_features_from_eig_device,
        static_argnames=("cfg", "replacing", "top_k"))(
            eig, x0, y0, v0, cfg, replacing=False,
            top_k=int(eig.size))
    np.testing.assert_array_equal(np.asarray(dv), np.asarray(host.val))
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(host.x))
    np.testing.assert_array_equal(np.asarray(dy), np.asarray(host.y))
