"""Serial-extraction greedy kernel (ops/pallas_select.
greedy_extract_pallas): the PFT_PALLAS_SELECT=1 refill lane must be the
host greedy VERBATIM — bit-equal statuses/positions with no top-K
prefix and never an exhaustion flag (interpret mode on the CPU backend;
on-chip runs recorded in PARITY.md)."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import make_textured_image

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.ops.pallas_select import (extract_available,
                                                  greedy_extract_pallas)
from pyfeaturetrack_tpu.ops.select import select_good_features_arrays
from pyfeaturetrack_tpu.ops.select_device import select_features_device


import jax

# CPU suite: interpret mode. Under PFT_TEST_PLATFORM=tpu the REAL
# kernel runs on the chip (PARITY.md round-4 on-chip sweep).
_INTERP = jax.default_backend() == "cpu"


def _np_extract(cand, min_eig, dg, budget):
    """Float-free reference: argmax (row-major first occurrence) ->
    record -> zero the (2*dg+1) box -> repeat."""
    m = cand.copy()
    out = []
    while len(out) < budget:
        v = m.max()
        if v < min_eig:
            break
        r, c = np.unravel_index(np.argmax(m), m.shape)
        out.append((int(r), int(c), int(v)))
        m[max(r - dg, 0):r + dg + 1, max(c - dg, 0):c + dg + 1] = 0
    return out


@pytest.mark.parametrize("dg,budget,min_eig,seed", [
    (3, 10, 30, 0), (0, 5, 30, 1), (9, 200, 900, 2), (1, 64, 1, 3),
])
def test_kernel_matches_numpy_extraction(dg, budget, min_eig, seed):
    rng = np.random.default_rng(seed)
    ny, nx = 50, 70
    cand = rng.integers(0, 1000, (ny, nx)).astype(np.int32)
    cand[cand < 30] = 0
    assert extract_available((ny, nx))
    rr, cc, vv, n = greedy_extract_pallas(
        jnp.asarray(cand), min_eig=min_eig, dg=dg,
        budget=jnp.int32(budget), max_out=256, interpret=_INTERP)
    got = [(int(rr[i]), int(cc[i]), int(vv[i])) for i in range(int(n))]
    assert got == _np_extract(cand, min_eig, dg, budget)


def test_tie_break_is_row_major_first():
    """Equal values must be accepted in flat scan order — the host
    sort's stable (-val, index) tie-break."""
    cand = np.zeros((16, 130), np.int32)
    cand[3, 100] = 7
    cand[3, 5] = 7
    cand[1, 120] = 7
    cand[9, 0] = 7
    rr, cc, vv, n = greedy_extract_pallas(
        jnp.asarray(cand), min_eig=1, dg=0, budget=jnp.int32(4),
        max_out=128, interpret=_INTERP)
    got = [(int(rr[i]), int(cc[i])) for i in range(int(n))]
    assert got == [(1, 120), (3, 5), (3, 100), (9, 0)]


def _refill(img, n, cfg, lost, monkeypatch, on):
    if on:
        monkeypatch.setenv("PFT_PALLAS_SELECT", "1")
    else:
        monkeypatch.delenv("PFT_PALLAS_SELECT", raising=False)
    x = jnp.asarray(lost[:, 0], jnp.float32)
    y = jnp.asarray(lost[:, 1], jnp.float32)
    v = jnp.asarray(lost[:, 2], jnp.int32)
    xs, ys, vs, filled, exhausted = select_features_device(
        jnp.asarray(img, jnp.float32), x, y, v, cfg, replacing=True)
    out = np.stack([np.asarray(xs, np.float64),
                    np.asarray(ys, np.float64),
                    np.asarray(vs, np.float64)], axis=-1)
    return out, np.asarray(filled), bool(exhausted)


@pytest.mark.parametrize("mindist,skipped", [(7, 0), (10, 0), (0, 0),
                                             (1, 0), (10, 2), (5, 3)])
def test_refill_lane_matches_host_greedy(mindist, skipped, monkeypatch):
    """The extraction refill must equal the host full-scan replacement
    bit-for-bit, including stepped candidate lattices
    (nSkippedPixels > 0 exercises the (mindist-1)//step stamp radius)."""
    img = make_textured_image(120, 160, seed=7)
    cfg = create_config(mindist=mindist, nSkippedPixels=skipped)
    base = select_good_features_arrays(img, 40, cfg)
    lost = base.copy()
    for i, code in [(0, -1), (3, -2), (7, -4), (12, -5), (21, -3),
                    (33, -1), (39, -4)]:
        lost[i] = (-1.0, -1.0, code)
    host = select_good_features_arrays(img, 40, cfg,
                                       existing=lost.copy())
    dev, filled, exhausted = _refill(img, 40, cfg, lost.copy(),
                                     monkeypatch, on=True)
    assert not exhausted
    np.testing.assert_array_equal(dev, host)
    # and equal to the top-K fixpoint lane (knob off)
    ref, _, _ = _refill(img, 40, cfg, lost.copy(), monkeypatch, on=False)
    np.testing.assert_array_equal(dev, ref)


def test_refill_lane_dry_pool_never_flags(monkeypatch):
    """Pool runs dry below the budget: the extraction scans ALL
    candidates, so partial fill is exact and must never flag
    divergence (there is no deeper scan to diverge from)."""
    img = make_textured_image(96, 96, seed=11)
    cfg = create_config(mindist=30)
    n = 30
    lost = np.tile([(-1.0, -1.0, -1.0)], (n, 1))
    host = select_good_features_arrays(img, n, cfg,
                                       existing=lost.copy())
    dev, filled, exhausted = _refill(img, n, cfg, lost.copy(),
                                     monkeypatch, on=True)
    assert not exhausted
    assert not filled.all()
    np.testing.assert_array_equal(dev, host)


def test_refill_lane_crowded_many_free_slots(monkeypatch):
    """A 760-slot refill (beyond the top-K ladder's first rung) comes
    out exact without any escalation machinery."""
    img = make_textured_image(300, 400, seed=13)
    cfg = create_config(mindist=3)
    n = 800
    base = select_good_features_arrays(img, n, cfg)
    lost = base.copy()
    lost[40:] = (-1.0, -1.0, -1.0)
    host = select_good_features_arrays(img, n, cfg,
                                       existing=lost.copy())
    dev, _, exhausted = _refill(img, n, cfg, lost.copy(), monkeypatch,
                                on=True)
    assert not exhausted
    np.testing.assert_array_equal(dev, host)
