"""Binned-gather Pallas LK window terms == XLA path (interpret mode on
the CPU backend; the TPU measurement lives in DESIGN.md §3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyfeaturetrack_tpu.ops.interp import gather_window
from pyfeaturetrack_tpu.ops.pallas_lk import (binned_window_terms,
                                              xla_window_terms)


@pytest.mark.parametrize("slab_h", [64, 128])
def test_binned_window_terms_matches_xla(slab_h):
    rng = np.random.default_rng(0)
    h, w, n = 200, 256, 77
    img2 = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    gx2 = jnp.asarray(rng.uniform(-20, 20, (h, w)), jnp.float32)
    gy2 = jnp.asarray(rng.uniform(-20, 20, (h, w)), jnp.float32)
    hw = hh = 3
    x2 = jnp.asarray(rng.uniform(8, w - 9, n), jnp.float32)
    y2 = jnp.asarray(rng.uniform(8, h - 9, n), jnp.float32)
    # templates from OFFSET positions: diff is then O(10), so the ex/ey
    # sums are well-conditioned (same-position templates cancel to ~0 and
    # compare only summation-order noise)
    w1 = gather_window(img2, x2 + 1.3, y2 - 0.8, hw, hh)
    g1x = gather_window(gx2, x2 + 1.3, y2 - 0.8, hw, hh)
    g1y = gather_window(gy2, x2 + 1.3, y2 - 0.8, hw, hh)
    args = (img2, gx2, gy2, w1, g1x, g1y, x2, y2)
    kw = dict(hw=hw, hh=hh, step_factor=1.0)
    got = np.asarray(binned_window_terms(*args, slab_h=slab_h,
                                         interpret=True, **kw))
    want = np.asarray(xla_window_terms(*args, **kw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=0.05)
