"""Kernel construction vs float64 oracle (SURVEY.md section 7.4 unit tier)."""

import numpy as np
import pytest

from pyfeaturetrack_tpu.errors import KLTError
from pyfeaturetrack_tpu.ops import kernels as K
from pyfeaturetrack_tpu.oracle import klt_oracle as O


@pytest.mark.parametrize("sigma", [0.7, 1.0, 1.8, 3.6, 7.2])
def test_kernels_match_oracle(sigma):
    g, d = K.compute_kernels(sigma)
    og, od = O.compute_kernels(sigma)
    assert g.shape == og.shape
    assert d.shape == od.shape
    np.testing.assert_allclose(g, og, rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(d, od, rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("sigma,expected_gauss_width", [
    # sigma=0.7 (default smoothing for 7x7 window): |i| <= 2 survives -> 5
    (0.7, 5),
    # sigma=3.6 (default pyramid smoothing, subsampling 4): width 21
    (3.6, 21),
])
def test_trimmed_widths(sigma, expected_gauss_width):
    gw, _ = K.get_kernel_widths(sigma)
    assert gw == expected_gauss_width


def test_gauss_normalized_and_deriv_ramp():
    for sigma in (0.7, 1.0, 3.6):
        g, d = K.compute_kernels(sigma)
        assert abs(float(np.sum(g)) - 1.0) < 1e-6
        hw = d.shape[0] // 2
        i = np.arange(-hw, hw + 1, dtype=np.float64)
        # normalized so that -sum(i * d[i]) == 1
        assert abs(-(i * d).sum() - 1.0) < 1e-5


def test_sigma_too_large_raises():
    with pytest.raises(KLTError):
        K.compute_kernels(20.0)


def test_widths_odd():
    for sigma in (0.3, 0.7, 1.0, 2.5, 3.6):
        gw, dw = K.get_kernel_widths(sigma)
        assert gw % 2 == 1 and dw % 2 == 1
