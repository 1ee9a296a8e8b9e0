"""Scaling harness runs and reports sane structure on the virtual mesh."""

import pytest

import jax

from pyfeaturetrack_tpu.parallel.scaling import measure_scaling

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def test_measure_scaling_structure():
    out = measure_scaling(device_counts=[1, 4], image_shape=(96, 128),
                          n_features=32, iters=2)
    assert out["device_counts"] == [1, 4]
    assert set(out["seconds_per_step"]) == {1, 4}
    assert out["efficiency_vs_smallest"][1] == 1.0
    assert out["seconds_per_step"][4] > 0
