"""Probe pltpu.roll semantics with traced scalar shifts on both axes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/probe_roll.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(s_ref, x_ref, o1_ref, o2_ref):
    x = x_ref[...]
    s = s_ref[0]
    # lane roll by traced scalar, then static crop
    r = pltpu.roll(x, -s, 1)
    o1_ref[...] = r[:, :32]
    # sublane roll by traced scalar
    r2 = pltpu.roll(x, -s_ref[1], 0)
    o2_ref[...] = r2[:32, :]


x = jnp.arange(48 * 256, dtype=jnp.float32).reshape(48, 256)
s = jnp.asarray([37, 5], jnp.int32)
o1, o2 = pl.pallas_call(
    kernel,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_shape=[jax.ShapeDtypeStruct((48, 32), jnp.float32),
               jax.ShapeDtypeStruct((32, 256), jnp.float32)],
)(s, x)
xn = np.asarray(x)
np.testing.assert_array_equal(np.asarray(o1), np.roll(xn, -37, 1)[:, :32])
np.testing.assert_array_equal(np.asarray(o2), np.roll(xn, -5, 0)[:32, :])
print("roll semantics ok: roll(x, -s, axis)[k] == x[k+s]")
