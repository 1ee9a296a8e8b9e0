"""Probe: Mosaic support for while_loop with (2D tile, scalar) carry and
a vector->scalar live-count reduction — the early-exit shape for the
vectorized LK iteration loop.

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/probe_while_early_exit.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FC = 32


def case(name):
    def deco(fn):
        CASES[name] = fn
        return fn
    return deco


CASES = {}


@case("w1_scalar_carry_while")
def _w1():
    # while_loop with ([FC,8] tile, scalar i32) carry
    def kernel(x_ref, o_ref):
        def cond(c):
            return c[1] > 0

        def body(c):
            t, _ = c
            t = t + 1.0
            live = (t[:, 0:1] < 5.0).astype(jnp.float32)
            n = jnp.sum(live, axis=0, keepdims=True)  # [1,1]
            return t, n[0, 0].astype(jnp.int32)

        t, _ = lax.while_loop(cond, body, (x_ref[...], jnp.int32(1)))
        o_ref[...] = t

    x = jnp.zeros((FC, 8), jnp.float32).at[:, 0].set(
        jnp.arange(FC, dtype=jnp.float32) % 7)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((FC, 8), jnp.float32),
    )(x)
    out = np.asarray(out)
    # each lane increments until its col0 reaches 5 BUT loop is global:
    # runs until ALL lanes' col0 >= 5 -> max start 6 needs ... all +k
    # until min start + k >= 5 -> k = 5 (start 0). every lane gets +5.
    expect = np.asarray(x) + 5.0
    assert np.array_equal(out, expect), (out[:3], expect[:3])
    return "ok"


@case("w2_fori_with_skip")
def _w2():
    # alternative: fixed-trip fori_loop whose body is pl.when-gated on a
    # scalar SMEM flag (cheap skip of dead iterations) — fallback design
    def kernel(x_ref, o_ref, n_ref):
        n_ref[0] = jnp.int32(1)

        def body(i, t):
            t2 = t + jnp.where(n_ref[0] > 0, 1.0, 0.0)
            live = (t2[:, 0:1] < 5.0).astype(jnp.float32)
            n = jnp.sum(live, axis=0, keepdims=True)
            n_ref[0] = n[0, 0].astype(jnp.int32)
            return t2

        o_ref[...] = lax.fori_loop(0, 10, body, x_ref[...])

    x = jnp.zeros((FC, 8), jnp.float32).at[:, 0].set(
        jnp.arange(FC, dtype=jnp.float32) % 7)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((FC, 8), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(x)
    return "ok shape" + str(np.asarray(out)[0, :2])


if __name__ == "__main__":
    import traceback
    for name, fn in CASES.items():
        try:
            print(name, "->", fn())
        except Exception as e:
            print(name, "FAIL", type(e).__name__,
                  str(e).split("\n")[0][:200])
