"""Probe tpu.dynamic_gather (jnp.take_along_axis) inside Pallas kernels.

The Mosaic lowering (jax/_src/pallas/mosaic/lowering.py:2465) supports
2D take_along_axis with indices.shape == x.shape for axis 0 (sublane
gather) and axis 1 (lane gather). If it is fast and exact on this rig,
it replaces the one-hot/two-hot sampling dot_generals in the vec LK and
affine kernels — the f32 HIGHEST dots are 6-pass MXU emulation and
dominate those kernels' honest clocks (measured 2026-08-20: DEFAULT vs
HIGHEST on the affine prod dot = 1.73 vs 3.48 ms/batch).

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/probe_dynamic_gather.py
"""
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyfeaturetrack_tpu.utils.traceview import capture_device_trace

H, W = 256, 256
ITERS = 50  # in-kernel repetitions so the op cost dominates


def _kernel(x_ref, idx_ref, o_ref, *, axis, iters):
    x = x_ref[...]
    idx = idx_ref[...]

    def body(i, acc):
        g = jnp.take_along_axis(x + acc * 0.0, idx, axis=axis,
                                mode="promise_in_bounds")
        return acc + g

    o_ref[...] = lax.fori_loop(0, iters, body, jnp.zeros_like(x))


def _kernel_add(x_ref, idx_ref, o_ref, *, axis, iters):
    del axis
    x = x_ref[...]
    y = idx_ref[...].astype(jnp.float32)

    def body(i, acc):
        return acc + x * y

    o_ref[...] = lax.fori_loop(0, iters, body, jnp.zeros_like(x))


def _kernel_dot(x_ref, idx_ref, o_ref, *, axis, iters):
    """One-hot HIGHEST dot doing the same row gather (axis-0 case)."""
    del axis
    x = x_ref[...]
    idx = idx_ref[...]
    sel = (lax.broadcasted_iota(jnp.int32, (H, H), 1)
           == idx[:, 0:1]).astype(jnp.float32)

    def body(i, acc):
        return acc + lax.dot_general(
            sel, x + acc * 0.0, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    o_ref[...] = lax.fori_loop(0, iters, body, jnp.zeros_like(x))


def run(kern, axis, iters=ITERS):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    idx = jnp.asarray(
        rng.integers(0, H if axis == 0 else W, (H, W)).astype(np.int32))
    fn = jax.jit(functools.partial(
        pl.pallas_call(functools.partial(kern, axis=axis, iters=iters),
                       out_shape=jax.ShapeDtypeStruct((H, W),
                                                      jnp.float32))))
    out = fn(x, idx)
    jax.block_until_ready(out)
    tr = capture_device_trace(
        lambda: jax.block_until_ready(fn(x, idx)), n_calls=3)
    # exactness vs numpy (first iteration's gather, acc=0 path)
    xn, idxn = np.asarray(x), np.asarray(idx)
    return tr["per_call_ms"], np.asarray(out), xn, idxn


if __name__ == "__main__":
    out = {}
    for axis in (0, 1):
        try:
            ms, o, xn, idxn = run(_kernel, axis)
            ref = np.take_along_axis(xn, idxn, axis=axis) * ITERS
            out[f"gather_axis{axis}_ms"] = ms
            out[f"gather_axis{axis}_exact"] = bool(
                np.array_equal(o, ref))
            out[f"gather_axis{axis}_ns_per_lane"] = round(
                ms * 1e6 / (H * W * ITERS), 4)
        except Exception as e:
            out[f"gather_axis{axis}"] = str(e)[-1500:]
    try:
        ms, o, xn, idxn = run(_kernel_add, 0)
        out["mult_add_ms"] = ms
        out["mult_add_ns_per_lane"] = round(ms * 1e6 / (H * W * ITERS),
                                            4)
    except Exception as e:
        out["mult_add"] = str(e)[-1500:]
    try:
        ms, o, xn, idxn = run(_kernel_dot, 0, iters=10)
        out["onehot_dot_ms_10it"] = ms
    except Exception as e:
        out["onehot_dot"] = str(e)[-1500:]
    print(json.dumps(out, indent=1, default=str))
