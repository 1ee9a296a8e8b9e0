"""Probe which gather/shuffle primitives Mosaic supports on this rig.

Determines the design of the feature-vectorized fused LK kernel
(VERDICT r2 item 1): per-feature window extraction needs a dynamic
per-lane/per-sublane shift; this script tests each candidate primitive
in a tiny pallas_call and reports compile+run success and correctness.

Run: python experiments/probe_mosaic_gather.py
"""
import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = fn()
        out = jax.tree.map(np.asarray, out)
        print(f"PASS {name}: {out if np.size(out) < 20 else out.shape}")
        return out
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return None


H, W = 64, 256
IMG = np.arange(H * W, dtype=np.float32).reshape(H, W)


def p1_advanced_indexing():
    def k(img_ref, r_ref, c_ref, o_ref):
        o_ref[:] = img_ref[r_ref[:], c_ref[:]]

    rows = jnp.arange(8, dtype=jnp.int32) * 3 + 1
    cols = jnp.arange(8, dtype=jnp.int32) * 5 + 2
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(IMG), rows, cols)
    expect = IMG[np.asarray(rows), np.asarray(cols)]
    assert np.array_equal(np.asarray(out), expect), (out, expect)
    return out


def p2_take_along_lanes():
    def k(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=-1)

    x = jnp.asarray(IMG)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, W, (H, W)), jnp.int32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)
    expect = np.take_along_axis(IMG, np.asarray(idx), axis=-1)
    assert np.array_equal(np.asarray(out), expect)
    return np.asarray(out)[:2, :4]


def p3_take_along_sublanes():
    def k(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

    x = jnp.asarray(IMG)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, H, (H, W)), jnp.int32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)
    expect = np.take_along_axis(IMG, np.asarray(idx), axis=0)
    assert np.array_equal(np.asarray(out), expect)
    return np.asarray(out)[:2, :4]


def p4_batched_dot_general():
    B, M, K, N = 8, 24, 256, 16

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((B, M, K)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, K, N)), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((B, M, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    expect = np.einsum("bmk,bkn->bmn", np.asarray(a), np.asarray(b))
    assert np.allclose(np.asarray(out), expect, atol=1e-3)
    return np.asarray(out).shape


def p5_dynamic_roll():
    def k(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], axis=1)

    x = jnp.asarray(IMG)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, jnp.asarray([5], jnp.int32))
    expect = np.roll(IMG, 5, axis=1)
    assert np.array_equal(np.asarray(out), expect)
    return np.asarray(out)[:1, :4]


def p6_stacked_3d_dynslice():
    def k(x_ref, r_ref, o_ref):
        row = pl.multiple_of(8 * (r_ref[0] // 8), 8)
        o_ref[:] = x_ref[:, pl.ds(row, 16), pl.ds(0, 128)]

    x = jnp.stack([jnp.asarray(IMG)] * 3)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((3, 16, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, jnp.asarray([19], jnp.int32))
    expect = np.stack([IMG[16:32, :128]] * 3)
    assert np.array_equal(np.asarray(out), expect)
    return np.asarray(out).shape


def p7_unaligned_sublane_dynslice():
    def k(x_ref, r_ref, o_ref):
        o_ref[:] = x_ref[pl.ds(r_ref[0], 8), pl.ds(0, 128)]

    x = jnp.asarray(IMG)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, jnp.asarray([19], jnp.int32))
    expect = IMG[19:27, :128]
    assert np.array_equal(np.asarray(out), expect)
    return np.asarray(out)[:1, :3]


def p8_dma_unaligned_hbm():
    def k(x_hbm, r_ref, o_ref):
        def body(scratch, sem):
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(r_ref[0], 16), pl.ds(r_ref[1], 128)],
                scratch, sem)
            dma.start()
            dma.wait()
            o_ref[:] = scratch[:]
        pl.run_scoped(body, pltpu.VMEM((16, 128), jnp.float32),
                      pltpu.SemaphoreType.DMA(()))

    x = jnp.asarray(IMG)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, jnp.asarray([19, 37], jnp.int32))
    expect = IMG[19:35, 37:165]
    assert np.array_equal(np.asarray(out), expect)
    return np.asarray(out)[:1, :3]


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    run("p1_advanced_indexing", p1_advanced_indexing)
    run("p2_take_along_lanes", p2_take_along_lanes)
    run("p3_take_along_sublanes", p3_take_along_sublanes)
    run("p4_batched_dot_general", p4_batched_dot_general)
    run("p5_dynamic_roll", p5_dynamic_roll)
    run("p6_stacked_3d_dynslice", p6_stacked_3d_dynslice)
    run("p7_unaligned_sublane_dynslice", p7_unaligned_sublane_dynslice)
    run("p8_dma_unaligned_hbm", p8_dma_unaligned_hbm)
