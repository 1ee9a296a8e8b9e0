"""Race window-extraction strategies for the vectorized fused LK kernel.

Workload per chunk-"level": 10 unrolled iterations x 3 arrays of
[FC, 8, 8] patch extraction from per-feature blocks [FC, 24, 256] at
per-feature (dr, dc) offsets carried as [FC, 1, 1] (1D<->3D reshapes and
fori_loop 3D carries crash this rig's Mosaic — probes g2/f3).

  A: two batched dot_generals (precision=HIGHEST, exact for one-hot)
  B: rows via batched dot (HIGHEST), cols via VPU masked lane-reduce
  D: serial per-feature rowsel/colsel 2D matmuls (current kernel shape)
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyfeaturetrack_tpu.utils.traceview import capture_device_trace

FC = 64
ROWS, COLS = 24, 256
PH, PW = 8, 8
ITERS = 10
NARR = 3
HI = lax.Precision.HIGHEST


def _mk_inputs(seed=0):
    rng = np.random.default_rng(seed)
    blocks = jnp.asarray(
        rng.uniform(0, 255, (NARR, FC, ROWS, COLS)), jnp.float32)
    dr = jnp.asarray(rng.integers(0, ROWS - PH, (FC, 1, 1)), jnp.int32)
    dc = jnp.asarray(rng.integers(0, COLS - PW, (FC, 1, 1)), jnp.int32)
    return blocks, dr, dc


def _rowsel(dr):
    ia = lax.broadcasted_iota(jnp.int32, (FC, PH, ROWS), 1)
    ib = lax.broadcasted_iota(jnp.int32, (FC, PH, ROWS), 2)
    return (ib == ia + dr).astype(jnp.float32)


def _colsel(dc):
    ic = lax.broadcasted_iota(jnp.int32, (FC, COLS, PW), 1)
    jc = lax.broadcasted_iota(jnp.int32, (FC, COLS, PW), 2)
    return (ic == jc + dc).astype(jnp.float32)


def _bdot(a, b):
    return lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=HI, preferred_element_type=jnp.float32)


def _sum12(x):
    """Multi-axis 3D reductions crash this rig's Mosaic (probe k1);
    chain single-axis sums instead."""
    return jnp.sum(jnp.sum(x, axis=2, keepdims=True), axis=1,
                   keepdims=True)


def kernel_A(blocks_ref, dr_ref, dc_ref, out_ref):
    s = jnp.zeros((FC, 1, 1), jnp.float32)
    for it in range(ITERS):
        rowsel = _rowsel(dr_ref[:] + (it % 3))
        colsel = _colsel(dc_ref[:] + (it % 5))
        for a in range(NARR):
            patch = _bdot(_bdot(rowsel, blocks_ref[a]), colsel)
            s = s + _sum12(patch)
    out_ref[:] = jnp.broadcast_to(s, (FC, 1, 8))


def kernel_B(blocks_ref, dr_ref, dc_ref, out_ref):
    ic = lax.broadcasted_iota(jnp.int32, (FC, 1, COLS), 2)
    s = jnp.zeros((FC, 1, 1), jnp.float32)
    for it in range(ITERS):
        rowsel = _rowsel(dr_ref[:] + (it % 3))
        dc = dc_ref[:] + (it % 5)
        for a in range(NARR):
            rows = _bdot(rowsel, blocks_ref[a])   # [FC, PH, COLS]
            for j in range(PW):
                m = (ic == dc + j).astype(jnp.float32)
                s = s + _sum12(rows * m)
    out_ref[:] = jnp.broadcast_to(s, (FC, 1, 8))


def kernel_D(blocks_ref, dr_ref, dc_ref, out_ref):
    def one(f, _):
        def body(it, acc):
            dr = dr_ref[f] + (it % 3)
            dc = dc_ref[f] + (it % 5)
            ia = lax.broadcasted_iota(jnp.int32, (PH, ROWS), 0)
            ib = lax.broadcasted_iota(jnp.int32, (PH, ROWS), 1)
            rowsel = (ib == ia + dr).astype(jnp.float32)
            ic = lax.broadcasted_iota(jnp.int32, (COLS, PW), 0)
            jc = lax.broadcasted_iota(jnp.int32, (COLS, PW), 1)
            colsel = (ic == jc + dc).astype(jnp.float32)
            s = acc
            for a in range(NARR):
                wide = jnp.dot(blocks_ref[a, f], colsel,
                               preferred_element_type=jnp.float32)
                patch = jnp.dot(rowsel, wide,
                                preferred_element_type=jnp.float32)
                s = s + jnp.sum(patch)
            return s
        out_ref[f] = jnp.full((1, 8), lax.fori_loop(
            0, ITERS, body, jnp.float32(0.0)))
        return _
    lax.fori_loop(0, FC, one, 0)


def build(kernel, scalar_smem=False):
    sp = pltpu.SMEM if scalar_smem else pltpu.VMEM
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((FC, 1, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=sp),
                  pl.BlockSpec(memory_space=sp)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def main():
    blocks, dr, dc = _mk_inputs()
    dr_flat = jnp.asarray(np.asarray(dr).ravel())
    dc_flat = jnp.asarray(np.asarray(dc).ravel())
    ref = None
    for name, kern, smem in [("A_batched_dot", kernel_A, False),
                             ("B_dot_rows_vpu_cols", kernel_B, False),
                             ("D_serial_per_feature", kernel_D, True)]:
        try:
            fn = build(kern, scalar_smem=smem)
            args = (blocks, dr_flat, dc_flat) if smem else (blocks, dr, dc)
            out = np.asarray(fn(*args))[:, 0, 0]
            if ref is None:
                ref = out
            match = np.allclose(out, ref, rtol=1e-6)
            tr = capture_device_trace(
                lambda: jax.block_until_ready(fn(*args)), n_calls=5)
            print(f"{name}: {tr['per_call_ms']:.3f} ms/call "
                  f"({tr['ops_per_call']:.0f} ops/call) match={match}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
