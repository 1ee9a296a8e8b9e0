"""Fetch-phase cost modes of the vec LK kernel (round 5 evidence).

Measures, on config-4-like shapes (4096 features, lvl0/lvl1 images),
the per-4096-block cost of:
  * VMEM-resident fetch, fori loop      (the pre-round-5 form)
  * VMEM-resident fetch, static unroll  (3x: trip overhead dominated)
  * HBM DMA fetch, serial start/wait    (worst case)
  * HBM DMA fetch, overlapped           (the shipped HBM form)
  * VMEM-resident at raised vmem_limit  (what made 1080p levels
                                         resident: 8x under HBM DMA)

Measured 2026-08-20 (v5e relay, honest device lane), ms per 4096
blocks: vmem fori 0.112 / vmem unrolled 0.036 / hbm serial 2.0 /
hbm overlapped 0.49 / lvl0-size vmem (26.9 MB image) 0.062.
Conclusion recorded in DESIGN.md §8: the full config-4 step barely
moved (9.47 -> 9.43 ms) because the per-level cost is dominated by the
per-feature vector phases, not the fetch — but the unroll and the
VMEM residency are kept (structurally cheaper, and the 8x DMA gap
matters wherever HBM mode still runs, e.g. 4K).

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
    experiments/probe_fetch_modes.py
"""
import json

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyfeaturetrack_tpu.utils.traceview import capture_device_trace

rb, CB = 24, 256
fc, ntiles = 32, 128
rng = np.random.default_rng(1)


def run(hp, wp3, mode, label, vmem_limit=None):
    img = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (hp, wp3)), jnp.float32)
    r0 = jnp.asarray(8 * (rng.integers(0, (hp - rb) // 8, fc * ntiles)),
                     jnp.int32)
    c0 = jnp.asarray(
        128 * (rng.integers(0, (wp3 // 3 - CB) // 128, fc * ntiles)),
        jnp.int32)

    def kern(r_ref, c_ref, img_ref, out_ref, blk_ref, *sem):
        base = pl.program_id(0) * fc

        def dma(f):
            row0 = pl.multiple_of(r_ref[base + f], 8)
            col0 = pl.multiple_of(c_ref[base + f] * 3, 128)
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(row0, rb), pl.ds(col0, 3 * CB)],
                blk_ref.at[f], sem[0].at[f, 0])

        def cp(f):
            row0 = pl.multiple_of(r_ref[base + f], 8)
            col0 = pl.multiple_of(c_ref[base + f] * 3, 128)
            blk_ref[f] = img_ref[pl.ds(row0, rb), pl.ds(col0, 3 * CB)]

        if mode == "hbm_serial":
            for f in range(fc):
                dma(f).start()
                dma(f).wait()
        elif mode == "hbm_overlap":
            for f in range(fc):
                dma(f).start()
            for f in range(fc):
                dma(f).wait()
        elif mode == "vmem_unroll":
            for f in range(fc):
                cp(f)
        elif mode == "vmem_fori":
            def b(f, c):
                cp(f)
                return c
            lax.fori_loop(0, fc, b, 0)
        out_ref[...] = jnp.sum(blk_ref[...], axis=(1,)).reshape(
            fc, 3 * CB)[:, :128]

    hbm = mode.startswith("hbm")
    spec_img = (pl.BlockSpec(memory_space=pl.ANY) if hbm else
                pl.BlockSpec((hp, wp3), lambda i: (0, 0),
                             memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM((fc, rb, 3 * CB), jnp.float32)]
    if hbm:
        scratch.append(pltpu.SemaphoreType.DMA((fc, 1)))
    kw = {}
    if vmem_limit:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit)
    call = pl.pallas_call(
        kern, grid=(ntiles,),
        out_shape=jax.ShapeDtypeStruct((fc * ntiles, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [spec_img],
        out_specs=pl.BlockSpec((fc, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch, **kw)
    try:
        fn = jax.jit(lambda r, c, im: call(r, c, im))
        res = fn(r0, c0, img)
        jax.block_until_ready(res)
        t = capture_device_trace(
            lambda: jax.block_until_ready(fn(r0, c0, img)), n_calls=4)
        return label, t["per_call_ms"]
    except Exception as e:  # noqa: BLE001 - probe reports, not raises
        return label, "FAIL: " + str(e)[:160]


if __name__ == "__main__":
    out = dict([
        run(552, 1152 * 3, "vmem_fori", "lvl1 vmem fori"),
        run(552, 1152 * 3, "vmem_unroll", "lvl1 vmem unrolled"),
        run(552, 1152 * 3, "hbm_serial", "lvl1 hbm serial start/wait"),
        run(552, 1152 * 3, "hbm_overlap", "lvl1 hbm overlapped"),
        run(1096, 2048 * 3, "vmem_unroll",
            "lvl0 vmem unrolled (26.9MB img, raised limit)",
            vmem_limit=110 * 1024 * 1024),
        run(1096, 2048 * 3, "hbm_overlap", "lvl0 hbm overlapped"),
    ])
    print(json.dumps(out, indent=1))
