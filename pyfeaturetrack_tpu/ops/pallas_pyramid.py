"""Pallas TPU kernel: fused pyramid-level build.

The profile (bench) shows the per-frame cost is dominated by the pyramid
build — a chain of separable convolutions that XLA materializes as
separate HBM round-trips. This kernel fuses, per pyramid level, in ONE
pass with the image resident in VMEM:

    [optional] presmooth:  h = gauss_s *h img ; base = gauss_s *v h
    gradients:             gradx = gauss_g *v (deriv_g *h base)
                           grady = deriv_g *v (gauss_g *h base)
    [optional] pyramid:    smp   = gauss_p *v (gauss_p *h base)

(*h / *v: horizontal / vertical 1-D convolution with zeroed borders of
kernel_width//2 — exactly ops/convolve.py semantics, which mirror the
reference convolve.py -> _convolveSeparate.)

Each 1-D conv is an unrolled static-tap shift-FMA over the VMEM block —
pure VPU work, one HBM read of the level image and one write per output.

Dispatch: ops/track.build_track_pyramids uses this path when PFT_PALLAS=1
(and the shapes fit the VMEM budgets); the default stays on the XLA path,
whose fused grouped convolutions measure equal speed at 480x640 (see
DESIGN.md section 3).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for choosing the fused kernel over the XLA fallback.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _enabled() -> bool:
    flag = os.environ.get("PFT_PALLAS", "auto").lower()
    if flag in ("0", "off", "false"):
        return False
    if flag in ("1", "on", "force", "true"):
        return True
    return jax.default_backend() == "tpu"


def _hconv(x, k: np.ndarray):
    """Horizontal true-convolution with zeroed borders (value-level)."""
    r = k.shape[0] // 2
    if r == 0:
        return x * float(k[0])
    w = x.shape[1]
    krev = k[::-1]
    acc = float(krev[0]) * x[:, 0:w - 2 * r]
    for t in range(1, 2 * r + 1):
        acc = acc + float(krev[t]) * x[:, t:t + w - 2 * r]
    z = jnp.zeros((x.shape[0], r), x.dtype)
    return jnp.concatenate([z, acc, z], axis=1)


def _vconv(x, k: np.ndarray):
    """Vertical true-convolution with zeroed borders (value-level)."""
    r = k.shape[0] // 2
    if r == 0:
        return x * float(k[0])
    h = x.shape[0]
    krev = k[::-1]
    acc = float(krev[0]) * x[0:h - 2 * r, :]
    for t in range(1, 2 * r + 1):
        acc = acc + float(krev[t]) * x[t:t + h - 2 * r, :]
    z = jnp.zeros((r, x.shape[1]), x.dtype)
    return jnp.concatenate([z, acc, z], axis=0)


def _decimate(smp, sub: int, subhalf: int, h2: int, w2: int,
              row_base: int = 0):
    """Exact one-hot-matmul decimation: out[j, q] = smp[row_base +
    subhalf + j*sub, subhalf + q*sub]. XLA lowers the equivalent
    strided slice as a lane gather costing ~185 us/frame on the relay
    (the fusion.12 finding); two one-hot dots are ~free on the MXU and
    bitwise equal (one-hot operands select, never round)."""
    import jax.lax as lax
    nr, nc = smp.shape
    rs = (lax.broadcasted_iota(jnp.int32, (h2, nr), 1)
          == row_base + subhalf
          + sub * lax.broadcasted_iota(jnp.int32, (h2, nr), 0)
          ).astype(smp.dtype)
    cs = (lax.broadcasted_iota(jnp.int32, (nc, w2), 0)
          == subhalf
          + sub * lax.broadcasted_iota(jnp.int32, (nc, w2), 1)
          ).astype(smp.dtype)
    import jax
    dec1 = jax.lax.dot(rs, smp, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=smp.dtype)
    return jax.lax.dot(dec1, cs, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=smp.dtype)


def _fused_kernel(img_ref, *out_refs, smooth_k, grad_g, grad_d, pyr_k,
                  dec=None):
    x = img_ref[:]
    i = 0
    if smooth_k is not None:
        x = _vconv(_hconv(x, smooth_k), smooth_k)
        out_refs[i][:] = x
        i += 1
    out_refs[i][:] = _vconv(_hconv(x, grad_d), grad_g)      # gradx
    out_refs[i + 1][:] = _vconv(_hconv(x, grad_g), grad_d)  # grady
    i += 2
    if pyr_k is not None:
        smp = _vconv(_hconv(x, pyr_k), pyr_k)
        out_refs[i][:] = smp
        if dec is not None:
            sub, subhalf, h2, w2 = dec
            out_refs[i + 1][:] = _decimate(smp, sub, subhalf, h2, w2)


def fits_vmem(shape: tuple[int, int], with_smooth: bool,
              with_pyr: bool) -> bool:
    n_bufs = 2 + 2 + (1 if with_smooth else 0) + (1 if with_pyr else 0)
    # The unrolled shift-FMA chains keep ~2.5x the I/O buffers live on the
    # Mosaic stack (measured: 22.5M for a naive 7.2M estimate at 480x640),
    # so budget with that factor; larger levels fall back to the XLA path.
    return (np.prod(shape) * 4 * n_bufs) * 3.2 < _VMEM_BUDGET_BYTES


@functools.partial(jax.jit, static_argnames=("smooth_k", "grad_k", "pyr_k",
                                             "dec"))
def fused_level_build(img: jax.Array, smooth_k, grad_k, pyr_k, dec=None):
    """Fused level build. Kernels are passed as hashable tuples of floats
    (static); ``smooth_k``/``pyr_k`` may be None.

    Returns (base, gradx, grady[, smp[, decimated]]):
      base  — presmoothed image (== img when smooth_k is None)
      gradx/grady — derivative-of-Gaussian gradients of base
      smp   — pyramid-presmoothed base (only when pyr_k is not None)
      decimated — smp[subhalf::sub, subhalf::sub][:h2, :w2] when
          ``dec = (sub, subhalf, h2, w2)`` is given (in-kernel one-hot
          dots; the XLA strided slice lowers to a costly lane gather)
    """
    gg = np.asarray(grad_k[0], np.float32)
    gd = np.asarray(grad_k[1], np.float32)
    sk = None if smooth_k is None else np.asarray(smooth_k, np.float32)
    pk = None if pyr_k is None else np.asarray(pyr_k, np.float32)

    shapes = []
    if sk is not None:
        shapes.append(jax.ShapeDtypeStruct(img.shape, img.dtype))
    shapes.append(jax.ShapeDtypeStruct(img.shape, img.dtype))
    shapes.append(jax.ShapeDtypeStruct(img.shape, img.dtype))
    if pk is not None:
        shapes.append(jax.ShapeDtypeStruct(img.shape, img.dtype))
        if dec is not None:
            shapes.append(jax.ShapeDtypeStruct((dec[2], dec[3]),
                                               img.dtype))

    outs = pl.pallas_call(
        functools.partial(_fused_kernel, smooth_k=sk, grad_g=gg, grad_d=gd,
                          pyr_k=pk, dec=dec if pk is not None else None),
        out_shape=tuple(shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in shapes),
        interpret=jax.default_backend() == "cpu",
    )(img)

    i = 0
    base = img
    if sk is not None:
        base = outs[i]
        i += 1
    gradx, grady = outs[i], outs[i + 1]
    i += 2
    smp = outs[i] if pk is not None else None
    decd = (outs[i + 1] if (pk is not None and dec is not None)
            else None)
    return (base, gradx, grady, smp, decd)


def _tiled_kernel(img_ref, *out_refs, smooth_k, grad_g, grad_d, pyr_k,
                  tile: int, h_pad: int, nrows: int, dec=None):
    """Row-tiled fused level build. The full image sits in VMEM; each grid
    step computes ``tile`` output rows from a haloed input slab, so the
    Mosaic stack only holds slab-sized intermediates."""
    # The input buffer is padded with h_pad zero rows on top (and enough
    # below), so every tile's slab starts at the STATIC-stride offset
    # i*tile and the output lives at static local rows [h_pad, h_pad+tile)
    # — Mosaic has no dynamic_slice on values, only pl.ds on refs.
    i = pl.program_id(0)
    slab = tile + 2 * h_pad
    start = i * tile  # padded coords; global row = padded row - h_pad

    def out_slice(vals):
        return vals[h_pad:h_pad + tile, :]

    x = img_ref[pl.ds(start, slab), :]
    # global row index of each slab row (for border zeroing by stage)
    g = (jax.lax.broadcasted_iota(jnp.int32, (slab, 1), 0) + start - h_pad)

    def vzero(vals, radius):
        """Zero rows whose GLOBAL index is in the vertical border."""
        bad = (g < radius) | (g >= nrows - radius)
        return jnp.where(bad, 0.0, vals)

    def vconv_full(vals, k):
        """Vertical conv evaluated for ALL slab rows (edge rows read
        garbage neighbours, then get zeroed by vzero)."""
        r = k.shape[0] // 2
        if r == 0:
            return vals * float(k[0])
        krev = k[::-1]
        acc = None
        for t in range(2 * r + 1):
            # tap t reads row (l + t - r): shift rows by (t - r) with zero
            # fill (contaminated edge rows are zeroed/discarded by callers)
            sh = t - r
            if sh > 0:
                shifted = jnp.concatenate(
                    [vals[sh:], jnp.zeros((sh, vals.shape[1]), vals.dtype)], 0)
            elif sh < 0:
                shifted = jnp.concatenate(
                    [jnp.zeros((-sh, vals.shape[1]), vals.dtype), vals[:sh]], 0)
            else:
                shifted = vals
            term = float(krev[t]) * shifted
            acc = term if acc is None else acc + term
        return acc

    i_out = 0
    if smooth_k is not None:
        r_s = smooth_k.shape[0] // 2
        x = vzero(vconv_full(_hconv(x, smooth_k), smooth_k), r_s)
        out_refs[i_out][...] = out_slice(x)
        i_out += 1

    # each output's vertical border radius is ITS vertical kernel's
    # radius (gradx: gauss vertically; grady: deriv vertically — widths
    # differ for some sigmas, e.g. 1.5 -> 9 vs 11)
    gx = vzero(vconv_full(_hconv(x, grad_d), grad_g), grad_g.shape[0] // 2)
    gy = vzero(vconv_full(_hconv(x, grad_g), grad_d), grad_d.shape[0] // 2)
    out_refs[i_out][...] = out_slice(gx)
    out_refs[i_out + 1][...] = out_slice(gy)
    i_out += 2
    if pyr_k is not None:
        r_p = pyr_k.shape[0] // 2
        smp = vzero(vconv_full(_hconv(x, pyr_k), pyr_k), r_p)
        out_refs[i_out][...] = out_slice(smp)
        if dec is not None:
            # this tile covers global rows [i*tile, (i+1)*tile) =
            # slab rows [h_pad, h_pad+tile); decimated rows jj pick
            # slab row h_pad + subhalf + jj*sub (tile % sub == 0 by
            # wrapper contract, so tiles partition the decimated rows)
            sub, subhalf, _, w2 = dec
            out_refs[i_out + 1][...] = _decimate(
                smp, sub, subhalf, tile // sub, w2, row_base=h_pad)


@functools.partial(jax.jit, static_argnames=("smooth_k", "grad_k", "pyr_k",
                                             "tile", "dec"))
def fused_level_build_tiled(img: jax.Array, smooth_k, grad_k, pyr_k,
                            tile: int = 64, dec=None):
    """Row-tiled fused level build for images too large for the
    single-block kernel. Same outputs as fused_level_build.

    Caveat: vconv_full's shifted-row adds assume the slab halo covers the
    kernel radius (h_pad >= r_s + max(r_g, r_p)), so interior rows are
    exact; edge rows are zeroed per-stage by global row index, exactly
    like the reference's border semantics.
    """
    gg = np.asarray(grad_k[0], np.float32)
    gd = np.asarray(grad_k[1], np.float32)
    sk = None if smooth_k is None else np.asarray(smooth_k, np.float32)
    pk = None if pyr_k is None else np.asarray(pyr_k, np.float32)

    nrows, ncols = img.shape
    orig_img = img
    r_s = 0 if sk is None else sk.shape[0] // 2
    r2 = max(gg.shape[0] // 2, gd.shape[0] // 2,
             0 if pk is None else pk.shape[0] // 2)
    h_pad = r_s + r2
    # pad h_pad zero rows on top (static slab offsets in the kernel) and
    # enough below that the grid divides evenly and every slab fits;
    # padded rows land in the zeroed border and are sliced off after
    out_rows = -(-nrows // tile) * tile
    img = jnp.pad(img, ((h_pad, out_rows - nrows + h_pad), (0, 0)))
    n_tiles = out_rows // tile

    if dec is not None:
        assert tile % dec[0] == 0, "tile must be a multiple of sub"

    shapes = []
    if sk is not None:
        shapes.append(jax.ShapeDtypeStruct((out_rows, ncols), img.dtype))
    shapes.append(jax.ShapeDtypeStruct((out_rows, ncols), img.dtype))
    shapes.append(jax.ShapeDtypeStruct((out_rows, ncols), img.dtype))
    out_spec = [pl.BlockSpec((tile, ncols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)] * len(shapes)
    if pk is not None:
        shapes.append(jax.ShapeDtypeStruct((out_rows, ncols), img.dtype))
        out_spec.append(pl.BlockSpec((tile, ncols), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        if dec is not None:
            sub, _, _, w2 = dec
            shapes.append(jax.ShapeDtypeStruct((out_rows // sub, w2),
                                               img.dtype))
            out_spec.append(pl.BlockSpec((tile // sub, w2),
                                         lambda i: (i, 0),
                                         memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        functools.partial(_tiled_kernel, smooth_k=sk, grad_g=gg, grad_d=gd,
                          pyr_k=pk, tile=tile, h_pad=h_pad, nrows=nrows,
                          dec=dec if pk is not None else None),
        grid=(n_tiles,),
        out_shape=tuple(shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple(out_spec),
        interpret=jax.default_backend() == "cpu",
    )(img)

    outs = tuple(o[:nrows] for o in outs[:-1]) + (outs[-1],) \
        if (pk is not None and dec is not None) \
        else tuple(o[:nrows] for o in outs)
    i = 0
    base = orig_img  # the padded buffer is internal; base == input here
    if sk is not None:
        base = outs[i]
        i += 1
    gradx, grady = outs[i], outs[i + 1]
    i += 2
    smp = outs[i] if pk is not None else None
    decd = (outs[i + 1][:dec[2]] if (pk is not None and dec is not None)
            else None)
    return (base, gradx, grady, smp, decd)


def build_track_pyramids_pallas(img: jax.Array, cfg):
    """Pallas-fused equivalent of ops/track.build_track_pyramids.

    Per level: one fused kernel produces the (pre)smoothed level image,
    its gradient pair, and the pyramid-smoothed image; decimation between
    levels is a cheap strided slice in XLA.
    """
    from .kernels import compute_kernels
    from .track import TrackPyramids

    smooth_g, _ = compute_kernels(float(cfg.smooth_sigma))
    grad_g, grad_d = compute_kernels(float(cfg.grad_sigma))
    pyr_g, _ = compute_kernels(float(cfg.pyramid_sigma_fact * cfg.subsampling))

    grad_k = (tuple(float(v) for v in grad_g), tuple(float(v) for v in grad_d))
    smooth_k = tuple(float(v) for v in smooth_g)
    pyr_k = tuple(float(v) for v in pyr_g)

    sub = cfg.subsampling
    subhalf = sub // 2
    n_levels = cfg.nPyramidLevels

    imgs, gxs, gys = [], [], []
    cur = jnp.asarray(img, jnp.float32)
    for level in range(n_levels):
        want_pyr = level < n_levels - 1
        lvl_smooth = smooth_k if level == 0 else None
        # decimation happens IN-KERNEL (one-hot dots): the XLA strided
        # slice lowers to a lane gather costing ~185 us/frame on the
        # relay (trace finding "fusion.12", 2026-08-19)
        dec = None
        if want_pyr:
            h2, w2 = cur.shape[0] // sub, cur.shape[1] // sub
            dec = (int(sub), int(subhalf), int(h2), int(w2))
        if fits_vmem(cur.shape, lvl_smooth is not None, want_pyr):
            base, gx, gy, _, nxt = fused_level_build(
                cur, lvl_smooth, grad_k, pyr_k if want_pyr else None,
                dec=dec)
        else:
            base, gx, gy, _, nxt = fused_level_build_tiled(
                cur, lvl_smooth, grad_k, pyr_k if want_pyr else None,
                tile=_tile_for(cur.shape), dec=dec)
        imgs.append(base)
        gxs.append(gx)
        gys.append(gy)
        if want_pyr:
            cur = nxt
    return TrackPyramids(img=tuple(imgs), gradx=tuple(gxs), grady=tuple(gys))


def _tile_for(shape: tuple[int, int]) -> int:
    """Row-tile height for the tiled kernel: smaller tiles for big
    images keep the double-buffered output blocks + slab temps inside
    VMEM next to the whole resident input."""
    return 32 if np.prod(shape) * 4 > 4 * 1024 * 1024 else 64


def fits_vmem_tiled(shape: tuple[int, int], n_outputs: int) -> bool:
    """The tiled kernel keeps the whole (padded) input image in VMEM;
    outputs are STREAMED per tile through BlockSpecs (double-buffered),
    and intermediates are slab-sized. Budget those parts separately —
    the old whole-array x n_outputs bound wrongly rejected 1080p level
    0, whose real footprint is input 8.5 MB + ~2 MB tiles + ~2 MB
    slabs (VERDICT r2 item 4)."""
    h, w = shape
    tile = _tile_for(shape)
    in_bytes = (h + 24) * w * 4            # whole input + halo pad
    out_bytes = n_outputs * tile * w * 4 * 2   # double-buffered blocks
    slab_bytes = 5 * (tile + 24) * w * 4       # live slab temps
    return in_bytes + out_bytes + slab_bytes < (14 * 1024 * 1024)


def pallas_pyramids_available(img_shape, cfg) -> bool:
    """True when the fused Pallas path is enabled AND every level fits
    one of the two kernels' VMEM budgets."""
    if not _enabled():
        return False
    h, w = img_shape
    for level in range(cfg.nPyramidLevels):
        with_smooth = level == 0
        with_pyr = level < cfg.nPyramidLevels - 1
        n_out = 2 + int(with_smooth) + int(with_pyr)
        if not (fits_vmem((h, w), with_smooth, with_pyr)
                or fits_vmem_tiled((h, w), n_out)):
            return False
        h, w = h // cfg.subsampling, w // cfg.subsampling
    return True
