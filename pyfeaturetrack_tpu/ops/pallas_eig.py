"""Fused min-eigenvalue map as ONE Pallas kernel.

Reference parity: selectGoodFeatures.py -> _KLTSelectGoodFeatures hot
loop (the per-pixel windowed structure tensor + min-eig formula), the
same math as ops/select.compute_min_eig_map + quantized_min_eig_map.

Motivation (VERDICT r2 "what's weak" #5): the XLA form of the eig map
is 6 separable convolutions + 3 pads + elementwise fusions — ~8.3 ms of
the 11.4 ms refill stage on the honest device clock of this rig, purely
from op-count tax (the arithmetic is ~50 FLOPs/pixel). This kernel
computes gradient products, both separable window sums, the min-eig
formula, the reference's int32 quantization, and the zeroed border in
one op.

Shape: grid over row strips; the gradient images live whole in VMEM
(with an 8-row / 128-col zero apron so every in-strip tap is a static
slice — no in-kernel pads, which is what blew the 16 MB VMEM stack in
the single-shot form). Availability is gated on a VMEM budget exactly
like ops/pallas_lk_fused.py (480x640 f32 fits easily; 1080p falls back
to the XLA conv path).

Value parity: the kernel's fixed accumulation (ascending taps, rows
then cols) differs from the conv lowering's FMA contraction by at most
ONE int quantization step at ~0.01% of pixels
(tests/test_pallas_eig.py); with PFT_PALLAS_SELECT set, BOTH selection
lanes rank by kernel values, so host/device parity is unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .select import _EIG_LIMIT

_VMEM_BUDGET = 12 * 1024 * 1024
_RB = 64       # output rows per grid step
_RAP = 8       # row apron (>= max supported window half-height)
_CAP = 128     # col apron (lane-aligned, >= max half-width)


def _padded_dims(nrows: int, ncols: int) -> tuple[int, int]:
    hp = _RB * (-(-nrows // _RB))
    wp = 128 * (-(-ncols // 128))
    return hp + 2 * _RAP, wp + 2 * _CAP


def pallas_eig_available(shape) -> bool:
    """True when the kernel supports this image: both apron-padded f32
    gradient arrays + the int32 output inside the VMEM budget."""
    nrows, ncols = shape
    hp, wp = _padded_dims(nrows, ncols)
    return 3 * hp * wp * 4 <= _VMEM_BUDGET


def _eig_kernel(gx_ref, gy_ref, out_ref, *, wh: int, ww: int,
                nrows: int, ncols: int, wp_out: int):
    hh, hw = wh // 2, ww // 2
    i = pl.program_id(0)
    r0 = i * _RB

    # strip with row halo: covers out rows r0..r0+_RB-1 plus +-hh taps
    # (data sits at (+_RAP, +_CAP) inside the apron-padded arrays)
    slab_rows = _RB + 2 * _RAP
    gx = gx_ref[pl.ds(r0, slab_rows), :]
    gy = gy_ref[pl.ds(r0, slab_rows), :]

    def window_sum(p):
        # ascending tap order, rows then cols — all static slices
        v = p[_RAP - hh:_RAP - hh + _RB, :]
        for k in range(1, wh):
            v = v + p[_RAP - hh + k:_RAP - hh + k + _RB, :]
        s = v[:, _CAP - hw:_CAP - hw + wp_out]
        for k in range(1, ww):
            s = s + v[:, _CAP - hw + k:_CAP - hw + k + wp_out]
        return s

    gxx = window_sum(gx * gx)
    gxy = window_sum(gx * gy)
    gyy = window_sum(gy * gy)
    disc = jnp.sqrt((gxx - gyy) * (gxx - gyy) + 4.0 * gxy * gxy)
    eig = ((gxx + gyy) - disc) * 0.5

    # zeroed border (ops/select._window_sum pads the valid conv) + the
    # reference's int32 quantization with saturating clamp
    rr = r0 + jax.lax.broadcasted_iota(jnp.int32, (_RB, wp_out), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (_RB, wp_out), 1)
    interior = ((rr >= hh) & (rr < nrows - hh) &
                (cc >= hw) & (cc < ncols - hw))
    eig = jnp.where(interior, eig, 0.0)
    out_ref[...] = jnp.clip(eig, max=_EIG_LIMIT).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("window_width",
                                             "window_height",
                                             "interpret"))
def min_eig_map_pallas(gradx: jax.Array, grady: jax.Array,
                       window_width: int, window_height: int,
                       *, interpret: bool = False) -> jax.Array:
    """One-op quantized min-eig map; same contract as
    ops/select.quantized_min_eig_map (int32 [H, W], zeroed border)."""
    if window_height // 2 > _RAP or window_width // 2 > _CAP:
        raise ValueError("window exceeds kernel apron")
    nrows, ncols = gradx.shape
    hp, wp = _padded_dims(nrows, ncols)
    hp_out, wp_out = hp - 2 * _RAP, wp - 2 * _CAP

    def padded(a):
        return jnp.pad(a.astype(jnp.float32),
                       ((_RAP, hp - _RAP - nrows),
                        (_CAP, wp - _CAP - ncols)))

    kernel = functools.partial(_eig_kernel, wh=window_height,
                               ww=window_width, nrows=nrows,
                               ncols=ncols, wp_out=wp_out)
    out = pl.pallas_call(
        kernel,
        grid=(hp_out // _RB,),
        in_specs=[pl.BlockSpec((hp, wp), lambda i: (0, 0))] * 2,
        out_specs=pl.BlockSpec((_RB, wp_out), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((hp_out, wp_out), jnp.int32),
        interpret=interpret,
    )(padded(gradx), padded(grady))
    return out[:nrows, :ncols]
