"""Fused full-level Pallas LK: the entire per-level iteration loop in ONE
kernel.

Reference parity: trackFeatures.py -> _trackFeature (the complete
iterative solve for one pyramid level: per-iteration bounds checks,
bilinear window gathers, 2x2 normal-equation solve, convergence test,
and the post-loop residue / max-iteration classification), vectorized
over features with the level images resident in VMEM.

Motivation (ROOFLINE.md §0): the XLA level loop issues ~600 HLO ops per
level (fixed-trip ``fori_loop`` over ``max_iterations``, each trip a
gather + reductions). On an op-count-taxed backend — the axon relay
executes compiled modules op-by-op — collapsing the loop into one
``pallas_call`` removes that tax entirely; on direct-attached silicon it
keeps every iteration's window reads in VMEM instead of re-streaming
from HBM. This subsumes the per-iteration ``binned_window_terms``
prototype (ops/pallas_lk.py), which fused one iteration's gather but
left the loop in XLA.

Kernel shape:

* grid = (1,): the level images (frame-1 and frame-2 image + gradients,
  six arrays) sit whole in VMEM, zero-padded to Mosaic-aligned dims
  (sublane %8, lane %128 + a 256-lane fetch block). Availability is
  gated on the six padded arrays fitting the VMEM budget — true for
  every level at 480x640 and for all coarse levels at 1080p.
* a ``fori_loop`` over features; each feature runs its own
  ``while_loop`` over LK iterations with scalar carry (x2, y2, status,
  iteration, live) — the data-dependent early exit the XLA path must
  emulate with lane masks is a real loop exit here.
* window fetches use the aligned-block + one-hot shift-matmul pattern
  from ops/pallas_lk.py (Mosaic requires provably %8/%128 dynamic-slice
  offsets; arbitrary subpixel positions go through rowsel/colsel
  matmuls), then the shared-fraction bilinear blend of ops/interp.py.
* inactive lanes (val < 0 on entry) skip all fetches via ``pl.when``
  and pass through unchanged, matching track_feature_level's masking.

Statuses, update order, and check priorities replicate
ops/track.track_feature_level exactly (OOB > SMALL_DET during
iteration; post-loop final-bounds OOB, then LARGE_RESIDUE, then
MAX_ITERATIONS) — tests/test_pallas_lk_fused.py asserts bit-equal
statuses and positions against the XLA path, which is itself
oracle-parity-tested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..features import (KLT_LARGE_RESIDUE, KLT_MAX_ITERATIONS, KLT_OOB,
                        KLT_SMALL_DET, KLT_TRACKED)

_COLS = 256            # lane width of the aligned fetch block
_ONE_PLUS_EPS = 1.001  # ops/track._ONE_PLUS_EPS (reference bound check)
_VMEM_BUDGET = 12 * 1024 * 1024
# Feature axis beyond this is gridded into SMEM-blocked chunks: whole-
# array SMEM residency caps out (5 arrays x N x 4 B), and dense flow
# (ops/flow.py routes every PIXEL through this kernel) needs N = H*W.
_CHUNK = 2048


def _rows_blk(wh: int) -> int:
    """Sublane height of the aligned fetch block for a wh-row window:
    the (wh+1)-row patch at any %8 residual fits in this many rows."""
    return 8 * ((wh + 1 + 7) // 8) + 8


def _padded_dims(nrows: int, ncols: int, wh: int) -> tuple[int, int]:
    hp = 8 * (-(-nrows // 8)) + _rows_blk(wh)
    wp = 128 * (-(-ncols // 128)) + 128
    return hp, wp


def fused_level_available(shape, cfg) -> bool:
    """True when the fused kernel supports this level (six padded f32
    arrays within the VMEM budget, window within the fetch block)."""
    nrows, ncols = shape
    ww, wh = cfg.window_width, cfg.window_height
    if ww + 2 > _COLS - 128 or wh + 2 > _rows_blk(wh):
        return False
    if nrows < wh + 2 or ncols < ww + 2:
        return False
    hp, wp = _padded_dims(nrows, ncols, wh)
    return 6 * hp * wp * 4 <= _VMEM_BUDGET


def _fused_level_kernel(x1_ref, y1_ref, x2_ref, y2_ref, act_ref,
                        img1_ref, gx1_ref, gy1_ref,
                        img2_ref, gx2_ref, gy2_ref, out_ref, *,
                        hw: int, hh: int, nrows: int, ncols: int,
                        max_iterations: int, min_displacement: float,
                        min_determinant: float, max_residue: float,
                        step_factor: float, lighting: bool,
                        one_d: bool = False):
    ww = 2 * hw + 1
    wh = 2 * hh + 1
    rows_blk = _rows_blk(wh)
    npix = float(ww * wh)

    def bounds_ok(xf, yf):
        # ops/track._bounds_ok: window-fits-in-image, reference
        # inequalities with the 1+eps guard on the high side
        return ((xf - hw >= 0.0) & (ncols - (xf + hw) >= _ONE_PLUS_EPS) &
                (yf - hh >= 0.0) & (nrows - (yf + hh) >= _ONE_PLUS_EPS))

    def fetch(refs, xf, yf):
        """Bilinear [wh, ww] windows centered at (xf, yf) from each ref,
        sharing one aligned block address + one-hot shift matmuls."""
        xt = jnp.floor(xf).astype(jnp.int32) - hw
        yt = jnp.floor(yf).astype(jnp.int32) - hh
        ax = xf - hw - xt.astype(jnp.float32)
        ay = yf - hh - yt.astype(jnp.float32)
        # clamp for lanes whose fetch is masked out later — SAME bound
        # as ops/interp.patch_indices (origin + patch of ww+1 cols must
        # fit: xt <= ncols - ww - 1); a tighter clamp would shift an
        # in-bounds edge-band window by one texel
        xt = jnp.clip(xt, 0, ncols - ww - 1)
        yt = jnp.clip(yt, 0, nrows - wh - 1)
        row_al = pl.multiple_of(8 * (yt // 8), 8)
        dr = yt - row_al
        col_al = pl.multiple_of(128 * (xt // 128), 128)
        dc = xt - col_al
        ia = lax.broadcasted_iota(jnp.int32, (wh + 1, rows_blk), 0)
        ib = lax.broadcasted_iota(jnp.int32, (wh + 1, rows_blk), 1)
        rowsel = (ib == ia + dr).astype(jnp.float32)
        ic = lax.broadcasted_iota(jnp.int32, (_COLS, ww + 1), 0)
        jc = lax.broadcasted_iota(jnp.int32, (_COLS, ww + 1), 1)
        colsel = (ic == jc + dc).astype(jnp.float32)

        def one(ref):
            block = ref[pl.ds(row_al, rows_blk), pl.ds(col_al, _COLS)]
            wide = jnp.dot(block, colsel,
                           preferred_element_type=jnp.float32)
            patch = jnp.dot(rowsel, wide,
                            preferred_element_type=jnp.float32)
            return ((1.0 - ax) * (1.0 - ay) * patch[:wh, :ww]
                    + ax * (1.0 - ay) * patch[:wh, 1:ww + 1]
                    + (1.0 - ax) * ay * patch[1:wh + 1, :ww]
                    + ax * ay * patch[1:wh + 1, 1:ww + 1])

        return [one(r) for r in refs]

    def li_terms(w1, w2):
        """Gain/bias normalization (lighting-insensitive mode), matching
        ops/track._window_terms: returns (alpha, beta)."""
        sum1_sq = jnp.sum(w1 * w1)
        sum2_sq = jnp.sum(w2 * w2)
        alpha = jnp.sqrt((sum1_sq / npix) / (sum2_sq / npix))
        beta = jnp.sum(w1) / npix - alpha * (jnp.sum(w2) / npix)
        return alpha, beta

    def one_feature(j, carry):
        x1 = x1_ref[j]
        y1 = y1_ref[j]
        x20 = x2_ref[j]
        y20 = y2_ref[j]
        act = act_ref[j] > 0

        @pl.when(act)
        def _():
            # frame-1 windows are constant through the iteration loop
            w1, g1x, g1y = fetch((img1_ref, gx1_ref, gy1_ref), x1, y1)
            ok1 = bounds_ok(x1, y1)

            def cond(c):
                return c[4]

            def body(c):
                x2, y2, status, it, _ = c
                ok = ok1 & bounds_ok(x2, y2)
                w2, g2x, g2y = fetch((img2_ref, gx2_ref, gy2_ref),
                                     x2, y2)
                if lighting:
                    alpha, beta = li_terms(w1, w2)
                    diff = w1 - w2 * alpha - beta
                    gx = g1x + alpha * g2x
                    gy = g1y + alpha * g2y
                else:
                    diff = w1 - w2
                    gx = g1x + g2x
                    gy = g1y + g2y
                gxx = jnp.sum(gx * gx)
                ex = step_factor * jnp.sum(diff * gx)
                if one_d:
                    # 1-D (rectified-stereo) mode: scalar normal
                    # equation along x, vertical displacement pinned
                    # (ops/disparity.disparity_level semantics)
                    small = gxx < min_determinant
                    dx = ex / jnp.where(small, 1.0, gxx)
                    dy = jnp.float32(0.0)
                else:
                    gxy = jnp.sum(gx * gy)
                    gyy = jnp.sum(gy * gy)
                    ey = step_factor * jnp.sum(diff * gy)
                    det = gxx * gyy - gxy * gxy
                    small = det < min_determinant
                    safe = jnp.where(small, 1.0, det)
                    dx = (gyy * ex - gxy * ey) / safe
                    dy = (gxx * ey - gxy * ex) / safe
                upd = ok & ~small
                nx = jnp.where(upd, x2 + dx, x2)
                ny = jnp.where(upd, y2 + dy, y2)
                nit = it + jnp.where(upd, 1, 0)
                nstatus = jnp.where(
                    ~ok, KLT_OOB,
                    jnp.where(small, KLT_SMALL_DET, status))
                moving = ((jnp.abs(dx) >= min_displacement) |
                          (jnp.abs(dy) >= min_displacement))
                live = upd & moving & (nit < max_iterations)
                return (nx, ny, nstatus, nit, live)

            init = (x20, y20, jnp.int32(KLT_TRACKED), jnp.int32(0),
                    act)
            x2, y2, status, it, _ = lax.while_loop(cond, body, init)

            # post-loop classification, ops/track.track_feature_level
            # order: final-bounds OOB overrides; residue only for
            # still-TRACKED lanes; MAX_ITERATIONS last
            status = jnp.where(~bounds_ok(x2, y2), KLT_OOB, status)
            (w2f,) = fetch((img2_ref,), x2, y2)
            if lighting:
                alpha, beta = li_terms(w1, w2f)
                rdiff = w1 - w2f * alpha - beta
            else:
                rdiff = w1 - w2f
            residue = jnp.sum(jnp.abs(rdiff)) / npix
            status = jnp.where(
                (status == KLT_TRACKED) & (residue > max_residue),
                KLT_LARGE_RESIDUE, status)
            status = jnp.where(
                (status == KLT_TRACKED) & (it >= max_iterations),
                KLT_MAX_ITERATIONS, status)
            out_ref[j] = jnp.stack([x2, y2, status.astype(jnp.float32),
                                    it.astype(jnp.float32)])

        @pl.when(~act)
        def _():
            # inactive lanes pass through, status TRACKED (the caller's
            # jnp.where(active, ...) discards these anyway)
            out_ref[j] = jnp.stack([x20, y20,
                                    jnp.float32(KLT_TRACKED),
                                    jnp.float32(0.0)])

        return carry

    lax.fori_loop(0, x1_ref.shape[0], one_feature, 0)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "chunk",
                                             "one_d"))
def fused_track_level(x1, y1, x2, y2, img1, gx1, gy1, img2, gx2, gy2,
                      cfg, active, *, interpret: bool = False,
                      chunk: int | None = None, one_d: bool = False):
    """Drop-in replacement for ops/track.track_feature_level running the
    whole level in one pallas_call. Returns (x2, y2, status, iteration).

    Up to ``chunk`` features (default ``_CHUNK``) run in a single grid
    step with the per-feature scalars whole in SMEM; larger batches —
    dense flow tracks every pixel through here — grid over SMEM-blocked
    chunks while the six level images stay VMEM-resident across steps
    (constant block index, fetched once).
    """
    nrows, ncols = img1.shape
    hw, hh = cfg.window_width // 2, cfg.window_height // 2
    wh = cfg.window_height
    hp, wp = _padded_dims(nrows, ncols, wh)

    def padded(a):
        h, w = a.shape
        return jnp.pad(a.astype(jnp.float32), ((0, hp - h), (0, wp - w)))

    kernel = functools.partial(
        _fused_level_kernel, hw=hw, hh=hh, nrows=nrows, ncols=ncols,
        max_iterations=cfg.max_iterations,
        min_displacement=cfg.min_displacement,
        min_determinant=cfg.min_determinant,
        max_residue=cfg.max_residue, step_factor=cfg.step_factor,
        lighting=cfg.lighting_insensitive, one_d=one_d)

    n = x1.shape[0]
    if chunk is None:
        chunk = min(n, _CHUNK)
    npad = -(-n // chunk) * chunk
    act = active.astype(jnp.int32)
    feats = (x1, y1, x2, y2, act)
    if npad != n:
        # tail lanes are inactive pass-throughs, sliced off below
        feats = tuple(jnp.pad(a, (0, npad - n)) for a in feats)

    smem = pl.BlockSpec((chunk,), lambda i: (i,),
                        memory_space=pltpu.SMEM)
    vmem_img = pl.BlockSpec((hp, wp), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(npad // chunk,),
        out_shape=jax.ShapeDtypeStruct((npad, 4), jnp.float32),
        in_specs=[smem] * 5 + [vmem_img] * 6,
        out_specs=pl.BlockSpec((chunk, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*feats,
      padded(img1), padded(gx1), padded(gy1),
      padded(img2), padded(gx2), padded(gy2))
    return (out[:n, 0], out[:n, 1], out[:n, 2].astype(jnp.int32),
            out[:n, 3].astype(jnp.int32))


def bench_fused_lk(h=480, w=640, n_features=1000, iters=20,
                   device_trace=False):
    """Race the fused level kernel against the XLA level loop on the
    current backend. Returns a dict of per-call seconds (dispatch clock)
    and, with device_trace=True, profiler device times (honest clock on
    the relay rig — ROOFLINE.md §0)."""
    import time

    from ..config import create_config
    from .convolve import compute_gradients, compute_smoothed_image
    from .track import track_feature_level

    cfg = create_config()
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (h + 8, w + 8)).astype(np.float32)
    img1 = jnp.asarray(base[:h, :w])
    img2 = jnp.asarray(base[1:h + 1, 2:w + 2])
    simg1 = compute_smoothed_image(img1, cfg.smooth_sigma)
    simg2 = compute_smoothed_image(img2, cfg.smooth_sigma)
    gx1, gy1 = compute_gradients(simg1, cfg.grad_sigma)
    gx2, gy2 = compute_gradients(simg2, cfg.grad_sigma)
    x = jnp.asarray(rng.uniform(8, w - 9, n_features), jnp.float32)
    y = jnp.asarray(rng.uniform(8, h - 9, n_features), jnp.float32)
    active = jnp.ones((n_features,), bool)

    fused = jax.jit(functools.partial(fused_track_level, cfg=cfg))
    ref = jax.jit(functools.partial(track_feature_level, cfg=cfg))
    args = (x, y, x, y, simg1, gx1, gy1, simg2, gx2, gy2)

    out = {}
    for name, fn in (("pallas_fused",
                      lambda: fused(*args, active=active)),
                     ("xla_level",
                      lambda: ref(*args, active_in=active))):
        r = fn()
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r)
        out[name + "_s"] = (time.perf_counter() - t0) / iters
        if device_trace:
            from ..utils.traceview import capture_device_trace
            out[name + "_device"] = capture_device_trace(
                lambda: jax.block_until_ready(fn()), n_calls=3)
    return out


if __name__ == "__main__":
    import json
    print(json.dumps(bench_fused_lk(device_trace=True), indent=2,
                     default=str))
