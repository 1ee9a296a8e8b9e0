"""Fused affine-consistency Pallas kernel: the whole Gauss-Newton
template-matching loop in ONE op.

Reference parity: trackFeatures.py -> _am_trackFeatureAffine (the
iterative warp refinement against the first-frame template, modes
0/1/2) including _am_computeIntensityDifferenceAffine's warped bilinear
sampling, the 6x6/4x4/2x2 normal-equation build, and
_am_gauss_jordan_elimination — semantics defined by
ops/affine._affine_track_batch (the XLA path, itself oracle-tested
against oracle/affine_oracle.py).

Motivation (ROOFLINE.md §0): the XLA affine batch runs a fixed-trip
``fori_loop`` whose every iteration issues warped gathers + einsum
reductions + the unrolled Gauss-Jordan — hundreds of HLO ops that the
op-count-taxed relay executes one by one (the affine stage measures
~275 ms/batch there, >5000x its speed-of-light). Like
ops/pallas_lk_fused.py for the translational stage, this kernel
collapses the entire loop into one ``pallas_call`` with the frame-2
image + gradients resident in VMEM.

The hard part vs the LK kernel: under a general affine warp the window
samples sit at ARBITRARY scattered positions (not one contiguous
patch), and Mosaic only allows dynamic-slice offsets that are provably
sublane-%8 / lane-%128. Solution: per iteration, fetch ONE aligned
block covering the warped footprint's bounding box, then evaluate all
T*T bilinear samples with two *two-hot* weight matmuls —

  rowsel[r, s] = (r == floor(ys_s) - row0) * (1 - fy_s)
               + (r == floor(ys_s) - row0 + 1) * fy_s
  P        = B^T @ rowsel          # [COLS, S] via MXU
  sample_s = sum_c P[c, s] * colsel[c, s]

which is algebraically the 4-tap bilinear blend. Warps whose footprint
outgrows the static block (|A| beyond ~2.5x scale — far past the drift
gate's useful range) raise a per-lane *fallback flag*; the wrapper
recomputes flagged lanes through the XLA path under a ``lax.cond`` so
results are always well-defined.

Opt-in via ``PFT_PALLAS_AFFINE=1`` (resolved at trace time in
ops/affine.affine_consistency_check). On direct-attached silicon the
batched XLA gathers win — same trade recorded for the LK kernel in
DESIGN.md §3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..features import KLT_LARGE_RESIDUE, KLT_OOB, KLT_SMALL_DET, KLT_TRACKED

_COLS = 256            # lane width of the aligned fetch block
_ONE_PLUS_EPS = 1.001  # ops/affine._ONE_PLUS_EPS (warp bound check)
_VMEM_BUDGET = 12 * 1024 * 1024
_CHUNK = 2048          # features per grid step (template block rows):
# one grid step for any realistic affine batch — SMEM blocks smaller
# than the array trip Mosaic/XLA 1-D layout-tiling mismatches (T(1024)
# vs T(256)) at sub-2048 sizes; 2048-chunking is the flow-kernel-proven
# shape for larger N (ops/pallas_lk_fused.py)


def _rows_blk(t: int) -> int:
    """Sublane height of the fetch block: fits the identity-warp
    footprint (t+1 rows) at any %8 residual with ~2.5x warp headroom."""
    return 8 * (-(-(2 * t + 12) // 8))


def _padded_dims(nrows: int, ncols: int, t: int) -> tuple[int, int]:
    return (8 * (-(-nrows // 8)) + _rows_blk(t),
            128 * (-(-ncols // 128)) + 128)


def fused_affine_available(shape, cfg) -> bool:
    """True when the fused kernel supports this image/config (three
    padded f32 arrays within the VMEM budget, window within the block's
    guaranteed span)."""
    nrows, ncols = shape
    t = max(cfg.affine_window_width, cfg.affine_window_height)
    if cfg.affine_window_width + 2 > _COLS - 128:
        return False
    if cfg.affine_window_height + 9 > _rows_blk(t):
        return False
    if nrows < cfg.affine_window_height + 2:
        return False
    if ncols < cfg.affine_window_width + 2:
        return False
    hp, wp = _padded_dims(nrows, ncols, t)
    return 3 * hp * wp * 4 <= _VMEM_BUDGET


def _affine_kernel(x0_ref, y0_ref, a11_ref, a12_ref, a21_ref, a22_ref,
                   act_ref, tmpl_ref, img2_ref, gx2_ref, gy2_ref,
                   out_ref, *, mode: int, hw: int, hh: int, nrows: int,
                   ncols: int, max_iterations: int,
                   min_displacement: float, min_determinant: float,
                   max_residue: float, max_displacement_differ: float):
    ww, wh = 2 * hw + 1, 2 * hh + 1
    tt = ww * wh
    rows_blk = _rows_blk(max(ww, wh))
    npix = float(tt)
    p = {0: 2, 1: 4, 2: 6}[mode]

    # window offsets, reference iteration order (j outer, i inner):
    # flattened index k -> i = k % ww - hw, j = k // ww - hh
    kk = lax.broadcasted_iota(jnp.int32, (1, tt), 1)
    ii = (kk - ww * (kk // ww) - hw).astype(jnp.float32)
    jj = (kk // ww - hh).astype(jnp.float32)

    def warp(x, y, a11, a12, a21, a22):
        xs = x + a11 * ii + a12 * jj
        ys = y + a21 * ii + a22 * jj
        return xs, ys

    def warp_oob(xs, ys):
        # ops/affine._warp_oob: any warped sample outside the image
        bad = ((xs < 0.0) | (ncols - xs < _ONE_PLUS_EPS) |
               (ys < 0.0) | (nrows - ys < _ONE_PLUS_EPS))
        return jnp.any(bad)

    def fetch(xs, ys, x, y, a11, a12, a21, a22):
        """All T*T bilinear samples of (img2, gx2, gy2) at the warped
        coords via one aligned block + two-hot weight matmuls. Returns
        (samples list, fits) — ``fits`` False when the footprint
        exceeds the static block (caller falls back to XLA).

        The block origin comes from SCALAR math (the warp is linear
        over a symmetric box, so its bbox extremes are |a|·hw + |b|·hh
        around the center) — Mosaic dynamic-slice offsets must live on
        the scalar unit, not in a vector reduction."""
        xf = jnp.floor(xs)
        yf = jnp.floor(ys)
        fx = xs - xf
        fy = ys - yf
        xt = xf.astype(jnp.int32)
        yt = yf.astype(jnp.int32)
        sx = jnp.abs(a11) * hw + jnp.abs(a12) * hh
        sy = jnp.abs(a21) * hw + jnp.abs(a22) * hh
        xmin = jnp.floor(x - sx).astype(jnp.int32)
        xmax = jnp.floor(x + sx).astype(jnp.int32)
        ymin = jnp.floor(y - sy).astype(jnp.int32)
        ymax = jnp.floor(y + sy).astype(jnp.int32)
        # origins clamped for failing lanes — their sample values are
        # never used, only memory safety matters
        x0b = jnp.clip(xmin, 0, ncols - 2)
        y0b = jnp.clip(ymin, 0, nrows - 2)
        row_al = pl.multiple_of(8 * (y0b // 8), 8)
        col_al = pl.multiple_of(128 * (x0b // 128), 128)
        ry = yt - row_al   # [1, tt] block-relative rows
        cx = xt - col_al
        # live lanes have xmin/ymin >= 0 (else warp_oob already fired),
        # so origin clamping is a no-op for them and the only failure
        # mode left is the bbox outgrowing the static block:
        fits = ((ymax + 1 - row_al <= rows_blk - 1) &
                (xmax + 1 - col_al <= _COLS - 1) &
                (ymin >= 0) & (xmin >= 0))
        # two-hot selectors (bilinear weights baked in)
        ir = lax.broadcasted_iota(jnp.int32, (rows_blk, tt), 0)
        rowsel = (jnp.where(ir == ry, 1.0 - fy, 0.0) +
                  jnp.where(ir == ry + 1, fy, 0.0))
        ic = lax.broadcasted_iota(jnp.int32, (_COLS, tt), 0)
        colsel = (jnp.where(ic == cx, 1.0 - fx, 0.0) +
                  jnp.where(ic == cx + 1, fx, 0.0))

        def one(ref):
            block = ref[pl.ds(row_al, rows_blk), pl.ds(col_al, _COLS)]
            prod = lax.dot_general(
                block, rowsel, (((0,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)   # [COLS, tt]
            return jnp.sum(prod * colsel, axis=0, keepdims=True)

        return [one(r) for r in (img2_ref, gx2_ref, gy2_ref)], fits

    def jacobian(gxw, gyw):
        """[p, tt] Gauss-Newton Jacobian rows (ops/affine._jacobian).
        Built by iota row-select rather than concatenate (sublane-axis
        concats of 1-row tiles don't lower well in Mosaic)."""
        if mode == 0:
            rows = [gxw, gyw]
        elif mode == 1:
            rows = [gxw * ii + gyw * jj, -gxw * jj + gyw * ii, gxw, gyw]
        else:
            rows = [gxw * ii, gyw * ii, gxw * jj, gyw * jj, gxw, gyw]
        ir = lax.broadcasted_iota(jnp.int32, (p, tt), 0)
        J = jnp.zeros((p, tt), jnp.float32)
        for r, row in enumerate(rows):
            J = jnp.where(ir == r, jnp.broadcast_to(row, (p, tt)), J)
        return J

    idx_p = lax.broadcasted_iota(jnp.int32, (p, p + 1), 0)
    idc_p = lax.broadcasted_iota(jnp.int32, (p, p + 1), 1)
    # [p, p+1] embedding matrix: aug = T @ embed + e in the last column
    embed = ((idx_p == idc_p) & (idc_p < p)).astype(jnp.float32)

    def gauss_solve(T, e):
        """Unpivoted Gauss-Jordan on the [p, p+1] augmented system —
        the in-kernel form of ops/linalg.gauss_solve_det (same
        elimination order, so dets/solutions agree to rounding)."""
        aug = (lax.dot_general(T, embed, (((1,), (0,)), ((), ())),
                               precision=lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
               + e * (idc_p == p).astype(jnp.float32))
        det = jnp.float32(1.0)
        for k in range(p):
            rowm = (idx_p == k).astype(jnp.float32)
            colm = (idc_p == k).astype(jnp.float32)
            piv = jnp.sum(aug * rowm * colm)
            det = det * piv
            safe = jnp.where(jnp.abs(piv) < 1e-30, 1.0, piv)
            row = jnp.sum(aug * rowm, axis=0, keepdims=True) / safe
            factors = jnp.sum(aug * colm, axis=1, keepdims=True)
            elim = aug - factors * row
            aug = jnp.where(idx_p == k, jnp.broadcast_to(row, aug.shape),
                            elim)
        sol = jnp.sum(aug * (idc_p == p).astype(jnp.float32), axis=1,
                      keepdims=True)   # [p, 1]

        def comp(i):
            m = (lax.broadcasted_iota(jnp.int32, (p, 1), 0) == i)
            return jnp.sum(sol * m.astype(jnp.float32))

        return [comp(i) for i in range(p)], det

    def one_feature(j, carry):
        x0 = x0_ref[j]
        y0 = y0_ref[j]
        act = act_ref[j] > 0

        @pl.when(act)
        def _():
            trow_sel = (lax.broadcasted_iota(
                jnp.int32, (1, tmpl_ref.shape[0]), 1) == j
            ).astype(jnp.float32)
            tmpl = jnp.dot(trow_sel, tmpl_ref[...],
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)  # [1, tt]

            def cond(c):
                return c[6] & (c[7] < max_iterations)

            def body(c):
                x, y, a11, a12, a21, a22, _, it, status, flag = c
                xs, ys = warp(x, y, a11, a12, a21, a22)
                oob = warp_oob(xs, ys)
                status = jnp.where(oob, KLT_OOB, status)
                live = ~oob
                (i2w, gxw, gyw), fits = fetch(xs, ys, x, y,
                                              a11, a12, a21, a22)
                flag = flag | (live & ~fits)
                live = live & fits
                diff = tmpl - i2w
                J = jacobian(gxw, gyw)
                T = lax.dot_general(J, J, (((1,), (1,)), ((), ())),
                                    precision=lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
                e = lax.dot_general(J, diff, (((1,), (1,)), ((), ())),
                                    precision=lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
                d, det = gauss_solve(T, e)
                small = jnp.abs(det) < min_determinant
                status = jnp.where(live & small, KLT_SMALL_DET, status)
                live = live & ~small
                if mode == 0:
                    da11 = da12 = da21 = da22 = jnp.float32(0.0)
                    dx, dy = d[0], d[1]
                elif mode == 1:
                    da11, da12, da21, da22 = d[0], -d[1], d[1], d[0]
                    dx, dy = d[2], d[3]
                else:
                    da11, da12, da21, da22 = d[0], d[2], d[1], d[3]
                    dx, dy = d[4], d[5]
                nx = jnp.where(live, x + dx, x)
                ny = jnp.where(live, y + dy, y)
                na11 = jnp.where(live, a11 + da11, a11)
                na12 = jnp.where(live, a12 + da12, a12)
                na21 = jnp.where(live, a21 + da21, a21)
                na22 = jnp.where(live, a22 + da22, a22)
                converged = ((jnp.abs(dx) < min_displacement) &
                             (jnp.abs(dy) < min_displacement))
                return (nx, ny, na11, na12, na21, na22,
                        live & ~converged, it + 1, status, flag)

            init = (x0, y0, a11_ref[j], a12_ref[j], a21_ref[j],
                    a22_ref[j], act, jnp.int32(0),
                    jnp.int32(KLT_TRACKED), jnp.bool_(False))
            (x, y, a11, a12, a21, a22, _, _, status,
             flag) = lax.while_loop(cond, body, init)

            # post-loop (ops/affine._affine_track_batch order): final
            # warp OOB overrides TRACKED, then residue, then drift
            xs, ys = warp(x, y, a11, a12, a21, a22)
            status = jnp.where((status == KLT_TRACKED) & warp_oob(xs, ys),
                               KLT_OOB, status)
            (i2w, _, _), fits = fetch(xs, ys, x, y, a11, a12, a21, a22)
            flag = flag | ((status == KLT_TRACKED) & ~fits)
            residue = jnp.sum(jnp.abs(tmpl - i2w)) / npix
            status = jnp.where(
                (status == KLT_TRACKED) & (residue > max_residue),
                KLT_LARGE_RESIDUE, status)
            drift = jnp.maximum(jnp.abs(x - x0), jnp.abs(y - y0))
            status = jnp.where(
                (status == KLT_TRACKED) &
                (drift > max_displacement_differ),
                KLT_OOB, status)
            out_ref[j] = jnp.stack(
                [x, y, a11, a12, a21, a22,
                 status.astype(jnp.float32),
                 flag.astype(jnp.float32)])

        @pl.when(~act)
        def _():
            # unchecked lanes pass through (XLA path: inactive init
            # state survives the masked loop untouched, status TRACKED)
            out_ref[j] = jnp.stack(
                [x0, y0, a11_ref[j], a12_ref[j], a21_ref[j], a22_ref[j],
                 jnp.float32(KLT_TRACKED), jnp.float32(0.0)])

        return carry

    lax.fori_loop(0, x0_ref.shape[0], one_feature, 0)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "chunk"))
def fused_affine_track_batch(tmpl, img2, gx2, gy2, x0, y0, A0, check,
                             cfg, *, interpret: bool = False,
                             chunk: int | None = None):
    """Drop-in replacement for ops/affine._affine_track_batch running
    the whole Gauss-Newton loop in one pallas_call. Returns
    (x, y, A, status) with identical semantics; lanes whose warp
    footprint outgrew the kernel's static fetch block are recomputed
    through the XLA path under a ``lax.cond`` (they only exist for
    extreme warps the drift gate would kill anyway)."""
    from .affine import _affine_track_batch

    mode = int(cfg.affineConsistencyCheck)
    hw, hh = cfg.affine_window_width // 2, cfg.affine_window_height // 2
    tt = cfg.affine_window_width * cfg.affine_window_height
    nrows, ncols = img2.shape
    t = max(cfg.affine_window_width, cfg.affine_window_height)
    hp, wp = _padded_dims(nrows, ncols, t)

    def padded(a):
        h, w = a.shape
        return jnp.pad(a.astype(jnp.float32), ((0, hp - h), (0, wp - w)))

    n = x0.shape[0]
    if chunk is None:
        chunk = min(8 * (-(-n // 8)), _CHUNK)
    npad = -(-n // chunk) * chunk
    feats = (x0, y0, A0[:, 0, 0], A0[:, 0, 1], A0[:, 1, 0], A0[:, 1, 1],
             check.astype(jnp.int32))
    tmpl2 = tmpl.reshape(n, tt).astype(jnp.float32)
    if npad != n:
        feats = tuple(jnp.pad(a, (0, npad - n)) for a in feats)
        tmpl2 = jnp.pad(tmpl2, ((0, npad - n), (0, 0)))

    kernel = functools.partial(
        _affine_kernel, mode=mode, hw=hw, hh=hh, nrows=nrows,
        ncols=ncols, max_iterations=cfg.affine_max_iterations,
        min_displacement=cfg.affine_min_displacement,
        min_determinant=cfg.min_determinant,
        max_residue=cfg.affine_max_residue,
        max_displacement_differ=cfg.affine_max_displacement_differ)

    smem = pl.BlockSpec((chunk,), lambda i: (i,),
                        memory_space=pltpu.SMEM)
    vmem_img = pl.BlockSpec((hp, wp), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(npad // chunk,),
        out_shape=jax.ShapeDtypeStruct((npad, 8), jnp.float32),
        in_specs=[smem] * 7 + [pl.BlockSpec((chunk, tt), lambda i: (i, 0),
                                            memory_space=pltpu.VMEM)]
        + [vmem_img] * 3,
        out_specs=pl.BlockSpec((chunk, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*feats, tmpl2, padded(img2), padded(gx2), padded(gy2))

    x = out[:n, 0]
    y = out[:n, 1]
    A = out[:n, 2:6].reshape(n, 2, 2)
    status = out[:n, 6].astype(jnp.int32)
    flag = (out[:n, 7] > 0.0) & check

    def with_fallback(_):
        xb, yb, Ab, sb = _affine_track_batch(
            tmpl, img2, gx2, gy2, x0, y0, A0, check, cfg)
        return (jnp.where(flag, xb, x), jnp.where(flag, yb, y),
                jnp.where(flag[:, None, None], Ab, A),
                jnp.where(flag, sb, status))

    return lax.cond(jnp.any(flag), with_fallback,
                    lambda _: (x, y, A, status), None)


def bench_fused_affine(h=480, w=640, n_features=1000, iters=10,
                       device_trace=False, mode=2):
    """Race the fused affine kernel against the XLA batch on the
    current backend (dispatch clock; device_trace adds the profiler
    device lane — the honest clock on the relay, ROOFLINE.md §0)."""
    import time

    from ..config import create_config
    from .affine import _affine_track_batch
    from .convolve import compute_gradients, compute_smoothed_image

    cfg = create_config(affineConsistencyCheck=mode)
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (h + 8, w + 8)).astype(np.float32)
    k = np.array([1.0, 4, 6, 4, 1], np.float32) / 16.0
    for axis in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, base)
    img1 = jnp.asarray(base[:h, :w])
    img2 = jnp.asarray(base[1:h + 1, 2:w + 2])
    s1 = compute_smoothed_image(img1, cfg.smooth_sigma)
    s2 = compute_smoothed_image(img2, cfg.smooth_sigma)
    gx2, gy2 = compute_gradients(s2, cfg.grad_sigma)

    hw, hh = cfg.affine_window_width // 2, cfg.affine_window_height // 2
    b = max(hw, hh) + 2
    x = jnp.asarray(rng.uniform(b, w - b - 1, n_features), jnp.float32)
    y = jnp.asarray(rng.uniform(b, h - b - 1, n_features), jnp.float32)
    from .interp import gather_window
    tmpl = gather_window(s1, x, y, hw, hh)
    A0 = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32),
                          (n_features, 2, 2))
    check = jnp.ones((n_features,), bool)
    # start from the translation-tracked position (shifted scene)
    x2, y2 = x + 2.0, y + 1.0

    fused = jax.jit(functools.partial(fused_affine_track_batch, cfg=cfg))
    ref = jax.jit(functools.partial(_affine_track_batch, cfg=cfg))

    out = {}
    for name, fn in (
            ("pallas_fused",
             lambda: fused(tmpl, s2, gx2, gy2, x2, y2, A0, check)),
            ("xla_batch",
             lambda: ref(tmpl, s2, gx2, gy2, x2, y2, A0, check))):
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
    print(json.dumps(bench_fused_affine(device_trace=True), indent=2,
                     default=str))
