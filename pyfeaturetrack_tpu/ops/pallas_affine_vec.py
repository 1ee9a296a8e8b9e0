"""Feature-VECTORIZED fused affine-consistency Pallas kernel.

Reference parity: trackFeatures.py -> _am_trackFeatureAffine (modes
0/1/2), semantics defined by ops/affine._affine_track_batch (the XLA
path, oracle-tested) and pinned to it in tests/test_pallas_affine_vec.py
(statuses exact, positions/warps to 1e-3 — the same bar the serial
fused kernel meets).

Motivation (VERDICT r2 item 2): the serial fused kernel iterates
features one at a time (lax.fori_loop at pallas_affine_fused.py:326,
~18 us/feature honest clock -> 17.9 ms for a 1000-feature batch). This
kernel advances a TILE of features per grid step, like
ops/pallas_lk_vec.py does for translational LK, with one extra idea:

COMPACT per-feature blocks. A first vectorized attempt kept the LK
kernel's [RB, 256]-lane blocks and built [fc, 256, tt] two-hot column
selectors — measured only 1.6x over serial (19.1 vs 31.3 ms device)
because selector construction and the sampling dots scale with the
256-lane corridor. Instead the fetch loop LANE-ROLLS each aligned
slice (pltpu.roll with a traced shift — sublane rolls are miscompiled
on this jax, experiments/probe_roll.py, so only columns roll; rows
absorb their %8 residual in an 8-row margin) so the warp footprint
starts at lane 8, crops to a CW=32-lane block, and stacks the three
arrays in ROWS: blk3 [fc, 3*RB, CW]. Per iteration the whole tile then
samples with ONE batched column dot ([fc, 3RB, CW] x [fc, CW, tt]) and
a rowsel multiply-reduce — selectors are 8x smaller and the dot count
per iteration drops from 3 to 1.

Features whose warped footprint leaves their compact block (drift
beyond ~+-6 px / warp growth beyond the corridor) are flagged ``stale``
and frozen; ``vec_affine_with_fallback`` recomputes just those lanes
through the serial fused kernel under ``lax.cond`` (which in turn
falls back to XLA for warps outgrowing even its refetched block).

Opt-in via ``PFT_PALLAS_AFFINE=vec`` (trace-time env read in
ops/affine.affine_consistency_check, like PFT_PALLAS_LK=vec).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..features import KLT_LARGE_RESIDUE, KLT_OOB, KLT_SMALL_DET, KLT_TRACKED

_ONE_PLUS_EPS = 1.001  # ops/affine._ONE_PLUS_EPS (warp bound check)
_VMEM_BUDGET = 12 * 1024 * 1024
_FC = 16               # features per tile. Scanned 8/16/32 on-chip at
                       # FORCED full iterations: 0.37/0.31/0.28 us per
                       # feature-iteration (fc=32 amortizes fixed
                       # phases best; probe_affine_vec_phases). But the
                       # early-exit loop runs each tile to its SLOWEST
                       # lane, and in the sequential config-3 step
                       # (carried warps, most lanes converge in 1-3
                       # GN iterations) the straggler waste of 32-lane
                       # tiles outweighs the amortization — measured
                       # 2026-08-20: full step 3.97 ms at fc=32 vs
                       # 1.0-1.6 ms at fc=16 on the same 8-call
                       # window. fc=16 also clears the VMEM gate with
                       # margin.
_XPAD = 8              # footprint left edge lands at this lane


def _cw(ww: int) -> int:
    """Compact block lane width: footprint (ww+2 with warp growth) at
    lane _XPAD plus a horizontal drift corridor."""
    return 32 if ww <= 16 else 64


def _rb_a(wh: int) -> int:
    """Compact block sublane height: footprint (wh+2) at any %8
    residual (<= 11 rows down) plus a vertical drift corridor.

    wh+12 leaves ~3-4 rows of drift/warp-growth margin past the
    identity-warp footprint (entry row lands 4-11 rows down, footprint
    wh+2, so worst case uses 11+wh+2 rows of 8*ceil((wh+12)/8)) — the
    affine refinement moves positions well under a pixel per iteration
    and lanes outgrowing the corridor fall back exactly. Shrinking from
    wh+26 cut the rowsel build + multiply-reduce (the largest VPU terms)
    by a third: 4.85 -> 4.0 ms/batch honest clock at 1000 features."""
    return 8 * (-(-(wh + 12) // 8))


def _padded_dims(nrows: int, ncols: int, wh: int) -> tuple[int, int]:
    return (8 * (-(-nrows // 8)) + _rb_a(wh) + 8,
            128 * (-(-ncols // 128)) + 256)


def vec_affine_available(shape, cfg) -> bool:
    """True when the vectorized kernel supports this image/config."""
    nrows, ncols = shape
    ww, wh = cfg.affine_window_width, cfg.affine_window_height
    if ww + 2 + _XPAD > _cw(ww) - 4:
        return False
    if nrows < wh + 2 or ncols < ww + 2:
        return False
    hp, wp = _padded_dims(nrows, ncols, wh)
    tt_pad = 128 * (-(-(ww * wh) // 128))
    rb = _rb_a(wh)
    # 3 images + the stacked block scratch + the live sampling temps
    # (prod [fc,3rb,tt] + colsel [fc,cw,tt] + rowsel [fc,rb,tt])
    need = (3 * hp * wp * 4
            + _FC * 3 * rb * 128 * 4
            + _FC * tt_pad * 4 * (3 * rb + _cw(ww) + rb))
    return need <= _VMEM_BUDGET


def _block_origin(x0, y0, a11, a12, a21, a22, *, hw, hh, nrows, ncols,
                  wh):
    """Entry-state block geometry: (row0 [8-aligned], col0
    [128-aligned], xoff) — xoff is the image column mapped to block
    lane 0 after the fetch roll. ONE definition shared by the SMEM
    fetch lane and the vector phase (both get it from the wrapper)."""
    sx = jnp.abs(a11) * hw + jnp.abs(a12) * hh
    sy = jnp.abs(a21) * hw + jnp.abs(a22) * hh
    xmin = jnp.clip(jnp.floor(x0 - sx).astype(jnp.int32), 0, ncols - 2)
    ymin = jnp.clip(jnp.floor(y0 - sy).astype(jnp.int32), 0, nrows - 2)
    hp, wp = _padded_dims(nrows, ncols, wh)
    row0 = jnp.clip(8 * ((ymin - 4) // 8), 0, hp - _rb_a(wh))
    xoff = jnp.maximum(xmin - _XPAD, 0)
    col0 = jnp.clip(128 * (xoff // 128), 0, wp - 256)
    return row0, col0, xoff


def _affine_vec_kernel(row0s_ref, col0s_ref, rolls_ref, acts_ref,
                       x0v_ref, y0v_ref, a11v_ref, a12v_ref,
                       a21v_ref, a22v_ref, actv_ref,
                       row0v_ref, xoffv_ref, tmpl_ref,
                       img2_ref, gx2_ref, gy2_ref, out_ref,
                       blk3_ref, *,
                       fc: int, mode: int, hw: int, hh: int,
                       nrows: int, ncols: int, max_iterations: int,
                       min_displacement: float, min_determinant: float,
                       max_residue: float,
                       max_displacement_differ: float):
    ww, wh = 2 * hw + 1, 2 * hh + 1
    tt = ww * wh
    rb = _rb_a(wh)
    cw = _cw(ww)
    npix = float(tt)
    p = {0: 2, 1: 4, 2: 6}[mode]
    f32 = jnp.float32

    # ---------- phase A: serial compact-block fetch --------------------
    base = pl.program_id(0) * fc

    def fetch_body(f, c):
        @pl.when(acts_ref[base + f] > 0)
        def _():
            row0 = pl.multiple_of(row0s_ref[base + f], 8)
            col0 = pl.multiple_of(col0s_ref[base + f], 128)
            roll = rolls_ref[base + f]
            for s, ref in enumerate((img2_ref, gx2_ref, gy2_ref)):
                raw = ref[pl.ds(row0, rb), pl.ds(col0, 256)]
                blk3_ref[f, s * rb:(s + 1) * rb, :] = pltpu.roll(
                    raw, -roll, 1)[:, :cw]
        return c

    lax.fori_loop(0, fc, fetch_body, 0)

    # ---------- phase B: vectorized Gauss-Newton loop ------------------

    # window offsets, reference iteration order (j outer, i inner)
    kk = lax.broadcasted_iota(jnp.int32, (fc, tt), 1)
    ii = (kk - ww * (kk // ww) - hw).astype(f32)
    jj = (kk // ww - hh).astype(f32)

    x0 = x0v_ref[pl.ds(0, fc)].reshape(fc, 1)
    y0 = y0v_ref[pl.ds(0, fc)].reshape(fc, 1)
    a11_0 = a11v_ref[pl.ds(0, fc)].reshape(fc, 1)
    a12_0 = a12v_ref[pl.ds(0, fc)].reshape(fc, 1)
    a21_0 = a21v_ref[pl.ds(0, fc)].reshape(fc, 1)
    a22_0 = a22v_ref[pl.ds(0, fc)].reshape(fc, 1)
    act = actv_ref[pl.ds(0, fc)].reshape(fc, 1) > 0.0
    row0 = row0v_ref[pl.ds(0, fc)].reshape(fc, 1).astype(jnp.int32)
    xoff = xoffv_ref[pl.ds(0, fc)].reshape(fc, 1).astype(jnp.int32)
    tmpl = tmpl_ref[pl.ds(0, fc)]          # [fc, tt]

    def warp(x, y, a11, a12, a21, a22):
        xs = x + a11 * ii + a12 * jj
        ys = y + a21 * ii + a22 * jj
        return xs, ys              # [fc, tt]

    def any_t(b):
        return jnp.sum(b.astype(f32), axis=1, keepdims=True) > 0.0

    def warp_oob(xs, ys):
        bad = ((xs < 0.0) | (ncols - xs < _ONE_PLUS_EPS) |
               (ys < 0.0) | (nrows - ys < _ONE_PLUS_EPS))
        return any_t(bad)

    # loop-invariant selector iotas, hoisted out of the GN body (the
    # while body rebuilt them every iteration otherwise)
    ic_cw = lax.broadcasted_iota(jnp.int32, (fc, cw, tt), 1)
    ir_rb = lax.broadcasted_iota(jnp.int32, (fc, rb, tt), 1)

    def fetch(xs, ys, x, y, a11, a12, a21, a22):
        """All tt bilinear samples per lane: one batched column dot on
        the row-stacked compact blocks + rowsel multiply-reduce per
        section. Returns ([img, gx, gy] samples, fits)."""
        xf = jnp.floor(xs)
        yf = jnp.floor(ys)
        fx = (xs - xf).reshape(fc, 1, tt)
        fy = (ys - yf).reshape(fc, 1, tt)
        xt = xf.astype(jnp.int32)
        yt = yf.astype(jnp.int32)
        sx = jnp.abs(a11) * hw + jnp.abs(a12) * hh
        sy = jnp.abs(a21) * hw + jnp.abs(a22) * hh
        xmin = jnp.floor(x - sx).astype(jnp.int32)
        xmax = jnp.floor(x + sx).astype(jnp.int32)
        ymin = jnp.floor(y - sy).astype(jnp.int32)
        ymax = jnp.floor(y + sy).astype(jnp.int32)
        # footprint must sit inside the ENTRY-state compact block (the
        # vec kernel never refetches — outgrowing lanes go stale)
        fits = ((ymin - row0 >= 0) & (ymax + 1 - row0 <= rb - 1) &
                (xmin - xoff >= 0) & (xmax + 1 - xoff <= cw - 1))
        ry = (yt - row0).reshape(fc, 1, tt)
        cx = (xt - xoff).reshape(fc, 1, tt)
        colsel = (jnp.where(ic_cw == cx, 1.0 - fx, 0.0) +
                  jnp.where(ic_cw == cx + 1, fx, 0.0))
        rowsel = (jnp.where(ir_rb == ry, 1.0 - fy, 0.0) +
                  jnp.where(ir_rb == ry + 1, fy, 0.0))

        prod = lax.dot_general(
            blk3_ref[pl.ds(0, fc)], colsel,
            (((2,), (1,)), ((0,), (0,))),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=f32)          # [fc, 3*rb, tt]

        def one(s):
            return jnp.sum(prod[:, s * rb:(s + 1) * rb, :] * rowsel,
                           axis=1)               # [fc, tt]

        return [one(s) for s in range(3)], fits

    # J = gxw*CX + gyw*CY with mode-specific CONSTANT pattern matrices
    # (hoisted: loop-invariant), replacing a 6-where broadcast build.
    # Row arithmetic is identical: e.g. mode-1 row1 = gxw*(-jj) + gyw*ii
    # == -gxw*jj + gyw*ii exactly (sign flip and +0.0 terms are exact).
    ir_p = lax.broadcasted_iota(jnp.int32, (fc, p, tt), 1)
    one_t = jnp.ones((fc, 1, tt), f32)
    zero_t = jnp.zeros((fc, 1, tt), f32)
    ii3 = ii.reshape(fc, 1, tt)
    jj3 = jj.reshape(fc, 1, tt)
    if mode == 0:
        cx_rows, cy_rows = [one_t, zero_t], [zero_t, one_t]
    elif mode == 1:
        cx_rows = [ii3, -jj3, one_t, zero_t]
        cy_rows = [jj3, ii3, zero_t, one_t]
    else:
        cx_rows = [ii3, zero_t, jj3, zero_t, one_t, zero_t]
        cy_rows = [zero_t, ii3, zero_t, jj3, zero_t, one_t]

    def pattern(rows):
        M = jnp.zeros((fc, p, tt), f32)
        for r, row in enumerate(rows):
            M = jnp.where(ir_p == r,
                          jnp.broadcast_to(row, (fc, p, tt)), M)
        return M

    CX, CY = pattern(cx_rows), pattern(cy_rows)

    def jacobian(gxw, gyw):
        return (gxw.reshape(fc, 1, tt) * CX
                + gyw.reshape(fc, 1, tt) * CY)

    idx_p = lax.broadcasted_iota(jnp.int32, (fc, p, p + 1), 1)

    def gauss_solve(T, e):
        """Batched unpivoted Gauss-Jordan, same elimination order as
        the serial kernel / ops/linalg.gauss_solve_det. Pivot rows and
        columns are extracted with STATIC slices (k is a Python int in
        the unrolled loop) — the masked-reduce formulation computed the
        same values through sums over zeros at ~2x the VPU work."""
        aug = jnp.concatenate([T, e], axis=2)          # [fc, p, p+1]
        det = jnp.ones((fc, 1), f32)
        for k in range(p):
            piv = aug[:, k:k + 1, k:k + 1]             # [fc, 1, 1]
            det = det * piv.reshape(fc, 1)
            safe = jnp.where(jnp.abs(piv) < 1e-30, 1.0, piv)
            row = aug[:, k:k + 1, :] / safe            # [fc, 1, p+1]
            factors = aug[:, :, k:k + 1]               # [fc, p, 1]
            elim = aug - factors * row
            aug = jnp.where(idx_p == k,
                            jnp.broadcast_to(row, aug.shape), elim)
        sol = aug[:, :, p:p + 1]                       # [fc, p, 1]
        return [sol[:, i:i + 1, 0] for i in range(p)], det

    zero = jnp.zeros((fc, 1), f32)

    def body(carry):
        x = carry[:, 0:1]
        y = carry[:, 1:2]
        a11 = carry[:, 2:3]
        a12 = carry[:, 3:4]
        a21 = carry[:, 4:5]
        a22 = carry[:, 5:6]
        live = carry[:, 6:7] > 0.0
        it = carry[:, 7:8]
        status = carry[:, 8:9]
        stale = carry[:, 9:10] > 0.0

        xs, ys = warp(x, y, a11, a12, a21, a22)
        oob = warp_oob(xs, ys)
        status = jnp.where(live & oob, float(KLT_OOB), status)
        live = live & ~oob
        (i2w, gxw, gyw), fits = fetch(xs, ys, x, y, a11, a12, a21, a22)
        newly_stale = live & ~fits
        stale = stale | newly_stale
        live = live & fits
        diff = tmpl - i2w
        J = jacobian(gxw, gyw)
        T = lax.dot_general(J, J, (((2,), (2,)), ((0,), (0,))),
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=f32)   # [fc, p, p]
        e = lax.dot_general(J, diff.reshape(fc, 1, tt),
                            (((2,), (2,)), ((0,), (0,))),
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=f32)   # [fc, p, 1]
        d, det = gauss_solve(T, e)
        small = jnp.abs(det) < min_determinant
        status = jnp.where(live & small, float(KLT_SMALL_DET), status)
        live = live & ~small
        if mode == 0:
            da11 = da12 = da21 = da22 = zero
            dx, dy = d[0], d[1]
        elif mode == 1:
            da11, da12, da21, da22 = d[0], -d[1], d[1], d[0]
            dx, dy = d[2], d[3]
        else:
            da11, da12, da21, da22 = d[0], d[2], d[1], d[3]
            dx, dy = d[4], d[5]
        x = jnp.where(live, x + dx, x)
        y = jnp.where(live, y + dy, y)
        a11 = jnp.where(live, a11 + da11, a11)
        a12 = jnp.where(live, a12 + da12, a12)
        a21 = jnp.where(live, a21 + da21, a21)
        a22 = jnp.where(live, a22 + da22, a22)
        nit = jnp.where(live, it + 1.0, it)
        converged = ((jnp.abs(dx) < min_displacement) &
                     (jnp.abs(dy) < min_displacement))
        live = live & ~converged & (nit < float(max_iterations))
        return jnp.concatenate(
            [x, y, a11, a12, a21, a22, live.astype(f32), nit, status,
             stale.astype(f32), zero, zero, zero, zero, zero, zero],
            axis=1)

    init = jnp.concatenate(
        [x0, y0, a11_0, a12_0, a21_0, a22_0, act.astype(f32), zero,
         jnp.full((fc, 1), float(KLT_TRACKED), f32),
         zero, zero, zero, zero, zero, zero, zero], axis=1)

    # early-exit loop: lanes freeze individually, the tile stops as
    # soon as every lane is dead (the LK-vec-proven shape)
    def ee_cond(c):
        return c[1] > 0

    def ee_step(c):
        tile = body(c[0])
        n = jnp.sum(tile[:, 6:7], axis=0, keepdims=True)
        return tile, n[0, 0].astype(jnp.int32)

    nlive0 = jnp.sum(init[:, 6:7], axis=0, keepdims=True)
    fin, _ = lax.while_loop(ee_cond, ee_step,
                            (init, nlive0[0, 0].astype(jnp.int32)))

    # ---------- post-loop (serial-kernel order) -------------------------
    x = fin[:, 0:1]
    y = fin[:, 1:2]
    a11 = fin[:, 2:3]
    a12 = fin[:, 3:4]
    a21 = fin[:, 4:5]
    a22 = fin[:, 5:6]
    status = fin[:, 8:9]
    stale = fin[:, 9:10] > 0.0

    xs, ys = warp(x, y, a11, a12, a21, a22)
    tracked = status == float(KLT_TRACKED)
    status = jnp.where(act & tracked & warp_oob(xs, ys),
                       float(KLT_OOB), status)
    (i2w, _, _), fits = fetch(xs, ys, x, y, a11, a12, a21, a22)
    stale = stale | (act & (status == float(KLT_TRACKED)) & ~fits)
    residue = jnp.sum(jnp.abs(tmpl - i2w), axis=1,
                      keepdims=True) / npix
    status = jnp.where(act & (status == float(KLT_TRACKED))
                       & (residue > max_residue),
                       float(KLT_LARGE_RESIDUE), status)
    drift = jnp.maximum(jnp.abs(x - x0), jnp.abs(y - y0))
    status = jnp.where(act & (status == float(KLT_TRACKED))
                       & (drift > max_displacement_differ),
                       float(KLT_OOB), status)

    # inactive lanes pass through entry state with status TRACKED
    status = jnp.where(act, status, float(KLT_TRACKED))
    out_ref[pl.ds(0, fc)] = jnp.concatenate(
        [x, y, a11, a12, a21, a22, status,
         (stale & act).astype(f32), fin[:, 7:8],
         jnp.zeros((fc, 7), f32)], axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "fc"))
def _vec_affine_raw(tmpl, img2, gx2, gy2, x0, y0, A0, check,
                    cfg, *, interpret: bool = False,
                    fc: int | None = None):
    """Kernel invocation returning the raw [npad, 16] output tile
    (cols: x, y, a11, a12, a21, a22, status, stale, nit, 0...). The
    public wrappers below slice it."""
    mode = int(cfg.affineConsistencyCheck)
    hw, hh = cfg.affine_window_width // 2, cfg.affine_window_height // 2
    ww, wh = cfg.affine_window_width, cfg.affine_window_height
    tt = ww * wh
    nrows, ncols = img2.shape
    hp, wp = _padded_dims(nrows, ncols, wh)
    if fc is None:
        fc = _FC

    def padded(a):
        h, w = a.shape
        return jnp.pad(a.astype(jnp.float32), ((0, hp - h), (0, wp - w)))

    n = x0.shape[0]
    npad = -(-n // fc) * fc
    a11, a12 = A0[:, 0, 0], A0[:, 0, 1]
    a21, a22 = A0[:, 1, 0], A0[:, 1, 1]
    row0, col0, xoff = _block_origin(x0, y0, a11, a12, a21, a22, hw=hw,
                                     hh=hh, nrows=nrows, ncols=ncols,
                                     wh=wh)
    roll = xoff - col0
    feats = (x0, y0, a11, a12, a21, a22, check.astype(jnp.int32),
             row0, col0, roll, xoff)
    tmpl2 = tmpl.reshape(n, tt).astype(jnp.float32)
    if npad != n:
        feats = tuple(jnp.pad(a, (0, npad - n)) for a in feats)
        tmpl2 = jnp.pad(tmpl2, ((0, npad - n), (0, 0)))
    (x0p, y0p, a11p, a12p, a21p, a22p, actp, row0p, col0p, rollp,
     xoffp) = feats
    vecs = tuple(a.astype(jnp.float32).reshape(npad, 1, 1)
                 for a in (x0p, y0p, a11p, a12p, a21p, a22p, actp,
                           row0p, xoffp))

    kernel = functools.partial(
        _affine_vec_kernel, fc=fc, mode=mode, hw=hw, hh=hh,
        nrows=nrows, ncols=ncols,
        max_iterations=cfg.affine_max_iterations,
        min_displacement=cfg.affine_min_displacement,
        min_determinant=cfg.min_determinant,
        max_residue=cfg.affine_max_residue,
        max_displacement_differ=cfg.affine_max_displacement_differ)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem1 = pl.BlockSpec((fc, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vimg = pl.BlockSpec((hp, wp), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(npad // fc,),
        out_shape=jax.ShapeDtypeStruct((npad, 16), jnp.float32),
        in_specs=[smem] * 4 + [vmem1] * 9
        + [pl.BlockSpec((fc, tt), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)]
        + [vimg] * 3,
        out_specs=pl.BlockSpec((fc, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((fc, 3 * _rb_a(wh), _cw(ww)),
                                   jnp.float32)],
        interpret=interpret,
    )(row0p, col0p, rollp, actp, *vecs, tmpl2,
      padded(img2), padded(gx2), padded(gy2))
    return out


def vec_affine_track_batch(tmpl, img2, gx2, gy2, x0, y0, A0, check,
                           cfg, *, interpret: bool = False,
                           fc: int | None = None):
    """Feature-vectorized fused affine batch. Same contract as
    pallas_affine_fused.fused_affine_track_batch minus the built-in
    fallback: returns (x, y, A, status, stale) where ``stale`` lanes
    drifted/grew outside their entry-state compact block and must be
    recomputed (see vec_affine_with_fallback)."""
    n = x0.shape[0]
    out = _vec_affine_raw(tmpl, img2, gx2, gy2, x0, y0, A0, check, cfg,
                          interpret=interpret, fc=fc)
    x = out[:n, 0]
    y = out[:n, 1]
    A = out[:n, 2:6].reshape(n, 2, 2)
    status = out[:n, 6].astype(jnp.int32)
    stale = (out[:n, 7] > 0.0) & check
    return x, y, A, status, stale


def vec_affine_track_batch_with_iters(tmpl, img2, gx2, gy2, x0, y0, A0,
                                      check, cfg, *,
                                      interpret: bool = False,
                                      fc: int | None = None):
    """Diagnostic variant returning (x, y, A, status, stale, nit) —
    nit is each lane's Gauss-Newton iteration count (out col 8), used
    by the straggler-waste probes (experiments/probe_affine_iters.py)."""
    n = x0.shape[0]
    out = _vec_affine_raw(tmpl, img2, gx2, gy2, x0, y0, A0, check, cfg,
                          interpret=interpret, fc=fc)
    return (out[:n, 0], out[:n, 1], out[:n, 2:6].reshape(n, 2, 2),
            out[:n, 6].astype(jnp.int32), (out[:n, 7] > 0.0) & check,
            out[:n, 8].astype(jnp.int32))


def vec_affine_with_fallback(tmpl, img2, gx2, gy2, x0, y0, A0, check,
                             cfg, *, interpret: bool = False,
                             order_hint=None, return_nit: bool = False):
    """vec_affine_track_batch + exact serial recomputation of stale
    lanes. Drop-in replacement for _affine_track_batch /
    fused_affine_track_batch: returns (x, y, A, status)
    (+ per-lane GN iteration counts when ``return_nit``).

    ``order_hint`` (perf only, DESIGN.md §9): per-lane predicted
    iteration counts — typically last frame's (AffineState.nit). Tiles
    run to their SLOWEST lane, and ~5% of lanes persistently hit the
    iteration cap, so ordering lanes by the hint clusters stragglers
    into few tiles (measured 2.11 -> 1.41 ms of iteration work on the
    config-3 window). Per-lane results are grouping-invariant (every
    update is lane-masked), so any hint — even garbage — changes
    nothing but speed; the permutation is undone on output."""
    from .pallas_affine_fused import fused_affine_track_batch
    n = x0.shape[0]
    if order_hint is not None:
        # inactive lanes sort last (they cost no iterations but would
        # otherwise dilute the active tiles)
        key = jnp.where(check, order_hint.astype(jnp.float32), -1.0)
        perm = jnp.argsort(-key)
        inv = jnp.zeros((n,), jnp.int32).at[perm].set(
            jnp.arange(n, dtype=jnp.int32))
        out = _vec_affine_raw(tmpl[perm], img2, gx2, gy2, x0[perm],
                              y0[perm], A0[perm], check[perm], cfg,
                              interpret=interpret)[:n][inv]
    else:
        out = _vec_affine_raw(tmpl, img2, gx2, gy2, x0, y0, A0, check,
                              cfg, interpret=interpret)[:n]
    x = out[:, 0]
    y = out[:, 1]
    A = out[:, 2:6].reshape(n, 2, 2)
    status = out[:, 6].astype(jnp.int32)
    stale = (out[:, 7] > 0.0) & check
    # stale lanes re-run serially below; mark them cap-iteration for
    # the next frame's ordering hint (they behaved like stragglers)
    nit = jnp.where(stale, cfg.affine_max_iterations,
                    out[:, 8].astype(jnp.int32))

    def rerun(_):
        xb, yb, Ab, sb = fused_affine_track_batch(
            tmpl, img2, gx2, gy2, x0, y0, A0, check & stale, cfg,
            interpret=interpret)
        return (jnp.where(stale, xb, x), jnp.where(stale, yb, y),
                jnp.where(stale[:, None, None], Ab, A),
                jnp.where(stale, sb, status))

    merged = lax.cond(jnp.any(stale), rerun,
                      lambda _: (x, y, A, status), None)
    if return_nit:
        return merged + (nit,)
    return merged


def bench_vec_affine(h=480, w=640, n_features=1000, iters=10,
                     device_trace=False, mode=2, start_off=2.0):
    """Race the vectorized kernel against the serial fused kernel and
    the XLA batch (dispatch clock; device trace optional)."""
    import time

    import numpy as np

    from ..config import create_config
    from .affine import _affine_track_batch
    from .convolve import compute_gradients, compute_smoothed_image
    from .interp import gather_window
    from .pallas_affine_fused import fused_affine_track_batch

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
    tmpl = gather_window(s1, x, y, hw, hh)
    A0 = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32),
                          (n_features, 2, 2))
    check = jnp.ones((n_features,), bool)
    x2, y2 = x + start_off, y + start_off / 2
    args = (tmpl, s2, gx2, gy2, x2, y2, A0, check)

    vec = jax.jit(functools.partial(vec_affine_with_fallback, cfg=cfg))
    fused = jax.jit(functools.partial(fused_affine_track_batch,
                                      cfg=cfg))
    ref = jax.jit(functools.partial(_affine_track_batch, cfg=cfg))

    out = {}
    for name, fn in (("pallas_vec", lambda: vec(*args)),
                     ("pallas_fused", lambda: fused(*args)),
                     ("xla_batch", lambda: ref(*args))):
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
    print(json.dumps(bench_vec_affine(device_trace=True), indent=2,
                     default=str))
