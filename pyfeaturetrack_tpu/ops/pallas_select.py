"""Pallas greedy min-distance suppression: the host scan as ONE kernel.

Reference parity: selectGoodFeatures.py -> _enforceMinimumDistance (the
greedy best-first acceptance with a mindist occupancy map). The XLA
device path (ops/select_device.suppress_and_fill) recomputes that greedy
as a lexicographic-MIS fixpoint over a [K, K] conflict matrix — ~10
rounds of 16 MB boolean relaxations. This kernel instead runs the
REFERENCE'S OWN algorithm directly: a serial scan over the
priority-ordered candidates against a VMEM-resident occupancy grid
(check the candidate's cell, accept, stamp the (2·(mindist-1)+1)-square
box), producing the identical acceptance sequence in one op with O(K)
work instead of O(K² · rounds).

Why it exists (ROOFLINE.md §0): after the fused LK kernel, the refill
branch became the dominant per-op-taxed stage of the device-resident
config-2 step (~11 of ~25 ms honest clock).

MEASURED VERDICT (2026-08-18, v5e via relay, honest profiler clock):
standalone the kernel is exactly what was predicted — bit-equal to the
host greedy and the MIS fixpoint, ONE op, 0.53 ms vs the fixpoint's
0.29 ms / 89 ops at K=2048 (and 1.05 ms inside a lax.cond). But
INTEGRATED into the device-resident sequence step it is a net loss on
this rig: swapping the fixpoint for the custom call changes how XLA
fuses the surrounding eig-map convolutions (six ~12 ms materialized
conv/fusion ops appear where the fixpoint arm had three ~2.8 ms ones)
and the step goes 25.5 -> 148 ms. Same A/B, identical live-feature
dynamics, only the suppression impl differs. So: OPT-IN
(PFT_PALLAS_SELECT=1), default stays the fixpoint — the kernel is kept
as the measured one-op form of the reference's greedy (exactness
tested in tests/test_pallas_select.py) and as the right shape for
backends where custom calls don't perturb fusion.

Mosaic shape notes: the occupancy grid lives in VMEM with a (64-row,
384-lane) guard margin so box stamps never need clamping (cell (y, x)
maps to grid[y + 64, x + 128]); cell reads and box read-modify-writes go
through 8/128-aligned blocks with one-hot / iota-range masks (dynamic
slices must be provably aligned — see ops/pallas_lk.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_GUARD = 64    # top margin (rows); also bottom via padding
_COL_GUARD = 128   # left margin (lanes); right margin via padding
_COLS = 256        # lane width of the aligned stamp block
_VMEM_GRID_BUDGET = 12 * 1024 * 1024
_MAX_RADIUS = 48   # box stamps stay inside the guard margins


def pallas_suppress_available(shape, mindist: int) -> bool:
    nrows, ncols = shape
    d = mindist - 1
    if d > _MAX_RADIUS or d >= _COL_GUARD or 2 * d + 1 > _COLS - 128:
        return False
    hp, wp = _grid_dims(nrows, ncols, d)
    return hp * wp * 4 <= _VMEM_GRID_BUDGET


def _rows_blk(d: int) -> int:
    return 8 * ((2 * d + 1 + 7) // 8) + 8


def _grid_dims(nrows: int, ncols: int, d: int) -> tuple[int, int]:
    hp = 8 * (-(-(nrows + _ROW_GUARD) // 8)) + _rows_blk(d) + 8
    wp = 128 * (-(-(ncols + _COL_GUARD) // 128)) + _COLS + 128
    return hp, wp


def _suppress_kernel(xs_ref, ys_ref, valid_ref, budget_ref, out_ref,
                     grid_ref, acc_ref, *, d: int):
    k = xs_ref.shape[0]
    rb = _rows_blk(d)
    grid_ref[...] = jnp.zeros(grid_ref.shape, grid_ref.dtype)
    acc_ref[0] = jnp.int32(0)

    def one(j, carry):
        # budget early exit (EXACT: greedy is prefix-stable and
        # fill_slots consumes only the first `budget` acceptances, so
        # once that many are accepted the remaining candidates cannot
        # change the fill — they are marked not-accepted and skipped)
        out_ref[j] = 0

        @pl.when(acc_ref[0] < budget_ref[0])
        def _():
            x = xs_ref[j] + _COL_GUARD
            y = ys_ref[j] + _ROW_GUARD

            # cell read: aligned (8, 128) block + one-hot row/col dots
            row_al = pl.multiple_of(8 * (y // 8), 8)
            col_al = pl.multiple_of(128 * (x // 128), 128)
            block = grid_ref[pl.ds(row_al, 8), pl.ds(col_al, 128)]
            rsel = (lax.broadcasted_iota(jnp.int32, (1, 8), 1)
                    == y - row_al).astype(jnp.float32)
            csel = (lax.broadcasted_iota(jnp.int32, (128, 1), 0)
                    == x - col_al).astype(jnp.float32)
            cell = jnp.dot(jnp.dot(rsel, block,
                                   preferred_element_type=jnp.float32),
                           csel, preferred_element_type=jnp.float32)[0, 0]

            ok = (valid_ref[j] > 0) & (cell == 0.0)
            out_ref[j] = jnp.where(ok, 1, 0)  # SMEM scalar store
            acc_ref[0] = acc_ref[0] + jnp.where(ok, 1, 0)

            @pl.when(ok & (d >= 0))
            def _():
                # stamp the (2d+1)-square box via an aligned RMW block
                r0 = y - d
                c0 = x - d
                row_s = pl.multiple_of(8 * (r0 // 8), 8)
                col_s = pl.multiple_of(128 * (c0 // 128), 128)
                blk = grid_ref[pl.ds(row_s, rb), pl.ds(col_s, _COLS)]
                ri = (lax.broadcasted_iota(jnp.int32, (rb, _COLS), 0)
                      + row_s)
                ci = (lax.broadcasted_iota(jnp.int32, (rb, _COLS), 1)
                      + col_s)
                mask = ((ri >= r0) & (ri <= r0 + 2 * d) &
                        (ci >= c0) & (ci <= c0 + 2 * d))
                grid_ref[pl.ds(row_s, rb), pl.ds(col_s, _COLS)] = (
                    jnp.maximum(blk, mask.astype(jnp.float32)))

        return carry

    lax.fori_loop(0, k, one, 0)


@functools.partial(jax.jit, static_argnames=("shape", "mindist",
                                             "interpret"))
def greedy_suppress_pallas(cand_x: jax.Array, cand_y: jax.Array,
                           valid: jax.Array, *, shape: tuple[int, int],
                           mindist: int, interpret: bool = False,
                           budget: jax.Array | None = None
                           ) -> jax.Array:
    """Greedy mindist acceptance flags for priority-ordered candidates.

    Equivalent to the accepted-set of select_device.suppress_and_fill
    (tested bit-equal). ``shape`` is the image (nrows, ncols); invalid
    lanes are rejected and never stamp. ``budget`` (traced scalar,
    default "no limit") stops the scan after that many acceptances —
    exact whenever the consumer uses at most ``budget`` accepted
    candidates (fill_slots does), and the big lever for refills: a
    typical replace-lost pass needs tens of slots, not a K=4096 scan.
    """
    nrows, ncols = shape
    d = mindist - 1
    k = cand_x.shape[0]
    hp, wp = _grid_dims(nrows, ncols, max(d, 0))
    if budget is None:
        budget = jnp.int32(k)
    kernel = functools.partial(_suppress_kernel, d=d)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k,), jnp.int32),
        in_specs=[smem, smem, smem, smem],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((hp, wp), jnp.float32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(cand_x.astype(jnp.int32), cand_y.astype(jnp.int32),
      valid.astype(jnp.int32),
      jnp.asarray(budget, jnp.int32).reshape(1))
    return out > 0


# ---------------------------------------------------------------------
# Serial-extraction greedy (round 4): the refill lane's one-op form of
# selectGoodFeatures.py -> _KLTSelectGoodFeatures + _sortPointList +
# _enforceMinimumDistance composed — instead of sort-then-scan, extract
# candidates in value order directly from the map (argmax with the
# sort's stable row-major tie-break) and stamp the mindist box like
# _fillFeaturemap. Greedy never consults rejected candidates, so
# stamping only accepted ones reproduces the reference acceptance
# sequence exactly over the FULL candidate pool (no top-K prefix).
# ---------------------------------------------------------------------


def extract_available(grid_shape) -> bool:
    """greedy_extract_pallas VMEM gate: the padded candidate map must
    fit in VMEM once (input is donated to the stamped output, so only
    one copy lives on chip)."""
    ny, nx = grid_shape
    hp = 8 * (-(-ny // 8))
    wp = 128 * (-(-nx // 128))
    return hp * wp * 4 <= _VMEM_GRID_BUDGET


def _extract_kernel(budget_ref, map_in_ref, map_io_ref, outc_ref,
                    outr_ref, outv_ref, nacc_ref, *, dg: int,
                    min_eig: int, big: int):
    del map_in_ref  # aliased with map_io_ref (input_output_aliases)
    """Serial greedy extraction from the candidate eig map.

    Each round: global argmax (first occurrence in row-major order —
    the host sort's stable (-val, scan-order) tie-break), record it,
    zero the (2*dg+1)-square box around it (candidates whose image
    distance to an ACCEPTED one is <= mindist-1 can never be accepted —
    exactly _enforceMinimumDistance's fill_map stamp, in lattice
    coordinates). Stops when the max drops below min_eig (pool dry) or
    ``budget`` candidates were accepted."""
    hp, wp = map_io_ref.shape
    rio = lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    cio = lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    rio1 = lax.broadcasted_iota(jnp.int32, (hp, 1), 0)
    cio1 = lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    sio = lax.broadcasted_iota(jnp.int32, outc_ref.shape, 1)
    outc_ref[...] = jnp.zeros(outc_ref.shape, jnp.int32)
    outr_ref[...] = jnp.zeros(outr_ref.shape, jnp.int32)
    outv_ref[...] = jnp.zeros(outv_ref.shape, jnp.int32)
    nacc_ref[0] = jnp.int32(0)

    def body(state):
        i, _ = state
        m = map_io_ref[...]
        rowmax = jnp.max(m, axis=1, keepdims=True)            # [hp, 1]
        v = jnp.max(rowmax, axis=0, keepdims=True)[0, 0]
        ok = v >= min_eig
        r = jnp.min(jnp.where(rowmax == v, rio1, big),
                    axis=0, keepdims=True)[0, 0]
        rowv = jnp.max(jnp.where(rio == r, m, 0),
                       axis=0, keepdims=True)                 # [1, wp]
        c = jnp.min(jnp.where(rowv == v, cio1, big),
                    axis=1, keepdims=True)[0, 0]

        @pl.when(ok)
        def _():
            lane = sio == i
            outc_ref[...] = jnp.where(lane, c, outc_ref[...])
            outr_ref[...] = jnp.where(lane, r, outr_ref[...])
            outv_ref[...] = jnp.where(lane, v, outv_ref[...])
            nacc_ref[0] = i + 1
            box = ((jnp.abs(rio - r) <= dg) & (jnp.abs(cio - c) <= dg))
            map_io_ref[...] = jnp.where(box, 0, m)

        new_i = i + jnp.where(ok, 1, 0)
        return new_i, ok & (new_i < budget_ref[0])

    lax.while_loop(lambda s: s[1], body,
                   (jnp.int32(0), budget_ref[0] > 0))


@functools.partial(jax.jit, static_argnames=("min_eig", "dg", "max_out",
                                             "interpret"))
def greedy_extract_pallas(cand: jax.Array, *, min_eig: int, dg: int,
                          budget: jax.Array, max_out: int,
                          interpret: bool = False):
    """One-op greedy selection straight from the candidate eig map.

    ``cand``/[ny, nx] is the int32 candidate-lattice min-eig map with
    blocked cells already zeroed. Returns (row, col, val, n_acc):
    lattice coordinates + values of the accepted candidates in
    acceptance order ([max_out] arrays; lanes >= n_acc are zero), which
    IS the host greedy's acceptance sequence over ALL candidates — so
    unlike the top-K path there is no exhaustion/divergence case.
    ``dg`` is the stamp radius in lattice steps ((mindist-1)//step,
    min 0: a candidate always excludes at least its own cell).
    ``budget`` must be <= max_out (in-repo callers pass the free-slot
    count, bounded by the feature array length = max_out; acceptances
    beyond the output capacity would be silently dropped)."""
    ny, nx = cand.shape
    hp = 8 * (-(-ny // 8))
    wp = 128 * (-(-nx // 128))
    padded = jnp.pad(cand.astype(jnp.int32),
                     ((0, hp - ny), (0, wp - nx)))
    s = 128 * (-(-max_out // 128))
    kernel = functools.partial(_extract_kernel, dg=dg,
                               min_eig=max(int(min_eig), 1),
                               big=1 << 30)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    _, outc, outr, outv, nacc = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((hp, wp), jnp.int32),
                   jax.ShapeDtypeStruct((1, s), jnp.int32),
                   jax.ShapeDtypeStruct((1, s), jnp.int32),
                   jax.ShapeDtypeStruct((1, s), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vmem],
        out_specs=(vmem, vmem, vmem, vmem,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.asarray(budget, jnp.int32).reshape(1), padded)
    return (outr[0, :max_out], outc[0, :max_out], outv[0, :max_out],
            nacc[0])


def bench_pallas_select(h=480, w=640, k=2048, iters=20):
    """Race the Pallas greedy against the MIS fixpoint on the current
    backend (dispatch clock; use utils.traceview for the honest one)."""
    import time

    from .select_device import suppress_and_fill

    rng = np.random.default_rng(0)
    cx = jnp.asarray(rng.integers(8, w - 8, k), jnp.int32)
    cy = jnp.asarray(rng.integers(8, h - 8, k), jnp.int32)
    valid = jnp.asarray(rng.uniform(size=k) > 0.05)
    n = 1000
    x = jnp.full((n,), -1.0, jnp.float32)
    y = jnp.full((n,), -1.0, jnp.float32)
    val = jnp.full((n,), -1, jnp.int32)
    free = jnp.ones((n,), bool)
    cval = jnp.asarray(np.sort(rng.integers(1, 1 << 20, k))[::-1].copy(),
                       jnp.int32)

    pall = jax.jit(functools.partial(greedy_suppress_pallas,
                                     shape=(h, w), mindist=10))
    mis = jax.jit(functools.partial(suppress_and_fill, mindist=10))

    out = {}
    r = pall(cx, cy, valid)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = pall(cx, cy, valid)
    jax.block_until_ready(r)
    out["pallas_s"] = (time.perf_counter() - t0) / iters

    r2 = mis(cx, cy, cval, valid, free, x, y, val)
    jax.block_until_ready(r2)
    t0 = time.perf_counter()
    for _ in range(iters):
        r2 = mis(cx, cy, cval, valid, free, x, y, val)
    jax.block_until_ready(r2)
    out["mis_s"] = (time.perf_counter() - t0) / iters
    return out


if __name__ == "__main__":
    print(bench_pallas_select())
