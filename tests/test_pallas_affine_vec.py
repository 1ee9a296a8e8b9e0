"""Feature-vectorized fused affine kernel == XLA affine batch
(interpret mode on the CPU backend; TPU measurements in DESIGN.md §3).

The XLA path (ops/affine._affine_track_batch) is oracle-parity-tested
in test_affine.py; the serial fused kernel is pinned to it in
test_pallas_affine_fused.py. These tests pin the VECTORIZED kernel to
the same bar: statuses exactly equal, positions/warps to 1e-3, with
corridor-stale lanes recomputed exactly by the serial kernel inside
vec_affine_with_fallback."""

import functools

import numpy as np
import jax.numpy as jnp
import pytest

from pyfeaturetrack_tpu.config import create_config
from pyfeaturetrack_tpu.ops.affine import _affine_track_batch
from pyfeaturetrack_tpu.ops.convolve import (compute_gradients,
                                             compute_smoothed_image)
from pyfeaturetrack_tpu.ops.interp import gather_window
from pyfeaturetrack_tpu.ops.pallas_affine_vec import (
    vec_affine_available, vec_affine_track_batch,
    vec_affine_with_fallback)



import jax

# CPU suite: interpret mode. Under PFT_TEST_PLATFORM=tpu the REAL
# kernel runs on the chip (PARITY.md round-4 on-chip sweep).
_INTERP = jax.default_backend() == "cpu"
# positions/warps tolerance: near-bitwise in interpret mode; on the
# real chip the serial fused kernel's documented bar is 0.03 px
# (DESIGN.md §3) — the vec kernel gets the same on-chip bar. Statuses
# stay asserted exactly equal on both.
_ATOL = 1e-3 if _INTERP else 5e-2


def _scene(h=120, w=160, n=24, seed=0, shift=(0.5, 1.0), gain=1.0,
           cfg=None):
    cfg = cfg or create_config(affineConsistencyCheck=2)
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h + 8, w + 8))
    k = np.array([1.0, 4, 6, 4, 1]) / 16.0
    for axis in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, base)
    dy, dx = 1, 1
    img1 = jnp.asarray(base[:h, :w], jnp.float32)
    img2 = jnp.asarray(gain * base[dy:h + dy, dx:w + dx], jnp.float32)
    s1 = compute_smoothed_image(img1, cfg.smooth_sigma)
    s2 = compute_smoothed_image(img2, cfg.smooth_sigma)
    gx2, gy2 = compute_gradients(s2, cfg.grad_sigma)
    hw = cfg.affine_window_width // 2
    hh = cfg.affine_window_height // 2
    b = max(hw, hh) + 3
    x = jnp.asarray(rng.uniform(b, w - b - 1, n), jnp.float32)
    y = jnp.asarray(rng.uniform(b, h - b - 1, n), jnp.float32)
    tmpl = gather_window(s1, x, y, hw, hh)
    A0 = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (n, 2, 2))
    check = jnp.ones((n,), bool)
    # start near the true position (post-translation-track state; the
    # scene shifted by (+1,+1) so the target sits at x-1): remaining
    # correction ~0.5 px stays well inside the 1.5 px drift gate
    del shift
    return cfg, (tmpl, s2, gx2, gy2, x - 0.5, y - 0.5, A0, check)


def _compare(cfg, args, atol=None):
    atol = _ATOL if atol is None else atol
    vx, vy, vA, vs = vec_affine_with_fallback(*args, cfg,
                                              interpret=_INTERP)
    rx, ry, rA, rs = _affine_track_batch(*args, cfg)
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(rs))
    check = np.asarray(args[7])
    ok = check & (np.asarray(rs) == 0)
    np.testing.assert_allclose(np.asarray(vx)[ok], np.asarray(rx)[ok],
                               atol=atol)
    np.testing.assert_allclose(np.asarray(vy)[ok], np.asarray(ry)[ok],
                               atol=atol)
    np.testing.assert_allclose(np.asarray(vA)[ok], np.asarray(rA)[ok],
                               atol=atol)
    return np.asarray(rs)


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_vec_affine_matches_xla_modes(mode):
    cfg, args = _scene(cfg=create_config(affineConsistencyCheck=mode))
    assert vec_affine_available((120, 160), cfg)
    rs = _compare(cfg, args)
    assert (rs == 0).sum() > 12  # scenario actually verifies features


def test_vec_affine_unchecked_lanes_pass_through():
    cfg, args = _scene(n=30)
    check = jnp.asarray(np.arange(30) % 3 == 0)
    args = args[:7] + (check,)
    vx, vy, vA, vs = vec_affine_with_fallback(*args, cfg,
                                              interpret=_INTERP)
    nc = ~np.asarray(check)
    np.testing.assert_array_equal(np.asarray(vs)[nc], 0)
    np.testing.assert_allclose(np.asarray(vx)[nc],
                               np.asarray(args[4])[nc])
    np.testing.assert_allclose(np.asarray(vA)[nc],
                               np.asarray(args[6])[nc])
    _compare(cfg, args)


def test_vec_affine_small_det_trigger():
    cfg = create_config(affineConsistencyCheck=2)
    h, w, n = 120, 160, 12
    img = jnp.full((h, w), 80.0, jnp.float32)  # flat: singular normal eq
    gx, gy = compute_gradients(img, cfg.grad_sigma)
    hw = cfg.affine_window_width // 2
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(hw + 3, w - hw - 4, n), jnp.float32)
    y = jnp.asarray(rng.uniform(hw + 3, h - hw - 4, n), jnp.float32)
    tmpl = gather_window(img, x, y, hw, hw)
    A0 = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (n, 2, 2))
    check = jnp.ones((n,), bool)
    args = (tmpl, img, gx, gy, x, y, A0, check)
    rs = _compare(cfg, args)
    assert (rs == -2).all()


def test_vec_affine_drift_and_residue_triggers():
    cfg, args = _scene(seed=5)
    # shift start far: converges > max_displacement_differ away -> OOB
    far = args[:4] + (args[4] + 3.0, args[5] + 2.0) + args[6:]
    rs = _compare(cfg, far)
    assert (rs == -4).any()
    # mismatched template -> LARGE_RESIDUE
    cfg2 = cfg.replace(affine_max_residue=0.5)
    rs = _compare(cfg2, args)
    assert (rs == -5).any()


def test_vec_affine_stale_lanes_recovered_exactly():
    """A large warp scale drives footprints outside the entry-state
    block; the fallback hands exactly those lanes to the serial fused
    kernel and statuses still match the XLA path."""
    cfg, args = _scene(seed=7, n=16)
    A0 = jnp.broadcast_to(2.4 * jnp.eye(2, dtype=jnp.float32),
                          (16, 2, 2))
    args = args[:6] + (A0,) + args[7:]
    _, _, _, _, stale = vec_affine_track_batch(*args, cfg,
                                               interpret=_INTERP)
    assert np.asarray(stale).any()  # scenario exercises the stale path
    _compare(cfg, args)


def test_vec_affine_ragged_tail_padding():
    cfg, args = _scene(n=13)  # not a multiple of the 8-feature tile
    _compare(cfg, args)


def test_vec_affine_rectangular_window():
    cfg = create_config(affineConsistencyCheck=2,
                        affine_window_width=11,
                        affine_window_height=17)
    cfg2, args = _scene(cfg=cfg)
    _compare(cfg2, args)


def test_env_dispatch_vec(monkeypatch):
    """PFT_PALLAS_AFFINE=vec routes the full consistency check through
    the vectorized kernel; result matches the XLA route."""
    import jax

    from pyfeaturetrack_tpu.features import (AffineState,
                                             create_feature_list)
    from pyfeaturetrack_tpu.models.tracker import KLTTrackFeatures

    from conftest import make_textured_image

    cfg = create_config(affineConsistencyCheck=2, sequentialMode=False)
    h, w, n = 88, 136, 12
    img1 = make_textured_image(h, w, seed=31)
    img2 = np.roll(img1, (1, 1), axis=(0, 1))
    rng = np.random.default_rng(32)
    fl = create_feature_list(n, with_affine=True)
    fl = fl._replace(
        x=jnp.asarray(rng.uniform(20, w - 21, n), jnp.float32),
        y=jnp.asarray(rng.uniform(20, h - 21, n), jnp.float32),
        val=jnp.zeros((n,), jnp.int32))

    monkeypatch.delenv("PFT_PALLAS_AFFINE", raising=False)
    jax.clear_caches()
    base_fl, _ = KLTTrackFeatures(cfg, img1, img2, fl)
    monkeypatch.setenv("PFT_PALLAS_AFFINE", "vec")
    jax.clear_caches()
    vec_fl, _ = KLTTrackFeatures(cfg, img1, img2, fl)
    np.testing.assert_array_equal(np.asarray(vec_fl.val),
                                  np.asarray(base_fl.val))
    np.testing.assert_allclose(np.asarray(vec_fl.x),
                               np.asarray(base_fl.x), atol=_ATOL)
    np.testing.assert_allclose(np.asarray(vec_fl.aff.A),
                               np.asarray(base_fl.aff.A), atol=_ATOL)


def test_vec_affine_order_hint_grouping_invariant():
    """Tile ordering by ``order_hint`` is a pure perf lever: results
    (and the returned per-lane iteration counts) must be BITWISE
    identical to the unsorted run for arbitrary — even adversarial —
    hints, because every kernel update is lane-masked and the output
    permutation is undone."""
    cfg, args = _scene(n=40)
    base = vec_affine_with_fallback(*args, cfg, interpret=_INTERP,
                                    return_nit=True)
    rng = np.random.default_rng(7)
    for hint in (jnp.zeros((40,), jnp.int32),
                 jnp.asarray(rng.integers(0, 11, 40), jnp.int32),
                 jnp.arange(40, dtype=jnp.int32)[::-1]):
        got = vec_affine_with_fallback(*args, cfg, interpret=_INTERP,
                                       order_hint=hint, return_nit=True)
        for a, b in zip(base, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(np.asarray(base[4]).max()) >= 1  # nit actually measured


def test_affine_stage_nit_hint_threads_through(monkeypatch):
    """affine_consistency_check under PFT_PALLAS_AFFINE=vec stores the
    measured iteration counts in AffineState.nit and produces the same
    features as the XLA stage."""
    import functools

    from pyfeaturetrack_tpu.features import FeatureState
    from pyfeaturetrack_tpu.ops.affine import affine_consistency_check
    from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                              track_features_pyramids)

    cfg = create_config(affineConsistencyCheck=2, sequentialMode=True)
    h, w, n = 120, 160, 32
    rng = np.random.default_rng(5)
    base = rng.uniform(0, 255, (h + 6, w + 6))
    k = np.array([1.0, 4, 6, 4, 1]) / 16.0
    for axis in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, base)
    frames = [jnp.asarray(base[i:i + h, i:i + w], jnp.float32)
              for i in range(3)]
    build = jax.jit(build_track_pyramids, static_argnames=("cfg",))
    pyrs = [build(f, cfg) for f in frames]
    x = jnp.asarray(rng.uniform(12, w - 13, n), jnp.float32)
    y = jnp.asarray(rng.uniform(12, h - 13, n), jnp.float32)
    fl = FeatureState(x=x, y=y, val=jnp.zeros((n,), jnp.int32), aff=None)

    def run(env):
        if env:
            monkeypatch.setenv("PFT_PALLAS_AFFINE", "vec")
        else:
            monkeypatch.delenv("PFT_PALLAS_AFFINE", raising=False)
        cur, nits = fl, []
        for i in range(2):
            nx, ny, nv = jax.jit(functools.partial(
                track_features_pyramids.__wrapped__, cfg=cfg))(
                pyrs[i], pyrs[i + 1], cur.x, cur.y, cur.val)
            after = cur._replace(x=nx, y=ny, val=nv)
            after = affine_consistency_check(pyrs[i], pyrs[i + 1], cur,
                                             after, cfg)
            nits.append(None if after.aff is None else
                        np.asarray(after.aff.nit))
            cur = after
        return cur, nits

    ref, _ = run(False)
    got, nits = run(True)
    np.testing.assert_array_equal(np.asarray(got.val), np.asarray(ref.val))
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=_ATOL)
    # second frame runs the vec check on carried templates: its nit
    # hints must be the measured counts (>=1 for checked lanes)
    checked = np.asarray(got.val) == 0
    assert nits[1] is not None and (nits[1][checked] >= 1).all()
