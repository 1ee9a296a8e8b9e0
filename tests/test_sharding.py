"""Multi-device sharding: sharded == unsharded (SURVEY.md section 7.4).

Runs on the virtual 8-device CPU mesh from conftest.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pyfeaturetrack_tpu as pft
from pyfeaturetrack_tpu.parallel.sharding import (make_mesh,
                                                  multichip_track_step,
                                                  track_batch_sharded)
from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                          track_features_pyramids)

from conftest import make_textured_image, shift_image_bilinear

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def batch():
    cfg = pft.create_config()
    b, h, w, n = 8, 96, 128, 32
    rng = np.random.default_rng(17)
    imgs1 = np.stack([make_textured_image(h, w, seed=100 + i)
                      for i in range(b)])
    imgs2 = np.stack([shift_image_bilinear(imgs1[i], 0.9, -0.4)
                      for i in range(b)])
    xs = rng.uniform(cfg.borderx + 1, w - cfg.borderx - 2, (b, n))
    ys = rng.uniform(cfg.bordery + 1, h - cfg.bordery - 2, (b, n))
    vals = np.ones((b, n), np.int32)
    return cfg, imgs1, imgs2, xs, ys, vals


def _unsharded_reference(cfg, imgs1, imgs2, xs, ys, vals):
    outs = []
    for i in range(imgs1.shape[0]):
        p1 = build_track_pyramids(jnp.asarray(imgs1[i], jnp.float32), cfg)
        p2 = build_track_pyramids(jnp.asarray(imgs2[i], jnp.float32), cfg)
        outs.append(track_features_pyramids(
            p1, p2, jnp.asarray(xs[i], jnp.float32),
            jnp.asarray(ys[i], jnp.float32),
            jnp.asarray(vals[i], jnp.int32), cfg))
    return (np.stack([np.asarray(o[0]) for o in outs]),
            np.stack([np.asarray(o[1]) for o in outs]),
            np.stack([np.asarray(o[2]) for o in outs]))


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1), (1, 8)])
def test_sharded_equals_unsharded(batch, mesh_shape):
    cfg, imgs1, imgs2, xs, ys, vals = batch
    n_frame, n_feature = mesh_shape
    mesh = make_mesh(n_frame=n_frame, n_feature=n_feature)
    with mesh:
        sx, sy, sv = track_batch_sharded(imgs1, imgs2, xs, ys, vals,
                                         cfg, mesh)
    ux, uy, uv = _unsharded_reference(cfg, imgs1, imgs2, xs, ys, vals)
    np.testing.assert_array_equal(np.asarray(sv), uv)
    np.testing.assert_allclose(np.asarray(sx), ux, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sy), uy, atol=1e-4)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (1, 8)])
def test_full_pipeline_sharded_equals_unsharded(mesh_shape):
    """Affine consistency + lighting-insensitive LK + on-device
    replace-lost under the mesh == same batch on one device (VERDICT r1:
    sharded parity previously covered only the translational path)."""
    from pyfeaturetrack_tpu.parallel.sharding import (_full_pair_batch,
                                                      FRAME_AXIS,
                                                      FEATURE_AXIS)
    from jax.sharding import NamedSharding, PartitionSpec as P
    cfg = pft.create_config(affineConsistencyCheck=2,
                            lighting_insensitive=True).validated_window()
    b, h, w, n = 4, 96, 128, 32
    rng = np.random.default_rng(23)
    imgs1 = np.stack([make_textured_image(h, w, seed=200 + i)
                      for i in range(b)])
    imgs2 = np.stack([shift_image_bilinear(imgs1[i], 1.1, 0.6)
                      for i in range(b)])
    xs = rng.uniform(cfg.borderx + 1, w - cfg.borderx - 2, (b, n))
    ys = rng.uniform(cfg.bordery + 1, h - cfg.bordery - 2, (b, n))
    vals = np.ones((b, n), np.int32)
    args = (jnp.asarray(imgs1, jnp.float32), jnp.asarray(imgs2, jnp.float32),
            jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32),
            jnp.asarray(vals, jnp.int32))

    ux, uy, uv = [np.asarray(o) for o in _full_pair_batch(*args, cfg)]

    n_frame, n_feature = mesh_shape
    mesh = make_mesh(n_frame=n_frame, n_feature=n_feature)
    img_sh = NamedSharding(mesh, P(FRAME_AXIS, None, None))
    feat_sh = NamedSharding(mesh, P(FRAME_AXIS, FEATURE_AXIS))
    with mesh:
        sx, sy, sv = _full_pair_batch(
            jax.device_put(args[0], img_sh), jax.device_put(args[1], img_sh),
            jax.device_put(args[2], feat_sh),
            jax.device_put(args[3], feat_sh),
            jax.device_put(args[4], feat_sh), cfg)
    np.testing.assert_array_equal(np.asarray(sv), uv)
    np.testing.assert_allclose(np.asarray(sx), ux, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sy), uy, atol=1e-4)


def test_dense_flow_sharded_equals_unsharded():
    """Pixels are features: one frame pair's flow with the pixel-row
    axis sharded over 8 devices == the single-device result exactly."""
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.ops.flow import dense_flow_pyramids
    from pyfeaturetrack_tpu.parallel.sharding import dense_flow_sharded

    cfg = create_config()
    base = make_textured_image(64, 128, seed=11)
    img1 = base
    img2 = shift_image_bilinear(base, 1.0, -0.5)

    got = dense_flow_sharded(img1, img2, cfg)

    p1 = build_track_pyramids(jnp.asarray(img1, jnp.float32), cfg)
    p2 = build_track_pyramids(jnp.asarray(img2, jnp.float32), cfg)
    want = dense_flow_pyramids(p1, p2, cfg)

    np.testing.assert_array_equal(np.asarray(got.status),
                                  np.asarray(want.status))
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(want.u),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.v), np.asarray(want.v),
                               atol=1e-5)
    # the result really is distributed
    assert len(got.u.sharding.device_set) == 8


def test_multichip_track_step_runs():
    nx, ny, nval = multichip_track_step(8)
    assert np.asarray(nval).shape == (4, 64)
    # something must have been processed (any status is fine; shapes and
    # execution across 8 devices are what's under test)
    assert np.isfinite(np.asarray(nx)).all()


def test_dryrun_multichip_entry():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out[2]).shape == (64,)


def test_dense_disparity_sharded_equals_unsharded():
    """Dense stereo disparity with the pixel-row axis sharded over 8
    devices == the single-device result exactly (the SSD hypothesis
    sweep and the 1-D LK are both row-local)."""
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.ops.disparity import dense_disparity_pyramids
    from pyfeaturetrack_tpu.parallel.sharding import \
        dense_disparity_sharded

    cfg = create_config()
    base = make_textured_image(64, 160, seed=13)
    left = base[:, :128]
    right = base[:, 24:152]         # constant d = +24 -> needs the sweep

    got = dense_disparity_sharded(left, right, cfg, max_disparity=32.0)

    p1 = build_track_pyramids(jnp.asarray(left, jnp.float32), cfg)
    p2 = build_track_pyramids(jnp.asarray(right, jnp.float32), cfg)
    want = dense_disparity_pyramids(p1, p2, cfg, max_disparity=32.0)

    np.testing.assert_array_equal(np.asarray(got.status),
                                  np.asarray(want.status))
    np.testing.assert_allclose(np.asarray(got.d), np.asarray(want.d),
                               atol=1e-5)
    assert len(got.d.sharding.device_set) == 8
    ok = np.asarray(want.status) == 0
    assert abs(np.median(np.asarray(want.d)[ok]) - 24.0) < 0.3


def test_stream_sharded_serving_equals_unsharded():
    """Round 5 (VERDICT r4 item 8): the stream-sharded batched serving
    tick — with the refill under shard_map so each device refills its
    streams locally — must equal the unsharded tick bit-for-bit, and
    its partitioned HLO must carry no data collectives (only the two
    scalar predicate all-reduces)."""
    import functools

    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.parallel.scaling import _collective_bytes
    from pyfeaturetrack_tpu.parallel.sharding import FRAME_AXIS
    from pyfeaturetrack_tpu.serving import _select_batch, _step_batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = create_config().replace(sequentialMode=True).validated_window()
    b, h, w, n = 8, 64, 96, 16
    rng = np.random.default_rng(9)
    base = rng.uniform(0, 255, size=(b, h, w)).astype(np.float32)
    ticks = [jnp.asarray(np.roll(base, 2 * i, axis=-1))
             for i in range(3)]
    pyr, x, y, val, aff, _ = _select_batch(ticks[0], cfg, n, 64)
    ref = _step_batch(pyr, tuple(ticks), x, y, val, cfg, True, 64, aff,
                      n_steps=3)

    mesh = make_mesh(n_frame=b, n_feature=1, devices=jax.devices()[:b])
    img_sh = NamedSharding(mesh, P(FRAME_AXIS, None, None))
    ticks_sh = [jax.device_put(t, img_sh) for t in ticks]
    with mesh:
        pyr2, x2, y2, val2, aff2, _ = _select_batch(ticks_sh[0], cfg,
                                                    n, 64)
        got = _step_batch(pyr2, tuple(ticks_sh), x2, y2, val2, cfg,
                          True, 64, aff2, n_steps=3, stream_mesh=mesh)
    for a, bb in zip(ref[2], got[2]):   # final (x, y, val)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
    for a, bb in zip(ref[1], got[1]):   # history
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))

    # collective census of the sharded module: nothing image-sized
    low = _step_batch.lower(pyr2, tuple(ticks_sh), x2, y2, val2, cfg,
                            True, 64, aff2, n_steps=3,
                            stream_mesh=mesh)
    colls = _collective_bytes(low.compile().as_text())
    assert colls.get("all-gather") is None
    assert colls["total_approx_bytes"] <= 64
