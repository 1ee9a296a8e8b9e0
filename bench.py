"""Benchmarks for the BASELINE.md configs.

Default run prints ONE JSON line — the headline metric (frames/s tracking
1000 features at 640x480 on one chip, vs the 500 fps north-star target).
``--all`` additionally measures the other BASELINE configs and writes
BENCH_DETAILS.json.

Per-frame work is the honest sequential-mode cost: build the NEW frame's
pyramid + gradients, then batched pyramidal LK for all features (previous
frame's pyramids are the cached carry).

FENCE SEMANTICS (ROOFLINE.md §0, measured 2026-08-17): on the axon relay
rig, `jax.block_until_ready` returns without awaiting execution, so the
fps figures below are DISPATCH-PIPELINE rates. They are kept because (a)
they are reproducible round-over-round and (b) they approximate what a
directly-attached TPU would achieve (the compiled module's on-chip time
is tens of microseconds — the relay's per-op execution tax is a harness
artifact). `--all` additionally records `device_trace` (profiler-
measured per-frame device time, the honest clock on this rig) and
`e2e_result_fps` (time-to-first-result rate, what a caller who needs the
answers actually gets here).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# cwd-independence (VERDICT r3 item 2): the driver may invoke bench.py
# from any directory; pin the repo dir for imports, subprocesses, and
# the BENCH_DETAILS.json artifact.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _textured(h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h + 8, w + 8))
    k = np.array([1.0, 4, 6, 4, 1]) / 16.0
    for axis in (0, 1):
        img = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, img)
    return img


def bench_tracking(h, w, n_features, cfg, n_frames=50, warmup=5):
    """frames/s for the sequential per-frame step at the given config."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                              track_features_pyramids)

    @jax.jit
    def frame_step(pyr_prev, img_new, x, y, val):
        pyr_new = build_track_pyramids(img_new, cfg)
        out = track_features_pyramids(pyr_prev, pyr_new, x, y, val, cfg)
        return pyr_new, out

    base = _textured(h, w)
    frames = [jnp.asarray(base[i % 4:i % 4 + h, i % 4:i % 4 + w],
                          jnp.float32) for i in range(4)]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(cfg.borderx + 1, w - cfg.borderx - 2,
                                n_features), jnp.float32)
    y = jnp.asarray(rng.uniform(cfg.bordery + 1, h - cfg.bordery - 2,
                                n_features), jnp.float32)
    val = jnp.ones((n_features,), jnp.int32)

    pyr = jax.jit(build_track_pyramids, static_argnames=('cfg',))(
        frames[0], cfg)
    for i in range(warmup):
        pyr2, out = frame_step(pyr, frames[(i + 1) % 4], x, y, val)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    cur = pyr
    for i in range(n_frames):
        cur, out = frame_step(cur, frames[(i + 1) % 4], x, y, val)
    jax.block_until_ready(out)
    return n_frames / (time.perf_counter() - t0)


def _repeat(fn, n=5, warmup=1):
    """Run ``fn`` warmup+n times; report median/min/max of the last n
    (VERDICT r1 item 3: the shared relay chip makes single-shot numbers
    unreproducible). The warmup call is DISCARDED: the historical
    5.8x serving-batched / 2.2x batched-chain spreads were diagnosed
    (2026-08-19) as the first repetition paying jit compile + first-
    execution warmup inside its timed section (50 s wall, ~30% low
    value) — steady-state repeats sit within +-3-20% (residual relay
    dispatch contention)."""
    for _ in range(warmup):
        fn()
    vals = [float(fn()) for _ in range(n)]
    return {"median": round(float(np.median(vals)), 2),
            "min": round(float(np.min(vals)), 2),
            "max": round(float(np.max(vals)), 2), "n": n}


def bench_device_trace(h=480, w=640, n_features=1000, n_calls=8):
    """Profiler-trace device time for the headline frame step — the
    honest per-frame clock on this relay (ROOFLINE.md §0): the device
    lane records every executed op with real durations, independent of
    the lying dispatch fence."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                              track_features_pyramids)
    from pyfeaturetrack_tpu.utils.traceview import capture_device_trace

    cfg = create_config()
    from pyfeaturetrack_tpu.ops.track import track_features_pyramids_carry

    @jax.jit
    def frame_step(pyr_prev, img_new, x, y, val, carry):
        pyr_new = build_track_pyramids(img_new, cfg)
        return pyr_new, track_features_pyramids_carry(
            pyr_prev, pyr_new, x, y, val, cfg, carry=carry)

    base = _textured(h, w)
    frames = [jnp.asarray(base[i:i + h, i:i + w], jnp.float32)
              for i in range(4)]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(cfg.borderx + 1, w - cfg.borderx - 2,
                                n_features), jnp.float32)
    y = jnp.asarray(rng.uniform(cfg.bordery + 1, h - cfg.bordery - 2,
                                n_features), jnp.float32)
    val = jnp.ones((n_features,), jnp.int32)
    pyr = jax.jit(build_track_pyramids, static_argnames=("cfg",))(
        frames[0], cfg)
    # sequential harness (round 5): positions ADVANCE frame to frame —
    # the reference's sequentialMode shape, and what lets the level-0
    # window carry engage. Dead lanes stay dead (no replacement in the
    # headline config); the warm loop below reaches the steady state.
    state = {"cur": pyr, "x": x, "y": y, "val": val, "carry": None,
             "i": 0}

    def one():
        s = state
        s["i"] += 1
        s["cur"], (nx, ny, nv, carry) = frame_step(
            s["cur"], frames[s["i"] % 4], s["x"], s["y"], s["val"],
            s["carry"])
        # lost lanes hold -1 sentinels; keep tracking the live ones
        # (reference sequential semantics)
        s["x"], s["y"], s["val"], s["carry"] = nx, ny, nv, carry
        return nv

    for _ in range(3):   # warm both carry structures (None + TrackCarry)
        one()
    jax.block_until_ready(state["val"])

    r = capture_device_trace(one, n_calls=n_calls)
    return {"per_frame_device_ms": r["per_call_ms"],
            "ops_per_frame": r["ops_per_call"],
            "device_fps": (round(1e3 / r["per_call_ms"], 2)
                           if r["per_call_ms"] else None),
            "note": "profiler device lane; relay executes modules "
                    "op-by-op (ROOFLINE.md §0); sequential harness "
                    "(positions advance; level-0 window carry active)"}


def bench_device_trace_fused(timeout_s=560):
    """bench_device_trace with the fused Pallas LK level kernel +
    Pallas pyramid enabled (PFT_PALLAS_LK=1 PFT_PALLAS=1) — run in a
    subprocess because the env knobs are read at trace time and this
    process's jit caches already hold the XLA paths. Measures the
    SERIAL fused kernel (ops/pallas_lk_fused.py) explicitly:
    PFT_PALLAS_LK=1 routes to the vec kernel since round 3, so this
    lane pins lk_mode=fused to keep the serial kernel's clock in the
    artifact (it is the dense-flow/1-D workhorse)."""
    return _trace_subprocess(
        "--device-trace-only",
        {"PFT_PALLAS_LK": "fused", "PFT_PALLAS": "1"}, timeout_s)


def bench_device_trace_vec(timeout_s=560):
    """bench_device_trace with the feature-vectorized Pallas LK kernel
    + Pallas pyramid (PFT_PALLAS_LK=vec PFT_PALLAS=1) — subprocess for
    the same trace-time-env reason as bench_device_trace_fused. The
    best honest-clock lane: 1.87 ms/frame = 534 fps measured 2026-08-19
    (ops/pallas_lk_vec.py)."""
    return _trace_subprocess(
        "--device-trace-only",
        {"PFT_PALLAS_LK": "vec", "PFT_PALLAS": "1"}, timeout_s)


def bench_config2_trace(h=480, w=640, n_features=1000, n_calls=6):
    """Honest device clock for the config-2 device-resident step
    (track + cond-gated refill). Respects the PFT_PALLAS_* knobs at
    trace time — run via bench_device_trace_config2 for the fused
    lanes."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.models.device_sequence import (
        select_step_device, sequence_step_device)
    from pyfeaturetrack_tpu.utils.traceview import capture_device_trace

    cfg = create_config().replace(sequentialMode=True).validated_window()
    base = _textured(h, w, seed=4)[:h, :w]
    cyc = [jnp.asarray(np.roll(base, 2 * i, axis=1).astype(np.float32))
           for i in range(16)]
    frames = cyc + cyc[-2:0:-1]
    pyr, x, y, val, _, _ = select_step_device(frames[0], cfg, n_features)
    carry = None
    for i in range(1, 3):
        pyr, x, y, val, _, _, carry = sequence_step_device(
            pyr, frames[i], x, y, val, cfg, True, carry=carry)
    jax.block_until_ready(val)
    state = {"pyr": pyr, "x": x, "y": y, "val": val, "carry": carry,
             "i": 3}

    def one():
        s = state
        (s["pyr"], s["x"], s["y"], s["val"], _, _,
         s["carry"]) = sequence_step_device(
            s["pyr"], frames[s["i"] % len(frames)], s["x"], s["y"],
            s["val"], cfg, True, carry=s["carry"])
        s["i"] += 1
        return s["val"]

    r = capture_device_trace(one, n_calls=n_calls)
    import os
    return {"per_frame_device_ms": r["per_call_ms"],
            "device_fps": (round(1e3 / r["per_call_ms"], 2)
                           if r["per_call_ms"] else None),
            "ops_per_frame": r["ops_per_call"],
            "lanes": {k: os.environ.get(k, "") for k in
                      ("PFT_PALLAS_LK", "PFT_PALLAS",
                       "PFT_PALLAS_SELECT")},
            "note": "device-resident sequence step incl. replace-lost; "
                    "profiler device lane (ROOFLINE.md §0)"}


def bench_config3_trace(h=480, w=640, n_features=1000, n_calls=16):
    """Honest device clock for the config-3 FULL affine frame step
    (translation track + mode-2 affine consistency). Respects the
    PFT_PALLAS_* knobs at trace time."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.features import create_feature_list
    from pyfeaturetrack_tpu.models.tracker import KLTTrackFeatures
    from pyfeaturetrack_tpu.utils.traceview import capture_device_trace

    cfg = create_config(affineConsistencyCheck=2, sequentialMode=True)
    base = _textured(h, w, seed=2)
    frames = [np.asarray(base[i:i + h, i:i + w], np.float32)
              for i in range(4)]
    rng = np.random.default_rng(0)
    n = n_features
    fl = create_feature_list(n, with_affine=True)
    fl = fl._replace(
        x=jnp.asarray(rng.uniform(40, w - 40, n), jnp.float32),
        y=jnp.asarray(rng.uniform(40, h - 40, n), jnp.float32),
        val=jnp.zeros((n,), jnp.int32))
    state = {"fl": fl, "cache": None, "carry": None, "i": 0}
    # warm both frames' jit paths (template capture + steady state);
    # then trace a LONG window: the affine reject->refill->recapture
    # cascade is threshold-sensitive, so short windows sample wildly
    # different per-frame op mixes (measured 101-304 ops/frame across
    # 8-call windows)
    for _ in range(4):
        state["fl"], state["cache"], state["carry"] = KLTTrackFeatures(
            cfg, frames[state["i"] % 4], frames[(state["i"] + 1) % 4],
            state["fl"], pyramid_last=state["cache"],
            carry_last=state["carry"], return_carry=True)
        state["i"] += 1
    jax.block_until_ready(state["fl"].x)

    def one():
        state["fl"], state["cache"], state["carry"] = KLTTrackFeatures(
            cfg, frames[state["i"] % 4], frames[(state["i"] + 1) % 4],
            state["fl"], pyramid_last=state["cache"],
            carry_last=state["carry"], return_carry=True)
        state["i"] += 1
        return state["fl"].x

    r = capture_device_trace(one, n_calls=n_calls)
    import os
    return {"per_frame_device_ms": r["per_call_ms"],
            "device_fps": (round(1e3 / r["per_call_ms"], 2)
                           if r["per_call_ms"] else None),
            "ops_per_frame": r["ops_per_call"],
            "lanes": {k: os.environ.get(k, "") for k in
                      ("PFT_PALLAS_LK", "PFT_PALLAS",
                       "PFT_PALLAS_AFFINE")},
            "note": "full affine frame step (track + mode-2 check); "
                    "profiler device lane (ROOFLINE.md §0)"}


def bench_config4_trace(h=1088, w=1920, n_features=4096, n_calls=3,
                        image_dtype="float32"):
    """Honest device clock for the config-4 1080p frame step (4-level
    pyramid, subsampling 2). With PFT_PALLAS_LK=vec, level 0 exceeds
    the VMEM gate and runs the vec kernel's HBM-images mode
    (per-feature async-DMA fetch, ops/pallas_lk_vec.py) — the first
    fused 1080p lane (VERDICT r2 item 4)."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                              track_features_pyramids)
    from pyfeaturetrack_tpu.utils.traceview import capture_device_trace

    cfg = create_config().replace(nPyramidLevels=4, subsampling=2,
                                  image_dtype=image_dtype)
    from pyfeaturetrack_tpu.ops.track import track_features_pyramids_carry

    @jax.jit
    def frame_step(pyr_prev, img_new, x, y, val, carry):
        pyr_new = build_track_pyramids(img_new, cfg)
        return pyr_new, track_features_pyramids_carry(
            pyr_prev, pyr_new, x, y, val, cfg, carry=carry)

    base = _textured(h, w)
    frames = [jnp.asarray(base[i:i + h, i:i + w], jnp.float32)
              for i in range(3)]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(cfg.borderx + 1, w - cfg.borderx - 2,
                                n_features), jnp.float32)
    y = jnp.asarray(rng.uniform(cfg.bordery + 1, h - cfg.bordery - 2,
                                n_features), jnp.float32)
    val = jnp.ones((n_features,), jnp.int32)
    pyr = jax.jit(build_track_pyramids, static_argnames=("cfg",))(
        frames[0], cfg)
    # sequential harness (round 5, same shape as bench_device_trace):
    # positions advance; the level-0 window carry engages
    state = {"cur": pyr, "x": x, "y": y, "val": val, "carry": None,
             "i": 0}

    def one():
        s = state
        s["i"] += 1
        s["cur"], (nx, ny, nv, carry) = frame_step(
            s["cur"], frames[s["i"] % 3], s["x"], s["y"], s["val"],
            s["carry"])
        s["x"], s["y"], s["val"], s["carry"] = nx, ny, nv, carry
        return nv

    for _ in range(2):
        one()
    jax.block_until_ready(state["val"])

    r = capture_device_trace(one, n_calls=n_calls)
    import os
    return {"per_frame_device_ms": r["per_call_ms"],
            "device_fps": (round(1e3 / r["per_call_ms"], 2)
                           if r["per_call_ms"] else None),
            "ops_per_frame": r["ops_per_call"],
            "image_dtype": image_dtype,
            "lanes": {k: os.environ.get(k, "") for k in
                      ("PFT_PALLAS_LK", "PFT_PALLAS")},
            "note": "1080p 4096-feat 4-level frame step; level 0 via "
                    "the vec kernel's HBM-images mode when the vec "
                    "lane is on; profiler device lane (ROOFLINE.md §0)"}


def _trace_subprocess(flag, env_knobs, timeout_s=560):
    """Run `bench.py <flag>` in a subprocess with Pallas env knobs (the
    knobs are read at trace time, and this process's jit caches already
    hold the XLA paths). cwd + PYTHONPATH pinned to the repo so the run
    is cwd-independent (VERDICT r3 item 2)."""
    import subprocess

    env = dict(os.environ, **env_knobs)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), flag],
        env=env, cwd=_REPO, capture_output=True, text=True,
        timeout=timeout_s)
    if out.returncode != 0:
        return {"error": (out.stderr or out.stdout).strip()[-400:]}
    return json.loads(out.stdout.strip().splitlines()[-1])


def bench_device_trace_config2(timeout_s=560):
    return _trace_subprocess(
        "--config2-trace-only",
        {"PFT_PALLAS_LK": "vec", "PFT_PALLAS": "1",
         "PFT_PALLAS_SELECT": "1"}, timeout_s)


def bench_device_trace_config3(timeout_s=560):
    return _trace_subprocess(
        "--config3-trace-only",
        {"PFT_PALLAS_LK": "vec", "PFT_PALLAS": "1",
         "PFT_PALLAS_AFFINE": "vec"}, timeout_s)


def bench_device_trace_config4(timeout_s=560):
    return _trace_subprocess(
        "--config4-trace-only",
        {"PFT_PALLAS_LK": "vec", "PFT_PALLAS": "1"}, timeout_s)


def bench_serving_tick_trace(h=480, w=640, n_features=1000,
                             n_streams=8, chain=8, n_calls=3):
    """Honest device clock for ONE batched serving tick: 8 lockstep
    streams advanced ``chain`` frames in one program, replace-lost ON
    (serving._step_batch — the shape behind the aggregate-fps serving
    claims). Aggregate honest fps = n_streams*chain / per-tick time.
    Respects the PFT_PALLAS_* knobs at trace time."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.serving import _select_batch, _step_batch
    from pyfeaturetrack_tpu.utils.traceview import capture_device_trace

    cfg = create_config().replace(sequentialMode=True).validated_window()
    bases = [np.floor(_textured(h, w, seed=10 + b)[:h, :w])
             for b in range(n_streams)]
    ticks = [jnp.asarray(np.stack([np.roll(bases[b], 2 * i, axis=1)
                                   for b in range(n_streams)]
                                  ).astype(np.float32))
             for i in range(chain)]
    pyr, x, y, val, aff, _ = _select_batch(ticks[0], cfg, n_features,
                                           512)
    out = _step_batch(pyr, tuple(ticks), x, y, val, cfg, True, 512,
                      aff, n_steps=chain)
    jax.block_until_ready(out[2])

    def one():
        o = _step_batch(pyr, tuple(ticks), x, y, val, cfg, True, 512,
                        aff, n_steps=chain)
        return o[2]

    r = capture_device_trace(one, n_calls=n_calls)
    frames = n_streams * chain
    import os
    return {"per_tick_device_ms": r["per_call_ms"],
            "frames_per_tick": frames,
            "aggregate_device_fps": (round(
                frames * 1e3 / r["per_call_ms"], 2)
                if r["per_call_ms"] else None),
            "ops_per_tick": r["ops_per_call"],
            "lanes": {k: os.environ.get(k, "") for k in
                      ("PFT_PALLAS_LK", "PFT_PALLAS",
                       "PFT_PALLAS_SELECT")},
            "note": "8 streams x chain-8 lockstep tick, replace-lost "
                    "ON; profiler device lane (ROOFLINE.md §0) — the "
                    "honest counterpart of the dispatch-rate serving "
                    "claims"}


def bench_device_trace_serving(timeout_s=1200):
    """Round-5 lanes ON: the batched tick loops streams INSIDE the one
    program (serving._step_batch — Mosaic kernels don't vmap, so the
    old vmapped body silently ran the 12k-op XLA path at 10.7 aggregate
    fps honest; DESIGN.md §9). With the knobs the per-stream fused
    kernels run for every stream: ~105 ms/tick = ~609 aggregate fps."""
    return _trace_subprocess(
        "--serving-trace-only",
        {"PFT_PALLAS_LK": "vec", "PFT_PALLAS": "1",
         "PFT_PALLAS_SELECT": "1"}, timeout_s)


def bench_e2e_result_vec(timeout_s=900):
    """Time-to-first-result rate WITH the Pallas lanes on — what a
    caller who needs the answers gets from the fast path on this rig
    (the plain e2e_result_fps entry measures the XLA default path).
    Subprocess for the trace-time env knobs."""
    return _trace_subprocess(
        "--e2e-result-only",
        {"PFT_PALLAS_LK": "vec", "PFT_PALLAS": "1"}, timeout_s)


def bench_scaling_prediction(timeout_s=560):
    """HLO-based multi-device scaling prediction (parallel/scaling.
    predict_scaling_efficiency) on an 8-device VIRTUAL CPU mesh — the
    partitioned module's per-device costs and collective census are
    identical to a real slice's, so this is the hardware-meaningful
    scaling number this rig can produce (VERDICT r3 weak-point 5).
    Subprocess: the env must select the CPU backend before python
    starts (the axon sitecustomize wins otherwise)."""
    return _trace_subprocess(
        "--scaling-predict-only",
        {"JAX_PLATFORMS": "cpu",
         "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        timeout_s)


def bench_device_trace_config4_bf16(timeout_s=560):
    """Config-4 with the bf16 image-storage lane (cfg.image_dtype):
    halves the HBM-mode per-feature DMA bytes at 1080p — the
    documented approximate lane (tests/test_track.py bf16 exclusion
    list), benched separately from the exact default."""
    return _trace_subprocess(
        "--config4-bf16-trace-only",
        {"PFT_PALLAS_LK": "vec", "PFT_PALLAS": "1"}, timeout_s)


def bench_flow_trace(h=480, w=640):
    """Honest device clock for ONE dense-flow pair (profiler trace, the
    only truthful lane on this relay — ROOFLINE.md §0). Respects
    PFT_PALLAS_LK: with it set, every pixel runs through the gridded
    fused kernel (ops/pallas_lk_fused.py via ops/flow.flow_level)."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.ops.flow import dense_flow_pyramids
    from pyfeaturetrack_tpu.ops.track import build_track_pyramids_jit
    from pyfeaturetrack_tpu.utils.traceview import capture_device_trace

    cfg = create_config().validated_window()
    base = _textured(h, w)
    p1 = build_track_pyramids_jit(jnp.asarray(base[:h, :w], jnp.float32),
                                  cfg)
    p2 = build_track_pyramids_jit(
        jnp.asarray(base[1:h + 1, 2:w + 2], jnp.float32), cfg)
    fn = jax.jit(lambda a, b: dense_flow_pyramids.__wrapped__(a, b, cfg))
    jax.block_until_ready(fn(p1, p2))
    r = capture_device_trace(lambda: jax.block_until_ready(fn(p1, p2)),
                             n_calls=1)
    import os
    r["fused"] = bool(os.environ.get("PFT_PALLAS_LK"))
    return r


def bench_device_trace_flow_fused(timeout_s=560):
    """bench_flow_trace with the fused Pallas LK kernel (PFT_PALLAS_LK=1)
    — subprocess for the same trace-time-env reason as
    bench_device_trace_fused. Measured 2026-08-18: 693 ms/pair device
    time vs 29.2 s for the XLA gather path on this relay (42x)."""
    return _trace_subprocess("--flow-trace-only",
                             {"PFT_PALLAS_LK": "1"}, timeout_s)


def bench_device_trace_flow_vec(timeout_s=900):
    """bench_flow_trace with the feature-vectorized kernel in
    shared-block dense mode (PFT_PALLAS_LK=vec routes every pixel
    through ops/pallas_lk_vec with per-tile shared blocks) — the best
    dense-flow honest clock (~307 ms/pair at 480x640, r3)."""
    return _trace_subprocess("--flow-trace-only",
                             {"PFT_PALLAS_LK": "vec"}, timeout_s)


def bench_e2e_result(h=480, w=640, n_features=1000, n_frames=12):
    """Time-to-first-result rate: dependent frame-step chain, ONE scalar
    pull at the end. This is what a caller who needs the answers gets on
    this rig. MUST run last in --all: the pull makes every subsequent
    call in the process synchronously observed."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                              track_features_pyramids)

    cfg = create_config()

    @jax.jit
    def frame_step(pyr_prev, img_new, x, y, val):
        pyr_new = build_track_pyramids(img_new, cfg)
        return pyr_new, track_features_pyramids(pyr_prev, pyr_new, x, y,
                                                val, cfg)

    base = _textured(h, w)
    frames = [jnp.asarray(base[i:i + h, i:i + w], jnp.float32)
              for i in range(4)]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(cfg.borderx + 1, w - cfg.borderx - 2,
                                n_features), jnp.float32)
    y = jnp.asarray(rng.uniform(cfg.bordery + 1, h - cfg.bordery - 2,
                                n_features), jnp.float32)
    val = jnp.ones((n_features,), jnp.int32)
    pyr = jax.jit(build_track_pyramids, static_argnames=("cfg",))(
        frames[0], cfg)
    cur, out = frame_step(pyr, frames[1], x, y, val)
    _ = float(jnp.sum(out[2]))  # warm + force compile through a result
    t0 = time.perf_counter()
    for i in range(n_frames):
        cur, out = frame_step(cur, frames[(i + 1) % 4], x, y, val)
    _ = float(jnp.sum(out[2]))
    return n_frames / (time.perf_counter() - t0)


def bench_sequence_replace(h=480, w=640, n_features=1000, n_frames=48,
                           shift=2, chain=1):
    """BASELINE config 2: the example3-shaped sequence loop WITH per-frame
    lost-feature replacement, fully device-resident (ops.select_device) —
    frames/s including the replace stage. The texture ping-pongs
    horizontally so a steady trickle of features drifts out of the border
    band and must be refilled. ``chain`` > 1 uses the micro-chained
    driver (k frames per dispatched program — amortizes the relay's
    ~40 us dispatch floor, ROOFLINE.md §2)."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.models.device_sequence import (
        select_step_device, sequence_chain_device, sequence_step_device)

    cfg = create_config().replace(sequentialMode=True).validated_window()
    base = _textured(h, w, seed=4)[:h, :w]
    n_cycle = 16
    cyc = [jnp.asarray(np.roll(base, shift * i, axis=1).astype(np.float32))
           for i in range(n_cycle)]
    frames = cyc + cyc[-2:0:-1]  # ping-pong: steps stay +-shift px

    def advance(pyr, i, x, y, val):
        if chain == 1:
            out = sequence_step_device(
                pyr, frames[i % len(frames)], x, y, val, cfg, True)
            return out[0], out[1], out[2], out[3]
        imgs = tuple(frames[(i + j) % len(frames)] for j in range(chain))
        pyr, _, (fx, fy, fv), _, _, _ = sequence_chain_device(
            pyr, imgs, x, y, val, cfg, True)
        return pyr, fx, fy, fv

    pyr, x, y, val, _, _ = select_step_device(frames[0], cfg, n_features)
    for i in range(1, 1 + 2 * chain, chain):  # warm cond branches
        pyr, x, y, val = advance(pyr, i, x, y, val)
    jax.block_until_ready(val)

    t0 = time.perf_counter()
    for i in range(0, n_frames, chain):
        pyr, x, y, val = advance(pyr, 6 + i, x, y, val)
    jax.block_until_ready(val)
    return n_frames / (time.perf_counter() - t0)


def bench_serving(h=480, w=640, n_features=1000, n_frames=48, chain=8,
                  prefetch=0, stage_uint8=True, warmed=[]):
    """Live-video ingestion: frames start HOST-side and the timed loop
    covers h2d staging + tracking with replace-lost (serving.py). The
    uint8-vs-float32 A/B exposes the host-link bytes (4x); prefetch=0
    is the shipped default (JAX async dispatch already overlaps h2d —
    a forced staging thread measured slower on the relay)."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.serving import StreamingTracker, prefetch_to_device

    cfg = create_config().replace(sequentialMode=True).validated_window()
    base = _textured(h, w, seed=4)[:h, :w]
    n_cycle = 16
    cyc = [np.roll(base, 2 * i, axis=1).astype(np.uint8)
           for i in range(n_cycle)]
    host_frames = cyc + cyc[-2:0:-1]

    def run_once():
        tr = StreamingTracker(cfg, n_features, replace_lost=True,
                              chain=chain)
        src = (host_frames[i % len(host_frames)] for i in range(n_frames))
        it = (prefetch_to_device(
                  src, depth=prefetch,
                  stage_dtype=np.uint8 if stage_uint8 else np.float32)
              if prefetch > 0 else
              (jnp.asarray(np.asarray(
                   f, np.uint8 if stage_uint8 else np.float32))
               for f in src))
        for fr in it:
            tr.feed(fr)
        tr.block()  # fence only — no d2h (relay poisoning, DESIGN.md)

    key = (chain, prefetch, stage_uint8)
    if key not in warmed:  # one unmeasured pass to absorb compiles
        warmed.append(key)
        run_once()
    t0 = time.perf_counter()
    run_once()
    return n_frames / (time.perf_counter() - t0)


def bench_batched_chain(h=480, w=640, n_features=1000, n_streams=8,
                        chain=8, n_prog=6):
    """Peak aggregate: chain frames per program x n_streams lockstep
    streams, REPLACE-LOST ON (full example3 semantics). Compute-side:
    frames pre-staged on device; one program advances every stream by
    ``chain`` frames (both dispatch-floor levers composed — DESIGN.md
    section 3a + the vmapped stream axis). Returns aggregate frames/s."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.serving import _select_batch, _step_batch

    cfg = create_config().replace(sequentialMode=True).validated_window()
    bases = [np.floor(_textured(h, w, seed=10 + b)[:h, :w])
             for b in range(n_streams)]
    ticks = [jnp.asarray(np.stack([np.roll(bases[b], 2 * i, axis=1)
                                   for b in range(n_streams)]
                                  ).astype(np.float32))
             for i in range(chain)]
    pyr, x, y, val, aff, _ = _select_batch(ticks[0], cfg, n_features, 512)
    out = _step_batch(pyr, tuple(ticks), x, y, val, cfg, True, 512, aff,
                      n_steps=chain)
    jax.block_until_ready(out[2])
    t0 = time.perf_counter()
    for _ in range(n_prog):
        out = _step_batch(pyr, tuple(ticks), x, y, val, cfg, True, 512,
                          aff, n_steps=chain)
    jax.block_until_ready(out[2])
    return n_prog * chain * n_streams / (time.perf_counter() - t0)


def bench_serving_batched(h=480, w=640, n_features=1000, n_streams=8,
                          n_ticks=12, chain=4, warmed=[]):
    """Multi-camera serving: n_streams live uint8 feeds advanced in
    lockstep (BatchedStreamingTracker), h2d staging inside the timed
    loop. Returns AGGREGATE frames/s across streams."""
    import jax
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.serving import BatchedStreamingTracker

    cfg = create_config().replace(sequentialMode=True).validated_window()
    bases = [np.floor(_textured(h, w, seed=10 + b)[:h, :w])
             for b in range(n_streams)]
    ticks = [np.stack([np.roll(bases[b], 2 * i, axis=1)
                       for b in range(n_streams)]).astype(np.uint8)
             for i in range(16)]

    def run_once():
        bt = BatchedStreamingTracker(cfg, n_streams=n_streams,
                                     n_features=n_features, chain=chain)
        for i in range(n_ticks):
            bt.feed(ticks[i % len(ticks)])
        bt.block()

    key = (h, w, n_features, n_streams, chain)
    if key not in warmed:  # one unmeasured pass per config (compiles)
        warmed.append(key)
        run_once()
    t0 = time.perf_counter()
    run_once()
    return n_ticks * n_streams / (time.perf_counter() - t0)


def bench_dense_flow(h=480, w=640, n_frames=20, warmup=3):
    """Dense per-pixel KLT flow frames/s for the sequential per-frame
    step: build the new frame's pyramid, dense flow vs the cached
    previous pyramid (each frame tracks all h*w pixels)."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.ops.flow import dense_flow_pyramids
    from pyfeaturetrack_tpu.ops.track import build_track_pyramids

    cfg = create_config()

    @jax.jit
    def frame_step(pyr_prev, img_new):
        pyr_new = build_track_pyramids(img_new, cfg)
        return pyr_new, dense_flow_pyramids(pyr_prev, pyr_new, cfg)

    base = _textured(h, w)
    frames = [jnp.asarray(base[i % 4:i % 4 + h, i % 4:i % 4 + w],
                          jnp.float32) for i in range(4)]
    pyr = jax.jit(build_track_pyramids, static_argnames=("cfg",))(
        frames[0], cfg)
    for i in range(warmup):
        pyr2, fl = frame_step(pyr, frames[(i + 1) % 4])
    jax.block_until_ready(fl)

    t0 = time.perf_counter()
    cur = pyr
    for i in range(n_frames):
        cur, fl = frame_step(cur, frames[(i + 1) % 4])
    jax.block_until_ready(fl)
    fps = n_frames / (time.perf_counter() - t0)
    return fps


def bench_dense_flow_batched(h=240, w=320, batch=4, n_steps=6, warmup=2):
    """Aggregate dense-flow frames/s for ``batch`` lockstep camera
    streams in ONE vmapped program per step (ops/flow.dense_flow_batched
    — the dense analogue of the batched8 sparse config).

    Default size is 240x320: the XLA dense path materializes ~2.8 GB of
    gather buffers per 480x640 stream (ROOFLINE.md dense section), so
    batch=4 at 480p exceeds v5e HBM at compile time (measured
    RESOURCE_EXHAUSTED 2026-08-19). The 480p-per-stream answer is the
    fused kernel path (PFT_PALLAS_LK=1), which never builds those
    buffers — see device_trace_flow_fused."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.ops.flow import dense_flow_batched

    cfg = create_config()
    base = _textured(h, w)
    stack = [jnp.stack([jnp.asarray(
        base[(i + b) % 4:(i + b) % 4 + h, (i + b) % 4:(i + b) % 4 + w],
        jnp.float32) for b in range(batch)]) for i in range(3)]
    for i in range(warmup):
        fl = dense_flow_batched(stack[i % 2], stack[(i + 1) % 3], cfg)
    jax.block_until_ready(fl)
    t0 = time.perf_counter()
    for i in range(n_steps):
        fl = dense_flow_batched(stack[i % 2], stack[(i + 1) % 3], cfg)
    jax.block_until_ready(fl)
    return batch * n_steps / (time.perf_counter() - t0)


def bench_two_frame_demo():
    """Config 1: the stock example1 flow (select 100 + track), end to end
    host-to-host, seconds per run."""
    import pyfeaturetrack_tpu as pft
    img1 = np.floor(_textured(240, 320, seed=1)[:240, :320])
    img2 = np.floor(_textured(240, 320, seed=1)[1:241, 1:321])
    cfg = pft.create_config()
    # warm
    fl = pft.KLTSelectGoodFeatures(cfg, img1, 100)
    fl2, _ = pft.KLTTrackFeatures(cfg, img1, img2, fl)
    t0 = time.perf_counter()
    for _ in range(5):
        fl = pft.KLTSelectGoodFeatures(cfg, img1, 100)
        fl2, _ = pft.KLTTrackFeatures(cfg, img1, img2, fl)
    return (time.perf_counter() - t0) / 5


def bench_affine(h=480, w=640, n_features=1000):
    """Config 3: affine-consistency tracking (6-param) frames/s."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.ops.affine import _affine_track_batch
    from pyfeaturetrack_tpu.ops.track import build_track_pyramids

    cfg = create_config(affineConsistencyCheck=2)
    base = _textured(h, w, seed=2)
    img = jnp.asarray(base[:h, :w], jnp.float32)
    pyr = jax.jit(build_track_pyramids, static_argnames=('cfg',))(img, cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(40, w - 40, n_features), jnp.float32)
    y = jnp.asarray(rng.uniform(40, h - 40, n_features), jnp.float32)
    hw, hh = cfg.affine_window_width // 2, cfg.affine_window_height // 2
    from pyfeaturetrack_tpu.ops.interp import gather_window
    tmpl = gather_window(pyr.img[0], x, y, hw, hh)
    A0 = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (n_features, 2, 2))
    check = jnp.ones((n_features,), bool)

    def run():
        return _affine_track_batch(tmpl, pyr.img[0], pyr.gradx[0],
                                   pyr.grady[0], x, y, A0, check, cfg)
    out = run()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = run()
    jax.block_until_ready(out)
    return 20 / (time.perf_counter() - t0)


def bench_batched_streams(h=480, w=640, n_features=1000, batch=8,
                          n_iters=20):
    """Aggregate throughput tracking ``batch`` independent frame pairs at
    once on one chip (the multi-stream serving shape). Returns aggregate
    frames/s."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.ops.track import (build_track_pyramids,
                                              track_features_pyramids)

    cfg = create_config()

    @jax.jit
    def step(imgs1, imgs2, x, y, val):
        def one(i1, i2, xx, yy, vv):
            p1 = build_track_pyramids(i1, cfg)
            p2 = build_track_pyramids(i2, cfg)
            return track_features_pyramids(p1, p2, xx, yy, vv, cfg)
        return jax.vmap(one)(imgs1, imgs2, x, y, val)

    rng = np.random.default_rng(0)
    imgs1 = jnp.asarray(rng.uniform(0, 255, (batch, h, w)).astype(np.float32))
    imgs2 = jnp.asarray(rng.uniform(0, 255, (batch, h, w)).astype(np.float32))
    x = jnp.asarray(rng.uniform(cfg.borderx + 1, w - cfg.borderx - 2,
                                (batch, n_features)), jnp.float32)
    y = jnp.asarray(rng.uniform(cfg.bordery + 1, h - cfg.bordery - 2,
                                (batch, n_features)), jnp.float32)
    val = jnp.ones((batch, n_features), jnp.int32)

    out = step(imgs1, imgs2, x, y, val)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = step(imgs1, imgs2, x, y, val)
    jax.block_until_ready(out)
    return n_iters * batch / (time.perf_counter() - t0)


def bench_sfm_windowed(C=60, L=6000, kw=12, n_iters=8, solver="dense",
                       precond_block=1):
    """Config 5b: windowed block-sparse BA iteration rate at production
    scale (60 cameras x 6000 landmarks, 12-frame windows). With
    ``solver="cg"`` this doubles as config 5c (long-trajectory scale:
    banded PCG, no [6C, 6C] materialization; ``precond_block`` groups
    the preconditioner — see sfm/ba_windowed._banded_pcg_solve)."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.sfm import (WindowedBAProblem,
                                        bundle_adjust_windowed)
    from pyfeaturetrack_tpu.sfm.geometry import so3_exp, project

    rng = np.random.default_rng(0)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    Rs = so3_exp(jnp.asarray(0.01 * rng.standard_normal((C, 3)), jnp.float32))
    ts = jnp.asarray(np.stack([[-0.15 * i, 0.0, 0.0] for i in range(C)]),
                     jnp.float32)
    X = np.stack([rng.uniform(-4, 4, L), rng.uniform(-3, 3, L),
                  rng.uniform(5, 12, L)], -1).astype(np.float32)
    c0 = rng.integers(0, C - kw + 1, L).astype(np.int32)
    cidx = c0[:, None] + np.arange(kw)[None, :]
    uv, _ = jax.vmap(lambda ci, x: project(jnp.asarray(K), Rs[ci], ts[ci],
                                           x))(jnp.asarray(cidx),
                                               jnp.asarray(X))
    problem = WindowedBAProblem(K=jnp.asarray(K), c0=jnp.asarray(c0),
                                uv=uv, w=jnp.ones((L, kw), jnp.float32))
    X0 = jnp.asarray(X + 0.05 * rng.standard_normal(X.shape
                                                    ).astype(np.float32))
    out = bundle_adjust_windowed(problem, Rs, ts, X0, n_iters=n_iters,
                                 point_only_iters=0, solver=solver,
                                 precond_block=precond_block)
    jax.block_until_ready(out[:3])
    t0 = time.perf_counter()
    out = bundle_adjust_windowed(problem, Rs, ts, X0, n_iters=n_iters,
                                 point_only_iters=0, solver=solver,
                                 precond_block=precond_block)
    jax.block_until_ready(out[:3])
    return n_iters / (time.perf_counter() - t0)


def bench_sfm():
    """Config 5 core: BA iteration rate on a synthetic 20-cam/2000-pt
    problem (iterations/s)."""
    import jax
    import jax.numpy as jnp
    from pyfeaturetrack_tpu.sfm import BAProblem, bundle_adjust
    from pyfeaturetrack_tpu.sfm.geometry import so3_exp, project

    rng = np.random.default_rng(0)
    C, L = 20, 2000
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    Rs = so3_exp(jnp.asarray(  # stays on device (no d2h before timing)
        0.02 * rng.standard_normal((C, 3)), jnp.float32))
    ts = np.stack([[-0.2 * i, 0.0, 0.0] for i in range(C)]).astype(np.float32)
    X = np.stack([rng.uniform(-3, 3, L), rng.uniform(-2, 2, L),
                  rng.uniform(5, 10, L)], -1).astype(np.float32)
    # project all cameras on device without host pulls (a d2h transfer
    # before the timed region would poison the axon relay's dispatch)
    uv_dev, _ = jax.vmap(lambda R, t: project(jnp.asarray(K), R, t,
                                              jnp.asarray(X)))(
        jnp.asarray(Rs), jnp.asarray(ts))
    cam = np.repeat(np.arange(C), L).astype(np.int32)
    pt = np.tile(np.arange(L), C).astype(np.int32)
    problem = BAProblem(jnp.asarray(K), jnp.asarray(cam), jnp.asarray(pt),
                        uv_dev.reshape(-1, 2),
                        jnp.ones((C * L,), jnp.float32))
    X0 = X + 0.05 * rng.standard_normal(X.shape).astype(np.float32)
    # warm up (compile) outside the timed region with the SAME n_iters —
    # even the trailing jnp.stack differs per count and recompiles on
    # the remote compiler; costs stay on device so the loop is async
    R, t, Xh, costs = bundle_adjust(problem, Rs, ts, X0, n_iters=8)
    jax.block_until_ready((R, t, Xh))  # compile must NOT bleed into rep 1
    t0 = time.perf_counter()
    R, t, Xh, costs = bundle_adjust(problem, Rs, ts, X0, n_iters=8)
    jax.block_until_ready((R, t, Xh))
    dt = (time.perf_counter() - t0)
    # ratio stays a DEVICE scalar: a float() here would d2h-poison every
    # later dispatch in the process (DESIGN.md rule 3) — callers pull it
    # only after all timed configs are done.
    return 8 / dt, costs[-1] / jnp.maximum(costs[0], 1e-9)


def main():
    # persistent XLA compile cache: repeat bench runs skip the 1-3 min
    # remote compiles (must be set before any jax backend use)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--features", type=int, default=1000)
    ap.add_argument("--size", type=str, default="480x640")
    ap.add_argument("--all", action="store_true",
                    help="run every BASELINE config, write BENCH_DETAILS.json")
    ap.add_argument("--scaling", action="store_true",
                    help="also run the multi-device weak-scaling sweep")
    ap.add_argument("--device-trace-only", action="store_true",
                    help=argparse.SUPPRESS)  # bench_device_trace_fused
    ap.add_argument("--flow-trace-only", action="store_true",
                    help=argparse.SUPPRESS)  # bench_device_trace_flow_fused
    ap.add_argument("--config2-trace-only", action="store_true",
                    help=argparse.SUPPRESS)  # bench_device_trace_config2
    ap.add_argument("--config3-trace-only", action="store_true",
                    help=argparse.SUPPRESS)  # bench_device_trace_config3
    ap.add_argument("--config4-trace-only", action="store_true",
                    help=argparse.SUPPRESS)  # bench_device_trace_config4
    ap.add_argument("--config4-bf16-trace-only", action="store_true",
                    help=argparse.SUPPRESS)  # bench_device_trace_config4_bf16
    ap.add_argument("--scaling-predict-only", action="store_true",
                    help=argparse.SUPPRESS)  # bench_scaling_prediction
    ap.add_argument("--e2e-result-only", action="store_true",
                    help=argparse.SUPPRESS)  # bench_e2e_result_vec
    ap.add_argument("--serving-trace-only", action="store_true",
                    help=argparse.SUPPRESS)  # bench_device_trace_serving
    args = ap.parse_args()
    h, w = map(int, args.size.split("x"))

    if args.device_trace_only:
        print(json.dumps(bench_device_trace()))
        return 0
    if args.flow_trace_only:
        print(json.dumps(bench_flow_trace()))
        return 0
    if args.config2_trace_only:
        print(json.dumps(bench_config2_trace()))
        return 0
    if args.config3_trace_only:
        print(json.dumps(bench_config3_trace()))
        return 0
    if args.config4_trace_only:
        print(json.dumps(bench_config4_trace()))
        return 0
    if args.config4_bf16_trace_only:
        print(json.dumps(bench_config4_trace(image_dtype="bfloat16")))
        return 0
    if args.serving_trace_only:
        print(json.dumps(bench_serving_tick_trace()))
        return 0
    if args.e2e_result_only:
        print(json.dumps({"e2e_result_fps": round(bench_e2e_result(),
                                                  3)}))
        return 0
    if args.scaling_predict_only:
        # the axon sitecustomize force-registers the TPU backend at
        # interpreter start, overriding JAX_PLATFORMS=cpu from the
        # env; re-point at CPU so the virtual 8-device mesh exists
        # (same dance as __graft_entry__.dryrun_multichip)
        import jax
        if len(jax.devices()) < 8:
            try:
                from jax._src import xla_bridge as _xb
                if _xb.backends_are_initialized():
                    from jax.extend.backend import clear_backends
                    clear_backends()
            except Exception:
                pass
            jax.config.update("jax_platforms", "cpu")
        from pyfeaturetrack_tpu.parallel.scaling import \
            predict_scaling_efficiency
        out = {"track": predict_scaling_efficiency()}
        # round 5 (VERDICT r4 item 8): the expensive shapes. config4 =
        # one 1080p/4096 pair per device; serving_tick = one lockstep
        # camera stream per device at the serving bench shape (the
        # batch-wide refill predicate is a cross-stream all-reduce —
        # constant small bytes per step, so it amortizes with compute).
        for wl, kw in (("config4", {}),
                       ("serving_tick", {"image_shape": (480, 640),
                                         "n_features": 1000})):
            try:
                out[wl] = predict_scaling_efficiency(workload=wl, **kw)
            except Exception as e:  # pragma: no cover - surface, don't die
                out[wl] = {"error": str(e)[:300]}
        print(json.dumps(out))
        return 0

    from pyfeaturetrack_tpu.config import create_config
    cfg = create_config()

    reps = _repeat(lambda: bench_tracking(h, w, args.features, cfg,
                                          n_frames=args.frames), n=5)
    headline = {
        "metric": f"frames_per_s_{args.features}feat_{h}x{w}",
        "value": reps["median"],
        "unit": "frames/s",
        "vs_baseline": round(reps["median"] / 500.0, 3),
    }
    # the honest clock MUST ride the round artifact (VERDICT r2): the
    # dispatch fence on this relay does not await execution
    # (ROOFLINE.md §0), so `value` is a dispatch-pipeline rate. The
    # profiler device lane below is real per-frame execution time,
    # measured with the feature-vectorized Pallas LK kernel
    # (the best lane; ops/pallas_lk_vec.py).
    if (h, w) == (480, 640):
        try:
            tr = bench_device_trace_vec()
            headline["honest_device_fps"] = tr.get("device_fps")
            headline["honest_device_ms_per_frame"] = tr.get(
                "per_frame_device_ms")
            headline["clock_note"] = (
                "value=dispatch-pipeline rate (relay fence); "
                "honest_device_fps=profiler device lane, vec Pallas LK")
        except Exception as e:  # keep the headline even if trace fails
            headline["honest_device_fps"] = None
            headline["clock_note"] = f"device trace failed: {e}"

    if args.all:
        def log(msg):
            print(f"[bench] {msg}", file=sys.stderr, flush=True)
            # incremental flush MERGED over any previous artifact: a
            # timeout mid-run must neither lose this run's completed
            # configs nor wipe results the previous complete run had
            path = os.path.join(_REPO, "BENCH_DETAILS.json")
            try:
                with open(path) as f:
                    merged = json.load(f)
            except (OSError, ValueError):
                merged = {}
            merged.update(details)
            with open(path, "w") as f:
                json.dump(merged, f, indent=2)
        details = {"headline": headline, "headline_runs": reps}
        # ORDER MATTERS: on the axon relay, the first device->host
        # transfer in a process degrades every later dispatch to a
        # synchronous ~274ms round-trip. Pure-compute configs (2, 3, 4)
        # run first; transferring flows (1, 5) run last.
        log(f"headline done: {reps}")
        details["config2_sequence_replace_fps"] = _repeat(
            bench_sequence_replace, n=5)
        log(f"config2 done: {details['config2_sequence_replace_fps']}")
        details["config2_chain8_fps"] = _repeat(
            lambda: bench_sequence_replace(chain=8), n=5)
        log(f"config2 chain8 done: {details['config2_chain8_fps']}")
        details["config3_affine_fps"] = _repeat(bench_affine, n=5)
        log(f"config3 done: {details['config3_affine_fps']} checks/s")
        details["config4_1080p_4096feat_4lvl_fps"] = _repeat(
            lambda: bench_tracking(
                1088, 1920, 4096,
                create_config().replace(nPyramidLevels=4, subsampling=2),
                n_frames=20), n=5)
        log(f"config4 done: {details['config4_1080p_4096feat_4lvl_fps']}")
        details["dense_flow_480x640_fps"] = _repeat(bench_dense_flow, n=5)
        log(f"dense flow done: {details['dense_flow_480x640_fps']}")
        try:
            details["dense_flow_batched4_240x320_fps"] = _repeat(
                bench_dense_flow_batched, n=5)
            log("dense flow batched4 done: "
                f"{details['dense_flow_batched4_240x320_fps']}")
        except Exception as e:  # never let one stage abort the sweep
            details["dense_flow_batched4_240x320_fps"] = {
                "error": str(e)[-300:]}
            log(f"dense flow batched4 FAILED: {e}")
        details["batched8_streams_aggregate_fps"] = _repeat(
            bench_batched_streams, n=5)
        log(f"batched8 done: {details['batched8_streams_aggregate_fps']}")
        # live ingestion (h2d inside the timed loop; h2d does not
        # trigger the relay's d2h poisoning, so safe to run here)
        details["serving_uint8_ingest_fps"] = _repeat(
            lambda: bench_serving(stage_uint8=True), n=5)
        log(f"serving uint8 done: {details['serving_uint8_ingest_fps']}")
        # NB: an f32-staging A/B (bench_serving(stage_uint8=False)) is
        # deliberately NOT in the sweep: the f32 put path on this relay
        # degrades erratically when run after other configs in the same
        # process (21-920 fps across runs for identical code), which
        # misleads round-over-round comparison. Run it standalone.
        details["serving_batched8_aggregate_ingest_fps"] = _repeat(
            bench_serving_batched, n=5)
        log("serving batched8 done: "
            f"{details['serving_batched8_aggregate_ingest_fps']}")
        details["batched8_chain8_replace_aggregate_fps"] = _repeat(
            bench_batched_chain, n=5)
        log("batched8 chain8 done: "
            f"{details['batched8_chain8_replace_aggregate_fps']}")
        ratios = []

        def _sfm_rate():
            rate, ratio = bench_sfm()
            ratios.append(ratio)  # device scalar — pulled after 5b
            return rate
        details["config5_ba_iters_per_s"] = _repeat(_sfm_rate, n=5)
        log(f"config5 done: {details['config5_ba_iters_per_s']} iters/s")
        details["config5b_windowed_ba_iters_per_s"] = _repeat(
            bench_sfm_windowed, n=5)
        log(f"config5b done: {details['config5b_windowed_ba_iters_per_s']}")
        details["config5c_cg_ba_500cams_20kpts_iters_per_s"] = _repeat(
            lambda: bench_sfm_windowed(C=500, L=20000, kw=8, n_iters=6,
                                       solver="cg", precond_block=16),
            n=5)
        log("config5c done: "
            f"{details['config5c_cg_ba_500cams_20kpts_iters_per_s']}")
        # final/initial cost: ~0 means excellent convergence, 1 means
        # none. First d2h of the process — everything after runs
        # host-side, so the relay poisoning no longer matters.
        # scientific notation: the ratio is ~3e-7 and a fixed-point
        # round displayed it as 0.0 (VERDICT r2 item 10)
        details["config5_ba_final_over_initial_cost"] = float(
            f"{float(np.median([float(r) for r in ratios])):.3e}")
        details["config1_two_frame_demo_s"] = round(bench_two_frame_demo(), 4)
        log(f"config1 done: {details['config1_two_frame_demo_s']} s")
        try:
            # config-5 END-TO-END (VERDICT r3 item 7): 100-frame
            # KITTI-style corridor through the full front-end (track ->
            # VO -> windowed BA) with ATE/RPE vs exact ground truth.
            # Runs in the transfer phase: the VO host loop pulls arrays
            # every frame, which is exactly the d2h pattern that must
            # come after all dispatch-fenced configs on this relay.
            from pyfeaturetrack_tpu.utils.synthscene import \
                run_vo_on_corridor
            details["config5_e2e_corridor"] = run_vo_on_corridor(
                n_frames=100, kf_every=3, n_features=100)
            log(f"config5 e2e done: {details['config5_e2e_corridor']}")
        except Exception as e:
            details["config5_e2e_corridor"] = {"error": str(e)[-300:]}
            log(f"config5 e2e FAILED: {e}")
        try:
            # config-5 LONG-horizon stress (VERDICT r4 item 7): 520
            # frames, closed circuit with a genuine revisit, exposure
            # gain/bias drift, loop closure, KITTI-format ATE/RPE.
            from pyfeaturetrack_tpu.utils.synthscene import \
                run_vo_on_circuit
            details["config5_e2e_long"] = run_vo_on_circuit(
                n_frames=520)
            log(f"config5 long e2e done: {details['config5_e2e_long']}")
        except Exception as e:
            details["config5_e2e_long"] = {"error": str(e)[-300:]}
            log(f"config5 long e2e FAILED: {e}")
        # roofline + honest clocks LAST (ROOFLINE.md §0): the profiler
        # capture inside roofline_report flips this process into
        # synchronously-observed execution (measured: config5 after a
        # trace reads its real 70 it/s instead of the 3.3k dispatch
        # rate), so every dispatch-fenced config must already be done
        from pyfeaturetrack_tpu.utils.roofline import roofline_report
        details["roofline"] = roofline_report()
        log(f"roofline done: " + ", ".join(
            f"{k}={v['achieved_fraction']:.0%}"
            for k, v in details["roofline"].items()
            if isinstance(v, dict) and "achieved_fraction" in v))
        details["fence_semantics"] = (
            "fps values above are dispatch-pipeline rates; "
            "block_until_ready does not await execution on this relay "
            "(ROOFLINE.md §0). device_trace* entries are the honest "
            "clocks for this rig.")
        details["spread_diagnosis"] = (
            "every config now runs n=5 with one DISCARDED warmup call: "
            "the r2 5.8x serving-batched and 2.2x batched-chain spreads "
            "were the first repetition paying jit compile + first-"
            "execution warmup inside its timed section (measured "
            "2026-08-19: 7170 then 10166/10334/10063/9668/10087 fps); "
            "residual steady-state spread is relay dispatch contention "
            "(~3% serving, ~20% batched-chain).")
        try:
            details["device_trace"] = bench_device_trace()
            log(f"device trace done: {details['device_trace']}")
        except Exception as e:  # profiler may be unavailable headless
            details["device_trace"] = {"error": str(e)}
            log(f"device trace failed: {e}")
        details["e2e_result_fps"] = round(bench_e2e_result(), 3)
        log(f"e2e-to-result done: {details['e2e_result_fps']} fps")
        try:
            details["device_trace_serving_tick"] = \
                bench_device_trace_serving()
            log("serving tick device trace done: "
                f"{details['device_trace_serving_tick']}")
        except Exception as e:
            details["device_trace_serving_tick"] = {"error": str(e)}
            log(f"serving tick device trace failed: {e}")
        try:
            details["e2e_result_fps_vec"] = bench_e2e_result_vec()
            log(f"e2e-to-result vec done: {details['e2e_result_fps_vec']}")
        except Exception as e:
            details["e2e_result_fps_vec"] = {"error": str(e)}
            log(f"e2e-to-result vec failed: {e}")
        try:
            details["device_trace_fused_lk"] = bench_device_trace_fused()
            log("fused-LK device trace done: "
                f"{details['device_trace_fused_lk']}")
        except Exception as e:
            details["device_trace_fused_lk"] = {"error": str(e)}
            log(f"fused-LK device trace failed: {e}")
        try:
            from pyfeaturetrack_tpu.ops.pallas_affine_fused import \
                bench_fused_affine
            r = bench_fused_affine(device_trace=True)
            fd, xd = r["pallas_fused_device"], r["xla_batch_device"]
            details["device_trace_fused_affine"] = {
                "fused_per_call_ms": fd["per_call_ms"],
                "fused_ops": fd["ops_per_call"],
                "xla_per_call_ms": xd["per_call_ms"],
                "xla_ops": xd["ops_per_call"],
                "speedup": (round(xd["per_call_ms"] / fd["per_call_ms"],
                                  2) if fd["per_call_ms"] else None),
                "note": "mode-2 affine batch, 1000 feat 480x640; "
                        "profiler device lane (ROOFLINE.md §0)"}
            log("fused-affine device trace done: "
                f"{details['device_trace_fused_affine']}")
        except Exception as e:
            details["device_trace_fused_affine"] = {"error": str(e)}
            log(f"fused-affine device trace failed: {e}")
        try:
            details["device_trace_config2"] = bench_device_trace_config2()
            log("config2 device trace done: "
                f"{details['device_trace_config2']}")
        except Exception as e:
            details["device_trace_config2"] = {"error": str(e)}
            log(f"config2 device trace failed: {e}")
        try:
            details["device_trace_config3"] = bench_device_trace_config3()
            log("config3 device trace done: "
                f"{details['device_trace_config3']}")
        except Exception as e:
            details["device_trace_config3"] = {"error": str(e)}
            log(f"config3 device trace failed: {e}")
        try:
            details["device_trace_config4"] = bench_device_trace_config4()
            log("config4 device trace done: "
                f"{details['device_trace_config4']}")
        except Exception as e:
            details["device_trace_config4"] = {"error": str(e)}
            log(f"config4 device trace failed: {e}")
        try:
            details["scaling_prediction_8dev"] = bench_scaling_prediction()
            log("scaling prediction done: " + json.dumps(
                {wl: {d: r["predicted_weak_efficiency"]
                      for d, r in v["per_device"].items()}
                 for wl, v in details["scaling_prediction_8dev"].items()
                 if isinstance(v, dict) and "per_device" in v}))
        except Exception as e:
            details["scaling_prediction_8dev"] = {"error": str(e)}
            log(f"scaling prediction failed: {e}")
        try:
            details["device_trace_config4_bf16"] = \
                bench_device_trace_config4_bf16()
            log("config4 bf16 device trace done: "
                f"{details['device_trace_config4_bf16']}")
        except Exception as e:
            details["device_trace_config4_bf16"] = {"error": str(e)}
            log(f"config4 bf16 device trace failed: {e}")
        try:
            from pyfeaturetrack_tpu.ops.pallas_affine_vec import \
                bench_vec_affine
            r = bench_vec_affine(device_trace=True, start_off=0.5)
            vd = r["pallas_vec_device"]
            fd = r["pallas_fused_device"]
            details["device_trace_vec_affine"] = {
                "vec_per_call_ms": vd["per_call_ms"],
                "serial_fused_per_call_ms": fd["per_call_ms"],
                "xla_per_call_ms": r["xla_batch_device"]["per_call_ms"],
                "note": "mode-2 affine batch, 1000 feat 480x640, "
                        "0.5px start; profiler device lane"}
            log("vec-affine device trace done: "
                f"{details['device_trace_vec_affine']}")
        except Exception as e:
            details["device_trace_vec_affine"] = {"error": str(e)}
            log(f"vec-affine device trace failed: {e}")
        try:
            details["device_trace_flow_fused"] = \
                bench_device_trace_flow_fused()
            log("fused dense-flow device trace done: "
                f"{details['device_trace_flow_fused']}")
        except Exception as e:
            details["device_trace_flow_fused"] = {"error": str(e)}
            log(f"fused dense-flow device trace failed: {e}")
        try:
            details["device_trace_flow_vec"] = \
                bench_device_trace_flow_vec()
            log("vec dense-flow device trace done: "
                f"{details['device_trace_flow_vec']}")
        except Exception as e:
            details["device_trace_flow_vec"] = {"error": str(e)}
            log(f"vec dense-flow device trace failed: {e}")
        if args.scaling:
            from pyfeaturetrack_tpu.parallel.scaling import measure_scaling
            sc = measure_scaling()
            details["scaling"] = {
                str(d): {"s_per_step": round(sc["seconds_per_step"][d], 6),
                         "efficiency": round(
                             sc["efficiency_vs_smallest"][d], 3)}
                for d in sc["device_counts"]}
            log(f"scaling done: {details['scaling']}")
        log("all configs done")  # final merged flush
        print(json.dumps(details), file=sys.stderr)
        # fail LOUDLY if any entry errored (VERDICT r3 item 2): a sweep
        # artifact with {"error": ...} entries must not pass silently
        errored = sorted(
            k for k, v in details.items()
            if isinstance(v, dict) and "error" in v)
        if errored:
            print(f"[bench] FAILED entries: {errored}", file=sys.stderr,
                  flush=True)
            print(json.dumps(headline))
            return 1

    print(json.dumps(headline))
    return 0


if __name__ == "__main__":
    sys.exit(main())
