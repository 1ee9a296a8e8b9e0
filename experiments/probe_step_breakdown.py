"""Per-op honest-clock breakdown of the config-2 / config-3 steps.

Run on the TPU with the Pallas knobs, e.g.:
  PFT_PALLAS_LK=vec PFT_PALLAS=1 PFT_PALLAS_SELECT=1 \
    python experiments/probe_step_breakdown.py config2
  PFT_PALLAS_LK=vec PFT_PALLAS=1 PFT_PALLAS_AFFINE=vec \
    python experiments/probe_step_breakdown.py config3
Prints every device op >= 10 us/call sorted by total time.
"""
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def full_ops(trace_dir):
    files = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])
    lanes = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            lanes[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, name in lanes.items()
                   if "TPU" in name or "device" in name.lower()}
    by_name = collections.Counter()
    counts = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            if e["name"].startswith("jit_"):
                continue
            by_name[e["name"]] += float(e.get("dur", 0.0))
            counts[e["name"]] += 1
    return by_name, counts


def trace(fn, n_calls):
    d = tempfile.mkdtemp(prefix="pft_probe_")
    with jax.profiler.trace(d):
        out = None
        for _ in range(n_calls):
            out = fn()
        jax.block_until_ready(out)
        time.sleep(2.0)
    by_name, counts = full_ops(d)
    tot = sum(by_name.values())
    print(f"total device {tot/1e3:.3f} ms over {n_calls} calls "
          f"= {tot/1e3/n_calls:.3f} ms/call, "
          f"{sum(counts.values())//n_calls} ops/call")
    for name, us in by_name.most_common(60):
        per = us / n_calls
        if per < 5:
            break
        print(f"  {per:9.1f} us/call  x{counts[name]//n_calls:<4d} {name[:110]}")


def _textured(h, w, seed=4):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h + 32, w + 32)).astype(np.float32)
    # smooth it a bit so tracking converges like the bench scenes
    k = np.ones(5) / 5
    base = np.apply_along_axis(
        lambda r: np.convolve(r, k, mode="same"), 1, base)
    base = np.apply_along_axis(
        lambda c: np.convolve(c, k, mode="same"), 0, base)
    return base


def config2(n_calls=6, h=480, w=640, n_features=1000):
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.models.device_sequence import (
        select_step_device, sequence_step_device)
    cfg = create_config().replace(sequentialMode=True).validated_window()
    base = _textured(h, w)[:h + 16, :w + 16]
    cyc = [jnp.asarray(np.roll(base[:h, :w], 2 * i, axis=1))
           for i in range(16)]
    frames = cyc + cyc[-2:0:-1]
    pyr, x, y, val, _, _ = select_step_device(frames[0], cfg, n_features)
    for i in range(1, 3):
        pyr, x, y, val, *_ = sequence_step_device(
            pyr, frames[i], x, y, val, cfg, True)
    jax.block_until_ready(val)
    state = {"pyr": pyr, "x": x, "y": y, "val": val, "i": 3}

    def one():
        s = state
        s["pyr"], s["x"], s["y"], s["val"], *_ = sequence_step_device(
            s["pyr"], frames[s["i"] % len(frames)], s["x"], s["y"],
            s["val"], cfg, True)
        s["i"] += 1
        return s["val"]
    trace(one, n_calls)


def config3(n_calls=4, h=480, w=640, n_features=1000):
    from pyfeaturetrack_tpu.config import create_config
    from pyfeaturetrack_tpu.features import create_feature_list
    from pyfeaturetrack_tpu.models.tracker import KLTTrackFeatures
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
    state = {"fl": fl, "cache": None, "i": 0}
    for _ in range(2):
        state["fl"], state["cache"] = KLTTrackFeatures(
            cfg, frames[state["i"] % 4], frames[(state["i"] + 1) % 4],
            state["fl"], pyramid_last=state["cache"])
        state["i"] += 1
    jax.block_until_ready(state["fl"].x)

    def one():
        state["fl"], state["cache"] = KLTTrackFeatures(
            cfg, frames[state["i"] % 4], frames[(state["i"] + 1) % 4],
            state["fl"], pyramid_last=state["cache"])
        state["i"] += 1
        return state["fl"].x
    trace(one, n_calls)


def headline(n_calls=8, h=480, w=640, n_features=1000):
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
    p2, out = frame_step(pyr, frames[1], x, y, val)
    jax.block_until_ready(out)
    state = {"cur": pyr, "i": 0}

    def one():
        state["i"] += 1
        state["cur"], o = frame_step(state["cur"],
                                     frames[state["i"] % 4], x, y, val)
        return o
    trace(one, n_calls)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "config2"
    {"config2": config2, "config3": config3,
     "headline": headline}[which]()
