"""Round-5 continuation: regenerate the BENCH_DETAILS.json entries the
relay outage left stale, MOST-CRITICAL FIRST (unlike the generic
finish_bench_details.py, which runs in --all order):

1. device_trace_serving_tick — the round-4 retained value (10.7 fps,
   vmapped tick) is 57x stale vs the round-5 per-stream-loop tick.
2. config5_e2e_long — promised round-5 entry, missing entirely.
3. device_trace_config3/config4 — round-5 kernels (straggler-sorted
   affine tiles, VMEM-resident 1080p, carry) changed these.
4. The remaining trace lanes, then the round-5-insensitive stages
   (corridor e2e, ratio, roofline — no BA/oracle code changed r5).

Run from repo root: python experiments/finish_bench_round5.py
"""
import importlib.util
import json
import sys

import numpy as np

sys.argv = ["bench.py"]
spec = importlib.util.spec_from_file_location("bench",
                                              "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def log(msg):
    print(f"[finish-r5] {msg}", file=sys.stderr, flush=True)


def flush(details):
    try:
        with open("BENCH_DETAILS.json") as f:
            merged = json.load(f)
    except (OSError, ValueError):
        merged = {}
    merged.update(details)
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(merged, f, indent=2)


details = {}


def _config5_long():
    from pyfeaturetrack_tpu.utils.synthscene import run_vo_on_circuit
    return run_vo_on_circuit(n_frames=520)


def _config5_e2e():
    from pyfeaturetrack_tpu.utils.synthscene import run_vo_on_corridor
    return run_vo_on_corridor(n_frames=100, kf_every=3, n_features=100)


def _fused_affine():
    from pyfeaturetrack_tpu.ops.pallas_affine_fused import \
        bench_fused_affine
    r = bench_fused_affine(device_trace=True)
    fd, xd = r["pallas_fused_device"], r["xla_batch_device"]
    return {
        "fused_per_call_ms": fd["per_call_ms"],
        "fused_ops": fd["ops_per_call"],
        "xla_per_call_ms": xd["per_call_ms"],
        "xla_ops": xd["ops_per_call"],
        "speedup": (round(xd["per_call_ms"] / fd["per_call_ms"], 2)
                    if fd["per_call_ms"] else None),
        "note": "mode-2 affine batch, 1000 feat 480x640; "
                "profiler device lane (ROOFLINE.md §0)"}


def _vec_affine():
    from pyfeaturetrack_tpu.ops.pallas_affine_vec import bench_vec_affine
    r = bench_vec_affine(device_trace=True, start_off=0.5)
    return {
        "vec_per_call_ms": r["pallas_vec_device"]["per_call_ms"],
        "serial_fused_per_call_ms":
            r["pallas_fused_device"]["per_call_ms"],
        "xla_per_call_ms": r["xla_batch_device"]["per_call_ms"],
        "note": "mode-2 affine batch, 1000 feat 480x640, 0.5px start; "
                "profiler device lane"}


def _roofline():
    from pyfeaturetrack_tpu.utils.roofline import roofline_report
    return roofline_report()


stages = [
    ("device_trace_serving_tick", bench.bench_device_trace_serving),
    ("config5_e2e_long", _config5_long),
    ("device_trace_config3", bench.bench_device_trace_config3),
    ("device_trace_config4", bench.bench_device_trace_config4),
    ("device_trace_flow_vec", bench.bench_device_trace_flow_vec),
    ("device_trace_vec_lk", bench.bench_device_trace_vec),
    ("device_trace_config2", bench.bench_device_trace_config2),
    ("device_trace", bench.bench_device_trace),
    ("device_trace_config4_bf16", bench.bench_device_trace_config4_bf16),
    ("device_trace_fused_lk", bench.bench_device_trace_fused),
    ("device_trace_flow_fused", bench.bench_device_trace_flow_fused),
    ("e2e_result_fps", lambda: round(bench.bench_e2e_result(), 3)),
    ("scaling_prediction_8dev", bench.bench_scaling_prediction),
    ("device_trace_vec_affine", _vec_affine),
    ("device_trace_fused_affine", _fused_affine),
    ("config5_e2e_corridor", _config5_e2e),
    ("roofline", _roofline),
]
for key, fn in stages:
    try:
        details[key] = fn()
    except Exception as e:
        details[key] = {"error": str(e)[-300:]}
    log(f"{key}: {details[key]}")
    flush(details)

# config5 convergence ratio needs a bench_sfm run in THIS process
try:
    rate, ratio = bench.bench_sfm()
    details["config5_ba_final_over_initial_cost"] = float(
        f"{float(ratio):.3e}")
except Exception as e:
    details["config5_ba_final_over_initial_cost"] = {
        "error": str(e)[-300:]}
log(f"ratio: {details['config5_ba_final_over_initial_cost']}")
flush(details)
log("all round-5 finish stages done")
