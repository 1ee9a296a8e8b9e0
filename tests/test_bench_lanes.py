"""The bench --all device-trace wrappers must pin the production Pallas
lanes for their subprocess (the knobs are read at TRACE time — an empty
environment silently measures the legacy XLA path instead).

Regression for the round-5 defect found 2026-08-21: the serving-tick
wrapper predated the stream-loop tick (DESIGN.md §9) and omitted the
knobs, so the --all artifact recorded the legacy vmapped tick (10.7
aggregate fps honest) while the production lane runs at ~609.
"""
import importlib.util
import sys


def _load_bench():
    if "bench" in sys.modules:
        return sys.modules["bench"]
    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    argv, sys.argv = sys.argv, ["bench.py"]
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = argv
    sys.modules["bench"] = mod
    return mod


EXPECTED = {
    "bench_device_trace_config2": {
        "PFT_PALLAS_LK": "vec", "PFT_PALLAS": "1",
        "PFT_PALLAS_SELECT": "1"},
    "bench_device_trace_config3": {
        "PFT_PALLAS_LK": "vec", "PFT_PALLAS": "1",
        "PFT_PALLAS_AFFINE": "vec"},
    "bench_device_trace_config4": {
        "PFT_PALLAS_LK": "vec", "PFT_PALLAS": "1"},
    "bench_device_trace_config4_bf16": {
        "PFT_PALLAS_LK": "vec", "PFT_PALLAS": "1"},
    "bench_device_trace_serving": {
        "PFT_PALLAS_LK": "vec", "PFT_PALLAS": "1",
        "PFT_PALLAS_SELECT": "1"},
}


def test_trace_wrappers_pin_production_lanes(monkeypatch):
    bench = _load_bench()
    seen = {}

    def fake(flag, env_knobs, timeout_s=560):
        seen[flag] = dict(env_knobs)
        return {}

    monkeypatch.setattr(bench, "_trace_subprocess", fake)
    for name, knobs in EXPECTED.items():
        seen.clear()
        getattr(bench, name)()
        assert len(seen) == 1, name
        (flag, got), = seen.items()
        for k, v in knobs.items():
            assert got.get(k) == v, (
                f"{name} ({flag}) must pin {k}={v!r} for its trace "
                f"subprocess; got {got!r} — without it the trace "
                f"measures the legacy XLA path")
