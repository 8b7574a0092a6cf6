"""Probe: per-stage HBM residency of the full bench profile.

Reproduces bench.py's engine set + two inspections and prints
device.memory_stats() after each stage, to locate what grew the
post-warmup resident set (run-1 RESOURCE_EXHAUSTED after a green warmup).
Run with the bench env (this script sets the same profile).
"""

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (sets _BENCH_ENV on import)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

device = jax.devices()[0]
print(f"device: {device}", flush=True)


def hbm(tag):
    try:
        ms = device.memory_stats() or {}
        gib = 2**30
        print(
            f"hbm[{tag}]: in_use={ms.get('bytes_in_use', 0) / gib:.2f} "
            f"peak={ms.get('peak_bytes_in_use', 0) / gib:.2f} "
            f"limit={ms.get('bytes_limit', 0) / gib:.2f}",
            flush=True,
        )
    except Exception as exc:
        print(f"hbm[{tag}]: unavailable ({type(exc).__name__}: {exc})",
              flush=True)


hbm("start")

from vis_tpu.orchestration.graph import run_inspection  # noqa: E402
from vis_tpu.serving.engine import _engines, build_engine  # noqa: E402
from vis_tpu.utils.config import config as app_config  # noqa: E402

from vis_tpu.agents import get_auditor, get_explainer, get_inspector  # noqa: E402,E501

for role, factory in (
    ("inspector", get_inspector),
    ("auditor", get_auditor),
    ("explainer", get_explainer),
):
    t0 = time.perf_counter()
    factory()  # builds + registers the engine
    print(f"built {role} in {time.perf_counter() - t0:.1f}s", flush=True)
    hbm(f"after_{role}_build")

image = str(REPO / "assets" / "sample.jpg")
for i in (1, 2):
    from vis_tpu.ops import frame_cache

    frame_cache.clear()
    t0 = time.perf_counter()
    state = run_inspection(image, criticality="medium",
                           domain="manufacturing")
    print(
        f"inspection {i}: {time.perf_counter() - t0:.1f}s "
        f"verdict={state['safety_verdict']['verdict']} "
        f"insp_failed={state['inspector_result']['analysis_failed']} "
        f"aud_failed={state['auditor_result']['analysis_failed']}",
        flush=True,
    )
    hbm(f"after_inspection_{i}")
