"""Extra measured legs for bench.py (run after the headline is printed).

Each function returns a JSON-serializable dict that bench.py publishes in
BENCH_breakdown.json.  All three answer a VERDICT r4 directive:

- leg_batch_throughput: images/s/chip under continuous batching through
  ``run_batch_inspection`` (r4 #4) — the reference's batch path is a
  strictly sequential loop (reference src/orchestration/graph.py:269).
- leg_preprocess_e2e: sustained host-JPEG-decode -> H2D -> device
  resize/normalize/patchify img/s over >=100 images (r4 #5) — everything
  the reference's utils/image_utils.py:20-148 hot path does, plus the
  transfer the BASELINE ">50 img/s/chip feeding HBM" target includes.
- leg_highres_4k: single-chip 4K-frame vision-encode TTFT through the
  Qwen2.5 window tower (r4 #6; BASELINE config 3) — the workload the
  reference cannot run at all (it downscales to 2048 px before encoding,
  reference src/agents/vlm_inspector.py:36-57).
"""

import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
SAMPLE = REPO / "assets" / "sample.jpg"


def _variant_images(n: int, out_dir: Path) -> list:
    """n distinct same-shape JPEGs derived from the sample image.

    Same pixel dimensions => same patch grid and prefill buckets => no new
    compiles; distinct bytes => distinct frame-cache keys, so each image
    pays its own decode + H2D like a real batch of uploads."""
    from PIL import Image

    out_dir.mkdir(parents=True, exist_ok=True)
    base = np.asarray(Image.open(SAMPLE).convert("RGB")).astype(np.int16)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        noisy = np.clip(
            base + rng.integers(-12, 13, base.shape, dtype=np.int16),
            0, 255,
        ).astype(np.uint8)
        p = out_dir / f"batch_{i:02d}.jpg"
        Image.fromarray(noisy).save(p, quality=90)
        paths.append(str(p))
    return paths


def leg_batch_throughput(p50_single: float, n_images: int = 8) -> dict:
    """North-star leg: sustained images/s/chip with the scheduler and the
    bounded-concurrency batch runner overlapping inspector/auditor/
    explainer decodes across images."""
    from vis_tpu.ops import frame_cache
    from vis_tpu.orchestration.graph import run_batch_inspection
    from vis_tpu.utils.config import config

    paths = _variant_images(n_images, Path("/tmp/bench_batch"))
    frame_cache.clear()
    t0 = time.perf_counter()
    session = run_batch_inspection(
        paths, criticality="medium", domain="manufacturing"
    )
    wall = time.perf_counter() - t0
    per_image = session.get("image_results", {})
    completed = sum(1 for r in per_image.values() if r.get("completed"))
    # A pipeline "completes" even when a VLM call failed (Gate 0 catches
    # it) — but such an image did NOT pay its decode work, so counting it
    # would inflate images/s.  Publish the failure count so the rate is
    # interpretable; a clean leg has analysis_failures == 0.
    failures = sum(
        1 for r in per_image.values() if r.get("failure_history")
    )
    rate = n_images / wall
    seq_equiv = 1.0 / p50_single if p50_single else None
    return {
        "images": n_images,
        "completed": completed,
        "analysis_failures": failures,
        "concurrency": config.max_concurrent_calls,
        "wall_s": round(wall, 2),
        "images_per_s_chip": round(rate, 4),
        "sequential_equiv_images_per_s": (
            round(seq_equiv, 4) if seq_equiv else None
        ),
        "speedup_vs_sequential": (
            round(rate * p50_single, 2) if p50_single else None
        ),
    }


def leg_preprocess_e2e(n_images: int = 120) -> dict:
    """Sustained end-to-end preprocess rate: PIL JPEG decode on the host,
    u8 host->HBM transfer, resize-as-matmul -> normalize -> patchify on
    the chip.  The loop never blocks per image (device work is dispatched
    asynchronously), so host decode and chip compute pipeline; the final
    block_until_ready charges every in-flight dispatch.

    Caveat published alongside the number: this dev chip hangs off an
    axon NETWORK tunnel, so H2D bandwidth here is tunnel bandwidth, not
    the PCIe/direct path a real v5e host has — h2d_MBps makes the
    transport's share attributable."""
    import io
    from collections import deque

    import jax
    from PIL import Image

    from vis_tpu.ops.preprocess_device import preprocess_frame_device

    # A realistic 1080p frame: structured gradients + texture compress to
    # a plausible camera-JPEG size (pure noise would inflate decode cost).
    h, w = 1080, 1920
    yy, xx = np.mgrid[0:h, 0:w]
    rng = np.random.default_rng(7)
    frame = np.stack(
        [
            (xx * 255 / w),
            (yy * 255 / h),
            ((xx + yy) * 255 / (h + w)),
        ],
        axis=-1,
    ).astype(np.uint8)
    frame = np.clip(
        frame.astype(np.int16) + rng.integers(-20, 21, frame.shape), 0, 255
    ).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, format="JPEG", quality=85)
    jpeg_bytes = buf.getvalue()

    # Component probes (stderr-free, published): host decode and H2D.
    t0 = time.perf_counter()
    for _ in range(10):
        rgb = np.asarray(Image.open(io.BytesIO(jpeg_bytes)).convert("RGB"))
    host_decode_ms = (time.perf_counter() - t0) / 10 * 1e3
    dev = jax.device_put(rgb)
    dev.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        jax.device_put(rgb).block_until_ready()
    h2d_s = (time.perf_counter() - t0) / 5
    h2d_mbps = rgb.nbytes / h2d_s / 1e6

    # Warm the compiled program for this (resize) geometry.
    preprocess_frame_device(dev, 728, 1288).block_until_ready()

    inflight = deque(maxlen=4)  # bound live HBM outputs, keep the pipe full
    t0 = time.perf_counter()
    for _ in range(n_images):
        rgb = np.asarray(Image.open(io.BytesIO(jpeg_bytes)).convert("RGB"))
        inflight.append(preprocess_frame_device(jax.device_put(rgb), 728, 1288))
    inflight[-1].block_until_ready()
    wall = time.perf_counter() - t0
    return {
        "images": n_images,
        "jpeg_kB": round(len(jpeg_bytes) / 1e3, 1),
        "resolution": "1920x1080",
        "images_per_s_e2e": round(n_images / wall, 1),
        "host_decode_ms": round(host_decode_ms, 1),
        "h2d_MBps_tunnel": round(h2d_mbps, 1),
        "note": (
            "includes host JPEG decode + u8 H2D over the axon tunnel + "
            "device resize/normalize/patchify; tunnel H2D replaces the "
            "real host's PCIe path"
        ),
    }


def leg_highres_4k() -> dict:
    """BASELINE config 3: encode a 4K frame through the inspector's
    Qwen2.5 window-attention tower on one chip at a 4x pixel budget
    (~20k patches after smart-resize — the grid ARCHITECTURE.md's
    measured table tracks).  TTFT-to-vision-embeds; the decode after it
    is the same per-token cost as the headline runs."""
    import io

    import jax
    from PIL import Image

    from vis_tpu.ops.preprocess import DEFAULT_MAX_PIXELS
    from vis_tpu.ops.preprocess_device import preprocess_image_device
    from vis_tpu.serving.engine import _engines

    eng = next(
        (e for k, e in _engines.items() if k.startswith("inspector:")), None
    )
    if eng is None or eng.vlm_config is None:
        return {"error": "no inspector VLM engine resident"}

    h, w = 2160, 3840
    yy, xx = np.mgrid[0:h, 0:w]
    frame = np.stack(
        [(xx * 255 / w), (yy * 255 / h), ((xx ^ yy) % 256)], axis=-1
    ).astype(np.uint8)
    path = "/tmp/bench_4k.jpg"
    Image.fromarray(frame).save(path, quality=85)

    image = preprocess_image_device(
        path, max_pixels=4 * DEFAULT_MAX_PIXELS
    )
    # Compile pass (persistent-cached for subsequent driver runs).
    t0 = time.perf_counter()
    eng.encode_vision(image).block_until_ready()
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        eng.encode_vision(image).block_until_ready()
        times.append(time.perf_counter() - t0)
    return {
        "input": "3840x2160",
        "patches": int(image.num_patches),
        "vision_tokens": int(image.num_tokens),
        "encode_s_p50": round(sorted(times)[1], 3),
        "encode_runs_s": [round(t, 3) for t in times],
        "first_call_incl_compile_s": round(compile_s, 1),
        "note": (
            "pixel budget 4x Qwen default (the reference downscales to "
            "2048px and cannot see this resolution); window attention + "
            "Pallas flash attention, O(seq) memory"
        ),
    }
