"""Probe: Mllama-11B int4 per-step decode cost, plain vs constrained-window.

The r04 bench measured mllama.decode ~15 ms/step standalone vs a ~8 ms
bandwidth expectation (5.2 GB int4 weights + 0.67 GB self-KV + 0.21 GB
cross-KV per step at the ~1 TB/s packed-read rate the 7B path achieves).
(That 15 ms predates the r04 frame-cache/device-tiling fixes; this probe,
run AFTER them, measures ~14.0 ms plain / ~10.3 ms windowed — the numbers
fuse_mllama_projections's docstring cites.  The two baselines differ
because they bracket those fixes, not because anything regressed.)
This probe isolates where the gap lives by timing, on the target-scale
auditor engine (random weights, latency is weight-value independent):

  1. plain greedy fused chunk        (_decode_chunk_jit)
  2. schema window path, lookahead 8 (_decode_window_json_jit) — the
     path the bench actually runs
  3. same with a shorter KV cache    (KV_CACHE_MAX_TOKENS env)

Usage:  python tools/probe_mllama_decode.py [steps]
Env knobs forwarded: KV_CACHE_MAX_TOKENS, CONSTRAINED_LOOKAHEAD.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("DEV_PROFILE", "target")
os.environ.setdefault("QUANTIZATION", "int4")
os.environ.setdefault("VOCAB_QUANTIZATION", "int4")
os.environ.setdefault("VLM_AUDITOR_PROVIDER", "tpu")
os.environ.setdefault("CONSTRAINED_JSON", "true")
os.environ.setdefault("CONSTRAINED_SCHEMA", "true")
os.environ.setdefault("CONSTRAINED_LOOKAHEAD", "8")
os.environ.setdefault("DECODE_CHUNK", "512")
os.environ.setdefault("KV_CACHE_MAX_TOKENS", "2560")
os.environ.setdefault("DEVICE_PREPROCESS", "true")
os.environ.setdefault("LOG_TO_FILE", "false")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def main():
    from vis_tpu.serving.engine import build_engine
    from vis_tpu.utils.prompts import get_prompt

    t0 = time.perf_counter()
    eng = build_engine("auditor", "meta-llama/Llama-3.2-11B-Vision-Instruct")
    print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)

    prompt = get_prompt("auditor").format(
        criticality="medium", domain="manufacturing"
    )
    img = "/root/repo/assets/sample.jpg"

    # --- 1. plain greedy (json_mode off) ---
    for tag in ("compile", "steady"):
        t0 = time.perf_counter()
        out = eng.generate(prompt, image_path=img, max_tokens=STEPS,
                           temperature=0.0, json_mode=False)
        dt = time.perf_counter() - t0
        n = eng.last_decode_tokens or STEPS
        print(f"plain[{tag}]: {dt:.2f}s for {n} tok = {1e3 * dt / n:.1f} ms/tok",
              flush=True)

    # --- 2. schema window path (what the bench runs) ---
    for tag in ("compile", "steady"):
        t0 = time.perf_counter()
        out = eng.generate(prompt, image_path=img, max_tokens=STEPS,
                           temperature=0.0, json_mode=True,
                           json_schema="inspection")
        dt = time.perf_counter() - t0
        n = eng.last_decode_tokens or STEPS
        print(f"window[{tag}]: {dt:.2f}s for {n} tok = {1e3 * dt / n:.1f} ms/tok",
              flush=True)


if __name__ == "__main__":
    main()
