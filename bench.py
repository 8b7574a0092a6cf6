"""End-to-end inspection benchmark on real TPU hardware — the REAL pipeline.

Measures the north-star metric (BASELINE.md) on the production path: p50
wall-clock of ``run_inspection()`` — quality gate -> concurrent dual-VLM
analysis (vision encode + prefill + EOS-terminated constrained-JSON decode)
-> consensus -> 9 safety gates -> explainer narration + counterfactual ->
SQLite -> PDF — at TARGET model scale:

    inspector  Qwen2.5-VL-7B (reference-parity family: window-attention
                              vision tower; real dims, int4 weight-only,
                              random weights)
    auditor    Mllama-11B    (real dims, int4, random weights)
    explainer  Llama-3.1-8B  (real dims, int4, random weights)

Round-3 profile additions: the explainer's three report decodes
(narration + counterfactual + decision support) batched through the
continuous-batching scheduler instead of running sequentially, and an
elastic paged-KV pool that returns the explainer's HBM between bursts.

Weight values don't change latency; random weights + JSON-grammar
constrained decoding (vis_tpu/serving/constrained.py) exercise the same
execution shape as real checkpoints: the emitted JSON parses, so the
pipeline follows the success path (no Gate-0/retry artifacts).  Token
budgets match the reference's observed ~400-500-token JSON outputs
(reference utils/prompts.py:74,155; .env.example:38,44).

Baseline: the reference's 3-5 s/image remote-API pipeline (reference
README.md:294; p50 taken as 4.0 s), which also includes 2 explainer calls.
NOTE: BASELINE.json's <2 s target assumes a v5e-8 (8 chips, TP); this
environment has ONE tunneled v5e chip — all three models share its HBM
bandwidth.  The per-phase breakdown (stderr + BENCH_breakdown.json) shows
the single-chip decode-bandwidth wall and what TP-8 removes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BASELINE_P50_S = 4.0
# 5 timed runs (warmup excluded): the driver host is contended (1 vCPU
# shared with the round driver) and r03 measured a 1.7x spread over 3 runs
# — the median of 5 plus a published min and a per-run host/device split
# make one bad host window visible instead of letting it flip the headline.
RUNS = 5

# Target-scale serving profile — must be set before vis_tpu/jax import.
_BENCH_ENV = {
    "DEV_PROFILE": "target",
    "QUANTIZATION": "int4",
    # Vocab-head precision: MEASURED on-chip at 152k-vocab 7B dims
    # (tools/probe_vocab_head.py) int4 = 2.40, int8 = 2.60, bf16 =
    # 3.63 ms/evaluation — int4's nibble-unpack cost is offset by
    # halved HBM bytes, so head precision is a capacity knob, not a
    # latency one.  Two pipeline A/Bs agree: int8 head on the explainer
    # (this profile, 18.53 s) vs on the inspector (18.87 s, tokens
    # identical) are within noise of each other.  The explainer keeps
    # the int8 head as the measured-green recorded configuration; only
    # one head fits at int8 on 16 GB (two with bf16 KV measured OOM).
    # KV_QUANTIZATION=int8 (opt-in, tests/test_kv_quant.py) was MEASURED
    # here and rejected for this profile: it frees ~1.2 GB of KV HBM but
    # the per-step dequant costs ~2.1 s on the explanation node
    # (20.30 s p50 vs 18.5 s with bf16 KV) — the right trade only when
    # HBM, not decode latency, is the binding constraint.
    "VOCAB_QUANTIZATION": "int4",
    "EXPLAINER_VOCAB_QUANTIZATION": "int8",
    "CONSTRAINED_JSON": "true",
    "VLM_INSPECTOR_PROVIDER": "tpu",
    "VLM_AUDITOR_PROVIDER": "tpu",
    "EXPLAINER_PROVIDER": "tpu",
    # The reference's JSON outputs are ~400-500 tokens (prompt contract);
    # its config cap of 2048 was an API ceiling, not the observed length.
    # RECORDED TRANSCRIPT PINNING (VERDICT r4 #2): decode lengths are
    # pinned per role — the DFA's budget-feasibility mask forces the JSON
    # to close by MAX_TOKENS, and the per-role MIN_TOKENS floor blocks
    # closing before it, so each role's token count lands in the narrow
    # [min, max] band regardless of compiled-graph content.  The recorded
    # shape is the round-4 builder-session transcript (the reference's
    # observed ~400-500-token inspector JSON and the auditor's ~300-token
    # early-exit answer) — auditor early-exit is no longer compile luck.
    "VLM_INSPECTOR_MAX_TOKENS": "448",
    "VLM_INSPECTOR_MIN_TOKENS": "432",
    "VLM_AUDITOR_MAX_TOKENS": "304",
    "VLM_AUDITOR_MIN_TOKENS": "288",
    # The narration stream bounds the explanation node (batching absorbs
    # the two side decodes, not the longest stream); 400 matches the
    # reference's observed ~400-token report sections (reference
    # utils/prompts.py:180-227 instructs concise sections) and shaves
    # ~1.3 s off the node at the single-chip ~12 ms/step decode floor.
    "EXPLAINER_MAX_TOKENS": "400",
    "USE_MOCK_RESPONSES": "false",
    # Explainer-only continuous batching: the report's three independent
    # decodes (narration, counterfactual, decision support) ride shared
    # batched slots on the 8B engine (2.64x at this config measured in r2).
    # Inspector/auditor stay unbatched: their single schema requests keep
    # the forced-run lookahead fast path.  Slot KV = 3 x 3072 tokens
    # (~1.2 GB) fits the explainer's bundle exactly.
    "CONTINUOUS_BATCHING": "true",
    "BATCHING_ROLES": "explainer",
    "DECODE_BATCH_SIZE": "3",
    "SCHEDULER_DECODE_CHUNK": "48",
    # The explainer scheduler's KV comes from a right-sized page pool:
    # dense 3x KV_CACHE_MAX_TOKENS slots cost ~1 GB+ at 8B dims, which
    # together with the int8 vocab heads overflowed the 16 GB chip; the
    # bundle's worst-case footprint (narration ~2k prompt + 512 gen,
    # counterfactual ~1k, decision support ~1k, + chunk slack) fits
    # 39 pages x 128 = 4992 pooled tokens (~0.64 GB).
    "PAGED_KV_CACHE": "true",
    "KV_PAGE_SIZE": "128",
    "KV_POOL_TOKENS": "4992",
    "SPECULATIVE_DECODING": "none",
    # One device dispatch per decode (the dev chip is tunneled: per-chunk
    # host RTT dominates at the default chunk of 64).
    "DECODE_CHUNK": "512",
    # Prefix caching pins up to ~1 GB of prompt-head KV per text engine;
    # with 13.5 GB of int4 weights resident on a 16 GB chip, HBM headroom
    # goes to per-request KV instead.
    "PREFIX_CACHING": "false",
    "KV_CACHE_MAX_TOKENS": "2560",
    "DEVICE_PREPROCESS": "true",
    # Random weights close `{}` greedily in 2 tokens; the floor makes the
    # constrained JSON match the reference's ~400-500-token verdict size.
    "CONSTRAINED_JSON_MIN_TOKENS": "384",
    # Schema-exact decode + forced-run fast-forward: skeleton tokens (keys,
    # punctuation, enums — DFA-forced moves) ride one weight pass per
    # 8-token window, and chunks exit on device at EOS (1.93x measured on
    # the 8B decision-support decode).  Window 16 trades ~5% on the 8B text
    # decode for a slower 7B/11B VLM decode — 8 keeps the better
    # time-to-verdict.
    "CONSTRAINED_SCHEMA": "true",
    "CONSTRAINED_LOOKAHEAD": "8",
    "LOG_TO_FILE": "false",
    "DATABASE_PATH": "/tmp/bench_inspections.db",
    "CHAT_HISTORY_DB": "/tmp/bench_chat.db",
    "UPLOAD_DIR": "/tmp/bench_uploads",
    "REPORT_DIR": "/tmp/bench_reports",
    "LOG_DIR": "/tmp/bench_logs",
}
if os.environ.get("BENCH_SMOKE"):  # harness self-test: small models, 1 run
    _BENCH_ENV["DEV_PROFILE"] = "small"
    # Wiring check, not a perf run: small token budgets keep the CPU-side
    # smoke to a couple of minutes (decode at small dims on 1 vCPU is slow).
    _BENCH_ENV["VLM_INSPECTOR_MAX_TOKENS"] = "64"
    _BENCH_ENV["VLM_AUDITOR_MAX_TOKENS"] = "64"
    _BENCH_ENV["EXPLAINER_MAX_TOKENS"] = "64"
    _BENCH_ENV["CONSTRAINED_JSON_MIN_TOKENS"] = "32"
    _BENCH_ENV["KV_CACHE_MAX_TOKENS"] = "2048"
    RUNS = 1
for _k, _v in _BENCH_ENV.items():
    # BENCH_RESPECT_ENV=1 runs a VARIANT: profile keys already present in
    # the environment win over _BENCH_ENV (used to publish e.g. the
    # speculative-decoding and KV-quant variants in ARCHITECTURE.md).
    if os.environ.get("BENCH_RESPECT_ENV") and _k in os.environ:
        continue
    os.environ[_k] = _v


def main() -> None:
    import threading

    # Device-init watchdog: the tunneled chip occasionally wedges and
    # jax.devices() then blocks forever in plugin init.  A bench that
    # hangs records NOTHING for the round; an explicit error line is
    # honest and machine-readable.  Normal init is seconds; 15 min means
    # the tunnel is down, not slow.
    _init_done = threading.Event()

    def _watchdog():
        if not _init_done.wait(timeout=900):
            print("# FATAL: device init exceeded 900s — TPU tunnel "
                  "unreachable; no measurement possible", file=sys.stderr)
            print(json.dumps({
                "metric": "single_image_dual_vlm_e2e_p50_target_scale_1chip",
                "value": None,
                "unit": "s",
                "vs_baseline": None,
                "error": "tpu_tunnel_unreachable_during_device_init",
            }))
            sys.stdout.flush()
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    # Persistent compilation cache (verified to work through the axon
    # tunnel): the target-scale engine compiles take ~6 min fresh and are
    # all warmup — caching them shrinks the bench's exposure to degraded
    # tunnel/host windows on repeat runs.  Timed runs are unaffected
    # (compile happens before measurement either way).
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if os.environ.get("BENCH_SMOKE"):
        # the axon plugin ignores JAX_PLATFORMS; force CPU explicitly
        jax.config.update("jax_platforms", "cpu")

    device = jax.devices()[0]
    _init_done.set()
    print(f"# device: {device} ({device.platform})", file=sys.stderr)

    # Tunnel health probe: p50 dispatch RTT of a tiny compiled program.
    # Normal is ~10-30 ms through the axon tunnel; a degraded tunnel (or a
    # starved host) shows up here BEFORE it contaminates the pipeline
    # numbers, and the value lands in the breakdown so a bad round is
    # attributable to transport, not the framework.
    import jax.numpy as _probe_jnp
    import numpy as _probe_np

    _probe = jax.jit(lambda x: (x * 2.0).sum())
    _probe_x = _probe_jnp.ones((128, 128), _probe_jnp.bfloat16)
    _probe_np.asarray(_probe(_probe_x))  # compile

    def _rtt_p50() -> float:
        rtts = []
        for _ in range(10):
            t = time.perf_counter()
            _probe_np.asarray(_probe(_probe_x))
            rtts.append((time.perf_counter() - t) * 1e3)
        return statistics.median(rtts)

    tunnel_rtt_ms = round(_rtt_p50(), 1)
    tunnel_rtt_initial_ms = tunnel_rtt_ms
    print(f"# tunnel dispatch RTT p50: {tunnel_rtt_ms} ms", file=sys.stderr)
    # Degraded-window rescue: normal dispatch RTT here is ~10-30 ms; a
    # p50 over 150 ms means the transport (or a starved host) is 5-10x
    # off and every pipeline number would be contaminated (r03's headline
    # regression was exactly such a window).  Wait up to 10 min for the
    # tunnel to normalize rather than recording a transport artifact as
    # the framework's latency; proceed best-effort either way and record
    # both RTTs so the round is attributable.
    _RTT_OK_MS = 150.0
    waited = 0
    while tunnel_rtt_ms > _RTT_OK_MS and waited < 600:
        print(f"# tunnel degraded (RTT p50 {tunnel_rtt_ms} ms > "
              f"{_RTT_OK_MS}); waiting 60s ({waited}s so far)",
              file=sys.stderr)
        time.sleep(60)
        waited += 60
        tunnel_rtt_ms = round(_rtt_p50(), 1)
    if tunnel_rtt_ms > _RTT_OK_MS:
        print(f"# WARNING: proceeding on a degraded tunnel "
              f"(RTT p50 {tunnel_rtt_ms} ms)", file=sys.stderr)

    def hbm(tag: str) -> None:
        """Per-phase HBM accounting (stderr only; absent on some backends)."""
        try:
            ms = device.memory_stats() or {}
            gib = 2**30
            print(
                f"# hbm[{tag}]: in_use={ms['bytes_in_use'] / gib:.2f}GiB "
                f"peak={ms.get('peak_bytes_in_use', 0) / gib:.2f}GiB "
                f"limit={ms.get('bytes_limit', 0) / gib:.2f}GiB",
                file=sys.stderr,
            )
        except Exception:
            pass

    from vis_tpu.orchestration.graph import run_inspection
    from vis_tpu.serving.engine import _engines

    image = str(REPO / "assets" / "sample.jpg")

    from vis_tpu.utils.logger import get_timings

    # Span-side classification for the per-run host/device split (VERDICT
    # r3 #2).  DEVICE spans wrap a device dispatch + its blocking sync, so
    # their wall time is chip time; everything else in the run is host work
    # (JPEG decode, prompt build, JSON parse, gates, PDF, tunnel RTTs).
    # The dual-VLM node runs inspector and auditor concurrently, so
    # device_s can exceed the node's wall time (it is attributable chip
    # time, not a wall-clock partition); host_s = total - device-span time
    # measured on the CRITICAL PATH is not recoverable from spans alone,
    # so we publish both sums and the total and let the delta speak.
    _DEVICE_SPANS = {
        "engine.vision_encode", "engine.prefill", "engine.prefill_suffix",
        "engine.decode", "mllama.vision", "mllama.prefill", "mllama.decode",
        "scheduler.decode",
    }
    _HOST_SPANS = {
        "quality_check", "engine.preprocess", "mllama.preprocess",
        "pdf_report", "scheduler.host",
    }

    def timed_run(tag):
        # Model a FRESH image per inspection (production inspects distinct
        # uploads): drop the shared frame cache so each run pays the one
        # decode + one u8 host->HBM transfer an inspection really costs —
        # the win being measured is one decode SHARED by quality gate +
        # both VLMs + report overlays, not a warm cache across runs.
        from vis_tpu.ops import frame_cache

        frame_cache.clear()
        events = []
        get_timings(reset=True)
        tokens_before = {
            role: getattr(eng, "decode_tokens_total", 0)
            for role, eng in list(_engines.items())
        }
        secs_before = {
            role: getattr(eng, "decode_seconds_total", 0.0)
            for role, eng in list(_engines.items())
        }
        t0 = time.perf_counter()
        state = run_inspection(
            image, criticality="medium", domain="manufacturing",
            on_event=lambda e: events.append(e),
        )
        total = time.perf_counter() - t0
        nodes = {
            e["node"]: e["elapsed_s"]
            for e in events if e.get("event") == "node_end"
        }
        tokens = {
            role: getattr(eng, "decode_tokens_total", 0)
            - tokens_before.get(role, 0)
            for role, eng in list(_engines.items())
        }
        decode_secs = {
            role: getattr(eng, "decode_seconds_total", 0.0)
            - secs_before.get(role, 0.0)
            for role, eng in list(_engines.items())
        }
        spans = {
            k: [len(v), round(sum(v), 2)]
            for k, v in get_timings(reset=True).items()
        }
        device_s = sum(s[1] for k, s in spans.items() if k in _DEVICE_SPANS)
        host_s = sum(s[1] for k, s in spans.items() if k in _HOST_SPANS)
        split = {
            "device_span_s": round(device_s, 2),
            "host_span_s": round(host_s, 2),
            "total_s": round(total, 2),
        }
        print(
            f"# {tag}: {total:.3f}s verdict={state['safety_verdict']['verdict']}"
            f" split={json.dumps(split)}"
            f" nodes={json.dumps(nodes)} decode_tokens={json.dumps(tokens)}"
            f" spans[n,sum_s]={json.dumps(spans)}",
            file=sys.stderr,
        )
        assert state.get("report_path"), "pipeline must produce the PDF"
        assert not state["inspector_result"]["analysis_failed"], (
            "constrained decode must yield parseable inspector JSON"
        )
        assert not state["auditor_result"]["analysis_failed"], (
            "constrained decode must yield parseable auditor JSON"
        )
        return total, nodes, tokens, split, decode_secs

    # Warmup: builds all three target-scale engines and compiles every jit
    # (vision encode, bucketed prefill, constrained decode chunks, PDF path).
    t0 = time.perf_counter()
    timed_run("warmup(compile)")
    print(f"# warmup total (incl. engine builds + compiles): "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    hbm("after_warmup")

    totals, node_runs, token_runs, split_runs = [], [], [], []
    decode_sec_runs = []
    for i in range(RUNS):
        total, nodes, tokens, split, decode_secs = timed_run(
            f"run {i + 1}/{RUNS}"
        )
        hbm(f"after_run{i + 1}")
        totals.append(total)
        node_runs.append(nodes)
        token_runs.append(tokens)
        split_runs.append(split)
        decode_sec_runs.append(decode_secs)

    from vis_tpu.utils.config import config as app_config

    p50 = statistics.median(totals)
    node_p50 = {
        name: round(statistics.median(r.get(name, 0.0) for r in node_runs), 4)
        for name in node_runs[0]
    }
    # Time-to-verdict (BASELINE.md's "dual-VLM consensus verdict" metric):
    # everything through the safety gates, before explanation/DB/PDF.
    verdict_nodes = (
        "initialize", "quality_check", "dual_vlm", "consensus",
        "safety_gates", "clean_verification",
    )
    verdict_p50 = sum(node_p50.get(n, 0.0) for n in verdict_nodes)

    # Device preprocessing throughput (VERDICT #4): compute-only img/s for
    # a 1080p frame through resize->normalize->patchify on the chip.
    import jax.numpy as jnp
    import numpy as _np

    from vis_tpu.ops.preprocess_device import preprocess_frame_device

    frame = jnp.asarray(
        _np.random.default_rng(0).integers(
            0, 255, (1080, 1920, 3), dtype=_np.uint8
        )
    )
    preprocess_frame_device(frame, 728, 1288).block_until_ready()  # compile
    n_pp = 20
    t0 = time.perf_counter()
    for _ in range(n_pp):
        out = preprocess_frame_device(frame, 728, 1288)
    out.block_until_ready()
    pp_rate = n_pp / (time.perf_counter() - t0)

    # Per-model decode roofline (VERDICT r4 #1): tokens/s over the chip
    # seconds spent inside decode dispatch blocks, and the implied weight
    # stream against the chip's MEASURED int4 packed-read rate
    # (tools/probe_int4_xla.py: ~1 TB/s effective on this v5e through
    # the Pallas matvec).  bytes_per_token is the decoder+head parameter
    # footprint ONE forward streams; CONSTRAINED_LOOKAHEAD shares one
    # forward across a DFA-forced window, so roofline_fraction is an
    # *effective* number and may legitimately exceed 1.0 on heavily
    # forced streams (that IS the fast-forward win).
    MEASURED_WEIGHT_STREAM_GBPS = 1000.0
    # The PRACTICAL single-model ceiling, measured r5 on this chip
    # (tools/probe_decode_cost.py): the full production decode step —
    # int4 unpack + matmuls + attention + KV write + vocab head, one
    # fused loop — streams 3.55 GB of weights in 6.705 ms = 529 GB/s,
    # while a pure XLA reduce over the same bytes reaches only 417 GB/s.
    # 1 TB/s is a single-matvec best case that no full-layer program
    # reproduces; fractions against BOTH are published so the headline
    # number is interpretable (the dual-VLM phase shares this practical
    # rate between two models).
    PRACTICAL_STREAM_GBPS = 529.0
    rooflines = {}
    for rkey, eng in list(_engines.items()):
        toks = sum(r.get(rkey, 0) for r in token_runs)
        secs = sum(r.get(rkey, 0.0) for r in decode_sec_runs)
        if toks <= 0 or secs <= 0:
            continue
        try:
            bpt = int(eng.weight_bytes_per_pass)
        except Exception:
            bpt = 0
        tps = toks / secs
        eff_gbps = bpt * tps / 1e9
        rooflines[rkey] = {
            "tokens_per_s": round(tps, 1),
            "decode_s_total": round(secs, 2),
            "bytes_per_token": bpt,
            "effective_weight_stream_GBps": round(eff_gbps, 1),
            "roofline_fraction": (
                round(eff_gbps / MEASURED_WEIGHT_STREAM_GBPS, 3)
            ),
            "practical_roofline_fraction": (
                round(eff_gbps / PRACTICAL_STREAM_GBPS, 3)
            ),
        }

    # Variance guard: on a contended host one bad window can flip the
    # median; flag spreads the reader should not average away.
    spread = (max(totals) - min(totals)) / p50 if p50 else 0.0
    breakdown = {
        "metric": "e2e_inspection_p50",
        "p50_s": round(p50, 4),
        "min_s": round(min(totals), 4),
        "verdict_p50_s": round(verdict_p50, 4),
        "runs_s": [round(t, 4) for t in totals],
        "run_splits": split_runs,
        "run_splits_note": (
            "device_span_s SUMS per-engine dispatch spans; the dual-VLM "
            "node runs inspector and auditor concurrently, so this "
            "attributable chip time can exceed total_s wall time — it is "
            "not a wall-clock partition (host_span_s likewise sums "
            "host-side spans only; neither pair adds up to total_s)"
        ),
        "spread_frac": round(spread, 4),
        "variance_warning": (
            f"run spread {spread:.0%} of p50 exceeds 15% — host contention "
            f"likely; compare run_splits host/device sums per run"
            if spread > 0.15 else None
        ),
        "node_p50_s": node_p50,
        "decode_tokens_last_run": token_runs[-1],
        "decode_rooflines": rooflines,
        "roofline_reference_GBps": MEASURED_WEIGHT_STREAM_GBPS,
        "practical_stream_GBps_measured": PRACTICAL_STREAM_GBPS,
        "device_preprocess_img_per_s_compute": round(pp_rate, 1),
        "tunnel_rtt_ms_p50": tunnel_rtt_ms,
        "tunnel_rtt_initial_ms_p50": tunnel_rtt_initial_ms,
        "profile": {
            "dev_profile": app_config.dev_profile,
            "quantization": app_config.quantization,
            "constrained_json": app_config.constrained_json,
            "device_preprocess": app_config.device_preprocess,
            "decode_chunk": app_config.decode_chunk,
            "inspector": app_config.vlm_inspector_model,
            "auditor": app_config.vlm_auditor_model,
            "explainer": app_config.explainer_model,
            "weights": "random (latency is weight-value independent)",
            "chips": 1,
            "note": "BASELINE <2s target assumes v5e-8 TP; this is 1 chip",
        },
    }
    (REPO / "BENCH_breakdown.json").write_text(json.dumps(breakdown, indent=2))

    # Headline FIRST: the extra legs below each compile fresh programs and
    # touch the chip again; a wedge there must not cost the round its
    # recorded measurement.  The breakdown file is re-written after every
    # completed leg, so partial extra-leg data is still published.
    print(json.dumps({
        "metric": "single_image_dual_vlm_e2e_p50_target_scale_1chip",
        "value": round(p50, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_P50_S / p50, 4),
    }))
    sys.stdout.flush()

    def leg(name, fn):
        t0 = time.perf_counter()
        try:
            breakdown[name] = fn()
        except Exception as exc:  # publish the failure, keep the bench alive
            breakdown[name] = {"error": f"{type(exc).__name__}: {exc}"}
        breakdown[name]["leg_wall_s"] = round(time.perf_counter() - t0, 1)
        (REPO / "BENCH_breakdown.json").write_text(
            json.dumps(breakdown, indent=2)
        )
        print(f"# leg[{name}]: {json.dumps(breakdown[name])}",
              file=sys.stderr)

    if not os.environ.get("BENCH_SMOKE"):
        from bench_legs import leg_batch_throughput, leg_highres_4k, \
            leg_preprocess_e2e

        leg("batch_continuous", lambda: leg_batch_throughput(p50))

        # The two remaining legs need at most the inspector engine, but the
        # three target-scale engines leave the 16 GB chip too full for the
        # 4K tower's activations (r5 run: both legs died instantly with
        # RESOURCE_EXHAUSTED).  Release the auditor + explainer (params,
        # schedulers, slot caches) first — the headline and batch legs that
        # needed them are already recorded.
        import gc

        from vis_tpu import agents as _agents_mod

        for key in list(_engines):
            if key.startswith("inspector:"):
                continue
            eng = _engines.pop(key)
            sched = getattr(eng, "scheduler", None)
            if sched is not None:
                try:
                    sched.stop()
                except Exception:
                    pass
        _agents_mod._cache.clear()  # agents hold backend -> engine refs
        gc.collect()
        hbm("after_engine_release")

        leg("preprocess_e2e", leg_preprocess_e2e)
        leg("highres_4k", leg_highres_4k)
    print(f"# breakdown: {json.dumps(breakdown)}", file=sys.stderr)


if __name__ == "__main__":
    main()
