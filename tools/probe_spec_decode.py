"""A/B probe: prompt-lookup speculative decoding (SPECULATIVE_DECODING=pld)
vs the fused greedy chunk loop, on the target-scale 8B int4 explainer
engine — the free-text narration span is the pipeline's remaining
unforced-token cost (VERDICT r2 item 3b; PAPERS.md SpecVLM/ViSpec are the
VLM-side analogs).

Run ON THE CHIP (no JAX_PLATFORMS override):
    python tools/probe_spec_decode.py

PLD reproduces greedy token-exactly by construction (verified here), so
the published number is a pure latency comparison.  Random weights mean
text has little self-repetition, which LOWERS pld acceptance vs real
weights — the measured number is a floor for repetitive report prose.
"""

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.update({
    "DEV_PROFILE": "target",
    "QUANTIZATION": "int4",
    "VOCAB_QUANTIZATION": "int8",
    "KV_CACHE_MAX_TOKENS": "2560",
    "DECODE_CHUNK": "512",
    "LOG_TO_FILE": "false",
    "LOG_DIR": "/tmp/probe_logs",
})

MAX_TOKENS = 256
# A prompt with report-like repetition (section headers recur), plus a
# non-repetitive control.
PROMPTS = {
    "report-like": (
        "EXECUTIVE SUMMARY\nThe bracket was inspected. "
        "DEFECT ANALYSIS\nThe bracket shows a crack. The bracket shows "
        "corrosion near the crack. "
        "FINAL RECOMMENDATION\nReplace the bracket. "
    ) * 4,
    "non-repetitive": "Write a detailed inspection report for a steel bracket.",
}


def main():
    from vis_tpu.serving.engine import build_engine
    from vis_tpu.utils.config import get_config

    engine = build_engine("explainer", "meta-llama/Llama-3.1-8B-Instruct")

    results = {}
    for name, prompt in PROMPTS.items():
        for mode in ("none", "pld"):
            os.environ["SPECULATIVE_DECODING"] = mode
            get_config(reload=True)
            # warmup/compile
            out_w = engine.generate(prompt, max_tokens=MAX_TOKENS)
            t0 = time.perf_counter()
            out = engine.generate(prompt, max_tokens=MAX_TOKENS)
            dt = time.perf_counter() - t0
            results[(name, mode)] = (dt, out)
            print(f"# {name:15s} {mode:4s}: {dt:7.3f}s "
                  f"({len(out)} chars)", file=sys.stderr)
        same = results[(name, "none")][1] == results[(name, "pld")][1]
        print(f"# {name}: pld output token-exact vs greedy: {same}",
              file=sys.stderr)
        assert same, "pld must reproduce greedy exactly"
    for name in PROMPTS:
        base, spec = results[(name, "none")][0], results[(name, "pld")][0]
        print(f"RESULT {name}: greedy {base:.3f}s, pld {spec:.3f}s, "
              f"speedup {base / spec:.2f}x")


if __name__ == "__main__":
    main()
