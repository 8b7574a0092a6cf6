"""Gated real-checkpoint E2E readiness (VERDICT r1 #9, SURVEY §7 hard part 6).

This environment ships no model checkpoints; the moment one appears under
``checkpoints/<model-name>/`` (HF layout: config.json + *.safetensors +
tokenizer.json), this test drives ONE image through the full production
pipeline with that checkpoint and asserts the agent JSON parses.

Skipped unless BOTH hold:
  - RUN_REAL_CKPT=1 is set (the run costs real chip time: a 7B-class
    checkpoint is not CPU-feasible, and the suite's conftest pins CPU), and
  - at least one checkpoint directory exists.

Run it on hardware with:
  RUN_REAL_CKPT=1 python -m pytest tests/test_real_checkpoint.py -x -q

The pipeline runs in a SUBPROCESS with a clean JAX platform choice (the
conftest forces jax_platforms=cpu in-process).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
CKPT_ROOT = REPO / "checkpoints"

_DRIVER = """
import json, sys
from pathlib import Path

repo = Path(sys.argv[1])
sys.path.insert(0, str(repo))

from vis_tpu.orchestration.graph import run_inspection

state = run_inspection(
    str(repo / "assets" / "sample.jpg"),
    criticality="medium", domain="manufacturing",
)
print("RESULT::" + json.dumps({
    "verdict": (state.get("safety_verdict") or {}).get("verdict"),
    "inspector_failed": state["inspector_result"]["analysis_failed"],
    "auditor_failed": state["auditor_result"]["analysis_failed"],
    "report": bool(state.get("report_path")),
}))
"""


def _checkpoints_present() -> bool:
    if not CKPT_ROOT.is_dir():
        return False
    return any(
        (d / "config.json").exists() for d in CKPT_ROOT.iterdir() if d.is_dir()
    )


@pytest.mark.skipif(
    not os.environ.get("RUN_REAL_CKPT"),
    reason="set RUN_REAL_CKPT=1 to run the real-checkpoint E2E (chip time)",
)
@pytest.mark.skipif(
    not _checkpoints_present(),
    reason="no checkpoints under checkpoints/ (HF layout with config.json)",
)
def test_real_checkpoint_end_to_end(tmp_path):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let jax pick the accelerator
    env.update({
        "VLM_INSPECTOR_PROVIDER": "tpu",
        "VLM_AUDITOR_PROVIDER": "tpu",
        "EXPLAINER_PROVIDER": "tpu",
        "USE_MOCK_RESPONSES": "false",
        "CHECKPOINT_DIR": str(CKPT_ROOT),
        "DATABASE_PATH": str(tmp_path / "real.db"),
        "REPORT_DIR": str(tmp_path / "reports"),
        "UPLOAD_DIR": str(tmp_path / "uploads"),
        "LOG_DIR": str(tmp_path / "logs"),
        # Real checkpoints must produce parseable JSON *without* the
        # grammar mask — this is the accuracy-parity probe.
        "CONSTRAINED_JSON": "false",
    })
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, str(REPO)],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT::")),
        None,
    )
    assert line, proc.stdout[-2000:]
    result = json.loads(line[len("RESULT::"):])
    # The whole point: a real on-pod model's output must survive the robust
    # parser (reference vlm_inspector.py:142 contract).
    assert result["inspector_failed"] is False
    assert result["verdict"] in ("SAFE", "UNSAFE", "REQUIRES_HUMAN_REVIEW")
    assert result["report"] is True


# ---------------------------------------------------------------------------
# Quantized-load matrix (VERDICT r2 item 8): {bf16, int8, int4} x
# {Qwen2.5-VL, Mllama, Llama} — quantize-on-load of a real safetensors
# checkpoint, one image (or prompt) through the engine.  The day real
# checkpoints land, nothing new needs writing.
# ---------------------------------------------------------------------------

_ENGINE_DRIVER = """
import sys
from pathlib import Path

repo = Path(sys.argv[1])
sys.path.insert(0, str(repo))
role, model_name, is_vlm = sys.argv[2], sys.argv[3], sys.argv[4] == "1"

from vis_tpu.serving.engine import build_engine

engine = build_engine(role, model_name)
image = str(repo / "assets" / "sample.jpg") if is_vlm else None
out = engine.generate(
    "Describe the component in this image briefly.", image,
    max_tokens=32, max_image_dim=512,
)
assert isinstance(out, str) and out.strip(), "empty generation"
print("ENGINE_OK::" + out[:120].replace(chr(10), " "))
"""


def _family_checkpoints():
    """(family, role, model_name, is_vlm) for each checkpoint on disk."""
    if not CKPT_ROOT.is_dir():
        return []
    found = []
    for d in sorted(CKPT_ROOT.iterdir()):
        cfg = d / "config.json"
        if not d.is_dir() or not cfg.exists():
            continue
        model_type = json.loads(cfg.read_text()).get("model_type", "")
        if model_type == "qwen2_5_vl":
            found.append(("qwen2_5_vl", "inspector", d.name, True))
        elif model_type == "mllama":
            found.append(("mllama", "auditor", d.name, True))
        elif model_type in ("llama", "qwen2"):
            found.append((model_type, "explainer", d.name, False))
        elif model_type == "qwen2_vl":
            found.append(("qwen2_vl", "inspector", d.name, True))
    return found


@pytest.mark.skipif(
    not os.environ.get("RUN_REAL_CKPT"),
    reason="set RUN_REAL_CKPT=1 to run the real-checkpoint matrix (chip time)",
)
@pytest.mark.skipif(
    not _checkpoints_present(),
    reason="no checkpoints under checkpoints/ (HF layout with config.json)",
)
@pytest.mark.parametrize("quant", ["none", "int8", "int4"])
def test_real_checkpoint_quantized_load_matrix(tmp_path, quant):
    families = _family_checkpoints()
    assert families, "checkpoint dirs present but no recognizable config.json"
    for family, role, model_name, is_vlm in families:
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.update({
            "CHECKPOINT_DIR": str(CKPT_ROOT),
            "QUANTIZATION": quant,
            # The production int4 profile runs the vocab head at int8
            # (decode roofline); exercise that exact mixed-precision path.
            "VOCAB_QUANTIZATION": "int8" if quant == "int4" else "same",
            "LOG_DIR": str(tmp_path / "logs"),
        })
        proc = subprocess.run(
            [sys.executable, "-c", _ENGINE_DRIVER, str(REPO), role,
             model_name, "1" if is_vlm else "0"],
            capture_output=True, text=True, timeout=3600, env=env,
        )
        assert proc.returncode == 0, (
            f"{family} ({quant}): {proc.stderr[-4000:]}"
        )
        assert any(
            ln.startswith("ENGINE_OK::") for ln in proc.stdout.splitlines()
        ), f"{family} ({quant}): {proc.stdout[-2000:]}"
