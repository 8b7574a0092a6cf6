"""Full production pipeline from HF checkpoints — runnable today.

test_real_checkpoint.py drives run_inspection() from checkpoints but is
env-gated on real model weights this environment does not ship.  This is
the same proof at tiny dims, default-on: synthesize complete HF-layout
checkpoints for ALL THREE roles (Qwen2.5-VL inspector, Mllama auditor,
Llama explainer — written by HF torch `save_pretrained` in a subprocess,
so tensor naming is exactly what production checkpoints carry), each
shipping a REAL trained tokenizer.json (assets/tokenizers/) augmented
with the family's special tokens, then run the whole inspection pipeline
with tpu providers:

    upload -> quality gate -> dual-VLM (vision encode -> prefill ->
    constrained-JSON decode over the real vocab) -> parse -> consensus ->
    gates -> explainer -> SQLite -> PDF

and assert the SUCCESS path: both agent JSONs parse (no Gate-0), a
verdict is produced, and the report exists.  Every step is the
production code path — find_checkpoint, config.json-driven shapes,
safetensors conversion, HFTokenizer special-token detection, DFA tables
compiled from the real vocab's byte pieces.

Reference contract being replaced: remote HF/Groq API calls returning
JSON the reference parses with a 3-strategy salvager
(reference src/agents/vlm_inspector.py:142-213); here grammar-constrained
local decode guarantees parseability and this test proves the loaded-
checkpoint route end-to-end.

The pipeline runs in a subprocess: torch (checkpoint gen) and jax
deadlock when mixed in-process here, and the subprocess gets a clean
JAX_PLATFORMS=cpu + env-driven config.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
TOKENIZERS = REPO / "assets" / "tokenizers"

_QWEN_SPECIALS = ["<|vision_start|>", "<|vision_end|>", "<|image_pad|>",
                  "<|im_end|>"]
_LLAMA_SPECIALS = ["<|image|>", "<|eot_id|>"]

# Torch-only checkpoint writer (subprocess).  argv: root qwen_vocab
# llama_vocab img_pad vis_start vis_end mllama_img
_GEN = """
import os, shutil, sys
os.environ["USE_TF"] = "0"
os.environ["TRANSFORMERS_VERBOSITY"] = "error"
import torch

(root, qwen_vocab, llama_vocab, img_pad, vis_start, vis_end,
 mllama_img) = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                int(sys.argv[4]), int(sys.argv[5]), int(sys.argv[6]),
                int(sys.argv[7]))

from transformers import Qwen2_5_VLConfig, Qwen2_5_VLForConditionalGeneration
torch.manual_seed(11)
q25 = Qwen2_5_VLForConditionalGeneration(Qwen2_5_VLConfig(
    text_config=dict(vocab_size=qwen_vocab, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, rope_theta=1000000.0,
        max_position_embeddings=4096, rms_norm_eps=1e-6,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]}),
    vision_config=dict(depth=4, hidden_size=64, intermediate_size=128,
        num_heads=4, patch_size=14, spatial_merge_size=2,
        temporal_patch_size=2, out_hidden_size=64, in_channels=3,
        window_size=56, fullatt_block_indexes=[1, 3]),
    image_token_id=img_pad, vision_start_token_id=vis_start,
    vision_end_token_id=vis_end,
)).eval()
q25.save_pretrained(root + "/synth-qwen2.5-vl", safe_serialization=True)
shutil.copy(root + "/qwen_tok.json",
            root + "/synth-qwen2.5-vl/tokenizer.json")

from transformers import MllamaConfig, MllamaForConditionalGeneration
torch.manual_seed(12)
mllama = MllamaForConditionalGeneration(MllamaConfig(
    vision_config=dict(hidden_size=64, num_hidden_layers=2,
        num_global_layers=1, attention_heads=4, image_size=448,
        patch_size=14, max_num_tiles=4, intermediate_size=128,
        intermediate_layers_indices=[0],
        supported_aspect_ratios=[[1,1],[1,2],[1,3],[1,4],[2,1],[2,2],
                                 [3,1],[4,1]],
        vision_output_dim=128, num_channels=3),
    text_config=dict(vocab_size=llama_vocab, hidden_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, rope_theta=500000.0, rms_norm_eps=1e-5,
        max_position_embeddings=4096, cross_attention_layers=[1, 3],
        pad_token_id=0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 8192}),
    image_token_index=mllama_img,
)).eval()
mllama.save_pretrained(root + "/synth-mllama", safe_serialization=True)
shutil.copy(root + "/llama_tok.json", root + "/synth-mllama/tokenizer.json")

from transformers import LlamaConfig, LlamaForCausalLM
torch.manual_seed(13)
llama = LlamaForCausalLM(LlamaConfig(
    vocab_size=llama_vocab, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
    rope_theta=500000.0, rms_norm_eps=1e-5, max_position_embeddings=4096,
)).eval()
llama.save_pretrained(root + "/synth-llama", safe_serialization=True)
shutil.copy(root + "/llama_tok.json", root + "/synth-llama/tokenizer.json")
print("written")
"""

# Pipeline driver (subprocess; clean jax platform + env-driven config).
_DRIVER = """
import json, sys
from pathlib import Path

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; pin CPU the way conftest does.
jax.config.update("jax_platforms", "cpu")

repo = Path(sys.argv[1])
sys.path.insert(0, str(repo))

from vis_tpu.orchestration.graph import run_inspection

state = run_inspection(
    str(repo / "assets" / "sample.jpg"),
    criticality="medium", domain="manufacturing",
)
insp = state["inspector_result"]
aud = state["auditor_result"]
print("RESULT::" + json.dumps({
    "verdict": (state.get("safety_verdict") or {}).get("verdict"),
    "inspector_failed": insp["analysis_failed"],
    "auditor_failed": aud["analysis_failed"],
    "inspector_condition": insp.get("overall_condition"),
    "report": bool(state.get("report_path")),
    "explanation": bool(state.get("explanation")),
}))
"""


def _augment_tokenizer(src: Path, dst: Path, specials: list) -> dict:
    """Copy a trained tokenizer.json adding the family's special tokens;
    returns {token: id} for the added specials."""
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(str(src))
    tok.add_special_tokens(specials)
    tok.save(str(dst))
    return {
        "vocab": tok.get_vocab_size(with_added_tokens=True),
        **{s: tok.token_to_id(s) for s in specials},
    }


@pytest.fixture(scope="module")
def synth_checkpoints(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_ckpts")
    base = TOKENIZERS / "bytelevel_bpe.tokenizer.json"
    qwen = _augment_tokenizer(base, root / "qwen_tok.json", _QWEN_SPECIALS)
    llama = _augment_tokenizer(base, root / "llama_tok.json", _LLAMA_SPECIALS)
    result = subprocess.run(
        [sys.executable, "-c", _GEN, str(root), str(qwen["vocab"]),
         str(llama["vocab"]), str(qwen["<|image_pad|>"]),
         str(qwen["<|vision_start|>"]), str(qwen["<|vision_end|>"]),
         str(llama["<|image|>"])],
        capture_output=True, text=True, timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    return root


class TestSyntheticPipelineE2E:
    def test_full_pipeline_from_checkpoints(self, synth_checkpoints,
                                            tmp_path):
        import os

        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            CHECKPOINT_DIR=str(synth_checkpoints),
            VLM_INSPECTOR_MODEL="synth-qwen2.5-vl",
            VLM_AUDITOR_MODEL="synth-mllama",
            EXPLAINER_MODEL="synth-llama",
            VLM_INSPECTOR_PROVIDER="tpu",
            VLM_AUDITOR_PROVIDER="tpu",
            EXPLAINER_PROVIDER="tpu",
            USE_MOCK_RESPONSES="false",
            CONSTRAINED_JSON="true",
            CONSTRAINED_JSON_MIN_TOKENS="16",
            VLM_INSPECTOR_MAX_TOKENS="48",
            VLM_AUDITOR_MAX_TOKENS="48",
            EXPLAINER_MAX_TOKENS="48",
            # Keep the CPU vision towers small; the resize path and patch
            # geometry are identical at any cap.
            MAX_IMAGE_DIMENSION="224",
            AUDITOR_MAX_IMAGE_DIMENSION="224",
            KV_CACHE_MAX_TOKENS="2048",
            LOG_TO_FILE="false",
            DATABASE_PATH=str(tmp_path / "inspections.db"),
            CHAT_HISTORY_DB=str(tmp_path / "chat.db"),
            UPLOAD_DIR=str(tmp_path / "uploads"),
            REPORT_DIR=str(tmp_path / "reports"),
            LOG_DIR=str(tmp_path / "logs"),
        )
        result = subprocess.run(
            [sys.executable, "-c", _DRIVER, str(REPO)],
            capture_output=True, text=True, timeout=900, env=env,
        )
        assert result.returncode == 0, (
            result.stderr[-3000:] + result.stdout[-500:]
        )
        line = next(
            ln for ln in result.stdout.splitlines()
            if ln.startswith("RESULT::")
        )
        out = json.loads(line[len("RESULT::"):])
        # SUCCESS path: constrained decode over the real vocab parsed for
        # both VLMs (no Gate-0 degradation), verdict + report produced.
        assert out["inspector_failed"] is False
        assert out["auditor_failed"] is False
        assert out["verdict"] in ("SAFE", "UNSAFE", "REQUIRES_HUMAN_REVIEW")
        assert out["report"] is True
        assert out["explanation"] is True
