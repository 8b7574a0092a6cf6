"""End-to-end checkpoint loading: HF-format directories (model.safetensors +
config.json, as `save_pretrained` writes them) -> build_engine -> generate.

Checkpoints are written by HF torch in a subprocess (torch+jax deadlock when
mixed in-process here).  The point under test is the production loading
path: find_checkpoint, config.json-driven shape derivation (any model size,
no name presets), safetensors merging, weight conversion, tokenizer
fallback — reference parity: the reference fetched models by remote API id
(src/agents/vlm_inspector.py:32); here a local checkout is the source of
truth.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

_GEN = """
import os
os.environ["USE_TF"] = "0"
os.environ["TRANSFORMERS_VERBOSITY"] = "error"
import sys, torch
root = sys.argv[1]

from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration
torch.manual_seed(0)
qwen = Qwen2VLForConditionalGeneration(Qwen2VLConfig(
    text_config=dict(vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        rope_theta=1000000.0, max_position_embeddings=512, rms_norm_eps=1e-6,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]}),
    vision_config=dict(depth=2, embed_dim=64, num_heads=4, mlp_ratio=4,
        patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
        hidden_size=64, in_channels=3),
    image_token_id=7, vision_start_token_id=5, vision_end_token_id=6,
)).eval()
qwen.save_pretrained(root + "/tiny-qwen2-vl", safe_serialization=True)

from transformers import LlamaConfig, LlamaForCausalLM
torch.manual_seed(1)
llama = LlamaForCausalLM(LlamaConfig(
    vocab_size=256, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
    rope_theta=500000.0, rms_norm_eps=1e-5, max_position_embeddings=512,
    rope_scaling={"rope_type": "llama3", "factor": 8.0,
                  "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                  "original_max_position_embeddings": 8192},
)).eval()
llama.save_pretrained(root + "/tiny-llama", safe_serialization=True)

from transformers import MllamaConfig, MllamaForConditionalGeneration
torch.manual_seed(3)
mllama = MllamaForConditionalGeneration(MllamaConfig(
    vision_config=dict(hidden_size=64, num_hidden_layers=2,
        num_global_layers=1, attention_heads=4, image_size=448,
        patch_size=14, max_num_tiles=4, intermediate_size=128,
        intermediate_layers_indices=[0],
        supported_aspect_ratios=[[1,1],[1,2],[1,3],[1,4],[2,1],[2,2],[3,1],[4,1]],
        vision_output_dim=128, num_channels=3),
    text_config=dict(vocab_size=256, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        rope_theta=500000.0, rms_norm_eps=1e-5, max_position_embeddings=512,
        cross_attention_layers=[1, 3], pad_token_id=0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 8192}),
    image_token_index=250,
)).eval()
mllama.save_pretrained(root + "/tiny-mllama-vision", safe_serialization=True)

from transformers import Qwen2_5_VLConfig, Qwen2_5_VLForConditionalGeneration
torch.manual_seed(5)
q25 = Qwen2_5_VLForConditionalGeneration(Qwen2_5_VLConfig(
    text_config=dict(vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        rope_theta=1000000.0, max_position_embeddings=512, rms_norm_eps=1e-6,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]}),
    vision_config=dict(depth=4, hidden_size=64, intermediate_size=128,
        num_heads=4, patch_size=14, spatial_merge_size=2,
        temporal_patch_size=2, out_hidden_size=64, in_channels=3,
        window_size=56, fullatt_block_indexes=[1, 3]),
    image_token_id=7, vision_start_token_id=5, vision_end_token_id=6,
)).eval()
q25.save_pretrained(root + "/tiny-qwen2.5-vl", safe_serialization=True)
print("written")
"""


@pytest.fixture(scope="module")
def checkpoint_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpts")
    result = subprocess.run(
        [sys.executable, "-c", _GEN, str(root)],
        capture_output=True, text=True, timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    return root


@pytest.fixture
def engines_from(checkpoint_root, monkeypatch):
    monkeypatch.setenv("CHECKPOINT_DIR", str(checkpoint_root))
    from vis_tpu.utils.config import get_config

    get_config(reload=True)
    yield checkpoint_root
    monkeypatch.delenv("CHECKPOINT_DIR")
    get_config(reload=True)


class TestCheckpointE2E:
    def test_qwen2vl_loads_and_generates(self, engines_from):
        from vis_tpu.serving.engine import build_engine

        engine = build_engine("inspector", "tiny-qwen2-vl")
        # Shapes came from config.json, not a preset.
        assert engine.text_config.hidden_size == 64
        assert engine.text_config.num_layers == 2
        assert engine.text_config.mrope_section == (2, 3, 3)
        assert engine.vlm_config.image_token_id == 7

        # Weights really loaded: final_norm equals the checkpoint tensor.
        from safetensors import safe_open

        ckpt = engines_from / "tiny-qwen2-vl"
        with safe_open(str(next(ckpt.glob("*.safetensors"))), framework="numpy") as fh:
            key = next(k for k in fh.keys() if k.endswith("norm.weight")
                       and "layers" not in k and "visual" not in k)
            ref = fh.get_tensor(key)
        ours = np.asarray(engine.vlm_params["text"]["final_norm"], np.float32)
        np.testing.assert_allclose(ours, ref, atol=1e-2)

        out_a = engine.generate("inspect the part", max_tokens=5)
        out_b = engine.generate("inspect the part", max_tokens=5)
        assert out_a == out_b  # greedy + loaded weights -> deterministic

    def test_llama_loads_and_generates(self, engines_from):
        from vis_tpu.serving.engine import build_engine

        engine = build_engine("explainer", "tiny-llama")
        assert engine.text_config.num_layers == 2
        assert engine.text_config.rope_scaling_dict["rope_type"] == "llama3"
        out = engine.generate("explain the verdict", max_tokens=5)
        assert isinstance(out, str)

    def test_mllama_loads_with_config_layers(self, engines_from):
        from vis_tpu.serving.engine import build_engine

        engine = build_engine("auditor", "tiny-mllama-vision")
        assert engine.config.cross_attention_layers == (1, 3)
        assert engine.config.text.num_layers == 4
        assert engine.config.image_token_id == 250
        out = engine.generate("audit the part", max_tokens=5)
        assert isinstance(out, str)

    def test_missing_checkpoint_falls_back_to_dev_profile(self, engines_from):
        from vis_tpu.serving.engine import build_engine

        engine = build_engine("explainer", "no/such-model")
        assert engine.name.startswith("dev-")
        assert engine.generate("hello", max_tokens=4) == engine.generate(
            "hello", max_tokens=4
        )

    def test_qwen25vl_loads_and_generates(self, engines_from):
        """Qwen2.5-VL checkpoints route through the window-attention tower;
        shapes (incl. window config) come from config.json."""
        from PIL import Image

        from vis_tpu.serving.engine import build_engine

        engine = build_engine("inspector", "tiny-qwen2.5-vl")
        assert engine._is_qwen25
        assert engine.vlm_config.vision.window_size == 56
        assert engine.vlm_config.vision.fullatt_block_indexes == (1, 3)
        assert engine.text_config.mrope_section == (2, 3, 3)

        import tempfile

        with tempfile.TemporaryDirectory() as td:
            path = Path(td) / "probe.png"
            Image.fromarray(
                np.random.default_rng(7).integers(
                    0, 255, (120, 200, 3), dtype=np.uint8
                )
            ).save(path)
            out = engine.generate("inspect", path, max_tokens=5,
                                  max_image_dim=128)
        assert isinstance(out, str)
