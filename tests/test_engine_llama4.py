"""Llama4Engine serving tests: prefill + chunked decode over the MoE
decoder, placeholder-merged vision, EP-sharded token-exactness.

The reference auditor tries Llama-4-Maverick FIRST (src/agents/
vlm_auditor.py:34-56) and falls back to Llama-3.2-Vision; this file covers
the serving path of that primary family (VERDICT r4 #8).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vis_tpu.models.llama4.config import (  # noqa: E402
    Llama4Config,
    Llama4TextConfig,
    Llama4VisionConfig,
)
from vis_tpu.models.llama4.model import init_params  # noqa: E402
from vis_tpu.serving.engine_llama4 import Llama4Engine  # noqa: E402
from vis_tpu.serving.tokenizer import ByteTokenizer  # noqa: E402


def _cfg() -> Llama4Config:
    # Tiny but pattern-complete: dense/MoE interleave, one NoPE layer,
    # chunked attention; vocab >= 262 so ByteTokenizer ids fit.
    return Llama4Config(
        text=Llama4TextConfig(
            vocab_size=512, hidden_size=64, num_layers=4, num_heads=4,
            num_kv_heads=2, head_dim=16, intermediate_size=112,
            intermediate_size_mlp=160, num_experts=4, top_k=2,
            interleave_moe_layer_step=2, nope_interval=4,
            attention_chunk_size=64, dtype=jnp.float32,
        ),
        vision=Llama4VisionConfig(
            image_size=56, patch_size=14, hidden_size=32, num_layers=2,
            num_heads=2, intermediate_size=128, pixel_shuffle_ratio=0.5,
            projector_input_dim=48, projector_output_dim=48,
            vision_output_dim=48, dtype=jnp.float32,
        ),
    )


@pytest.fixture(scope="module")
def engine():
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(3))
    tok = ByteTokenizer(vocab_size=cfg.text.vocab_size)
    return Llama4Engine("test-llama4", cfg, params, tok,
                        max_cache_tokens=512)


def test_text_only_generate(engine):
    out = engine.generate("audit the weld", max_tokens=12)
    assert isinstance(out, str)
    assert engine.last_decode_tokens is not None
    assert 0 <= engine.last_decode_tokens <= 12


def test_generate_deterministic(engine):
    a = engine.generate("check casting", max_tokens=10)
    b = engine.generate("check casting", max_tokens=10)
    assert a == b


def test_image_generate_uses_vision(engine, tmp_path):
    from PIL import Image

    img = tmp_path / "frame.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (80, 60, 3), dtype=np.uint8)
    ).save(img)
    out = engine.generate("inspect", image_path=img, max_tokens=8)
    assert isinstance(out, str)
    # A different image must change the prefill (features merged at
    # placeholders actually reach the decoder).
    img2 = tmp_path / "frame2.png"
    Image.fromarray(
        np.random.default_rng(9).integers(0, 255, (80, 60, 3), dtype=np.uint8)
    ).save(img2)
    out2 = engine.generate("inspect", image_path=img2, max_tokens=8)
    text_only = engine.generate("inspect", max_tokens=8)
    assert out != text_only or out2 != text_only


def test_json_mode_parses(engine):
    import json

    out = engine.generate("report as json", max_tokens=96, json_mode=True)
    json.loads(out)


def test_weight_bytes_exclude_vision_and_embed(engine):
    per_pass = engine.weight_bytes_per_pass
    assert per_pass > 0
    total = sum(
        leaf.nbytes for leaf in jax.tree_util.tree_leaves(engine.params)
    )
    assert per_pass < total  # vision + embedding excluded


def test_ep_sharded_engine_token_exact(engine):
    """Engine decode with expert-parallel sharded weights matches the
    unsharded engine token for token (the dryrun_multichip EP leg's
    pytest twin)."""
    from jax.sharding import Mesh

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    from vis_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(3))
    tok = ByteTokenizer(vocab_size=cfg.text.vocab_size)
    mesh = Mesh(
        np.array(jax.devices()[:4]).reshape(1, 4), (DATA_AXIS, MODEL_AXIS)
    )
    ep = Llama4Engine("test-llama4-ep", cfg, params, tok,
                      max_cache_tokens=512, mesh=mesh)
    gate_up = ep.params["layers"][1]["moe"]["gate_up"]
    assert gate_up.sharding.spec[0] == MODEL_AXIS

    prompt = "audit the casting for porosity"
    assert engine.generate(prompt, max_tokens=12) == ep.generate(
        prompt, max_tokens=12
    )
