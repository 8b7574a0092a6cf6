"""Qwen2.5-VL numerics vs the HF torch reference (CPU, tiny config).

The 2.5 vision tower differs from 2.0 (RMSNorm, SwiGLU-with-bias MLPs,
WINDOW attention with full-attention blocks, window-index reordering);
references come from tests/hf_reference_gen_25.py in a subprocess.
The grid (6x6 patches -> llm grid 3x3, window 2x2 cells) forces PARTIAL
edge windows, exercising the padded-window masking.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from vis_tpu.models.common.layers import causal_mask
from vis_tpu.models.common.decoder import decoder_forward, lm_logits
from vis_tpu.models.qwen2_5_vl import (
    Qwen25VLConfig,
    convert_hf_state_dict,
    vision_forward_25,
    window_layout,
)
from vis_tpu.models.qwen2_vl.model import embed_multimodal
from vis_tpu.ops.preprocess import build_mrope_positions

ATOL = 2e-4
GRID_H = GRID_W = 6


@pytest.fixture(scope="session")
def ref25(tmp_path_factory):
    out = tmp_path_factory.mktemp("hf_ref25") / "qwen25vl_ref.npz"
    script = Path(__file__).parent / "hf_reference_gen_25.py"
    result = subprocess.run(
        [sys.executable, str(script), str(out)],
        capture_output=True, text=True, timeout=600,
    )
    if result.returncode != 0:
        pytest.fail(f"HF reference generation failed:\n{result.stderr[-2000:]}")
    return np.load(out)


@pytest.fixture(scope="session")
def jx25(ref25):
    config = Qwen25VLConfig.tiny()
    state_dict = {
        key[4:]: ref25[key] for key in ref25.files if key.startswith("sd::")
    }
    params = convert_hf_state_dict(state_dict, config)
    return config, params


def _encode(config, params, patches, num_patches=None, min_len=0):
    layout = window_layout(
        config.vision, GRID_H, GRID_W,
        min_len=min_len, src_len=patches.shape[0],
    )
    return vision_forward_25(
        config.vision, params["vision"], jnp.asarray(patches),
        jnp.asarray(layout.gather_patch), jnp.asarray(layout.valid),
        jnp.asarray(layout.cos), jnp.asarray(layout.sin),
        jnp.asarray(layout.inv_merged), jnp.asarray(layout.inv_patch),
        num_patches=num_patches, use_flash=False,
    )


class TestVisionTower25:
    def test_vision_embeddings_match(self, ref25, jx25):
        config, params = jx25
        ours = np.asarray(_encode(config, params, ref25["patches"]))
        assert ours.shape == ref25["vision_out"].shape
        np.testing.assert_allclose(
            ours, ref25["vision_out"], atol=ATOL, rtol=1e-3
        )

    def test_bucket_padding_is_transparent(self, ref25, jx25):
        """Extra fully-masked windows (bucket padding) must not change the
        valid outputs."""
        config, params = jx25
        patches = ref25["patches"]
        base = np.asarray(_encode(config, params, patches))
        wp = config.vision.window_patches
        padded_src = np.zeros((128, patches.shape[1]), np.float32)
        padded_src[: patches.shape[0]] = patches
        out = np.asarray(_encode(
            config, params, padded_src,
            num_patches=jnp.int32(patches.shape[0]),
            min_len=((GRID_H * GRID_W // wp + 4) * wp),
        ))
        np.testing.assert_allclose(out[: base.shape[0]], base, atol=1e-5)


class TestMultimodal25:
    def test_full_multimodal_logits_match(self, ref25, jx25):
        config, params = jx25
        ids = ref25["mm_ids"]
        vision = _encode(config, params, ref25["patches"])
        n_vision = (GRID_H * GRID_W) // 4
        embeds = embed_multimodal(
            config, params, jnp.asarray(ids), vision[:n_vision]
        )
        prefix_len = int(np.argmax(ids[0] == config.image_token_id))
        suffix_len = ids.shape[1] - prefix_len - n_vision
        positions, _ = build_mrope_positions(
            prefix_len, GRID_H, GRID_W, suffix_len
        )
        hidden, _ = decoder_forward(
            config.text, params["text"], embeds,
            jnp.asarray(positions)[:, None, :],
            mask=causal_mask(ids.shape[1], ids.shape[1]),
        )
        ours = np.asarray(lm_logits(config.text, params["text"], hidden))
        np.testing.assert_allclose(
            ours, ref25["mm_logits"], atol=ATOL, rtol=1e-3
        )

    def test_text_only_logits_match(self, ref25, jx25):
        config, params = jx25
        ids = ref25["text_ids"]
        b, s = ids.shape
        positions = np.broadcast_to(np.arange(s)[None], (b, s)).copy()
        embeds = jnp.take(
            params["text"]["embed_tokens"], jnp.asarray(ids), axis=0
        )
        hidden, _ = decoder_forward(
            config.text, params["text"], embeds, jnp.asarray(positions),
            mask=causal_mask(s, s),
        )
        ours = np.asarray(lm_logits(config.text, params["text"], hidden))
        np.testing.assert_allclose(
            ours, ref25["text_logits"], atol=ATOL, rtol=1e-3
        )


class TestQwen25Engine:
    def test_engine_generate_with_image(self, tmp_path, monkeypatch):
        """The serving engine routes Qwen2.5-VL through the window-attention
        tower (build_engine name detection -> dev profile here)."""
        from PIL import Image

        from vis_tpu.serving.engine import build_engine

        monkeypatch.setenv("CHECKPOINT_DIR", str(tmp_path / "none"))
        from vis_tpu.utils.config import get_config

        get_config(reload=True)
        try:
            engine = build_engine("inspector", "Qwen/Qwen2.5-VL-7B-Instruct")
            assert engine._is_qwen25
            img = Image.fromarray(
                np.random.default_rng(9).integers(
                    0, 255, (120, 200, 3), dtype=np.uint8
                )
            )
            path = tmp_path / "q25.png"
            img.save(path)
            out = engine.generate("inspect", path, max_tokens=8,
                                  max_image_dim=128)
            assert isinstance(out, str)
            again = engine.generate("inspect", path, max_tokens=8,
                                    max_image_dim=128)
            assert out == again  # deterministic greedy
            json_out = engine.generate("inspect json", path, max_tokens=48,
                                       json_mode=True, max_image_dim=128)
            import json as _json

            assert isinstance(_json.loads(json_out), dict)
        finally:
            monkeypatch.delenv("CHECKPOINT_DIR")
            get_config(reload=True)
