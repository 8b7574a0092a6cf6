"""Ulysses sequence parallelism for the vision encoder: SP output must equal
the single-device vision_forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vis_tpu.models.qwen2_vl.config import VisionConfig
from vis_tpu.models.qwen2_vl.vision import (
    init_vision_params,
    vision_forward,
    vision_rotary_tables,
)
from vis_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from vis_tpu.parallel.sp import vision_forward_sp


@pytest.fixture(scope="module")
def setup():
    config = VisionConfig(
        depth=2, embed_dim=64, num_heads=4, mlp_ratio=4, patch_size=14,
        spatial_merge_size=2, hidden_size=64, dtype=jnp.float32,
    )
    params = init_vision_params(config, jax.random.PRNGKey(7))
    return config, params


def _mesh(n):
    devices = np.array(jax.devices()[:n]).reshape(1, n)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sp_matches_single_device(setup, n_shards):
    config, params = setup
    grid_h, grid_w = 8, 8  # 64 patches, divisible by 4 shards * merge 4
    seq = grid_h * grid_w
    cos, sin = vision_rotary_tables(config, grid_h, grid_w)
    rng = np.random.default_rng(1)
    patches = rng.standard_normal((seq, config.patch_input_dim)).astype(np.float32)

    ref = np.asarray(
        vision_forward(config, params, jnp.asarray(patches),
                       jnp.asarray(cos), jnp.asarray(sin), use_flash=False)
    )
    out = np.asarray(
        vision_forward_sp(config, params, jnp.asarray(patches),
                          jnp.asarray(cos), jnp.asarray(sin), _mesh(n_shards))
    )
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_sp_respects_padding_mask(setup):
    config, params = setup
    grid_h, grid_w = 8, 8
    seq = grid_h * grid_w
    cos, sin = vision_rotary_tables(config, grid_h, grid_w)
    rng = np.random.default_rng(2)
    patches = rng.standard_normal((seq, config.patch_input_dim)).astype(np.float32)
    n_valid = 48

    ref = np.asarray(
        vision_forward(config, params, jnp.asarray(patches), jnp.asarray(cos),
                       jnp.asarray(sin), num_patches=jnp.int32(n_valid),
                       use_flash=False)
    )
    out = np.asarray(
        vision_forward_sp(config, params, jnp.asarray(patches),
                          jnp.asarray(cos), jnp.asarray(sin), _mesh(4),
                          num_patches=jnp.int32(n_valid))
    )
    valid_merged = n_valid // config.merge_unit
    np.testing.assert_allclose(
        out[:valid_merged], ref[:valid_merged], atol=2e-4, rtol=2e-4
    )


class TestServingSPReachable:
    """VISION_PARALLEL=sp routes the ENGINE's vision prefill through the
    Ulysses path (SURVEY §5.7: SP must be reachable from serving)."""

    def test_engine_vision_sp(self, tmp_path, monkeypatch):
        from PIL import Image

        from vis_tpu.models.common.decoder import DecoderConfig
        from vis_tpu.models.qwen2_vl.config import Qwen2VLConfig
        from vis_tpu.models.qwen2_vl.model import init_params
        from vis_tpu.serving.engine import Engine
        from vis_tpu.serving.tokenizer import ByteTokenizer
        from vis_tpu.utils.config import config as app_config

        cfg = Qwen2VLConfig(
            vision=VisionConfig(depth=2, embed_dim=64, num_heads=4,
                                hidden_size=64, dtype=jnp.float32),
            text=DecoderConfig(
                vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                num_kv_heads=2, intermediate_size=128, qkv_bias=True,
                mrope_section=(2, 3, 3), tie_word_embeddings=True,
                dtype=jnp.float32,
            ),
            image_token_id=261, vision_start_token_id=259,
            vision_end_token_id=260, eos_token_id=256,
        )
        params = init_params(cfg, jax.random.PRNGKey(0))
        tok = ByteTokenizer(vocab_size=cfg.text.vocab_size)
        img = Image.fromarray(
            np.random.default_rng(5).integers(
                0, 255, (120, 200, 3), dtype=np.uint8
            )
        )
        path = tmp_path / "sp_probe.png"
        img.save(path)

        plain = Engine("sp-ref", cfg.text, None, tok, vlm_config=cfg,
                       vlm_params=init_params(cfg, jax.random.PRNGKey(0)),
                       max_cache_tokens=2048)
        ref = plain.generate("inspect", path, max_tokens=8, max_image_dim=128)

        monkeypatch.setattr(app_config, "vision_parallel", "sp")
        mesh = _mesh(4)
        sp_engine = Engine("sp-serve", cfg.text, None, tok, vlm_config=cfg,
                           vlm_params=params, max_cache_tokens=2048,
                           mesh=mesh)
        assert sp_engine._vision_sp, "SP vision path must be selected"
        out = sp_engine.generate("inspect", path, max_tokens=8,
                                 max_image_dim=128)
        # SP numerics match to collective-reassociation tolerance; at this
        # tiny scale greedy tokens stay identical.
        assert out == ref
