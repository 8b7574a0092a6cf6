"""Mllama serving-engine tests (CPU, tiny dev-profile model)."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from vis_tpu.models.common.decoder import DecoderConfig
from vis_tpu.models.llama.mllama import MllamaConfig, MllamaVisionConfig, init_params
from vis_tpu.ops.preprocess_mllama import (
    SUPPORTED_ASPECT_RATIOS,
    preprocess_image_mllama,
    select_aspect_ratio,
)
from vis_tpu.serving.engine_mllama import MllamaEngine
from vis_tpu.serving.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def engine():
    config = MllamaConfig(
        vision=MllamaVisionConfig(
            hidden_size=64, num_layers=2, num_global_layers=1,
            attention_heads=4, image_size=448, patch_size=14, max_num_tiles=4,
            intermediate_size=128, intermediate_layers_indices=(0,),
            num_aspect_ratios=8, dtype=jnp.float32,
        ),
        text=DecoderConfig(
            vocab_size=512, hidden_size=64, num_layers=4, num_heads=4,
            num_kv_heads=2, intermediate_size=128, qkv_bias=False,
            rms_norm_eps=1e-5, tie_word_embeddings=True, dtype=jnp.float32,
        ),
        cross_attention_layers=(1, 3),
        image_token_id=261, eos_token_id=256,
    )
    params = init_params(config, jax.random.PRNGKey(11))
    tok = ByteTokenizer(vocab_size=config.text.vocab_size)
    return MllamaEngine("tiny-mllama", config, params, tok,
                        max_cache_tokens=512)


@pytest.fixture
def image_file(tmp_path):
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 255, size=(300, 500, 3), dtype=np.uint8)
    path = tmp_path / "part.jpg"
    Image.fromarray(arr).save(path)
    return path


class TestTiling:
    def test_aspect_ratio_selection(self):
        assert select_aspect_ratio(448, 448) == (1, 1)
        assert select_aspect_ratio(1600, 400) in ((1, 4), (1, 3))
        assert select_aspect_ratio(400, 1600) in ((4, 1), (3, 1))

    def test_tiles_shape_and_id(self, image_file):
        out = preprocess_image_mllama(image_file)
        assert out.tiles.shape[1:] == (3, 448, 448)
        assert out.tiles.shape[0] == out.num_tiles
        assert 1 <= out.aspect_ratio_id <= len(SUPPORTED_ASPECT_RATIOS)

    def test_tile_values_normalized(self, image_file):
        out = preprocess_image_mllama(image_file)
        assert np.isfinite(out.tiles).all()
        assert out.tiles.std() > 0.1  # normalized pixel data, not zeros


class TestMllamaEngine:
    def test_text_only_generate(self, engine):
        a = engine.generate("audit this", max_tokens=6)
        b = engine.generate("audit this", max_tokens=6)
        assert a == b

    def test_multimodal_generate(self, engine, image_file):
        out = engine.generate("Audit the image.", image_file, max_tokens=6)
        assert isinstance(out, str)

    def test_image_reaches_cross_attention(self, engine, image_file, tmp_path):
        """Different images must change the cross-KV (vision path live)."""
        rng = np.random.default_rng(5)
        other = tmp_path / "other.jpg"
        Image.fromarray(
            rng.integers(0, 255, size=(300, 500, 3), dtype=np.uint8)
        ).save(other)
        kvs = []
        for path in (image_file, other):
            tiles = preprocess_image_mllama(path)
            feats = engine._vision_jit(
                engine.params, jnp.asarray(tiles.tiles),
                jnp.asarray(tiles.aspect_ratio_id),
                jnp.asarray(tiles.tile_mask),
            )
            kvs.append(engine._cross_kv_jit(engine.params, feats))
        diff = float(jnp.abs(kvs[0][0][0] - kvs[1][0][0]).max())
        assert diff > 1e-3

    def test_health_check(self, engine):
        assert engine.health_check() is True

    def test_no_prompt_room_fails_loudly(self, engine):
        """budget <= 1 must raise, not silently mis-truncate: ids[:0] +
        ids[-0:] is the FULL prompt, and the decode cursor then walks past
        cache_len into clamped-slice garbage (Engine raises the same way)."""
        with pytest.raises(RuntimeError, match="no prompt room"):
            engine.generate("audit this part",
                            max_tokens=engine.max_cache_tokens - 1)


class TestTilingHFParity:
    # Shapes hitting distinct code paths: wide landscape (no-resize +
    # horizontal pad), already-fits square, tiny upscale-to-tile, huge
    # downscale, and a tall portrait arrangement.
    SHAPES = [(300, 500), (448, 448), (100, 160), (2000, 3000), (900, 400)]

    def test_tiles_match_hf_processor(self, tmp_path):
        """Tile pixel values, aspect-ratio id, and tile count must match the
        HF Mllama image processor exactly (subprocess — torch+JAX deadlock
        in-process here).  The processor is configured like the real
        Llama-3.2-Vision checkpoint: bilinear resample, CLIP mean/std."""
        import subprocess, sys

        rng = np.random.default_rng(4)
        paths = []
        for h, w in self.SHAPES:
            arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            p = tmp_path / f"part_{h}x{w}.png"  # lossless: exact pixels
            Image.fromarray(arr).save(p)
            paths.append(p)

        script = f"""
import os
os.environ["USE_TF"] = "0"
import numpy as np
from transformers.models.mllama.image_processing_mllama import MllamaImageProcessor
from PIL import Image
proc = MllamaImageProcessor(
    size={{"height": 448, "width": 448}}, max_image_tiles=4,
    image_mean=[0.48145466, 0.4578275, 0.40821073],
    image_std=[0.26862954, 0.26130258, 0.27577711],
)
for path in {[str(p) for p in paths]!r}:
    out = proc(images=Image.open(path), return_tensors="np")
    np.save(path + ".tiles.npy", out["pixel_values"])
    np.save(path + ".ar.npy", out["aspect_ratio_ids"])
    np.save(path + ".mask.npy", out["aspect_ratio_mask"])
"""
        result = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True,
            timeout=300,
        )
        assert result.returncode == 0, result.stderr[-1500:]

        for path in paths:
            ref_tiles = np.load(f"{path}.tiles.npy")[0, 0]
            ref_ar = int(np.load(f"{path}.ar.npy")[0, 0])
            ref_mask = np.load(f"{path}.mask.npy")[0, 0]

            ours = preprocess_image_mllama(path)
            assert ours.aspect_ratio_id == ref_ar, path.name
            n = int(ref_mask.sum())
            assert ours.num_tiles == n, path.name
            diff = np.abs(ours.tiles - ref_tiles[:n])
            assert float(diff.max()) < 1e-4, (path.name, float(diff.max()))


class TestDeviceTiling:
    """Device tiling path (DEVICE_PREPROCESS=true): the pixel work runs as
    one jit program on device; only the shared u8 frame leaves the host."""

    # Same code-path spread as TestTilingHFParity: no-resize + pad,
    # exact-fit, upscale-to-tile, large downscale, portrait.
    SHAPES = [(300, 500), (448, 448), (100, 160), (2000, 3000), (900, 400)]

    def test_matches_host_reference(self, tmp_path):
        from vis_tpu.ops.preprocess_mllama_device import (
            preprocess_image_mllama_device,
        )

        rng = np.random.default_rng(7)
        for h, w in self.SHAPES:
            arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            path = tmp_path / f"dev_{h}x{w}.png"
            Image.fromarray(arr).save(path)

            host = preprocess_image_mllama(path)
            dev = preprocess_image_mllama_device(path)
            assert dev.aspect_ratio_id == host.aspect_ratio_id, path.name
            assert dev.num_tiles == host.num_tiles, path.name
            dt = np.asarray(dev.tiles)
            assert dt.shape == host.tiles.shape
            diff = np.abs(dt - host.tiles)
            resized = (h, w) not in ((300, 500), (448, 448))
            if resized:
                # PIL fixed-point bilinear vs f32 matmul: a couple of u8
                # levels at most, ~0.015 normalized per level.
                assert float(diff.max()) < 0.08, (path.name, float(diff.max()))
                assert float(diff.mean()) < 0.01, (path.name, float(diff.mean()))
            else:
                # No resample on this path — identical math, exact.
                assert float(diff.max()) < 1e-5, (path.name, float(diff.max()))

    def test_engine_uses_device_tiles(self, engine, image_file, monkeypatch):
        """With DEVICE_PREPROCESS on, the auditor engine routes through the
        device tiling path and still generates."""
        from vis_tpu.utils.config import config as app_config

        monkeypatch.setattr(app_config, "device_preprocess", True)
        out = engine.generate("inspect", image_path=image_file, max_tokens=4)
        assert isinstance(out, str)


class TestMllamaQuantized:
    def test_int8_engine_generates_deterministically(self, monkeypatch, tmp_path):
        """QUANTIZATION=int8 quantizes the Mllama text stack (required to
        fit the 11B auditor on one chip); outputs stay deterministic and the
        multimodal path still runs."""
        monkeypatch.setenv("QUANTIZATION", "int8")
        from vis_tpu.utils.config import get_config

        get_config(reload=True)
        try:
            config = MllamaConfig(
                vision=MllamaVisionConfig(
                    hidden_size=64, num_layers=2, num_global_layers=1,
                    attention_heads=4, image_size=448, patch_size=14,
                    max_num_tiles=4, intermediate_size=128,
                    intermediate_layers_indices=(0,), num_aspect_ratios=8,
                    dtype=jnp.float32,
                ),
                text=DecoderConfig(
                    vocab_size=512, hidden_size=64, num_layers=4, num_heads=4,
                    num_kv_heads=2, intermediate_size=128, qkv_bias=False,
                    rms_norm_eps=1e-5, tie_word_embeddings=True,
                    dtype=jnp.float32,
                ),
                cross_attention_layers=(1, 3),
                image_token_id=261, eos_token_id=256,
            )
            params = init_params(config, jax.random.PRNGKey(17))
            tok = ByteTokenizer(vocab_size=config.text.vocab_size)
            q8 = MllamaEngine("tiny-mllama-q8", config, params, tok,
                              max_cache_tokens=512)
            from vis_tpu.ops.quantized import QuantizedWeight

            # Single-device engines fuse Q/K/V before quantizing (layer 0
            # is a self layer; cross layers at 1,3 keep q_proj separate).
            assert isinstance(
                q8.params["text"]["layers"][0]["qkv_proj"], QuantizedWeight
            )
            assert isinstance(
                q8.params["text"]["layers"][1]["q_proj"], QuantizedWeight
            )
            a = q8.generate("audit this", max_tokens=6)
            b = q8.generate("audit this", max_tokens=6)
            assert a == b

            rng = np.random.default_rng(9)
            img = tmp_path / "p.jpg"
            Image.fromarray(
                rng.integers(0, 255, size=(300, 500, 3), dtype=np.uint8)
            ).save(img)
            out = q8.generate("Audit the image.", img, max_tokens=6)
            assert isinstance(out, str)
        finally:
            monkeypatch.delenv("QUANTIZATION")
            get_config(reload=True)
