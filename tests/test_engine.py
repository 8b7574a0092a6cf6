"""Serving-engine tests on CPU with small dev-profile models.

These run the REAL compute path — vision encode, bucketed prefill, KV-cached
streaming decode — with random weights and the byte tokenizer; output text is
meaningless but shapes, determinism, and streaming semantics are the
contract under test.
"""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from vis_tpu.models.common.decoder import DecoderConfig, init_decoder_params
from vis_tpu.models.qwen2_vl.config import Qwen2VLConfig, VisionConfig
from vis_tpu.models.qwen2_vl.model import init_params as init_qwen_params
from vis_tpu.serving.engine import Engine, EngineBackend
from vis_tpu.serving.tokenizer import ByteTokenizer
from vis_tpu.ops.preprocess import preprocess_image, smart_resize


def tiny_text_config():
    return DecoderConfig(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, qkv_bias=False,
        tie_word_embeddings=True, dtype=jnp.float32,
    )


def tiny_vlm_config():
    return Qwen2VLConfig(
        vision=VisionConfig(depth=2, embed_dim=64, num_heads=4, hidden_size=64,
                            dtype=jnp.float32),
        text=DecoderConfig(
            vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128, qkv_bias=True,
            mrope_section=(2, 3, 3), tie_word_embeddings=True,
            dtype=jnp.float32,
        ),
        image_token_id=261, vision_start_token_id=259,
        vision_end_token_id=260, eos_token_id=256,
    )


@pytest.fixture(scope="module")
def text_engine():
    config = tiny_text_config()
    params = init_decoder_params(config, jax.random.PRNGKey(0))
    tok = ByteTokenizer(vocab_size=config.vocab_size)
    return Engine("tiny-text", config, params, tok, max_cache_tokens=512)


@pytest.fixture(scope="module")
def vlm_engine():
    config = tiny_vlm_config()
    params = init_qwen_params(config, jax.random.PRNGKey(1))
    tok = ByteTokenizer(vocab_size=config.text.vocab_size)
    return Engine(
        "tiny-vlm", config.text, None, tok,
        vlm_config=config, vlm_params=params, max_cache_tokens=2048,
    )


@pytest.fixture
def image_file(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(64, 80, 3), dtype=np.uint8)
    path = tmp_path / "img.jpg"
    Image.fromarray(arr).save(path)
    return path


class TestSmartResize:
    def test_divisible_by_factor(self):
        h, w = smart_resize(480, 640)
        assert h % 28 == 0 and w % 28 == 0

    def test_pixel_budget(self):
        h, w = smart_resize(4000, 3000, max_pixels=1024 * 1024)
        assert h * w <= 1024 * 1024
        h2, w2 = smart_resize(10, 10)
        assert h2 * w2 >= 56 * 56

    def test_longest_side_cap(self):
        """The reference's per-agent caps (2048/1024) bound the LONGEST
        side, not just the area: an elongated image inside the pixel
        budget must still be clamped."""
        from vis_tpu.ops.preprocess import clamp_longest_side

        h, w = smart_resize(500, 4000)  # elongated, within area budget
        assert max(h, w) > 1024  # the budget alone does not cap the side
        h2, w2 = clamp_longest_side(h, w, 1024)
        assert max(h2, w2) <= 1024
        assert h2 % 28 == 0 and w2 % 28 == 0
        # No-ops below the cap.
        assert clamp_longest_side(560, 840, 1024) == (560, 840)
        assert clamp_longest_side(560, 840, None) == (560, 840)


class TestPreprocess:
    def test_patch_shapes(self, image_file):
        out = preprocess_image(image_file)
        assert out.patches.shape[1] == 3 * 2 * 14 * 14
        assert out.num_patches == out.grid_h * out.grid_w
        assert out.grid_h % 2 == 0 and out.grid_w % 2 == 0

    def test_matches_hf_processor_layout(self, image_file):
        """Patch values must bit-match the HF Qwen2VL image processor."""
        import subprocess, sys, tempfile, json
        from pathlib import Path

        ours = preprocess_image(image_file, use_native=False)
        script = f"""
import os
os.environ["USE_TF"] = "0"
import numpy as np
from transformers.models.qwen2_vl.image_processing_qwen2_vl import Qwen2VLImageProcessor
from PIL import Image
proc = Qwen2VLImageProcessor()
out = proc(images=Image.open(r"{image_file}"), return_tensors="np")
np.save(r"{image_file}.ref.npy", out["pixel_values"])
np.save(r"{image_file}.grid.npy", out["image_grid_thw"])
"""
        result = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True,
            timeout=300,
        )
        assert result.returncode == 0, result.stderr[-1500:]
        ref = np.load(f"{image_file}.ref.npy")
        grid = np.load(f"{image_file}.grid.npy")
        assert tuple(grid[0]) == (ours.grid_t, ours.grid_h, ours.grid_w)
        np.testing.assert_allclose(ours.patches, ref, atol=2e-3, rtol=1e-3)


class TestNativePreprocess:
    def test_native_matches_python_path(self, image_file):
        from vis_tpu.native import native_available

        if not native_available():
            pytest.skip("native extension not built")
        native = preprocess_image(image_file, use_native=True)
        python = preprocess_image(image_file, use_native=False)
        assert native.patches.shape == python.patches.shape
        assert (native.grid_h, native.grid_w) == (python.grid_h, python.grid_w)
        # Support-scaled bicubic parity within ~1 u8 level RMS.
        diff = np.abs(native.patches - python.patches)
        assert float(diff.mean()) < 0.02
        assert float(diff.max()) < 0.5


class TestTextEngine:
    def test_generate_deterministic(self, text_engine):
        a = text_engine.generate("hello world", max_tokens=8)
        b = text_engine.generate("hello world", max_tokens=8)
        assert a == b  # greedy decode must be reproducible

    def test_streaming_concatenates(self, text_engine):
        chunks = list(text_engine.generate_stream("stream me", max_tokens=8))
        whole = text_engine.generate("stream me", max_tokens=8)
        assert "".join(chunks) == whole

    def test_health_check(self, text_engine):
        assert text_engine.health_check() is True

    def test_backend_adapter(self, text_engine):
        backend = EngineBackend(text_engine)
        assert backend.name == "tpu:tiny-text"
        out = backend.generate("ping", max_tokens=4)
        assert isinstance(out, str)


class TestVLMEngine:
    def test_multimodal_generate(self, vlm_engine, image_file):
        out = vlm_engine.generate(
            "Inspect this.", image_file, max_tokens=8, max_image_dim=256
        )
        assert isinstance(out, str)

    def test_multimodal_deterministic(self, vlm_engine, image_file):
        a = vlm_engine.generate("Check.", image_file, max_tokens=6, max_image_dim=256)
        b = vlm_engine.generate("Check.", image_file, max_tokens=6, max_image_dim=256)
        assert a == b

    def test_image_content_reaches_embeddings(self, vlm_engine, image_file, tmp_path):
        """Different images must produce different vision embeddings (the
        vision path is live end-to-end).  Text-level divergence is not
        asserted: a tiny random decoder legitimately saturates to one token."""
        from vis_tpu.models.qwen2_vl.model import encode_image
        from vis_tpu.models.qwen2_vl.vision import vision_rotary_tables

        rng = np.random.default_rng(9)
        other = tmp_path / "other.jpg"
        Image.fromarray(
            rng.integers(0, 255, size=(64, 80, 3), dtype=np.uint8)
        ).save(other)
        cfg = vlm_engine.vlm_config
        imgs = [
            preprocess_image(p, max_image_dim=256) for p in (image_file, other)
        ]
        embeds = []
        for img in imgs:
            cos, sin = vision_rotary_tables(cfg.vision, img.grid_h, img.grid_w)
            embeds.append(
                encode_image(
                    cfg, vlm_engine.vlm_params, jnp.asarray(img.patches),
                    jnp.asarray(cos), jnp.asarray(sin),
                )
            )
        diff = float(jnp.abs(embeds[0] - embeds[1]).max())
        assert diff > 1e-3


class TestPrefixCaching:
    def test_prefix_hit_matches_cold_prefill(self, monkeypatch):
        """Same tokens out whether the shared prompt head came from the
        prefix cache or a cold prefill, and the second call actually hits."""
        import jax as _jax
        from vis_tpu.models.common.decoder import DecoderConfig, init_decoder_params
        from vis_tpu.serving.engine import Engine
        from vis_tpu.serving.tokenizer import ByteTokenizer
        from vis_tpu.utils.config import get_config

        config = DecoderConfig(
            vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128, qkv_bias=False,
            tie_word_embeddings=True, dtype=jnp.float32,
        )
        params = init_decoder_params(config, _jax.random.PRNGKey(31))
        tok = ByteTokenizer(vocab_size=config.vocab_size)
        engine = Engine("prefix-test", config, params, tok,
                        max_cache_tokens=2048)

        shared_head = "SYSTEM: you are an inspection explainer. " * 12  # >256 tokens
        q1 = shared_head + "Question: is the part safe?"
        q2 = shared_head + "Question: what is the repair cost?"

        cold_q1 = engine.generate(q1, max_tokens=8)
        cold_q2 = engine.generate(q2, max_tokens=8)

        monkeypatch.setenv("PREFIX_CACHING", "true")
        get_config(reload=True)
        try:
            warm_q1 = engine.generate(q1, max_tokens=8)   # populates
            warm_q2 = engine.generate(q2, max_tokens=8)   # hits
            assert getattr(engine, "prefix_hits", 0) >= 1
        finally:
            monkeypatch.delenv("PREFIX_CACHING")
            get_config(reload=True)
        assert warm_q1 == cold_q1
        assert warm_q2 == cold_q2


class TestPrefixFallback:
    def test_suffix_overflow_falls_back_to_full_prefill(self, monkeypatch):
        """A cached prefix whose padded suffix chunk would not fit the
        prompt-only cache must be SKIPPED, not written: extend_scan's
        dynamic_update_slice would clamp backward and overwrite the seeded
        prefix KV (regression: p=128 + s_bucket=512 into a 512-row cache)."""
        import jax as _jax
        from vis_tpu.models.common.decoder import init_decoder_params
        from vis_tpu.utils.config import get_config

        config = tiny_text_config()
        params = init_decoder_params(config, _jax.random.PRNGKey(41))
        tok = ByteTokenizer(vocab_size=config.vocab_size)
        engine = Engine("prefix-overflow", config, params, tok,
                        max_cache_tokens=2048)

        # q1 stores a 256-token prefix entry; q2 shares only ~135 tokens
        # (lookup rounds the common prefix down to 128) and is ~400 tokens
        # total -> suffix 272 -> s_bucket 512; prompt-only cache_len is 512.
        head = "SHARED INSPECTION PREAMBLE " * 5          # 135 chars
        q1 = head + ("alpha " * 35)[:165]                  # ~300 tokens
        q2 = head + ("omega " * 60)[:265]                  # ~400 tokens

        def prompt_logits(prompt):
            cache, logits, _, _, _ = engine._prefill_request(
                prompt, None, max_tokens=8, max_image_dim=None,
                prompt_only_cache=True,
            )
            return np.asarray(logits)

        cold_q2 = prompt_logits(q2)

        monkeypatch.setenv("PREFIX_CACHING", "true")
        get_config(reload=True)
        try:
            engine._prefix_cache = {}
            prompt_logits(q1)                              # populates p=256
            warm_q2 = prompt_logits(q2)                    # hit would overflow
        finally:
            monkeypatch.delenv("PREFIX_CACHING")
            get_config(reload=True)
        np.testing.assert_array_equal(warm_q2, cold_q2)


class TestPatchBucketLaw:
    def test_host_and_device_padded_agree(self, image_file):
        """ONE statement of the bucket law: host ImagePatches.padded and
        DeviceImagePatches.padded must pick the same compiled shape."""
        from vis_tpu.ops.preprocess import patch_bucket_for, PATCH_BUCKETS

        assert patch_bucket_for(1) == PATCH_BUCKETS[0]
        assert patch_bucket_for(256) == 256
        assert patch_bucket_for(257) == 384
        assert patch_bucket_for(16385) == 16640   # past the table: 256-mult
        host = preprocess_image(image_file, max_image_dim=256)
        _, host_bucket = host.padded()
        from vis_tpu.ops.preprocess_device import preprocess_image_device

        dev = preprocess_image_device(image_file, max_image_dim=256)
        _, dev_bucket = dev.padded()
        assert host_bucket == dev_bucket


class TestFlagInteractions:
    """All serving flags ON together must stay token-exact vs defaults:
    the scheduler path ignores PLD (batched decode), prefix caching feeds
    the scheduler hand-off a full-size cache, and the unbatched path
    composes PLD + prefix caching."""

    def test_all_serving_flags_together(self, monkeypatch):
        import jax as _jax
        from vis_tpu.models.common.decoder import DecoderConfig, init_decoder_params
        from vis_tpu.serving.engine import Engine
        from vis_tpu.serving.tokenizer import ByteTokenizer
        from vis_tpu.utils.config import get_config

        config = DecoderConfig(
            vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128, qkv_bias=False,
            tie_word_embeddings=True, dtype=jnp.float32,
        )
        params = init_decoder_params(config, _jax.random.PRNGKey(41))
        tok = ByteTokenizer(vocab_size=config.vocab_size)
        engine = Engine("flags-test", config, params, tok,
                        max_cache_tokens=1024)

        head = "SYSTEM: inspection rules apply. " * 10
        prompts = [head + f"Q{i}: check item {i}." for i in range(3)]
        plain = [engine.generate(p, max_tokens=12) for p in prompts]

        monkeypatch.setenv("SPECULATIVE_DECODING", "pld")
        monkeypatch.setenv("PREFIX_CACHING", "true")
        get_config(reload=True)
        try:
            # Unbatched path: PLD + prefix caching compose.
            combo = [engine.generate(p, max_tokens=12) for p in prompts]
            assert combo == plain

            # Scheduler attached: batched decode takes over, prefix caching
            # still feeds the (full-size) hand-off cache.
            engine.attach_scheduler(num_slots=2)
            try:
                sched = [engine.generate(p, max_tokens=12) for p in prompts]
            finally:
                engine.detach_scheduler()
            assert sched == plain
        finally:
            monkeypatch.delenv("SPECULATIVE_DECODING")
            monkeypatch.delenv("PREFIX_CACHING")
            get_config(reload=True)
