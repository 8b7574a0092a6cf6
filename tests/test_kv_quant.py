"""int8 KV cache (KV_QUANTIZATION=int8) tests.

Format: K/V rows quantized per (token, kv-head), bf16 scales packed into
one extra head row of the same int8 array (models/common/layers.py
encode_kv/decode_kv) — cache shape [L, B, S, H+1, D] int8.  Because the
scales travel inside the buffer, every carry/donation/insert/page path is
format-agnostic; these tests pin the codec and the end-to-end serving
behavior under quantized KV.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vis_tpu.models.common.decoder import DecoderConfig, init_decoder_params
from vis_tpu.models.common.layers import (
    KVCache,
    decode_kv,
    encode_kv,
    kv_store_heads,
)
from vis_tpu.serving.engine import Engine
from vis_tpu.serving.scheduler import ContinuousBatchingScheduler
from vis_tpu.serving.tokenizer import ByteTokenizer
from vis_tpu.utils.config import config as app_config


def _tiny_config():
    return DecoderConfig(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, qkv_bias=False,
        tie_word_embeddings=True, dtype=jnp.float32,
    )


class TestCodec:
    def test_roundtrip_error_below_one_percent(self):
        x = jax.random.normal(
            jax.random.PRNGKey(0), (3, 17, 4, 128), jnp.float32
        ) * 2.5
        enc = encode_kv(x, jnp.int8)
        assert enc.shape == (3, 17, 5, 128) and enc.dtype == jnp.int8
        dec = decode_kv(enc, jnp.float32, 4)
        rel = jnp.max(jnp.abs(dec - x)) / jnp.max(jnp.abs(x))
        assert float(rel) < 0.01

    def test_float_passthrough_identity(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 2, 16))
        enc = encode_kv(x, jnp.float32)
        assert enc.shape == x.shape
        np.testing.assert_array_equal(
            np.asarray(decode_kv(enc, jnp.float32, 2)), np.asarray(x)
        )

    def test_store_heads(self):
        assert kv_store_heads(8, jnp.int8) == 9
        assert kv_store_heads(8, jnp.bfloat16) == 8

    def test_create_allocates_scale_row(self):
        cache = KVCache.create(2, 1, 64, 2, 16, dtype=jnp.int8)
        assert cache.k.shape == (2, 1, 64, 3, 16)
        assert cache.k.dtype == jnp.int8

    def test_zero_fill_decodes_to_zero(self):
        cache = KVCache.create(1, 1, 8, 2, 16, dtype=jnp.int8)
        dec = decode_kv(cache.k[0], jnp.float32, 2)
        assert float(jnp.abs(dec).max()) == 0.0


class TestQuantizedServing:
    @pytest.fixture()
    def int8_kv(self, monkeypatch):
        monkeypatch.setattr(app_config, "kv_quantization", "int8")

    def test_engine_decode_deterministic(self, int8_kv):
        config = _tiny_config()
        params = init_decoder_params(config, jax.random.PRNGKey(7))
        tok = ByteTokenizer(vocab_size=config.vocab_size)
        engine = Engine("kvq", config, params, tok, max_cache_tokens=512)
        prompt = "inspect the weld seam for porosity"
        a = engine.generate(prompt, max_tokens=12)
        b = engine.generate(prompt, max_tokens=12)
        assert a == b and len(a) > 0

    def test_scheduler_token_exact_vs_engine(self, int8_kv):
        """Batched decode over int8 slots must equal the single-request
        engine (both quantize identically -> exact token equality)."""
        config = _tiny_config()
        params = init_decoder_params(config, jax.random.PRNGKey(7))
        tok = ByteTokenizer(vocab_size=config.vocab_size)
        engine = Engine("kvq-ref", config, params, tok, max_cache_tokens=512)
        scheduler = ContinuousBatchingScheduler(
            config, params, tok, num_slots=2, max_len=512
        )
        assert scheduler.cache.k.dtype == jnp.int8
        scheduler.start()
        try:
            prompt = "check the casting for cracks near the rim"
            want = engine.generate(prompt, max_tokens=10)
            got = scheduler.generate(prompt, max_tokens=10, timeout=120)
            assert got == want
        finally:
            scheduler.stop()

    def test_paged_pool_int8_token_exact(self, int8_kv):
        config = _tiny_config()
        params = init_decoder_params(config, jax.random.PRNGKey(7))
        tok = ByteTokenizer(vocab_size=config.vocab_size)
        engine = Engine("kvq-p", config, params, tok, max_cache_tokens=512)
        scheduler = ContinuousBatchingScheduler(
            config, params, tok, num_slots=2, max_len=512, paged=True
        )
        assert scheduler.pool.k.dtype == jnp.int8
        assert scheduler.pool.k.shape[-2] == config.num_kv_heads + 1
        scheduler.start()
        try:
            prompt = "measure the flange thickness"
            want = engine.generate(prompt, max_tokens=10)
            got = scheduler.generate(prompt, max_tokens=10, timeout=120)
            assert got == want
        finally:
            scheduler.stop()

    def test_quantized_logits_close_to_bf16_kv(self):
        """Quantization error must stay small at the logits level: one
        prefill + one decode step with int8 KV vs float KV."""
        from vis_tpu.models.common.decoder import (
            decode_step_scan,
            prefill_scan,
            stack_decoder_layers,
        )
        from vis_tpu.models.common.layers import embed

        config = _tiny_config()
        params = stack_decoder_layers(
            init_decoder_params(config, jax.random.PRNGKey(3))
        )
        ids = jnp.asarray([[5, 9, 200, 41, 77, 3, 0, 0]])
        embeds = embed(ids, params["embed_tokens"])
        positions = jnp.arange(8)[None]
        lengths = jnp.asarray([6])

        outs = {}
        for dtype in (jnp.float32, jnp.int8):
            cache = KVCache.create(
                config.num_layers, 1, 32, config.num_kv_heads,
                config.head_dim_, dtype=dtype,
            )
            logits, cache = prefill_scan(
                config, params, embeds, positions, cache, lengths
            )
            tok = jnp.argmax(logits, -1)[:, None]
            step_logits, _ = decode_step_scan(
                config, params, embed(tok, params["embed_tokens"]),
                jnp.asarray([[6]]), cache,
            )
            outs[str(dtype)] = (np.asarray(logits), np.asarray(step_logits))

        for a, b in zip(outs["<class 'jax.numpy.float32'>"],
                        outs["<class 'jax.numpy.int8'>"]):
            scale = np.abs(a).max() + 1e-9
            assert np.abs(a - b).max() / scale < 0.05


def test_encode_kv_rejects_narrow_head_dim():
    """int8 KV packs 2*kv_heads scale bytes into one head row; a geometry
    with head_dim < 2*kv_heads must fail loudly at trace time, not corrupt
    scales (r3 advisor)."""
    import pytest

    from vis_tpu.models.common.layers import encode_kv

    x = jnp.zeros((1, 4, 16, 6), jnp.float32)  # 16 heads, head_dim 6 < 32
    with pytest.raises(ValueError, match="kv_quantization"):
        encode_kv(x, jnp.int8)
