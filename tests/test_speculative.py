"""Prompt-lookup speculative decoding: drafts from n-gram matches, one-pass
verification — must reproduce plain greedy decode EXACTLY."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vis_tpu.models.common.decoder import DecoderConfig, init_decoder_params
from vis_tpu.serving.engine import Engine, _pld_draft
from vis_tpu.serving.tokenizer import ByteTokenizer


class TestDraft:
    def test_draft_from_repeat(self):
        ctx = [1, 2, 3, 4, 5, 9, 9, 1, 2, 3]
        # trailing 2-gram (2, 3) matched at index 1 -> continuation [4, 5, 9, 9]
        assert _pld_draft(ctx, 4) == [4, 5, 9, 9]

    def test_no_match(self):
        assert _pld_draft([1, 2, 3, 4, 5, 6], 4) == []

    def test_most_recent_match_wins(self):
        ctx = [7, 8, 100, 5, 5, 7, 8, 200, 6, 7, 8]
        assert _pld_draft(ctx, 2) == [200, 6]

    def test_short_context(self):
        assert _pld_draft([1], 4) == []


@pytest.fixture(scope="module")
def engine_pair():
    config = DecoderConfig(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, qkv_bias=False,
        tie_word_embeddings=True, dtype=jnp.float32,
    )
    params = init_decoder_params(config, jax.random.PRNGKey(21))
    tok = ByteTokenizer(vocab_size=config.vocab_size)
    return Engine("pld-test", config, params, tok, max_cache_tokens=512)


PROMPTS = [
    # repetitive, JSON-like: drafts should hit
    '{"defects": [{"type": "scratch", "type": "scratch", "type": "dent"}]}' * 2,
    # non-repetitive: exercises the low-acceptance fallback to fused chunks
    "the quick brown fox jumps over a lazy dog near the riverbank",
]


class TestPLDExactness:
    @pytest.mark.parametrize("prompt", PROMPTS, ids=["repetitive", "plain"])
    def test_matches_plain_greedy(self, engine_pair, prompt, monkeypatch):
        engine = engine_pair
        plain = engine.generate(prompt, max_tokens=48)

        monkeypatch.setenv("SPECULATIVE_DECODING", "pld")
        from vis_tpu.utils.config import get_config

        get_config(reload=True)
        try:
            pld = engine.generate(prompt, max_tokens=48)
        finally:
            monkeypatch.delenv("SPECULATIVE_DECODING")
            get_config(reload=True)
        assert pld == plain

    def test_deterministic_under_pld(self, engine_pair, monkeypatch):
        monkeypatch.setenv("SPECULATIVE_DECODING", "pld")
        from vis_tpu.utils.config import get_config

        get_config(reload=True)
        try:
            a = engine_pair.generate(PROMPTS[0], max_tokens=32)
            b = engine_pair.generate(PROMPTS[0], max_tokens=32)
        finally:
            monkeypatch.delenv("SPECULATIVE_DECODING")
            get_config(reload=True)
        assert a == b
