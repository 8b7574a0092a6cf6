"""KV-cached chat sessions: follow-up turns must produce the same tokens as
full-history re-prefill (BASELINE config 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vis_tpu.models.common.decoder import DecoderConfig, init_decoder_params
from vis_tpu.serving.engine import Engine
from vis_tpu.serving.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def engine():
    config = DecoderConfig(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, qkv_bias=False,
        tie_word_embeddings=True, dtype=jnp.float32,
    )
    params = init_decoder_params(config, jax.random.PRNGKey(13))
    tok = ByteTokenizer(vocab_size=config.vocab_size)
    return Engine("chat", config, params, tok, max_cache_tokens=512)


def test_cached_turn_matches_full_reprefill(engine):
    system = "Inspection context: verdict SAFE, zero defects."
    q1 = "what was found?"

    session = engine.chat_start(system)
    cached_answer = "".join(engine.chat_turn(session, q1, max_tokens=10))

    # Ground truth: prefill the identical concatenated text from scratch.
    full_prompt = f"{system}\nUser: {q1}\nAssistant:"
    expected = engine.generate(full_prompt, max_tokens=10)
    assert cached_answer == expected


def test_multi_turn_state_accumulates(engine):
    system = "Context: one crack on the bracket."
    session = engine.chat_start(system)
    a1 = "".join(engine.chat_turn(session, "where?", max_tokens=8))
    pos_after_1 = session.position
    a2 = "".join(engine.chat_turn(session, "severity?", max_tokens=8))
    assert session.position > pos_after_1
    # Ground truth for turn 2: full transcript including turn 1's reply.
    transcript = (
        f"{system}\nUser: where?\nAssistant:{a1}"
        f"\nUser: severity?\nAssistant:"
    )
    expected = engine.generate(transcript, max_tokens=8)
    assert a2 == expected


def test_budget_exhaustion_raises(engine):
    session = engine.chat_start("ctx")
    with pytest.raises(RuntimeError):
        engine.chat_turn(session, "q" * 2000, max_tokens=500).__next__()
