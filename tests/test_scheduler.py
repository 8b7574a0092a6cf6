"""Continuous-batching scheduler tests (CPU, tiny model).

The key correctness property: greedy decode through the shared-slot batched
scheduler must produce EXACTLY the tokens the single-request engine produces
for the same prompt — mixed-length batching must not leak context between
slots.
"""

import queue
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vis_tpu.models.common.decoder import DecoderConfig, init_decoder_params
from vis_tpu.serving.engine import Engine
from vis_tpu.serving.scheduler import ContinuousBatchingScheduler
from vis_tpu.serving.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def setup():
    config = DecoderConfig(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, qkv_bias=False,
        tie_word_embeddings=True, dtype=jnp.float32,
    )
    params = init_decoder_params(config, jax.random.PRNGKey(7))
    tok = ByteTokenizer(vocab_size=config.vocab_size)
    engine = Engine("ref", config, params, tok, max_cache_tokens=512)
    scheduler = ContinuousBatchingScheduler(
        config, params, tok, num_slots=4, max_len=512
    )
    scheduler.start()
    yield engine, scheduler
    scheduler.stop()


def test_single_request_matches_engine(setup):
    engine, scheduler = setup
    prompt = "inspect the bracket for cracks"
    expected = engine.generate(prompt, max_tokens=12)
    got = scheduler.generate(prompt, max_tokens=12, timeout=120)
    assert got == expected


def test_concurrent_mixed_length_requests_are_isolated(setup):
    engine, scheduler = setup
    prompts = [
        "short",
        "a somewhat longer prompt about corrosion on the lower panel",
        "medium length prompt here",
    ]
    expected = [engine.generate(p, max_tokens=10) for p in prompts]

    results = [None] * len(prompts)
    errors = []

    def worker(i):
        try:
            results[i] = scheduler.generate(prompts[i], max_tokens=10, timeout=180)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert not errors
    assert results == expected


def test_more_requests_than_slots(setup):
    engine, scheduler = setup
    prompts = [f"request number {i} about defects" for i in range(7)]
    expected = [engine.generate(p, max_tokens=6) for p in prompts]

    results = [None] * len(prompts)

    def worker(i):
        results[i] = scheduler.generate(prompts[i], max_tokens=6, timeout=240)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=240)
    assert results == expected


def test_streaming_interface(setup):
    engine, scheduler = setup
    prompt = "stream this response"
    expected = engine.generate(prompt, max_tokens=8)
    chunks = list(scheduler.stream(prompt, max_tokens=8, timeout=120))
    assert "".join(chunks) == expected
