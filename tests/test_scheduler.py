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


class TestChunkedPrefill:
    """SURVEY §7 hard part 3: long prompt admissions fill their slot in
    segments interleaved with decode chunks — token-exact vs whole-prompt
    prefill, and the in-flight request keeps streaming."""

    def _scheduler(self, config, params, tok, chunk):
        import vis_tpu.serving.scheduler as sched_mod
        from vis_tpu.utils.config import config as app_config

        sched = ContinuousBatchingScheduler(
            config, params, tok, num_slots=2, max_len=512
        )
        sched.chunked_prefill = chunk
        sched.start()
        return sched

    def test_token_exact_and_interleaved(self, setup):
        engine, _ = setup
        config = engine.text_config
        params = engine.text_params
        tok = engine.tokenizer

        long_prompt = ("corrosion on the lower panel near the weld seam " * 8)
        short_prompt = "short request"
        expected_long = engine.generate(long_prompt, max_tokens=16)
        expected_short = engine.generate(short_prompt, max_tokens=300)

        sched = self._scheduler(config, params, tok, chunk=32)
        try:
            # Short request first so a slot is actively decoding when the
            # long prompt arrives (chunked prefill only engages then).
            short_req = sched.submit(short_prompt, max_tokens=300)
            import time as _time

            deadline = _time.time() + 60
            while not any(s.active for s in sched.slots):
                assert _time.time() < deadline
                _time.sleep(0.01)
            long_out = sched.generate(long_prompt, max_tokens=16, timeout=120)

            chunks = []
            while True:
                c = short_req.out.get(timeout=60)
                if c is None:
                    break
                chunks.append(c)
            assert "".join(chunks) == expected_short
            assert long_out == expected_long
            assert sched.prefill_segments_done > 1, (
                "long prompt should have prefilled in multiple segments"
            )
        finally:
            sched.stop()

    def test_whole_prompt_when_idle(self, setup):
        """With no active decode, the prompt prefills in one shot (chunking
        only protects in-flight requests)."""
        engine, _ = setup
        sched = self._scheduler(
            engine.text_config, engine.text_params, engine.tokenizer, chunk=32
        )
        try:
            long_prompt = "x" * 200
            expected = engine.generate(long_prompt, max_tokens=8)
            out = sched.generate(long_prompt, max_tokens=8, timeout=120)
            assert out == expected
            assert sched.prefill_segments_done == 0
        finally:
            sched.stop()


class TestBatchedSampling:
    """temperature>0 requests batch with greedy ones in a single chunk:
    greedy rows stay token-exact, sampled rows draw per-slot gumbel."""

    def test_mixed_greedy_and_sampled(self, setup):
        engine, scheduler = setup
        prompt_g = "greedy row prompt about the casing"
        prompt_s = "sampled row prompt about the weld"
        expected_greedy = engine.generate(prompt_g, max_tokens=24)

        import threading

        results = {}

        def run(tag, prompt, temp):
            results[tag] = scheduler.generate(
                prompt, max_tokens=24, timeout=300
            ) if temp == 0 else "".join(
                c for c in iter_stream(prompt, temp)
            )

        def iter_stream(prompt, temp):
            req = scheduler.submit(prompt, max_tokens=24, temperature=temp)
            while True:
                c = req.out.get(timeout=300)
                if c is None:
                    break
                yield c

        t1 = threading.Thread(target=run, args=("g", prompt_g, 0.0))
        t2 = threading.Thread(target=run, args=("s", prompt_s, 0.9))
        t1.start(); t2.start(); t1.join(300); t2.join(300)

        # a missing key means a worker thread timed out (slow shared-CPU
        # host), not a batching bug — fail with that distinction visible
        assert "g" in results and "s" in results, "worker thread timed out"
        assert results["g"] == expected_greedy
        # random tiny-model sampling may hit EOS/special ids immediately;
        # the contract is completion-without-error, not non-empty text
        assert isinstance(results["s"], str)

    def test_sampled_request_alone(self, setup):
        engine, scheduler = setup
        out = "".join(
            c for c in scheduler.stream(
                "solo sampled", max_tokens=16, timeout=120
            )
        )
        # greedy baseline unchanged by the sampling machinery
        assert out == engine.generate("solo sampled", max_tokens=16)
        req = scheduler.submit("solo sampled", max_tokens=16, temperature=1.0)
        chunks = []
        while True:
            c = req.out.get(timeout=120)
            if c is None:
                break
            chunks.append(c)
        assert isinstance("".join(chunks), str)


class TestDecodeCrashRecovery:
    """A decode-chunk device failure must fail the in-flight requests
    loudly (error + terminating None) and leave the scheduler serving —
    an unguarded exception would kill the daemon thread and wedge every
    caller forever on out.get()."""

    def test_injected_decode_failure_recovers(self, setup):
        engine, scheduler = setup
        original = scheduler._decode_once
        fired = threading.Event()

        def exploding_once():
            if not fired.is_set():
                fired.set()
                raise RuntimeError("injected device failure")
            return original()

        scheduler._decode_once = exploding_once
        try:
            with pytest.raises(RuntimeError, match="batched decode failed"):
                scheduler.generate("doomed request", max_tokens=8, timeout=60)
            assert fired.is_set()
            assert scheduler.active_count == 0
        finally:
            scheduler._decode_once = original

        # The loop survived: a fresh request completes and stays token-exact.
        out = scheduler.generate("after the crash", max_tokens=8, timeout=120)
        assert out == engine.generate("after the crash", max_tokens=8)

    def test_injected_admission_failure_survives_thread(self, setup):
        """An exception that escapes _admit_one entirely (the r5 batch leg
        hit one: OOM inside the admit handler's own device cleanup) must
        not kill the scheduler thread."""
        engine, scheduler = setup
        original = scheduler._admit_one
        fired = threading.Event()

        def exploding_once():
            if not fired.is_set():
                fired.set()
                raise RuntimeError("injected admission failure")
            return original()

        scheduler._admit_one = exploding_once
        try:
            # The first admission attempt explodes past _admit_one's own
            # handler; the request stays QUEUED (never popped by the real
            # admit) and is served once the patched function delegates.
            out = scheduler.generate("survives admit crash", max_tokens=8,
                                     timeout=120)
            assert fired.is_set()
        finally:
            scheduler._admit_one = original
        assert out == engine.generate("survives admit crash", max_tokens=8)
        assert scheduler._thread.is_alive()
