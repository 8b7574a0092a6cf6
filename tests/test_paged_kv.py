"""Paged KV cache tests (VERDICT r1 item 3: kv_page_size made real).

Correctness contract: the paged scheduler must emit EXACTLY the tokens the
single-request engine (and the dense scheduler) emit, under slot churn with
mixed prompt/output lengths, while holding less KV memory than the dense
slots x max_len layout.
"""

import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vis_tpu.models.common.decoder import DecoderConfig, init_decoder_params
from vis_tpu.serving.engine import Engine
from vis_tpu.serving.paged_kv import PagedKVPool
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
        config, params, tok, num_slots=4, max_len=512, paged=True,
    )
    scheduler.start()
    yield engine, scheduler
    scheduler.stop()


class TestPool:
    def _pool(self, **kw):
        args = dict(num_layers=2, slots=4, max_len=512, kv_heads=2,
                    head_dim=16, page_size=128, pool_tokens=1024,
                    dtype=jnp.float32)
        args.update(kw)
        return PagedKVPool(**args)

    def test_reserve_rejects_beyond_slot_window(self):
        """A budget past max_pages*page_size must be REFUSED, not clamped:
        a clamped reservation lets terminal-chunk overhang writes wrap
        through the last mapped page and corrupt live KV."""
        pool = self._pool(pool_tokens=2048)  # pool could hold it...
        assert pool.max_pages == 4           # ...but one slot cannot
        total = pool.free_pages
        assert not pool.try_reserve(0, 4 * 128 + 1)
        assert pool.free_pages == total      # no side effects
        assert pool.try_reserve(0, 4 * 128)  # exactly the window is fine

    def test_rereserve_replaces_not_leaks(self):
        pool = self._pool()
        total = pool.free_pages
        assert pool.try_reserve(1, 300)      # 3 pages
        assert pool.try_reserve(1, 150)      # re-reserve same slot: 2 pages
        assert pool.free_pages == total - 2  # old 3 returned, not leaked
        pool.release(1)
        assert pool.free_pages == total

    def test_reserve_release_roundtrip(self):
        pool = self._pool()
        total = pool.free_pages
        assert pool.try_reserve(0, 300)  # 3 pages
        assert pool.free_pages == total - 3
        table = np.asarray(pool.page_tables)[0]
        assert (table[:3] > 0).all() and (table[3:] == 0).all()
        pool.release(0)
        assert pool.free_pages == total
        assert (np.asarray(pool.page_tables)[0] == 0).all()

    def test_reserve_fails_when_exhausted(self):
        pool = self._pool(pool_tokens=256)  # 2 usable pages
        assert pool.try_reserve(0, 256)
        assert not pool.try_reserve(1, 128)
        pool.release(0)
        assert pool.try_reserve(1, 128)

    def test_page_alignment_enforced(self):
        with pytest.raises(ValueError):
            self._pool(max_len=500)

    def test_pool_smaller_than_dense(self):
        """The point of paging: KV memory is the pool, not slots x max_len."""
        pool = self._pool()
        dense_bytes = 2 * 2 * 4 * 512 * 2 * 16 * 4  # k+v,L,slots,len,kvh,hd,f32
        assert pool.memory_bytes() < dense_bytes / 1.5

    def test_reserve_device_failure_rolls_back(self):
        """A device failure mid-reserve (OOM on a full chip) must surface
        as a clean False with host bookkeeping intact — the r5 batch leg
        killed the scheduler thread when this raised instead."""
        pool = self._pool()
        total = pool.free_pages
        assert pool.try_reserve(0, 300)  # 3 pages, establishes prev mapping

        def boom(*a, **k):
            raise RuntimeError("RESOURCE_EXHAUSTED: injected")

        real = pool._set_row_jit
        pool._set_row_jit = boom
        try:
            assert not pool.try_reserve(0, 150)  # re-reserve fails on device
            assert not pool.try_reserve(1, 128)  # fresh reserve fails too
        finally:
            pool._set_row_jit = real
        # Slot 0 keeps its ORIGINAL 3-page mapping; slot 1 owns nothing.
        assert len(pool._owned[0]) == 3
        assert 1 not in pool._owned
        assert pool.free_pages == total - 3
        pool.release(0)
        assert pool.free_pages == total

    def test_release_device_failure_still_frees_pages(self):
        """release() must return pages to the host free list even when the
        page-table clear fails on-device (stale rows are rewritten by the
        next try_reserve before any decode reads them)."""
        pool = self._pool()
        total = pool.free_pages
        assert pool.try_reserve(0, 300)

        def boom(*a, **k):
            raise RuntimeError("RESOURCE_EXHAUSTED: injected")

        real = pool._set_row_jit
        pool._set_row_jit = boom
        try:
            pool.release(0)  # must not raise
        finally:
            pool._set_row_jit = real
        assert pool.free_pages == total
        assert 0 not in pool._owned
        # Next reserve rewrites the full row, clearing the stale mapping.
        assert pool.try_reserve(0, 128)
        table = np.asarray(pool.page_tables)[0]
        assert (table[1:] == 0).all()


class TestPagedScheduler:
    def test_single_request_matches_engine(self, setup):
        engine, scheduler = setup
        prompt = "inspect the bracket for cracks"
        expected = engine.generate(prompt, max_tokens=12)
        got = scheduler.generate(prompt, max_tokens=12, timeout=120)
        assert got == expected

    def test_churn_mixed_lengths_token_exact(self, setup):
        """More requests than slots AND more than the pool holds at once:
        slots churn, pages recycle, outputs stay exact."""
        engine, scheduler = setup
        prompts = [
            "short",
            "a somewhat longer prompt about corrosion on the lower panel "
            "with extra descriptive detail to vary the prefill length",
            "medium length prompt here",
            "req four",
            "request five concerns the weld seam and its porosity profile",
            "six",
            "the seventh request asks about fastener torque marks",
        ]
        budgets = [6, 14, 9, 5, 12, 7, 10]
        expected = [
            engine.generate(p, max_tokens=b) for p, b in zip(prompts, budgets)
        ]
        results = [None] * len(prompts)

        def worker(i):
            results[i] = scheduler.generate(
                prompts[i], max_tokens=budgets[i], timeout=240
            )

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=240)
        assert results == expected
        # All pages returned after the churn.
        assert scheduler.pool.free_pages == scheduler.pool.n_pages - 1

    def test_oversized_request_errors_cleanly(self, setup):
        engine, scheduler = setup
        request = scheduler.submit("too big", max_tokens=100_000)
        assert request.out.get(timeout=60) is None
        err = request.error or ""
        assert ("exceeds the paged-KV limit" in err
                or "leaves no prompt room" in err), err

    def test_matches_dense_scheduler(self, setup):
        engine, scheduler = setup
        config = scheduler.config
        dense = ContinuousBatchingScheduler(
            config, scheduler.params, scheduler.tokenizer,
            num_slots=4, max_len=512, paged=False,
        )
        dense.start()
        try:
            prompt = "compare paged against dense decode"
            a = scheduler.generate(prompt, max_tokens=16, timeout=120)
            b = dense.generate(prompt, max_tokens=16, timeout=120)
        finally:
            dense.stop()
        assert a == b


class TestElasticPool:
    """Idle paged pools release their device buffers (HBM returned to the
    chip between bursts — single-chip target profiles run the dual-VLM
    phase in that headroom) and re-create them on the next admission,
    token-exactly."""

    def test_idle_release_then_reuse_token_exact(self, setup):
        engine, scheduler = setup
        prompt = "check the casting for porosity near the rim"
        expected = engine.generate(prompt, max_tokens=10)

        assert scheduler.generate(prompt, max_tokens=10, timeout=120) == expected
        # The worker releases the buffers once every slot is idle.
        deadline = time.time() + 30
        while scheduler.pool.k is not None and time.time() < deadline:
            time.sleep(0.02)
        assert scheduler.pool.k is None, "idle pool must release its buffers"
        assert scheduler.pool.memory_bytes() == 0

        # Next burst re-allocates and decodes exactly the same tokens.
        assert scheduler.generate(prompt, max_tokens=10, timeout=120) == expected


class TestPagedMultimodalHandoff:
    def test_vlm_prefilled_handoff_token_exact(self, tmp_path):
        """Engine-side multimodal prefill handed into the PAGED scheduler
        (the production continuous-batching + paged-KV composition)."""
        from PIL import Image
        from vis_tpu.models.qwen2_vl.config import Qwen2VLConfig, VisionConfig
        from vis_tpu.models.qwen2_vl.model import init_params as init_qwen

        config = Qwen2VLConfig(
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
        params = init_qwen(config, jax.random.PRNGKey(1))
        tok = ByteTokenizer(vocab_size=config.text.vocab_size)
        plain = Engine("plain-vlm", config.text, None, tok,
                       vlm_config=config, vlm_params=params,
                       max_cache_tokens=1024)
        scheduled = Engine("paged-vlm", config.text, None, tok,
                           vlm_config=config, vlm_params=params,
                           max_cache_tokens=1024)
        scheduled.attach_scheduler(num_slots=2, paged=True)
        try:
            img = tmp_path / "part.jpg"
            rng = np.random.default_rng(8)
            Image.fromarray(
                rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
            ).save(img)
            prompt = "Inspect this part."
            expected = plain.generate(prompt, img, max_tokens=8,
                                      max_image_dim=256)
            got = scheduled.generate(prompt, img, max_tokens=8,
                                     max_image_dim=256)
            assert got == expected
        finally:
            scheduled.detach_scheduler()


class TestLargePageSize:
    def test_page_size_256_staging_alignment_token_exact(self, monkeypatch):
        """KV_PAGE_SIZE > 128 (r3 advisor): whole-prompt admission stages
        into a page-aligned bucket and the prefilled hand-off path rounds
        its staging cache up to a page multiple — a short prompt must not
        fail the page reshape at insert, and tokens stay exact."""
        from vis_tpu.utils.config import config as app_config

        monkeypatch.setattr(app_config, "kv_page_size", 256)
        monkeypatch.setattr(app_config, "kv_pool_tokens", 2048)
        monkeypatch.setattr(app_config, "paged_kv_cache", True)

        config = DecoderConfig(
            vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128, qkv_bias=False,
            tie_word_embeddings=True, dtype=jnp.float32,
        )
        params = init_decoder_params(config, jax.random.PRNGKey(7))
        tok = ByteTokenizer(vocab_size=config.vocab_size)
        engine = Engine("ref-256", config, params, tok, max_cache_tokens=512)
        expected = engine.generate("short prompt", max_tokens=8)

        # Whole-prompt admission (scheduler does the prefill).
        scheduler = ContinuousBatchingScheduler(
            config, params, tok, num_slots=2, max_len=512, paged=True,
        )
        assert scheduler.pool.page_size == 256
        scheduler.start()
        try:
            got = scheduler.generate("short prompt", max_tokens=8, timeout=120)
            assert got == expected
        finally:
            scheduler.stop()

        # Prefilled hand-off (engine stages prompt_only_cache).
        scheduled = Engine("sched-256", config, params, tok,
                           max_cache_tokens=512)
        scheduled.attach_scheduler(num_slots=2, paged=True)
        try:
            got = scheduled.generate("short prompt", max_tokens=8)
            assert got == expected
        finally:
            scheduled.detach_scheduler()
