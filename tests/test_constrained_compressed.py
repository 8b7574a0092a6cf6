"""Column-class-compressed constraint tables (real-vocab constrained decode).

Real checkpoints carry ~151k-piece vocabularies; dense [S, V] tables at the
generic JSON DFA's ~1.9k states would be GBs of HBM, so large vocabs
compile COMPRESSED tables: tokens whose byte strings act identically on
every DFA state share one column, and class_of [V] maps vocab id ->
column.  These tests pin exact equivalence with the dense compiler on the
real trained tokenizer (assets/tokenizers/) by forcing compression below
its production vocab threshold.

Reference contract being replaced: remote APIs returning JSON parsed by a
3-strategy salvager (reference src/agents/vlm_inspector.py:142-213); here
grammar-masked decode guarantees parseability, and this file proves the
guarantee holds in the table format real checkpoints actually use.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from vis_tpu.serving import constrained as con_mod
from vis_tpu.serving import schema as schema_mod
from vis_tpu.serving.tokenizer import HFTokenizer

REPO = Path(__file__).resolve().parents[1]
TOKENIZER = REPO / "assets" / "tokenizers" / "bytelevel_bpe.tokenizer.json"


@pytest.fixture()
def force_compression(monkeypatch):
    """Compile with compression at the real test tokenizer's small vocab
    (production triggers at >4096) and isolate the table caches so dense
    results from other tests are not reused."""
    monkeypatch.setattr(con_mod, "_COMPRESS_VOCAB_THRESHOLD", 64)
    monkeypatch.setattr(con_mod, "_tables_cache", {})
    monkeypatch.setattr(con_mod, "_compile_key_locks", {})
    monkeypatch.setattr(schema_mod, "_tables_cache", {})
    yield


@pytest.fixture()
def isolated_dense(monkeypatch):
    monkeypatch.setattr(con_mod, "_tables_cache", {})
    monkeypatch.setattr(con_mod, "_compile_key_locks", {})
    monkeypatch.setattr(schema_mod, "_tables_cache", {})
    yield


def _expand(tables):
    """Compressed tables -> dense [S, V] arrays via class_of."""
    cls = tables.class_of
    return (
        tables.token_ok[:, cls],
        tables.token_trans[:, cls],
        tables.cost_after[:, cls],
    )


class TestCompressedEquivalence:
    def test_generic_json_tables_match_dense(self, force_compression):
        tok = HFTokenizer(TOKENIZER)
        comp = con_mod.json_constraint_tables(tok, tok.vocab_size)
        assert comp is not None and comp.class_of is not None
        # Compression must actually compress: distinct behaviors are
        # grammar-bounded, far below the vocab size.
        C = comp.token_ok.shape[1]
        assert C < tok.vocab_size / 2, (C, tok.vocab_size)

        con_mod._tables_cache.clear()
        dense = None
        try:
            con_mod._COMPRESS_VOCAB_THRESHOLD = 10**9
            dense = con_mod.json_constraint_tables(tok, tok.vocab_size)
        finally:
            con_mod._COMPRESS_VOCAB_THRESHOLD = 64
        assert dense is not None and dense.class_of is None

        ok, trans, cost = _expand(comp)
        np.testing.assert_array_equal(ok, dense.token_ok)
        np.testing.assert_array_equal(
            np.where(ok, trans, 0), dense.token_trans
        )
        np.testing.assert_array_equal(cost, dense.cost_after)
        np.testing.assert_array_equal(comp.forced_token, dense.forced_token)
        np.testing.assert_array_equal(comp.forced_state, dense.forced_state)
        assert comp.min_budget == dense.min_budget
        assert comp.init_state == dense.init_state

    def test_schema_tables_match_dense(self, force_compression):
        tok = HFTokenizer(TOKENIZER)
        comp = schema_mod.schema_constraint_tables(
            tok, tok.vocab_size, "inspection"
        )
        assert comp is not None and comp.class_of is not None

        schema_mod._tables_cache.clear()
        try:
            con_mod._COMPRESS_VOCAB_THRESHOLD = 10**9
            dense = schema_mod.schema_constraint_tables(
                tok, tok.vocab_size, "inspection"
            )
        finally:
            con_mod._COMPRESS_VOCAB_THRESHOLD = 64
        assert dense is not None and dense.class_of is None

        ok, trans, cost = _expand(comp)
        np.testing.assert_array_equal(ok, dense.token_ok)
        np.testing.assert_array_equal(
            np.where(ok, trans, 0), dense.token_trans
        )
        np.testing.assert_array_equal(cost, dense.cost_after)
        np.testing.assert_array_equal(comp.forced_token, dense.forced_token)
        np.testing.assert_array_equal(comp.forced_state, dense.forced_state)

    def test_walk_document_compressed(self, force_compression):
        tok = HFTokenizer(TOKENIZER)
        tables = con_mod.json_constraint_tables(tok, tok.vocab_size)
        doc = json.dumps({"overall_condition": "good", "defects": []})
        ids = tok.encode(doc)
        state = con_mod.walk_document(tables, ids)
        assert state == tables.accept_state


def _tiny_engine():
    import jax

    from vis_tpu.models.common.decoder import (
        DecoderConfig, init_decoder_params,
    )
    from vis_tpu.serving.engine import Engine

    tok = HFTokenizer(TOKENIZER)
    config = DecoderConfig(
        vocab_size=tok.vocab_size, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, qkv_bias=False,
        tie_word_embeddings=True, dtype=jnp.float32,
    )
    params = init_decoder_params(config, jax.random.PRNGKey(3))
    return Engine("cmp", config, params, tok, max_cache_tokens=512), params, config, tok


class TestCompressedDecode:
    def test_generate_token_exact_vs_dense(self, isolated_dense,
                                           monkeypatch):
        """The SAME engine weights decode the SAME constrained JSON whether
        the tables are dense or compressed."""
        engine, params, config, tok = _tiny_engine()
        dense_out = engine.generate(
            "inspect the part", max_tokens=160, json_mode=True
        )
        json.loads(dense_out)

        monkeypatch.setattr(con_mod, "_COMPRESS_VOCAB_THRESHOLD", 64)
        con_mod._tables_cache.clear()
        schema_mod._tables_cache.clear()
        from vis_tpu.serving.engine import Engine

        engine2 = Engine("cmp2", config, params, tok, max_cache_tokens=512)
        comp_out = engine2.generate(
            "inspect the part", max_tokens=160, json_mode=True
        )
        assert comp_out == dense_out

    def test_schema_lookahead_compressed(self, isolated_dense, monkeypatch):
        """Schema-exact decode with forced-run lookahead rides compressed
        tables token-identically."""
        monkeypatch.setenv("CONSTRAINED_SCHEMA", "true")
        monkeypatch.setenv("CONSTRAINED_LOOKAHEAD", "8")
        from vis_tpu.utils.config import get_config

        get_config(reload=True)
        try:
            engine, params, config, tok = _tiny_engine()
            dense_out = engine.generate(
                "decision", max_tokens=200, json_mode=True,
                json_schema="decision_support",
            )
            doc = json.loads(dense_out)

            monkeypatch.setattr(con_mod, "_COMPRESS_VOCAB_THRESHOLD", 64)
            con_mod._tables_cache.clear()
            schema_mod._tables_cache.clear()
            from vis_tpu.serving.engine import Engine

            engine2 = Engine("cmp3", config, params, tok,
                             max_cache_tokens=512)
            comp_out = engine2.generate(
                "decision", max_tokens=200, json_mode=True,
                json_schema="decision_support",
            )
            assert comp_out == dense_out
            assert list(json.loads(comp_out)) == list(doc)
        finally:
            monkeypatch.delenv("CONSTRAINED_SCHEMA", raising=False)
            monkeypatch.delenv("CONSTRAINED_LOOKAHEAD", raising=False)
            get_config(reload=True)

    def test_scheduler_stacked_compressed(self, isolated_dense, monkeypatch):
        """Batched scheduler decode over STACKED compressed tables (mixed
        generic + schema rows) matches the unbatched engine token-exactly."""
        monkeypatch.setattr(con_mod, "_COMPRESS_VOCAB_THRESHOLD", 64)
        engine, params, config, tok = _tiny_engine()
        unbatched = engine.generate(
            "check the weld", max_tokens=96, json_mode=True
        )
        json.loads(unbatched)

        engine.attach_scheduler(num_slots=2)
        try:
            assert engine.scheduler._json_dev[3] is not None  # class map
            request = engine.scheduler.submit(
                "check the weld", max_tokens=96, json_mode=True
            )
            chunks = []
            while True:
                chunk = request.out.get(timeout=300)
                if chunk is None:
                    break
                chunks.append(chunk)
            assert not request.error, request.error
            batched = "".join(chunks)
        finally:
            engine.detach_scheduler()
        assert batched == unbatched
