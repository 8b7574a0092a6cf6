"""Constrained decode against REAL tokenizer.json vocabularies.

VERDICT r3 #5: the DFA's piece-byte tracking had only been exercised on
synthetic pieces.  These tests load genuine BPE `tokenizer.json` files —
trained by tools/build_test_tokenizer.py with the HF tokenizers runtime
(the same library that loads production Llama/Qwen vocab files), committed
under assets/tokenizers/ — through the production ``HFTokenizer`` wrapper,
and assert:

- byte-level BPE (the Llama-3/Qwen2 mechanism): the DFA's per-piece byte
  map reconstructs adversarial JSON byte-identically, every encoded
  document walks the token tables to ACCEPT, and masked decode
  trajectories detokenize to exactly the bytes the DFA tracked;
- SentencePiece-style Metaspace BPE (leading ▁ marker + dummy prefix, the
  round-2 advisor's top drift risk): the composability probe detects the
  encode-side prefix asymmetry and DISABLES constrained decode rather
  than risking DFA/detokenizer drift;
- a real Engine built over the byte-level vocab emits schema-exact JSON
  whose detokenization round-trips byte-identically.

The JSON-robustness contract being protected is the reference's
(reference src/agents/vlm_inspector.py:142-213: 3-strategy parse of
malformed API JSON); prevention here must never drift from detokenization.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vis_tpu.serving.constrained import (
    _vocab_byte_contents,
    json_constraint_tables,
)
from vis_tpu.serving.tokenizer import HFTokenizer

REPO = Path(__file__).resolve().parents[1]
BYTELEVEL = REPO / "assets" / "tokenizers" / "bytelevel_bpe.tokenizer.json"
SPM = REPO / "assets" / "tokenizers" / "spm_bpe.tokenizer.json"

ADVERSARIAL_DOCS = [
    '{"defects_found": true, "defect_count": 2}',
    '{"path": "C:\\\\parts\\\\unit_7\\\\scan.jpg", "note": "tab\\there"}',
    '{"quote": "she said \\"stop\\" twice", "slash": "a\\/b"}',
    '{"unicode": "\\u00e9\\u4e2d", "raw": "é中文🙂"}',
    '{"nums": [0, 3.14, -2.5e-3, 1E+9, 0.0001, 123456789]}',
    # Depth 6 = the DFA's MAX_DEPTH bound (deeper documents are outside
    # the constrained grammar by design).
    '{"deep": {"a": {"b": {"c": [[]], "d": [1]}}}, "empty": {}}',
    '{"controls": "\\b\\f\\n\\r\\t", "n": null, "t": true, "f": false}',
    '{ "spaced"  :\t[ 1 ,\n 2 ] }',
]


@pytest.fixture(scope="module")
def bl_tok():
    return HFTokenizer(BYTELEVEL)


class TestByteLevelVocab:
    def test_piece_bytes_reconstruct_adversarial_docs(self, bl_tok):
        contents = _vocab_byte_contents(bl_tok, bl_tok.vocab_size)
        assert contents is not None, "byte-level BPE must pass the probe"
        for doc in ADVERSARIAL_DOCS:
            ids = bl_tok.encode(doc)
            parts = [contents[i] for i in ids]
            assert all(p is not None for p in parts), doc
            assert b"".join(parts) == doc.encode("utf-8"), doc
            # And the real detokenizer agrees with the byte map.
            assert bl_tok.decode(ids) == doc

    def test_encoded_docs_walk_tables_to_accept(self, bl_tok):
        tables = json_constraint_tables(bl_tok, bl_tok.vocab_size)
        assert tables is not None
        for doc in ADVERSARIAL_DOCS:
            state = tables.init_state
            for tid in bl_tok.encode(doc):
                assert tables.token_ok[state, tid], (doc, tid, state)
                state = int(tables.token_trans[state, tid])
            assert state == tables.accept_state, doc
            # Only EOS continues from accept.
            allowed = np.flatnonzero(tables.token_ok[state])
            assert allowed.tolist() == [tables.eos_id]

    def test_masked_trajectories_match_detokenizer(self, bl_tok):
        """Greedy decode over random logits under the DFA mask: whatever
        the mask admits must detokenize (through the REAL tokenizer.json
        decoder) to exactly the bytes the DFA tracked."""
        tables = json_constraint_tables(bl_tok, bl_tok.vocab_size)
        assert tables is not None
        rng = np.random.default_rng(0)
        V = bl_tok.vocab_size
        for traj in range(20):
            state = tables.init_state
            remaining = 160
            ids = []
            while True:
                ok = tables.token_ok[state] & (
                    tables.cost_after[state] < remaining
                )
                if not ok.any():
                    # Budget spent to the byte: only legal at ACCEPT (the
                    # invariant close_cost(state) <= remaining means an
                    # empty mask implies close_cost == remaining == 0).
                    assert state == tables.accept_state, (traj, state)
                    break
                logits = rng.standard_normal(V)
                tid = int(np.where(ok, logits, -np.inf).argmax())
                if state == tables.accept_state and tid == tables.eos_id:
                    break
                ids.append(tid)
                state = int(tables.token_trans[state, tid])
                remaining -= 1
                assert remaining >= 0, "feasibility mask must bound length"
            contents = _vocab_byte_contents(bl_tok, V)
            tracked = b"".join(contents[i] for i in ids)
            # Byte-level BPE can emit byte sequences that are not valid
            # UTF-8 (legal inside a JSON string; the host sees U+FFFD).
            # The real detokenizer must agree with the DFA's bytes under
            # the same replacement semantics — and byte-exactly whenever
            # the output IS valid UTF-8.
            tracked_text = tracked.decode("utf-8", errors="replace")
            assert bl_tok.decode(ids) == tracked_text, traj
            try:
                tracked.decode("utf-8")
                assert bl_tok.decode(ids).encode("utf-8") == tracked, traj
            except UnicodeDecodeError:
                pass
            json.loads(tracked_text)  # and it is valid JSON

    def test_schema_exact_engine_round_trips_byte_identically(self, bl_tok):
        """A real Engine over the real vocab file, CONSTRAINED_SCHEMA path:
        the emitted document has EXACTLY the schema's keys and the output
        string equals the detokenization of the generated ids (pinned by
        re-encoding: encode(output) walks the schema DFA to accept)."""
        from vis_tpu.models.common.decoder import (
            DecoderConfig,
            init_decoder_params,
        )
        from vis_tpu.serving.engine import Engine
        from vis_tpu.serving.schema import SCHEMAS, schema_constraint_tables

        config = DecoderConfig(
            vocab_size=bl_tok.vocab_size, hidden_size=64, num_layers=2,
            num_heads=4, num_kv_heads=2, intermediate_size=128,
            qkv_bias=False, tie_word_embeddings=True, dtype=jnp.float32,
        )
        params = init_decoder_params(config, jax.random.PRNGKey(3))
        engine = Engine("real-vocab", config, params, bl_tok,
                        max_cache_tokens=1024)
        out = engine.generate(
            "inspect the casting", max_tokens=512, json_mode=True,
            json_schema="decision_support",
        )
        doc = json.loads(out)
        assert list(doc) == [k for k, _ in SCHEMAS["decision_support"].props]

        # Byte-identity with the DFA's own tracking: the output re-encodes
        # and walks the schema tables to accept.
        tables = schema_constraint_tables(
            bl_tok, bl_tok.vocab_size, "decision_support"
        )
        assert tables is not None
        state = tables.init_state
        for tid in bl_tok.encode(out):
            assert tables.token_ok[state, tid]
            state = int(tables.token_trans[state, tid])
        assert state == tables.accept_state

    def test_generic_json_engine_emits_parseable(self, bl_tok):
        from vis_tpu.models.common.decoder import (
            DecoderConfig,
            init_decoder_params,
        )
        from vis_tpu.serving.engine import Engine

        config = DecoderConfig(
            vocab_size=bl_tok.vocab_size, hidden_size=64, num_layers=2,
            num_heads=4, num_kv_heads=2, intermediate_size=128,
            qkv_bias=False, tie_word_embeddings=True, dtype=jnp.float32,
        )
        params = init_decoder_params(config, jax.random.PRNGKey(4))
        engine = Engine("real-vocab-json", config, params, bl_tok,
                        max_cache_tokens=1024)
        out = engine.generate("report", max_tokens=256, json_mode=True)
        json.loads(out)


class TestSpmVocab:
    def test_dummy_prefix_probe_disables_constrained(self):
        """Metaspace/SentencePiece-style vocab with the dummy leading ▁:
        single-piece byte maps would differ from detokenization by one
        leading space, so the composability probe must return None and
        constrained decode must be disabled (fallback to the robust
        parser), never silently drift."""
        tok = HFTokenizer(SPM)
        # The hazard is real: pieces carry the marker.
        probe = tok._tok.encode(" a", add_special_tokens=False).tokens
        assert any("\u2581" in p for p in probe)
        assert _vocab_byte_contents(tok, tok.vocab_size) is None
        assert json_constraint_tables(tok, tok.vocab_size) is None

    def test_engine_falls_back_to_unconstrained(self):
        from vis_tpu.models.common.decoder import (
            DecoderConfig,
            init_decoder_params,
        )
        from vis_tpu.serving.engine import Engine

        tok = HFTokenizer(SPM)
        config = DecoderConfig(
            vocab_size=tok.vocab_size, hidden_size=64, num_layers=2,
            num_heads=4, num_kv_heads=2, intermediate_size=128,
            qkv_bias=False, tie_word_embeddings=True, dtype=jnp.float32,
        )
        params = init_decoder_params(config, jax.random.PRNGKey(5))
        engine = Engine("spm-vocab", config, params, tok,
                        max_cache_tokens=512)
        # json_mode silently degrades to unconstrained (robust-parser path)
        # instead of erroring or drifting.
        out = engine.generate("report", max_tokens=16, json_mode=True)
        assert isinstance(out, str)
