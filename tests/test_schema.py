"""Schema-exact constrained decoding (vis_tpu/serving/schema.py).

The generic-JSON DFA guarantees well-formed output; these tests assert the
stronger contract — the decoded document IS the agents' schema: every key
present, in order, with type-correct values — even from random weights.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vis_tpu.models.common.decoder import DecoderConfig, init_decoder_params
from vis_tpu.serving.constrained import walk_document
from vis_tpu.serving.engine import Engine
from vis_tpu.serving.schema import (
    SCHEMAS,
    SArray,
    SEnum,
    SNumber,
    SObject,
    SString,
    SchemaDfa,
    get_schema_dfa,
    schema_constraint_tables,
)
from vis_tpu.serving.tokenizer import ByteTokenizer

INSPECTION_KEYS = [
    "object_identified", "overall_condition", "defects",
    "overall_confidence", "analysis_reasoning",
]
DEFECT_KEYS = [
    "type", "location", "bbox", "safety_impact", "reasoning",
    "confidence", "recommended_action",
]


def _accepts(dfa: SchemaDfa, doc: bytes) -> bool:
    s = dfa.start_id
    for b in doc:
        s = int(dfa.trans_table[s, b])
        if s < 0:
            return False
    return s == dfa.accept_id


def _good_inspection(n_defects: int = 1) -> bytes:
    return json.dumps({
        "object_identified": "steel bracket",
        "overall_condition": "damaged",
        "defects": [{
            "type": "hairline_crack",
            "location": "upper left flange",
            "bbox": {"x": 12.5, "y": 30, "width": 8, "height": 4},
            "safety_impact": "CRITICAL",
            "reasoning": "through-thickness crack risks failure",
            "confidence": "high",
            "recommended_action": "remove from service",
        }] * n_defects,
        "overall_confidence": "high",
        "analysis_reasoning": "one critical crack found on the flange",
    }, separators=(",", ":")).encode()


class TestSchemaDfa:
    def test_accepts_conforming_documents(self):
        dfa = get_schema_dfa("inspection")
        assert _accepts(dfa, _good_inspection(0))
        assert _accepts(dfa, _good_inspection(1))
        assert _accepts(dfa, _good_inspection(3))

    @pytest.mark.parametrize("mutate", [
        lambda d: b"{}",
        lambda d: d.replace(b'"damaged"', b'"broken"'),      # bad enum
        lambda d: d.replace(b'"defects"', b'"defect"'),      # bad key
        lambda d: d.replace(b'"x":12.5', b'"x":"12.5"'),     # string not number
        lambda d: d[:-1] + b" }",                             # whitespace
        lambda d: d[:-1],                                     # truncated
        lambda d: d.replace(                                  # keys out of order
            b'"object_identified":"steel bracket","overall_condition":"damaged"',
            b'"overall_condition":"damaged","object_identified":"steel bracket"',
        ),
    ])
    def test_rejects_nonconforming(self, mutate):
        dfa = get_schema_dfa("inspection")
        assert not _accepts(dfa, mutate(_good_inspection()))

    def test_decision_support_schema(self):
        dfa = get_schema_dfa("decision_support")
        doc = json.dumps({
            "repair_cost_min": 120, "repair_cost_max": 450.5,
            "replace_cost_estimate": 2100,
            "repair_time_estimate": "2-4 hours",
            "replace_lead_time": "3-5 days",
            "recommendation": "REPAIR", "reasoning": "cheap fix",
        }, separators=(",", ":")).encode()
        assert _accepts(dfa, doc)
        assert not _accepts(dfa, doc.replace(b'"REPAIR"', b'"PATCH"'))

    def test_string_min_len(self):
        dfa = SchemaDfa(SObject((("a", SString(min_len=5)),)))
        assert _accepts(dfa, b'{"a":"hello"}')
        assert _accepts(dfa, b'{"a":"hello world"}')
        assert not _accepts(dfa, b'{"a":"hi"}')
        # escapes count as one character
        assert _accepts(dfa, b'{"a":"hi\\n\\t\\u0041"}')

    def test_number_forms(self):
        dfa = SchemaDfa(SObject((("n", SNumber()),)))
        for n in (b"0", b"-7", b"12.75", b"1e9", b"-2.5E-3"):
            assert _accepts(dfa, b'{"n":' + n + b"}"), n
        for n in (b"01", b"+1", b".5", b"1.", b'"1"'):
            assert not _accepts(dfa, b'{"n":' + n + b"}"), n

    def test_array_min_items(self):
        spec = SObject((("xs", SArray(SNumber(), min_items=1)),))
        dfa = SchemaDfa(spec)
        assert not _accepts(dfa, b'{"xs":[]}')
        assert _accepts(dfa, b'{"xs":[1]}')
        assert _accepts(dfa, b'{"xs":[1,2.5,3e2]}')

    def test_close_cost_matches_shortest_doc(self):
        dfa = SchemaDfa(SObject((("k", SEnum(("ab", "xyz"))),)))
        # shortest: {"k":"ab"} = 10 bytes
        assert int(dfa.close_cost[dfa.start_id]) == 10


class TestSchemaTables:
    def test_byte_tokenizer_tables(self):
        tok = ByteTokenizer(vocab_size=512)
        tables = schema_constraint_tables(tok, 512, "inspection")
        assert tables is not None
        end = walk_document(tables, list(_good_inspection()))
        assert end == tables.accept_state
        # EOS is the unique action at accept
        ok = tables.token_ok[tables.accept_state]
        assert ok[tok.eos_id] and ok.sum() == 1

    def test_funnel_completes_any_budget(self):
        """Random logits through the feasibility mask always yield a
        schema-conforming document within the budget."""
        tok = ByteTokenizer(vocab_size=512)
        tables = schema_constraint_tables(tok, 512, "decision_support")
        dfa = get_schema_dfa("decision_support")
        rng = np.random.default_rng(7)
        for _ in range(25):
            budget = int(rng.integers(tables.min_budget, 400))
            state, out, remaining = tables.init_state, [], budget
            while remaining > 0:
                allowed = tables.token_ok[state] & (
                    tables.cost_after[state] < remaining
                )
                assert allowed.any(), (state, remaining)
                token = int(np.argmax(
                    np.where(allowed, rng.normal(size=262), -1e30)
                ))
                if token == tok.eos_id and state == tables.accept_state:
                    break
                out.append(token)
                state = int(tables.token_trans[state, token])
                remaining -= 1
            doc = bytes(i for i in out if i < 256)
            assert _accepts(dfa, doc), doc

    def test_all_registered_schemas_compile(self):
        tok = ByteTokenizer(vocab_size=512)
        for name in SCHEMAS:
            assert schema_constraint_tables(tok, 512, name) is not None


@pytest.fixture(scope="module")
def schema_engine():
    config = DecoderConfig(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, qkv_bias=False,
        tie_word_embeddings=True, dtype=jnp.float32,
    )
    params = init_decoder_params(config, jax.random.PRNGKey(3))
    tok = ByteTokenizer(vocab_size=config.vocab_size)
    return Engine("tiny-schema", config, params, tok, max_cache_tokens=1024)


class TestEngineSchemaMode:
    def test_inspection_schema_exact(self, schema_engine):
        out = schema_engine.generate(
            "Inspect this.", None, max_tokens=320, json_mode=True,
            json_schema="inspection",
        )
        doc = json.loads(out)
        assert list(doc.keys()) == INSPECTION_KEYS
        assert doc["overall_condition"] in ("damaged", "good", "uncertain")
        assert doc["overall_confidence"] in ("high", "medium", "low")
        assert isinstance(doc["defects"], list)
        for defect in doc["defects"]:
            assert list(defect.keys()) == DEFECT_KEYS
            assert set(defect["bbox"].keys()) == {"x", "y", "width", "height"}
            for v in defect["bbox"].values():
                assert isinstance(v, (int, float))
            assert defect["safety_impact"] in (
                "CRITICAL", "MODERATE", "COSMETIC"
            )

    def test_schema_mode_deterministic(self, schema_engine):
        a = schema_engine.generate(
            "Same.", None, max_tokens=280, json_mode=True,
            json_schema="inspection",
        )
        b = schema_engine.generate(
            "Same.", None, max_tokens=280, json_mode=True,
            json_schema="inspection",
        )
        assert a == b

    def test_decision_support_schema_exact(self, schema_engine):
        out = schema_engine.generate(
            "Estimate.", None, max_tokens=280, json_mode=True,
            json_schema="decision_support",
        )
        doc = json.loads(out)
        assert doc["recommendation"] in ("REPAIR", "REPLACE")
        assert isinstance(doc["repair_cost_min"], (int, float))

    def test_min_tokens_floor_with_schema(self, schema_engine, monkeypatch):
        """The document-length floor must not dead-end on forced-close
        states (the final '}' has no open continuation)."""
        from vis_tpu.utils.config import config as app_config

        monkeypatch.setattr(app_config, "constrained_json_min_tokens", 220)
        out = schema_engine.generate(
            "grow", None, max_tokens=320, json_mode=True,
            json_schema="inspection",
        )
        doc = json.loads(out)
        assert list(doc.keys()) == INSPECTION_KEYS
        assert schema_engine.last_decode_tokens >= 220

    def test_unknown_schema_name_raises(self, schema_engine):
        with pytest.raises(KeyError):
            schema_engine.generate(
                "x", None, max_tokens=160, json_mode=True,
                json_schema="not_registered",
            )

    def test_sampled_schema_mode(self, schema_engine):
        out = schema_engine.generate(
            "sampled", None, max_tokens=320, temperature=0.9,
            json_mode=True, json_schema="inspection",
        )
        assert list(json.loads(out).keys()) == INSPECTION_KEYS


class TestLookaheadDecode:
    """CONSTRAINED_LOOKAHEAD: forced-run fast-forward windows must change
    the dispatch structure, not the output."""

    def test_matches_step_by_step(self, schema_engine, monkeypatch):
        from vis_tpu.utils.config import config as app_config

        base = schema_engine.generate(
            "Inspect.", None, max_tokens=300, json_mode=True,
            json_schema="inspection",
        )
        monkeypatch.setattr(app_config, "constrained_lookahead", 8)
        look = schema_engine.generate(
            "Inspect.", None, max_tokens=300, json_mode=True,
            json_schema="inspection",
        )
        assert look == base

    def test_chunk_boundaries_stable(self, schema_engine, monkeypatch):
        from vis_tpu.utils.config import config as app_config

        monkeypatch.setattr(app_config, "constrained_lookahead", 4)
        wide = schema_engine.generate(
            "chunks", None, max_tokens=260, json_mode=True,
            json_schema="inspection",
        )
        old = schema_engine.decode_chunk
        try:
            schema_engine.decode_chunk = 5  # many dispatch hand-offs
            narrow = schema_engine.generate(
                "chunks", None, max_tokens=260, json_mode=True,
                json_schema="inspection",
            )
        finally:
            schema_engine.decode_chunk = old
        assert wide == narrow

    def test_sampled_lookahead_parses(self, schema_engine, monkeypatch):
        from vis_tpu.utils.config import config as app_config

        monkeypatch.setattr(app_config, "constrained_lookahead", 8)
        out = schema_engine.generate(
            "sampled", None, max_tokens=300, temperature=0.7,
            json_mode=True, json_schema="inspection",
        )
        assert list(json.loads(out).keys()) == INSPECTION_KEYS

    def test_generic_json_lookahead(self, schema_engine, monkeypatch):
        """Lookahead composes with the generic grammar too (few forced
        states — accept-EOS mainly — but must stay correct)."""
        from vis_tpu.utils.config import config as app_config

        monkeypatch.setattr(app_config, "constrained_lookahead", 4)
        out = schema_engine.generate(
            "generic", None, max_tokens=96, json_mode=True,
        )
        assert isinstance(json.loads(out), dict)

    def test_forced_tables_cover_skeleton(self):
        """Most schema states are forced (that is the whole point)."""
        tok = ByteTokenizer(vocab_size=512)
        tables = schema_constraint_tables(tok, 512, "inspection")
        frac = (tables.forced_token >= 0).mean()
        assert frac > 0.3
        # the accept state forces EOS
        assert tables.forced_token[tables.accept_state] == tok.eos_id


class TestMllamaSchemaLookahead:
    @pytest.fixture(scope="class")
    def mllama_engine(self):
        from vis_tpu.models.llama.mllama import (
            MllamaConfig,
            MllamaVisionConfig,
            init_params,
        )
        from vis_tpu.serving.engine_mllama import MllamaEngine

        cfg = MllamaConfig(
            vision=MllamaVisionConfig(
                hidden_size=64, num_layers=2, num_global_layers=1,
                attention_heads=4, intermediate_size=128,
                intermediate_layers_indices=(1,),
            ),
            text=DecoderConfig(
                vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                num_kv_heads=2, intermediate_size=128, rope_theta=500000.0,
                qkv_bias=False, tie_word_embeddings=True, dtype=jnp.float32,
            ),
            cross_attention_layers=(1,),
            image_token_id=261, eos_token_id=256,
        )
        params = init_params(cfg, jax.random.PRNGKey(5))
        from vis_tpu.serving.engine_mllama import MllamaEngine

        return MllamaEngine(
            "tiny-mllama-schema", cfg, params,
            ByteTokenizer(vocab_size=cfg.text.vocab_size),
            max_cache_tokens=1024,
        )

    def test_schema_exact(self, mllama_engine):
        out = mllama_engine.generate(
            "audit", None, max_tokens=300, json_mode=True,
            json_schema="inspection",
        )
        assert list(json.loads(out).keys()) == INSPECTION_KEYS

    def test_lookahead_matches_step_by_step(self, mllama_engine, monkeypatch):
        from vis_tpu.utils.config import config as app_config

        base = mllama_engine.generate(
            "audit", None, max_tokens=300, json_mode=True,
            json_schema="inspection",
        )
        monkeypatch.setattr(app_config, "constrained_lookahead", 8)
        look = mllama_engine.generate(
            "audit", None, max_tokens=300, json_mode=True,
            json_schema="inspection",
        )
        assert look == base


class TestAgentSchemaMode:
    def test_inspector_through_schema_engine(self, schema_engine, monkeypatch):
        """CONSTRAINED_SCHEMA=true end-to-end through the inspector agent:
        a random-weight engine still yields a parsed, schema-shaped
        VLMAnalysisResult (no robust-parser salvage involved)."""
        from vis_tpu.agents.inspector import VLMInspectorAgent
        from vis_tpu.schemas import InspectionContext
        from vis_tpu.serving.engine import EngineBackend
        from vis_tpu.utils.config import config as app_config

        monkeypatch.setattr(app_config, "constrained_json", True)
        monkeypatch.setattr(app_config, "constrained_schema", True)
        monkeypatch.setattr(app_config, "vlm_inspector_max_tokens", 320)
        agent = VLMInspectorAgent(EngineBackend(schema_engine))
        ctx = InspectionContext(
            image_id="t1", image_path="assets/sample.jpg",
            criticality="high", domain="general",
        )
        result = agent.analyze("assets/sample.jpg", ctx)
        assert not result.analysis_failed
        assert result.overall_condition in ("damaged", "good", "uncertain")
        assert result.overall_confidence in ("high", "medium", "low")
