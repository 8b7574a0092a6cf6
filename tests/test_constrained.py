"""JSON-grammar constrained decoding (vis_tpu/serving/constrained.py).

SURVEY §7 hard part 6: the reference *recovers* from malformed model JSON
with a 3-strategy parser (reference src/agents/vlm_inspector.py:142); the
constrained decoder *prevents* it — every emitted document must parse, even
from random weights, and must close within the token budget.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vis_tpu.models.common.decoder import DecoderConfig, init_decoder_params
from vis_tpu.serving.constrained import (
    _JsonDfa,
    json_constraint_tables,
    walk_document,
)
from vis_tpu.serving.engine import Engine
from vis_tpu.serving.tokenizer import ByteTokenizer


def _dfa_accepts(dfa: _JsonDfa, text: str) -> bool:
    state = dfa.start_id
    for byte in text.encode():
        state = dfa.trans_table[state, byte]
        if state < 0:
            return False
    return state == dfa.accept_id


class TestJsonDfa:
    def setup_method(self):
        self.dfa = _JsonDfa()

    @pytest.mark.parametrize(
        "doc",
        [
            "{}",
            '{"a": 1}',
            '{"a": [1, 2.5e-3, "x", true, false, null, {"b": {}}]}',
            '{ "k" : [ ] }',
            '{"neg": -0.5, "zero": 0, "exp": 1E+10}',
            '{"esc": "a\\"b\\\\c\\n\\u00Ff"}',
            '{"nested": {"deep": {"arr": [[1], [2]]}}}',
        ],
    )
    def test_accepts_valid_json(self, doc):
        assert _dfa_accepts(self.dfa, doc)
        json.loads(doc)  # cross-check against the host parser

    @pytest.mark.parametrize(
        "doc",
        [
            "",
            "[1]",            # root must be an object (agent contract)
            "{",
            '{"a": 01}',      # leading zero
            '{"a": 1,}',      # trailing comma
            '{"a" 1}',        # missing colon
            '{"a": tru}',
            '{"a": 1}}',
            '{"a": .5}',
            '{"a": "\\x"}',   # bad escape
            '{"a": 1} x',     # trailing garbage
            '{"a": 1e}',      # dangling exponent
        ],
    )
    def test_rejects_invalid_json(self, doc):
        assert not _dfa_accepts(self.dfa, doc)

    def test_close_cost_start(self):
        # Shortest document from scratch is "{}" = 2 bytes.
        assert self.dfa.close_cost[self.dfa.start_id] == 2


class TestConstraintTables:
    def test_byte_tokenizer_tables(self):
        tok = ByteTokenizer(vocab_size=512)
        tables = json_constraint_tables(tok, 512)
        assert tables is not None
        # Byte tokenizer tables are narrow: only ids < 262 carry content.
        assert tables.token_ok.shape[1] == 262
        # A full valid document walks to ACCEPT, where only EOS is allowed.
        state = walk_document(tables, list('{"a": [1, true]}'.encode()))
        assert state == tables.accept_state
        row = tables.token_ok[state]
        assert row[tok.eos_id] and row.sum() == 1

    def test_wide_vocab_falls_back(self):
        class FakeTok:
            vocab_size = 200_000
            eos_id = 0

            def decode(self, ids):
                return ""

        assert json_constraint_tables(FakeTok(), 200_000) is None

    def test_funnel_completes_any_budget(self):
        """Random logits + the feasibility mask always yield parseable JSON
        within the budget (the invariant the device scan relies on)."""
        tok = ByteTokenizer(vocab_size=512)
        tables = json_constraint_tables(tok, 512)
        rng = np.random.default_rng(42)
        for _ in range(100):
            budget = int(rng.integers(tables.min_budget, 96))
            state, out, remaining = tables.init_state, [], budget
            while remaining > 0:
                allowed = tables.token_ok[state] & (
                    tables.cost_after[state] < remaining
                )
                assert allowed.any(), (state, remaining)
                logits = np.where(allowed, rng.normal(size=262), -1e30)
                token = int(np.argmax(logits))
                if token == tok.eos_id and state == tables.accept_state:
                    break
                out.append(token)
                state = int(tables.token_trans[state, token])
                remaining -= 1
            text = bytes(i for i in out if i < 256).decode("utf-8", "replace")
            json.loads(text)


@pytest.fixture(scope="module")
def text_engine():
    config = DecoderConfig(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, qkv_bias=False,
        tie_word_embeddings=True, dtype=jnp.float32,
    )
    params = init_decoder_params(config, jax.random.PRNGKey(0))
    tok = ByteTokenizer(vocab_size=config.vocab_size)
    return Engine("tiny-json", config, params, tok, max_cache_tokens=512)


class TestEngineJsonMode:
    def test_greedy_json_mode_parses(self, text_engine):
        out = text_engine.generate(
            "Return inspection JSON.", None, max_tokens=96, json_mode=True
        )
        doc = json.loads(out)  # must parse as-is, no repair
        assert isinstance(doc, dict)

    def test_json_mode_deterministic(self, text_engine):
        a = text_engine.generate("Same prompt.", None, max_tokens=64, json_mode=True)
        b = text_engine.generate("Same prompt.", None, max_tokens=64, json_mode=True)
        assert a == b

    def test_tight_budget_still_closes(self, text_engine):
        out = text_engine.generate("x", None, max_tokens=8, json_mode=True)
        json.loads(out)

    def test_chunk_boundaries_do_not_change_output(self, text_engine):
        wide = text_engine.generate("chunk test", None, max_tokens=90, json_mode=True)
        old = text_engine.decode_chunk
        try:
            text_engine.decode_chunk = 7  # force many chunk hand-offs
            narrow = text_engine.generate(
                "chunk test", None, max_tokens=90, json_mode=True
            )
        finally:
            text_engine.decode_chunk = old
        assert wide == narrow

    def test_sampling_json_mode_parses(self, text_engine):
        out = text_engine.generate(
            "sampled", None, max_tokens=96, temperature=0.8, json_mode=True
        )
        json.loads(out)

    def test_min_tokens_floor(self, text_engine, monkeypatch):
        """CONSTRAINED_JSON_MIN_TOKENS blocks closing the root early: the
        document grows to at least the floor, still parses, still ends."""
        from vis_tpu.utils.config import config as app_config

        monkeypatch.setattr(app_config, "constrained_json_min_tokens", 64)
        out = text_engine.generate("grow", None, max_tokens=128, json_mode=True)
        json.loads(out)
        assert text_engine.last_decode_tokens >= 64
        # Floor off: output still parses (length is weight-dependent).
        monkeypatch.setattr(app_config, "constrained_json_min_tokens", 0)
        json.loads(
            text_engine.generate("grow", None, max_tokens=128, json_mode=True)
        )

    def test_unconstrained_output_differs(self, text_engine):
        """Sanity: random weights without the mask do NOT emit valid JSON
        (otherwise these tests prove nothing)."""
        out = text_engine.generate("Return inspection JSON.", None, max_tokens=96)
        with pytest.raises(Exception):
            json.loads(out)


class TestSchedulerJsonMode:
    """json_mode composes with continuous batching: per-slot DFA rows in the
    shared batched chunk; plain rows stay mask-free (token-exact)."""

    def _engine(self, paged: bool):
        config = DecoderConfig(
            vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128, qkv_bias=False,
            tie_word_embeddings=True, dtype=jnp.float32,
        )
        params = init_decoder_params(config, jax.random.PRNGKey(0))
        tok = ByteTokenizer(vocab_size=config.vocab_size)
        engine = Engine("sched-json", config, params, tok,
                        max_cache_tokens=512)
        engine.attach_scheduler(num_slots=2, paged=paged)
        return engine

    @pytest.mark.parametrize("paged", [False, True])
    def test_mixed_batch(self, paged, monkeypatch):
        if paged:
            monkeypatch.setenv("KV_PAGE_SIZE", "64")
            monkeypatch.setenv("KV_POOL_TOKENS", "2048")
            from vis_tpu.utils.config import get_config

            get_config(reload=True)
        engine = self._engine(paged)
        try:
            # Reference output: plain request without any scheduler
            # (_finish is idempotent on the already-stacked params).
            plain_ref = Engine(
                "plain-ref", engine.text_config,
                engine.text_params, engine.tokenizer, max_cache_tokens=512,
            )
            baseline = "".join(plain_ref._generate_locked(
                "free-form request", None, max_tokens=48,
                temperature=0.0, max_image_dim=2048,
            ))

            import threading

            results = {}

            def run(tag, prompt, **kwargs):
                results[tag] = engine.generate(prompt, **kwargs)

            t1 = threading.Thread(
                target=run, args=("json", "emit JSON"),
                kwargs={"max_tokens": 64, "json_mode": True},
            )
            t2 = threading.Thread(
                target=run, args=("plain", "free-form request"),
                kwargs={"max_tokens": 48},
            )
            t1.start(); t2.start(); t1.join(60); t2.join(60)

            doc = json.loads(results["json"])  # parses as-is
            assert isinstance(doc, dict)
            assert results["plain"] == baseline  # mask-free row untouched
        finally:
            engine.detach_scheduler()
            from vis_tpu.utils.config import get_config

            get_config(reload=True)


class TestMllamaJsonMode:
    def test_mllama_json_mode_parses(self):
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
        params = init_params(cfg, jax.random.PRNGKey(3))
        tok = ByteTokenizer(vocab_size=cfg.text.vocab_size)
        engine = MllamaEngine("tiny-mllama-json", cfg, params, tok,
                              max_cache_tokens=512)
        out = engine.generate("audit JSON", None, max_tokens=80, json_mode=True)
        doc = json.loads(out)
        assert isinstance(doc, dict)
        again = engine.generate("audit JSON", None, max_tokens=80, json_mode=True)
        assert out == again


class _FakeSpmTokenizer:
    """SentencePiece-style test double: pieces use U+2581 for space and the
    vocab is one piece per printable char.  Its standalone ``decode([id])``
    strips the leading space marker — the exact divergence that forces the
    table compiler to derive bytes from vocab PIECES, never from decode()."""

    def __init__(self, eos_id=None, swap=False, corrupt=False):
        chars = [chr(c) for c in range(0x20, 0x7F)] + ["\t", "\n"]
        if swap:  # same class/width, different vocab contents
            i, j = chars.index("!"), chars.index("~")
            chars[i], chars[j] = chars[j], chars[i]
        self._pieces = {}
        self._ids = {}
        for i, ch in enumerate(chars):
            self._pieces[i] = "▁" if ch == " " else ch
            self._ids[ch] = i
        self.vocab_size = len(chars) + 1
        self.eos_id = len(chars) if eos_id is None else eos_id
        if corrupt:
            # Piece table lies about one char; the round-trip probe in
            # _vocab_byte_contents must catch the drift.
            self._pieces[self._ids["b"]] = "c"

    def encode(self, text):
        return [self._ids[ch] for ch in text]

    def decode(self, ids):
        out = "".join(
            self._pieces.get(i, "") for i in ids if i != self.eos_id
        ).replace("▁", " ")
        return out.lstrip(" ")  # SPM single-token strip behavior

    def convert_ids_to_tokens(self, i):
        return self._pieces.get(int(i))


class TestPieceByteDerivation:
    """Token byte content comes from vocab pieces, not decode([id])
    (round-2 advisor finding: SPM-family standalone decode strips leading
    space markers, which would let 'constrained' output drift invalid)."""

    def test_spm_pieces_compose_and_compile(self):
        from vis_tpu.serving.constrained import _vocab_byte_contents

        tok = _FakeSpmTokenizer()
        space = tok._ids[" "]
        # The trap is real on this double: decode([space]) loses the space.
        assert tok.decode([space]) == ""
        contents = _vocab_byte_contents(tok, tok.vocab_size)
        assert contents is not None
        assert contents[space] == b" "
        assert contents[tok.eos_id] is None  # special, not raw content
        tables = json_constraint_tables(tok, tok.vocab_size)
        assert tables is not None
        doc = '{"verdict": "SAFE", "count": 3}'
        state = walk_document(tables, tok.encode(doc))
        assert tables.token_ok[state, tok.eos_id]  # EOS legal at accept

    def test_piece_bytes_families(self):
        from vis_tpu.serving.constrained import _piece_bytes

        assert _piece_bytes("<0x0A>", "spm") == b"\n"  # byte fallback
        assert _piece_bytes("▁ab", "spm") == b" ab"
        assert _piece_bytes("Ġa", "bytelevel") == b" a"  # GPT-2 map
        assert _piece_bytes(None, "spm") is None
        assert _piece_bytes("", "bytelevel") is None

    def test_noncomposable_vocab_disables_constrained_decode(self):
        from vis_tpu.serving.constrained import _vocab_byte_contents

        tok = _FakeSpmTokenizer(corrupt=True)
        assert _vocab_byte_contents(tok, tok.vocab_size) is None
        # Engines then decode unconstrained + robust-parse, never emit a
        # DFA-"valid" document whose detokenization differs.
        assert json_constraint_tables(tok, tok.vocab_size) is None

    def test_cache_separation_by_vocab_and_eos(self):
        from vis_tpu.serving.constrained import _tokenizer_fingerprint

        base = _FakeSpmTokenizer()
        swapped = _FakeSpmTokenizer(swap=True)
        other_eos = _FakeSpmTokenizer(eos_id=999)
        # Same class + width must NOT share compiled tables when the vocab
        # contents or eos differ (round-2 advisor finding on cache keys).
        assert _tokenizer_fingerprint(base, base.vocab_size) != (
            _tokenizer_fingerprint(swapped, swapped.vocab_size)
        )
        assert _tokenizer_fingerprint(base, base.vocab_size) != (
            _tokenizer_fingerprint(other_eos, other_eos.vocab_size)
        )
        ta = json_constraint_tables(base, base.vocab_size)
        tb = json_constraint_tables(swapped, swapped.vocab_size)
        assert ta is not None and tb is not None
        assert ta is not tb
