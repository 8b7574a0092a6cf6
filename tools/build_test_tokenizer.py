"""Build REAL `tokenizer.json` vocabularies for constrained-decode tests.

This environment has no network and no vendored model checkpoints, so the
actual Llama/Qwen vocab files cannot be fetched — but the HF `tokenizers`
library (the exact runtime that loads production tokenizer.json files) is
present.  This tool TRAINS two genuine BPE tokenizers on a deterministic
JSON-heavy corpus and saves them in the standard tokenizer.json format:

- ``bytelevel_bpe.tokenizer.json`` — ByteLevel BPE with the GPT-2
  byte-to-unicode alphabet and Llama-3-style special tokens.  This is the
  same mechanism (model class, pre-tokenizer, decoder, piece alphabet) as
  the Llama-3.1 / Llama-3.2 / Qwen2 production vocabularies the serving
  engines load (reference src/agents/vlm_inspector.py:433 names the
  models); only the merge list is smaller.
- ``spm_bpe.tokenizer.json`` — Metaspace (SentencePiece-style) BPE whose
  pieces carry the U+2581 leading-space marker, the exact detokenization
  hazard the round-2 advisor flagged for the DFA's piece-byte tracking.

tests/test_constrained_real_vocab.py loads these through the production
``HFTokenizer`` wrapper and asserts the constrained decoder's byte
tracking matches the real detokenizer byte-for-byte.

Run from the repo root:  python tools/build_test_tokenizer.py
The artifacts under assets/tokenizers/ are committed; re-running must be
deterministic (fixed corpus, fixed trainer settings).
"""

from __future__ import annotations

import json
from pathlib import Path

from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

REPO = Path(__file__).resolve().parents[1]
OUT_DIR = REPO / "assets" / "tokenizers"

VOCAB_SIZE = 2048


def _corpus() -> list:
    """Deterministic JSON-heavy text: inspection-shaped documents plus
    adversarial strings (escapes, unicode, deep nesting, exotic numbers)
    so the trained merges cover real constrained-decode output."""
    docs = []
    defect_types = [
        "crack", "corrosion", "dent", "scratch", "porosity", "misalignment",
        "missing component", "discoloration", "deformation", "contamination",
    ]
    severities = ["CRITICAL", "MODERATE", "MINOR"]
    locations = [
        "upper left quadrant", "lower right corner", "center weld seam",
        "mounting hole rim", "outer edge", "surface near fastener",
    ]
    for i, d in enumerate(defect_types):
        for j, s in enumerate(severities):
            doc = {
                "defects_found": bool((i + j) % 2),
                "defect_count": (i * 3 + j) % 7,
                "defects": [
                    {
                        "type": d,
                        "location": locations[(i + j) % len(locations)],
                        "description": f"a {s.lower()} {d} observed during "
                                       "automated inspection of the part",
                        "safety_impact": s,
                        "confidence": ["high", "medium", "low"][j % 3],
                        "bbox": [10 * i, 5 * j, 10 * i + 40, 5 * j + 30],
                    }
                ],
                "overall_assessment": f"component shows {d} requiring review",
                "confidence": round(0.5 + 0.04 * ((i + j) % 12), 2),
            }
            docs.append(json.dumps(doc))
            docs.append(json.dumps(doc, indent=2))
    # Adversarial content: escapes, unicode escapes, multi-byte UTF-8,
    # exotic-but-legal numbers, deep nesting, empty containers.
    docs += [
        '{"path": "C:\\\\parts\\\\unit_7\\\\scan.jpg", "note": "tab\\there"}',
        '{"quote": "she said \\"stop\\" twice", "slash": "a\\/b"}',
        '{"unicode": "\\u00e9\\u4e2d\\ud83d\\ude00", "raw": "é中文🙂"}',
        '{"nums": [0, -0, 3.14, -2.5e-3, 1E+9, 0.0001, 123456789]}',
        '{"deep": {"a": {"b": {"c": [[[]]], "d": [{}]}}}, "empty": {}}',
        '{"ws": "space tab\\tnewline\\ncarriage\\rreturn"}',
        '{"controls": "\\b\\f\\n\\r\\t", "null_like": null, "t": true, "f": false}',
        "the explainer narrates verdicts in plain language with cost and "
        "time estimates for repair versus replacement decisions",
        "verdict SAFE UNSAFE NEEDS_HUMAN_REVIEW agreement consensus gates",
    ]
    return docs


def build_bytelevel(out: Path) -> None:
    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=VOCAB_SIZE,
        special_tokens=[
            "<|begin_of_text|>", "<|eot_id|>", "<|image|>",
            "<|finetune_right_pad_id|>",
        ],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(_corpus(), trainer)
    tok.save(str(out))
    print(f"wrote {out} (vocab {tok.get_vocab_size()})")


def build_spm(out: Path) -> None:
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    # prepend_scheme="always" reproduces SentencePiece's dummy-prefix
    # behavior (a leading ▁ on the first word) — the exact encode-side
    # asymmetry the composability probe must catch.
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="\u2581", prepend_scheme="always"
    )
    tok.decoder = decoders.Metaspace(
        replacement="\u2581", prepend_scheme="always"
    )
    ascii_alphabet = [chr(c) for c in range(0x20, 0x7F)] + [
        "\u2581", "\t", "\n", "\r", "é", "中", "文", "🙂",
    ]
    trainer = trainers.BpeTrainer(
        vocab_size=VOCAB_SIZE,
        special_tokens=["<unk>", "<s>", "</s>"],
        initial_alphabet=ascii_alphabet,
        show_progress=False,
    )
    tok.train_from_iterator(_corpus(), trainer)
    tok.save(str(out))
    print(f"wrote {out} (vocab {tok.get_vocab_size()})")


if __name__ == "__main__":
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    build_bytelevel(OUT_DIR / "bytelevel_bpe.tokenizer.json")
    build_spm(OUT_DIR / "spm_bpe.tokenizer.json")
