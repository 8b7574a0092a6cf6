"""Engine + scheduler integration: concurrent (even multimodal) requests
decode in shared batched slots with token-exact results."""

import threading

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from vis_tpu.models.common.decoder import DecoderConfig, init_decoder_params
from vis_tpu.models.qwen2_vl.config import Qwen2VLConfig, VisionConfig
from vis_tpu.models.qwen2_vl.model import init_params as init_qwen_params
from vis_tpu.serving.engine import Engine
from vis_tpu.serving.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def vlm_engines():
    config = Qwen2VLConfig(
        vision=VisionConfig(depth=2, embed_dim=64, num_heads=4, hidden_size=64,
                            dtype=jnp.float32),
        text=DecoderConfig(
            vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128, qkv_bias=True,
            mrope_section=(2, 3, 3), tie_word_embeddings=True,
            dtype=jnp.float32,
        ),
        image_token_id=261, vision_start_token_id=259,
        vision_end_token_id=260, eos_token_id=256,
    )
    params = init_qwen_params(config, jax.random.PRNGKey(1))
    tok = ByteTokenizer(vocab_size=config.text.vocab_size)
    plain = Engine("plain-vlm", config.text, None, tok,
                   vlm_config=config, vlm_params=params, max_cache_tokens=1024)
    scheduled = Engine("sched-vlm", config.text, None, tok,
                       vlm_config=config, vlm_params=params,
                       max_cache_tokens=1024)
    scheduled.attach_scheduler(num_slots=4)
    yield plain, scheduled
    scheduled.detach_scheduler()


@pytest.fixture
def images(tmp_path):
    rng = np.random.default_rng(8)
    paths = []
    for i in range(3):
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
        ).save(p)
        paths.append(p)
    return paths


def test_scheduled_vlm_matches_plain(vlm_engines, images):
    plain, scheduled = vlm_engines
    prompt = "Inspect this part."
    expected = plain.generate(prompt, images[0], max_tokens=8, max_image_dim=256)
    got = scheduled.generate(prompt, images[0], max_tokens=8, max_image_dim=256)
    assert got == expected


def test_concurrent_multimodal_requests(vlm_engines, images):
    plain, scheduled = vlm_engines
    prompt = "Audit carefully."
    expected = [
        plain.generate(prompt, p, max_tokens=6, max_image_dim=256)
        for p in images
    ]
    results = [None] * len(images)

    def worker(i):
        results[i] = scheduled.generate(
            prompt, images[i], max_tokens=6, max_image_dim=256
        )

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert results == expected


def test_sampling_path_bypasses_scheduler(vlm_engines, images):
    _, scheduled = vlm_engines
    out = scheduled.generate(
        "sample", images[0], max_tokens=4, temperature=0.7, max_image_dim=256
    )
    assert isinstance(out, str)


# ---------------------------------------------------------------------------
# Schema-constrained rows in batched decode (stacked constraint tables)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def text_engines():
    config = DecoderConfig(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, qkv_bias=False,
        tie_word_embeddings=True, dtype=jnp.float32,
    )
    params = init_decoder_params(config, jax.random.PRNGKey(5))
    tok = ByteTokenizer(vocab_size=config.vocab_size)
    plain = Engine("plain-text", config, params, tok, max_cache_tokens=1024)
    scheduled = Engine("sched-text", config, params, tok,
                       max_cache_tokens=1024)
    scheduled.attach_scheduler(num_slots=4)
    yield plain, scheduled
    scheduled.detach_scheduler()


def test_schema_batched_matches_unbatched(text_engines):
    """A schema-exact request routed through the scheduler's stacked
    tables (schema_batched=True) must be token-exact vs the engine's
    unbatched fused schema path."""
    import json

    plain, scheduled = text_engines
    prompt = "Estimate repair costs for the dented panel."
    expected = plain.generate(
        prompt, json_mode=True, json_schema="decision_support",
        max_tokens=96,
    )
    got = scheduled.generate(
        prompt, json_mode=True, json_schema="decision_support",
        max_tokens=96, schema_batched=True,
    )
    assert got == expected
    data = json.loads(got)
    assert set(data) >= {"repair_cost_min", "recommendation"}


def test_mixed_free_json_schema_rows_token_exact(text_engines):
    """Free-form, generic-JSON, and schema-exact rows decoding TOGETHER in
    one batch (the explainer bundle shape: narration + counterfactual +
    decision support) each match their single-request outputs."""
    import json

    plain, scheduled = text_engines
    jobs = [
        dict(prompt="Narrate the inspection findings in plain prose.",
             max_tokens=24),
        dict(prompt="Summarize as JSON.", max_tokens=64, json_mode=True),
        dict(prompt="Estimate repair costs.", max_tokens=96, json_mode=True,
             json_schema="decision_support", schema_batched=True),
    ]
    expected = []
    for job in jobs:
        kwargs = {k: v for k, v in job.items() if k != "schema_batched"}
        expected.append(plain.generate(**kwargs))

    results = [None] * len(jobs)
    errors = []

    def worker(i):
        try:
            results[i] = scheduled.generate(**jobs[i])
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors
    assert results == expected
    json.loads(results[2])


def test_explainer_bundle_token_exact(text_engines, monkeypatch):
    """generate_report_bundle (concurrent batched submission) returns the
    same three outputs as the sequential explainer calls."""
    from vis_tpu.agents.explainer import ExplainerAgent
    from vis_tpu.schemas.models import VLMAnalysisResult
    from vis_tpu.serving.engine import EngineBackend
    from vis_tpu.utils.config import config as app_config

    monkeypatch.setattr(app_config, "constrained_json", True)
    monkeypatch.setattr(app_config, "constrained_schema", True)
    monkeypatch.setattr(app_config, "explainer_max_tokens", 48)
    # Token-exactness requires greedy decode: sampled rows draw from a
    # per-chunk RNG fold that differs between batched and sequential runs.
    monkeypatch.setattr(app_config, "explainer_temperature", 0.0)

    plain, scheduled = text_engines
    result = VLMAnalysisResult(
        object_identified="steel bracket",
        overall_condition="damaged",
        defects=[{
            "defect_id": "D1", "type": "crack", "location": "left flange",
            "severity": "HIGH", "confidence": "high",
            "safety_impact": "CRITICAL", "reasoning": "load-bearing member",
            "recommended_action": "replace the bracket",
        }],
        overall_confidence="high",
    )
    consensus = {"combined_defects": [result.defects[0].model_dump()],
                 "models_agree": True, "agreement_score": 0.95}
    verdict = {"verdict": "UNSAFE", "requires_human": False}

    seq_agent = ExplainerAgent(EngineBackend(plain))
    seq = (
        seq_agent.generate_explanation(result, result, consensus, verdict),
        seq_agent.generate_counterfactual(result, verdict),
        seq_agent.generate_decision_support(
            consensus["combined_defects"], "UNSAFE"
        ),
    )
    batched_agent = ExplainerAgent(EngineBackend(scheduled))
    batched = batched_agent.generate_report_bundle(
        result, result, consensus, verdict
    )
    assert batched == seq


def test_generic_json_falls_back_when_table_missing(vlm_engines, monkeypatch):
    """If the scheduler's stacked tables lack the GENERIC grammar (e.g. the
    generic compile failed while schemas succeeded), a json_mode request
    must fall back to the unbatched path instead of erroring in
    submit_prefilled's _check_modes (r3 advisor)."""
    import json as _json

    plain, scheduled = vlm_engines
    sched = scheduled.scheduler
    assert sched.has_table(None)
    # Simulate a schema-only table stack.
    monkeypatch.setattr(
        sched, "_table_index",
        {k: v for k, v in sched._table_index.items() if k is not None},
    )
    monkeypatch.setattr(sched, "_json_tables", None)
    assert not sched.has_table(None)

    expected = plain.generate("report findings", max_tokens=64,
                              json_mode=True)
    got = scheduled.generate("report findings", max_tokens=64,
                             json_mode=True)
    assert got == expected
    _json.loads(got)
