"""Foundation-layer tests: config, validators, image quality, aggregation,
prompts, logger."""

import numpy as np
import pytest

from vis_tpu.orchestration.session_aggregation import (
    aggregate_session_results,
    determine_aggregate_verdict,
)
from vis_tpu.safety.image_quality import assess_image_quality
from vis_tpu.ops.quality import laplacian_variance_jax, laplacian_variance_np
from vis_tpu.utils.config import Config, get_config
from vis_tpu.utils.prompts import PROMPT_REGISTRY, get_prompt
from vis_tpu.utils.validators import (
    sanitize_filename,
    validate_criticality,
    validate_domain,
    validate_image_path,
    validate_inspection_context,
    validate_request_id,
    validate_user_notes,
)


class TestConfig:
    def test_defaults_valid(self):
        cfg = Config()
        assert cfg.max_defects_auto == 2
        assert cfg.mesh_shape_tuple == (1, 1)
        assert cfg.prefill_bucket_list[0] == 512

    def test_invalid_mesh_rejected(self):
        with pytest.raises(Exception):
            Config(mesh_shape="banana")

    def test_env_override(self, monkeypatch):
        monkeypatch.setenv("MAX_DEFECTS_AUTO", "5")
        monkeypatch.setenv("USE_MOCK_RESPONSES", "true")
        cfg = get_config(reload=True)
        assert cfg.max_defects_auto == 5
        assert cfg.use_mock_responses is True
        monkeypatch.delenv("MAX_DEFECTS_AUTO")
        monkeypatch.delenv("USE_MOCK_RESPONSES")
        get_config(reload=True)

    def test_models_yaml_layer(self, tmp_path, monkeypatch):
        """configs/models.yaml feeds per-agent fields; env vars beat it."""
        from vis_tpu.utils import config as config_mod

        yml = tmp_path / "models.yaml"
        yml.write_text(
            "inspector:\n"
            "  model_id: yaml/inspector\n"
            "  temperature: 0.42\n"
            "  max_tokens: 123\n"
            "explainer:\n"
            "  provider: mock\n"
        )
        loaded = config_mod._load_models_yaml(yml)
        assert loaded["VLM_INSPECTOR_MODEL"] == "yaml/inspector"
        assert loaded["VLM_INSPECTOR_MAX_TOKENS"] == "123"
        assert loaded["EXPLAINER_PROVIDER"] == "mock"

        monkeypatch.setattr(config_mod, "MODELS_YAML_PATH", yml)
        cfg = get_config(reload=True)
        assert cfg.vlm_inspector_model == "yaml/inspector"
        assert cfg.vlm_inspector_temperature == 0.42
        assert cfg.vlm_inspector_max_tokens == 123
        assert cfg.explainer_provider == "mock"
        # env var wins over the yaml layer
        monkeypatch.setenv("VLM_INSPECTOR_MODEL", "env/inspector")
        cfg = get_config(reload=True)
        assert cfg.vlm_inspector_model == "env/inspector"
        assert cfg.vlm_inspector_max_tokens == 123
        monkeypatch.delenv("VLM_INSPECTOR_MODEL")
        # malformed yaml is a warning, not a crash
        yml.write_text("inspector: [not-a-mapping\n")
        assert config_mod._load_models_yaml(yml) == {}
        monkeypatch.setattr(config_mod, "MODELS_YAML_PATH", yml)
        get_config(reload=True)

    def test_repo_models_yaml_matches_defaults(self):
        """The shipped configs/models.yaml mirrors the built-in defaults so
        a fresh checkout behaves identically with or without the file."""
        from vis_tpu.utils.config import _load_models_yaml, MODELS_YAML_PATH

        loaded = _load_models_yaml(MODELS_YAML_PATH)
        assert loaded  # file exists in-repo
        defaults = Config()
        for env_key, value in loaded.items():
            assert str(getattr(defaults, env_key.lower())) == value


class TestValidators:
    def test_criticality(self):
        assert validate_criticality(" HIGH ") == (True, None, "high")
        ok, err, _ = validate_criticality("extreme")
        assert not ok and "Invalid criticality" in err

    def test_domain_normalization(self):
        ok, _, norm = validate_domain("Food Processing!")
        assert ok and norm == "food_processing"
        assert validate_domain(None) == (True, None, None)

    def test_notes_length(self):
        ok, err, _ = validate_user_notes("x" * 1001)
        assert not ok
        assert validate_user_notes("  hi  ") == (True, None, "hi")

    def test_request_id(self):
        assert validate_request_id("abc!!!") != "abc"  # too short after strip -> new uuid
        assert len(validate_request_id(None)) == 8
        assert validate_request_id("abcdefgh-123") == "abcdefgh-123"

    def test_sanitize_filename(self):
        assert sanitize_filename("../../etc/passwd") == "passwd"
        assert "/" not in sanitize_filename('a/b:c*d?.jpg')

    def test_image_path(self, sample_image_path, tmp_path):
        ok, _, p = validate_image_path(str(sample_image_path))
        assert ok and p == sample_image_path
        ok, err, _ = validate_image_path(str(tmp_path / "missing.jpg"))
        assert not ok and "not found" in err

    def test_full_context(self, sample_image_path):
        ok, errors, context = validate_inspection_context(
            str(sample_image_path), "high", "Aerospace", "check the welds"
        )
        assert ok and not errors
        assert context["criticality"] == "high"
        assert context["domain"] == "aerospace"


class TestImageQuality:
    def test_textured_image_scores(self, sample_image_path):
        r = assess_image_quality(sample_image_path)
        assert 0.0 <= r["quality_score"] <= 1.0
        assert r["sharpness"]["laplacian_variance"] > 0
        assert r["resolution"]["width"] == 128

    def test_missing_file_fails_gracefully(self, tmp_path):
        r = assess_image_quality(tmp_path / "nope.jpg")
        assert r["quality_passed"] is False
        assert "error" in r

    def test_laplacian_host_device_agree(self):
        rng = np.random.default_rng(1)
        gray = rng.integers(0, 255, size=(64, 80), dtype=np.uint8)
        host = laplacian_variance_np(gray)
        dev = laplacian_variance_jax(gray)
        assert host == pytest.approx(dev, rel=1e-4)

    def test_flat_image_zero_sharpness(self):
        gray = np.full((100, 100), 128, dtype=np.uint8)
        assert laplacian_variance_np(gray) == 0.0


class TestAggregation:
    def _result(self, verdict, defects=(), completed=True):
        return {
            "completed": completed,
            "safety_verdict": {"verdict": verdict},
            "consensus": {
                "combined_defects": [{"safety_impact": s} for s in defects]
            },
        }

    def test_empty(self):
        assert aggregate_session_results({})["aggregate_verdict"] == "UNKNOWN"

    def test_any_unsafe_wins(self):
        out = aggregate_session_results({
            "a": self._result("SAFE"),
            "b": self._result("UNSAFE", ["CRITICAL"]),
        })
        assert out["aggregate_verdict"] == "UNSAFE"
        assert out["critical_defects"] == 1

    def test_review_precedence(self):
        out = aggregate_session_results({
            "a": self._result("SAFE"),
            "b": self._result("REQUIRES_HUMAN_REVIEW"),
        })
        assert out["aggregate_verdict"] == "REQUIRES_HUMAN_REVIEW"

    def test_all_safe(self):
        out = aggregate_session_results({
            "a": self._result("SAFE"),
            "b": self._result("SAFE", ["COSMETIC"]),
        })
        assert out["aggregate_verdict"] == "SAFE"
        assert out["cosmetic_defects"] == 1

    def test_failed_images_counted(self):
        out = aggregate_session_results({
            "a": self._result("SAFE"),
            "b": self._result("SAFE", completed=False),
        })
        assert out["failed_images"] == 1
        assert out["completed_images"] == 1

    def test_verdict_helper(self):
        assert determine_aggregate_verdict([], 0) == "UNKNOWN"
        assert determine_aggregate_verdict(["SAFE", "UNKNOWN"], 1) == "REQUIRES_HUMAN_REVIEW"


class TestPrompts:
    def test_registry_complete(self):
        for name in ("inspector", "auditor", "explainer", "chat_system", "chat_history_aware"):
            assert "current" in PROMPT_REGISTRY[name]

    def test_format_variables(self):
        text = get_prompt("inspector").format(
            criticality="high", domain="aerospace", user_notes="n/a"
        )
        assert "high" in text and '"defects"' in text
        get_prompt("auditor").format(criticality="low", domain="general")
        get_prompt("explainer").format(findings="{}")
        get_prompt("chat_history_aware").format(chat_history="", question="q")

    def test_unknown_prompt_raises(self):
        with pytest.raises(KeyError):
            get_prompt("nonexistent")


class TestLogger:
    def test_secret_masking_and_request_id(self, capsys):
        import logging
        from vis_tpu.utils.logger import set_request_id, setup_logger

        log = setup_logger("vis_tpu.test.masking", component="TEST", to_file=False)
        set_request_id("req-1234")
        log.info("key hf_ABCDsecretsecret done")
        captured = capsys.readouterr()
        assert "secretsecret" not in captured.err
        assert "req-1234" in captured.err
        set_request_id(None)

    def test_span_timings(self):
        from vis_tpu.utils.logger import get_timings, span

        with span("unit-op"):
            pass
        t = get_timings(reset=True)
        assert "unit-op" in t and len(t["unit-op"]) == 1


class TestPromptOverlay:
    """configs/prompts.yaml is a LIVE overlay (the reference ships the
    sidecar but never reads it)."""

    def test_shipped_sidecar_is_neutral(self):
        from vis_tpu.utils.prompts import PROMPT_REGISTRY, PROMPTS_YAML_PATH

        assert PROMPTS_YAML_PATH.exists()
        # The shipped file documents the format without overriding anything.
        assert "file" not in PROMPT_REGISTRY["inspector"]

    def test_overlay_registers_file_version(self, tmp_path):
        from vis_tpu.utils import prompts as prompts_mod

        yml = tmp_path / "prompts.yaml"
        yml.write_text(
            "prompts:\n  chat_system: |\n    Overridden system prompt.\n"
        )
        before = prompts_mod.get_prompt("chat_system", "v1.0.0")
        names = prompts_mod.load_prompt_overrides(yml)
        try:
            assert names == ["chat_system"]
            assert prompts_mod.get_prompt("chat_system").startswith(
                "Overridden system prompt"
            )
            assert prompts_mod.get_prompt("chat_system", "v1.0.0") == before
            assert "file" in prompts_mod.list_prompt_versions("chat_system")
        finally:
            prompts_mod.PROMPT_REGISTRY["chat_system"]["current"] = before
            prompts_mod.PROMPT_REGISTRY["chat_system"].pop("file", None)

    def test_malformed_overlay_never_blocks(self, tmp_path):
        from vis_tpu.utils import prompts as prompts_mod

        bad = tmp_path / "prompts.yaml"
        bad.write_text("prompts: [not, a, mapping")
        assert prompts_mod.load_prompt_overrides(bad) == []
        # Unknown names are ignored.
        unknown = tmp_path / "p2.yaml"
        unknown.write_text("prompts:\n  nonexistent: hi\n")
        assert prompts_mod.load_prompt_overrides(unknown) == []
