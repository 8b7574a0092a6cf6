"""Hermetic end-to-end pipeline tests over the mock backend
(SURVEY.md §4 strategy 2: the USE_MOCK_RESPONSES capability made real)."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from vis_tpu.agents import (
    MockVLMBackend,
    get_auditor,
    get_explainer,
    get_inspector,
    health_check_agents,
    reset_agent_cache,
)
from vis_tpu.agents.base import parse_json_robust, validate_and_fix_result
from vis_tpu.orchestration import (
    get_pending_reviews,
    resume_inspection,
    run_batch_inspection,
    run_inspection,
    run_inspection_streaming,
)


@pytest.fixture(autouse=True)
def mock_env(monkeypatch, tmp_path):
    monkeypatch.setenv("USE_MOCK_RESPONSES", "true")
    monkeypatch.setenv("DATABASE_PATH", str(tmp_path / "inspections.db"))
    monkeypatch.setenv("CHAT_HISTORY_DB", str(tmp_path / "chat.db"))
    monkeypatch.setenv("REPORT_DIR", str(tmp_path / "reports"))
    monkeypatch.setenv("LOG_DIR", str(tmp_path / "logs"))
    from vis_tpu.utils.config import get_config

    get_config(reload=True)
    reset_agent_cache()
    yield
    for var in ("USE_MOCK_RESPONSES", "DATABASE_PATH", "CHAT_HISTORY_DB",
                "REPORT_DIR", "LOG_DIR"):
        monkeypatch.delenv(var, raising=False)
    get_config(reload=True)
    reset_agent_cache()


def _make_image(tmp_path, name="clean_part.jpg"):
    rng = np.random.default_rng(7)
    arr = rng.integers(80, 180, size=(120, 160, 3), dtype=np.uint8)
    arr[40:70, 50:110] = [160, 160, 170]
    path = tmp_path / name
    Image.fromarray(arr).save(path, quality=90)
    return path


class TestRobustJsonParsing:
    def test_fenced(self):
        out = parse_json_robust('prose\n```json\n{"a": 1}\n```\nmore')
        assert out == {"a": 1}

    def test_balanced_with_noise(self):
        out = parse_json_robust('The result is {"a": {"b": 2}, "c": "}{"} thanks!')
        assert out["a"]["b"] == 2

    def test_reasoning_salvage(self):
        broken = '{"object_identified": "bolt", "defects": [{{bad, "analysis_reasoning": "Looks fine to me"'
        out = parse_json_robust(broken)
        assert out["analysis_reasoning"] == "Looks fine to me"
        assert out["overall_confidence"] == "low"

    def test_unparseable_raises(self):
        with pytest.raises(ValueError):
            parse_json_robust("no json here at all")


class TestResultFixup:
    def test_defaults_applied(self):
        out = validate_and_fix_result({})
        assert out["object_identified"] == "unknown"
        assert out["overall_condition"] == "uncertain"
        assert out["defects"] == []

    def test_clean_confidence_boost(self):
        out = validate_and_fix_result(
            {"overall_condition": "good", "overall_confidence": "medium", "defects": []}
        )
        assert out["overall_confidence"] == "high"

    def test_pixel_bbox_stripped(self):
        out = validate_and_fix_result({
            "overall_condition": "damaged",
            "overall_confidence": "high",
            "defects": [{
                "type": "crack", "location": "x", "safety_impact": "CRITICAL",
                "reasoning": "clearly visible", "confidence": "high",
                "recommended_action": "replace",
                "bbox": {"x": 512, "y": 300, "width": 100, "height": 50},
            }],
        })
        assert out["defects"][0]["bbox"] is None
        assert out["defects"][0]["bbox_approximate"] is True

    def test_hedged_low_confidence_defect_dropped(self):
        out = validate_and_fix_result({
            "overall_condition": "damaged",
            "overall_confidence": "medium",
            "defects": [{
                "type": "shadow", "location": "left", "safety_impact": "COSMETIC",
                "reasoning": "might be a scratch, unclear", "confidence": "low",
                "recommended_action": "look again",
            }],
        })
        assert out["defects"] == []

    def test_oversized_bbox_removed_defect_kept(self):
        out = validate_and_fix_result({
            "overall_condition": "damaged",
            "overall_confidence": "high",
            "defects": [{
                "type": "corrosion", "location": "all over",
                "safety_impact": "MODERATE", "reasoning": "clearly visible",
                "confidence": "high", "recommended_action": "treat",
                "bbox": {"x": 0, "y": 0, "width": 90, "height": 90},
            }],
        })
        assert len(out["defects"]) == 1
        assert out["defects"][0]["bbox"] is None


class TestAgentsOnMock:
    def test_inspector_clean(self, tmp_path, mock_context):
        img = _make_image(tmp_path, "clean_bolt.jpg")
        result = get_inspector(MockVLMBackend()).analyze(img, mock_context)
        assert not result.analysis_failed
        assert result.overall_condition == "good"
        assert result.overall_confidence == "high"

    def test_inspector_critical_scenario(self, tmp_path, mock_context):
        img = _make_image(tmp_path, "crack_bracket.jpg")
        result = get_inspector(MockVLMBackend()).analyze(img, mock_context)
        assert result.critical_defect_count == 1
        assert result.defects[0].bbox is not None

    def test_auditor_independent(self, tmp_path, mock_context):
        img = _make_image(tmp_path, "clean_p.jpg")
        result = get_auditor(MockVLMBackend()).verify(img, mock_context, None)
        assert not result.analysis_failed

    def test_backend_failure_degrades(self, tmp_path, mock_context):
        img = _make_image(tmp_path, "clean_q.jpg")
        backend = MockVLMBackend(fail_every=1)  # every call fails
        result = get_inspector(backend).analyze(img, mock_context)
        assert result.analysis_failed
        assert "injected" in result.failure_reason

    def test_health_checks(self):
        assert health_check_agents() == {
            "inspector": True, "auditor": True, "explainer": True
        }


class TestEndToEnd:
    def test_clean_image_full_run(self, tmp_path):
        img = _make_image(tmp_path, "clean_widget.jpg")
        state = run_inspection(str(img), criticality="medium", domain="general")
        assert state["safety_verdict"]["verdict"] == "SAFE"
        assert state["safety_verdict"]["confidence_level"] == "high"
        assert state["clean_verification"]["verified"] is True
        assert state["current_step"] == "completed"
        assert "EXECUTIVE SUMMARY" in state["explanation"]
        # PDF written and readable
        report = Path(state["report_path"])
        assert report.exists()
        raw = report.read_bytes()
        assert raw[:8].startswith(b"%PDF-")
        # Verdict rubber stamp + 3 evidence panels = >= 4 embedded images
        # (reference pdf_generator.py:303 StatusStamp flowable).
        assert raw.count(b"/Subtype /Image") >= 4

    def test_critical_image_full_run(self, tmp_path):
        img = _make_image(tmp_path, "crack_arm.jpg")
        state = run_inspection(str(img), criticality="high", domain="aerospace")
        assert state["safety_verdict"]["verdict"] == "UNSAFE"
        assert "GATE_1_CRITICAL_DEFECT" in state["safety_verdict"]["triggered_gates"]
        assert state["decision_support"]["recommendation"] in ("REPAIR", "REPLACE")

    def test_database_persistence(self, tmp_path):
        img = _make_image(tmp_path, "crack_rail.jpg")
        state = run_inspection(str(img), criticality="medium")
        from vis_tpu.database import InspectionRepository

        repo = InspectionRepository()
        record = repo.get_inspection(state["request_id"])
        assert record is not None
        assert record.overall_verdict == "UNSAFE"
        defects = repo.get_defects(state["request_id"])
        assert len(defects) == 1
        assert defects[0].defect_type == "crack"
        stats = repo.get_defect_statistics()
        assert stats["total_inspections"] >= 1
        assert "crack" in stats["defect_counts"]

    def test_streaming_events(self, tmp_path):
        img = _make_image(tmp_path, "clean_s.jpg")
        events = list(run_inspection_streaming(str(img)))
        kinds = [e["event"] for e in events]
        assert "node_start" in kinds and "node_end" in kinds
        assert kinds[-1] == "complete"
        nodes_seen = [e["node"] for e in events if e["event"] == "node_end"]
        assert nodes_seen[0] == "initialize"
        assert "dual_vlm" in nodes_seen
        assert nodes_seen[-1] == "finalize"

    def test_batch_inspection_aggregates(self, tmp_path):
        paths = [
            str(_make_image(tmp_path, "clean_a.jpg")),
            str(_make_image(tmp_path, "crack_b.jpg")),
            str(_make_image(tmp_path, "scratch_c.jpg")),
        ]
        session = run_batch_inspection(paths, criticality="medium")
        assert session["total_images"] == 3
        assert session["completed_images"] == 3
        assert session["aggregate_verdict"] == "UNSAFE"  # crack taints session
        assert session["critical_defects"] == 1
        assert len(session["per_image_verdicts"]) == 3

    def test_failure_path_gate0(self, tmp_path, monkeypatch):
        img = _make_image(tmp_path, "clean_f.jpg")
        reset_agent_cache()
        failing = MockVLMBackend(fail_every=1)
        from vis_tpu import agents as agents_mod

        # Force the inspector to the failing backend; auditor stays healthy.
        monkeypatch.setattr(
            agents_mod, "get_inspector", lambda backend=None: agents_mod.VLMInspectorAgent(failing)
        )
        import vis_tpu.orchestration.nodes as nodes_mod

        monkeypatch.setattr(nodes_mod, "get_inspector",
                            lambda: agents_mod.VLMInspectorAgent(failing))
        state = run_inspection(str(img))
        assert state["safety_verdict"]["verdict"] == "UNSAFE"
        assert state["safety_verdict"]["requires_human"] is True
        assert "GATE_0_ERROR_STATE" in state["safety_verdict"]["triggered_gates"]
        assert state["failure_history"]

    def test_interactive_review_interrupt_and_resume(self, tmp_path, monkeypatch):
        img = _make_image(tmp_path, "clean_r.jpg")
        reset_agent_cache()
        failing = MockVLMBackend(fail_every=1)
        import vis_tpu.orchestration.nodes as nodes_mod
        from vis_tpu import agents as agents_mod

        monkeypatch.setattr(nodes_mod, "get_inspector",
                            lambda: agents_mod.VLMInspectorAgent(failing))
        state = run_inspection(str(img), interactive_review=True)
        assert state["current_step"] == "awaiting_human_review"
        pending = get_pending_reviews()
        assert any(p["thread_id"] == state["request_id"] for p in pending)
        final = resume_inspection(state["request_id"], "approve", "visually checked")
        assert final["current_step"] == "completed"
        assert final["human_decision"] == "approve"
        assert not get_pending_reviews()


class TestChatAndMemory:
    def test_chat_roundtrip(self, tmp_path):
        from vis_tpu.chat_memory import get_session_history, rewrite_query_with_history

        history = get_session_history("sess-1")
        history.add_user_message("What defects were found?")
        history.add_ai_message("One crack on the bracket arm.")
        assert history.get_message_count() == 2
        rewritten = rewrite_query_with_history("it looks bad?", history.messages)
        assert "previous response" in rewritten
        history.clear()
        assert history.get_message_count() == 0

    def test_trimming(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MAX_CHAT_HISTORY", "4")
        from vis_tpu.utils.config import get_config

        get_config(reload=True)
        from vis_tpu.chat_memory import SQLiteChatHistory

        history = SQLiteChatHistory("sess-trim")
        for i in range(10):
            history.add_user_message(f"msg {i}")
        assert history.get_message_count() == 4
        assert history.messages[-1].content == "msg 9"

    def test_explainer_chat_stream(self):
        explainer = get_explainer(MockVLMBackend())
        chunks = list(explainer.chat_stream("context: verdict SAFE", "any defects?"))
        assert len(chunks) > 1
        assert "".join(chunks)


class TestExplanationParsing:
    def test_marker_format(self):
        from vis_tpu.reporting import parse_explanation_sections

        text = (
            "The bracket shows a crack.\n\n---\n## REASONING CHAINS\n\n"
            "Step 1: looked closely.\n\n---\n## COUNTERFACTUAL ANALYSIS\n\n"
            "If the crack were absent, verdict would be SAFE."
        )
        sections = parse_explanation_sections(text)
        assert "SUMMARY" in sections
        assert "REASONING CHAINS" in sections
        assert "COUNTERFACTUAL" in sections

    def test_plain_header_format(self):
        from vis_tpu.reporting import parse_explanation_sections

        text = (
            "EXECUTIVE SUMMARY\n\nAll good.\n\nFINAL RECOMMENDATION\n\n"
            "Verdict: SAFE\nAction Required: none"
        )
        sections = parse_explanation_sections(text)
        assert "EXECUTIVE SUMMARY" in sections
        assert "FINAL RECOMMENDATION" in sections
        assert "SAFE" in sections["FINAL RECOMMENDATION"]

    def test_empty_explanation(self):
        from vis_tpu.reporting import parse_explanation_sections

        sections = parse_explanation_sections("")
        assert "SUMMARY" in sections


class TestCounterfactualWiring:
    """The counterfactual generator must actually feed the report
    (VERDICT round-1 item 7: the reference left it dormant)."""

    def test_explanation_gains_counterfactual_section(self, tmp_path):
        from vis_tpu.reporting import parse_explanation_sections

        img = _make_image(tmp_path, "crack_bracket.jpg")  # critical scenario
        state = run_inspection(str(img), criticality="high", domain="general")
        explanation = state["explanation"]
        assert "COUNTERFACTUAL" in explanation.upper()
        sections = parse_explanation_sections(explanation)
        assert "COUNTERFACTUAL" in sections
        assert len(sections["COUNTERFACTUAL"]) > 40
        # The PDF report generates with the section present.
        assert state.get("report_path") and Path(state["report_path"]).exists()


class TestReviewFixesR4:
    """Regressions pinned by the round-4 directory review."""

    def test_sliver_bbox_clamp_stays_in_bounds(self):
        # A thin sliver at the right edge: flooring width to 0.1 must not
        # push x+width past 100 (that would fail BoundingBox validation and
        # turn one odd box into analysis_failed).
        out = validate_and_fix_result({
            "overall_condition": "damaged",
            "overall_confidence": "high",
            "defects": [{
                "type": "crack", "location": "right edge",
                "safety_impact": "CRITICAL", "reasoning": "visible seam",
                "confidence": "high", "recommended_action": "replace",
                "bbox": {"x": 99.905, "y": 20.0, "width": 0.09, "height": 60.0},
            }],
        })
        from vis_tpu.schemas.models import VLMAnalysisResult

        result = VLMAnalysisResult(**out)  # must validate
        bbox = result.defects[0].bbox
        assert bbox is not None
        assert bbox.x + bbox.width <= 100.0
        assert bbox.y + bbox.height <= 100.0

    def test_invalid_criticality_fails_fast(self, tmp_path):
        img = _make_image(tmp_path, "clean_v.jpg")
        with pytest.raises(ValueError, match="criticality"):
            run_inspection(str(img), criticality="EXTREME")

    def test_uppercase_criticality_normalized(self, tmp_path):
        img = _make_image(tmp_path, "clean_w.jpg")
        state = run_inspection(str(img), criticality="HIGH")
        assert state["context"]["criticality"] == "high"
        assert state["current_step"] == "completed"

    def test_inferred_criticality_replaces_context_atomically(self, tmp_path):
        # _apply_inferred_criticality must swap in a NEW dict (readers
        # snapshotting the old one stay consistent), not mutate in place
        # while the concurrent sibling node unpacks it.
        from vis_tpu.orchestration.nodes import _apply_inferred_criticality
        from vis_tpu.schemas.models import VLMAnalysisResult

        ctx = {"image_id": "t", "criticality": "low", "domain": None,
               "user_notes": None}
        state = {"context": ctx}
        result = VLMAnalysisResult(
            object_identified="pressure valve",
            overall_condition="damaged",
            overall_confidence="high",
            defects=[],
            inferred_criticality="high",
            inferred_criticality_reasoning="safety-critical component",
        )
        _apply_inferred_criticality(state, result)
        assert state["context"]["criticality"] == "high"
        assert state["context"] is not ctx
        assert ctx["criticality"] == "low"  # old snapshot untouched

    def test_finalize_survives_none_verdict(self, tmp_path):
        from vis_tpu.orchestration.nodes import finalize_inspection

        state = {
            "request_id": "t-none", "start_time": __import__("time").time(),
            "safety_verdict": None, "error": "consensus blew up",
            "failure_history": [], "current_step": "failed",
            "explanation": None, "consensus": None,
            "inspector_result": None, "auditor_result": None,
            "image_path": str(_make_image(tmp_path, "clean_x.jpg")),
            "report_path": None, "processing_time": None,
        }
        out = finalize_inspection(state)  # must not raise
        assert out["current_step"] == "completed"

    def test_defect_ids_unique_same_millisecond(self):
        from vis_tpu.schemas.models import DefectInfo

        defects = [
            DefectInfo(
                type="crack", location="left", safety_impact="CRITICAL",
                reasoning="r", confidence="high", recommended_action="fix",
            )
            for _ in range(50)
        ]
        ids = {d.defect_id for d in defects}
        assert len(ids) == 50


class TestReportingReviewFixesR4:
    """Regressions pinned by the round-4 reporting/database review pass."""

    def test_explainer_prompt_format_parses_into_four_sections(self):
        # The parser must recognize the system's OWN explainer headers
        # (utils/prompts.py EXPLAINER_PROMPT) — before the fix the whole
        # text collapsed into SUMMARY and the PDF rendered it twice.
        from vis_tpu.reporting import parse_explanation_sections

        text = (
            "EXECUTIVE SUMMARY\n"
            "The bracket was inspected by two models; verdict UNSAFE.\n\n"
            "INSPECTION DETAILS\n"
            "Inspector Findings: one corrosion defect.\n"
            "Auditor Findings: confirmed.\n"
            "Agreement: high.\n\n"
            "DEFECT ANALYSIS\n"
            "1. corrosion at lower right quadrant (MODERATE).\n\n"
            "FINAL RECOMMENDATION\n"
            "Verdict: UNSAFE\nAction Required: repair."
        )
        sections = parse_explanation_sections(text)
        assert set(sections) == {
            "EXECUTIVE SUMMARY", "INSPECTION DETAILS",
            "DEFECT ANALYSIS", "FINAL RECOMMENDATION",
        }
        # No duplicated full-text SUMMARY, and sections split cleanly.
        assert "FINAL RECOMMENDATION" not in sections["EXECUTIVE SUMMARY"]
        assert sections["DEFECT ANALYSIS"].startswith("1. corrosion")

    def test_freeform_text_still_synthesizes_summary(self):
        from vis_tpu.reporting import parse_explanation_sections

        sections = parse_explanation_sections(
            "Just prose with no headers. More prose. And more. " * 10
        )
        assert "SUMMARY" in sections or "EXECUTIVE SUMMARY" in sections

    def test_pdf_transliterates_unicode_punctuation(self):
        # Model text routinely carries em-dashes/curly quotes/ellipses;
        # the latin-1 writer must render visual equivalents, not '?'.
        from vis_tpu.reporting.pdf import _escape, string_width

        s = "temperature 40°C — replace ‘part’ … → done"
        out = _escape(s)
        assert "?" not in out
        assert "--" in out and "->" in out and "..." in out
        # Measurement matches what renders: width of the transliterated
        # string equals width of the original (same code path).
        assert string_width(s) == string_width(
            "temperature 40°C -- replace 'part' ... -> done"
        )

    def test_repository_schema_survives_db_rotation(self, tmp_path, monkeypatch):
        # Deleting/rotating the DB file must not leave a tableless DB
        # behind the schema cache (writes would fail until restart).
        monkeypatch.setenv("DATABASE_PATH", str(tmp_path / "rot.db"))
        from vis_tpu.utils.config import get_config

        get_config(reload=True)
        try:
            from vis_tpu.database import InspectionRepository

            repo = InspectionRepository()
            repo.get_inspection_count()  # initializes schema + cache
            (tmp_path / "rot.db").unlink()
            repo2 = InspectionRepository()
            assert repo2.get_inspection_count() == 0  # tables recreated
        finally:
            monkeypatch.delenv("DATABASE_PATH")
            get_config(reload=True)

    def test_safety_rules_cache_tracks_mtime(self, tmp_path):
        import os
        from vis_tpu.safety.gates import load_safety_rules

        rules = tmp_path / "rules.yaml"
        rules.write_text("domains:\n  general:\n    max_cosmetic_defects: 3\n")
        first = load_safety_rules(rules)
        assert first["domains"]["general"]["max_cosmetic_defects"] == 3
        # Same mtime -> cached object.
        assert load_safety_rules(rules) is first
        rules.write_text("domains:\n  general:\n    max_cosmetic_defects: 7\n")
        os.utime(rules, ns=(1, 1))  # force a distinct mtime
        assert load_safety_rules(rules)["domains"]["general"][
            "max_cosmetic_defects"] == 7
