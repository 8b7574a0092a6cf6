"""Safety-gate decision-table tests.

Pins the gate contract from SURVEY.md §2 (reference: src/safety/gates.py) as
golden cases: gate order, first-failure-wins, auto-decide semantics, defect
pre-filtering, and the all-gate audit trail.
"""

import pytest

from tests.conftest import make_defect, make_result
from vis_tpu.safety.consensus import analyze_consensus
from vis_tpu.safety.gates import (
    GATE_AUDITOR_UNCERTAIN,
    GATE_CRITICAL_DEFECT,
    GATE_DEFAULT_CONSERVATIVE,
    GATE_DOMAIN_ZERO_TOLERANCE,
    GATE_ERROR_STATE,
    GATE_LOW_CONFIDENCE,
    GATE_MODEL_DISAGREEMENT,
    GATE_NO_DEFECTS,
    SafetyGateEngine,
    evaluate_safety,
)
from vis_tpu.schemas.models import ConsensusResult, InspectionContext


def ctx(criticality="medium", domain="general"):
    return InspectionContext(image_id="t", criticality=criticality, domain=domain)


def consensus_of(ins, aud):
    return analyze_consensus(ins, aud)


class TestGate0Errors:
    def test_failed_analysis_is_unsafe_with_human_review(self):
        ins = make_result(condition="uncertain", confidence="low", failed=True,
                          failure_reason="engine timeout")
        aud = make_result(condition="good", confidence="high")
        v = evaluate_safety(consensus_of(ins, aud), ctx())
        assert v.verdict == "UNSAFE"
        assert v.requires_human is True
        assert v.confidence_level == "low"
        assert GATE_ERROR_STATE in v.triggered_gates
        assert any("engine timeout" in e for e in v.errors)


class TestGate1Critical:
    def test_agreed_critical_defect_unsafe_high(self):
        d = make_defect(severity="CRITICAL")
        ins = make_result(condition="damaged", confidence="high", defects=[d])
        aud = make_result(condition="damaged", confidence="high",
                          defects=[make_defect(severity="CRITICAL", bbox=(10.5, 10.5, 12, 8))])
        v = evaluate_safety(consensus_of(ins, aud), ctx())
        assert v.verdict == "UNSAFE"
        assert v.confidence_level == "high"
        assert v.requires_human is False
        assert GATE_CRITICAL_DEFECT in v.triggered_gates

    def test_critical_with_strong_disagreement_still_unsafe_medium(self):
        # Inspector finds a critical crack, auditor says clean w/ medium conf.
        d = make_defect(severity="CRITICAL", confidence="high")
        ins = make_result(condition="damaged", confidence="high", defects=[d])
        aud = make_result(condition="uncertain", confidence="medium")
        c = consensus_of(ins, aud)
        assert c.agreement_score < 0.5
        v = evaluate_safety(c, ctx())
        assert v.verdict == "UNSAFE"
        assert v.confidence_level == "medium"


class TestGate2Domain:
    def test_zero_tolerance_domain_flags_unsafe(self):
        d = make_defect(type="crack", severity="MODERATE", confidence="high")
        ins = make_result(condition="damaged", confidence="high", defects=[d])
        aud = make_result(condition="damaged", confidence="high",
                          defects=[make_defect(type="crack", severity="MODERATE",
                                               confidence="high", bbox=(10.5, 10.5, 12, 8))])
        v = evaluate_safety(consensus_of(ins, aud), ctx(domain="aerospace"))
        assert v.verdict == "UNSAFE"
        assert GATE_DOMAIN_ZERO_TOLERANCE in v.triggered_gates
        assert v.confidence_level == "high"

    def test_same_defect_in_general_domain_not_domain_gated(self):
        d = make_defect(type="crack", severity="MODERATE", confidence="high")
        ins = make_result(condition="damaged", confidence="high", defects=[d])
        aud = make_result(condition="damaged", confidence="high",
                          defects=[make_defect(type="crack", severity="MODERATE",
                                               confidence="high", bbox=(10.5, 10.5, 12, 8))])
        v = evaluate_safety(consensus_of(ins, aud), ctx(domain="general"))
        assert GATE_DOMAIN_ZERO_TOLERANCE not in v.triggered_gates
        # Falls to default conservative: moderate -> UNSAFE
        assert v.verdict == "UNSAFE"
        assert GATE_DEFAULT_CONSERVATIVE in v.triggered_gates


class TestGate3Disagreement:
    def test_disagreement_with_defects_auto_unsafe(self):
        d = make_defect(severity="MODERATE", confidence="high")
        ins = make_result(condition="damaged", confidence="high", defects=[d])
        aud = make_result(condition="uncertain", confidence="medium")
        v = evaluate_safety(consensus_of(ins, aud), ctx())
        assert v.verdict == "UNSAFE"
        assert GATE_MODEL_DISAGREEMENT in v.triggered_gates
        assert v.confidence_level == "medium"
        assert v.requires_human is False  # auto-decide, not deferred

    def test_disagreement_without_defects_auto_safe(self):
        ins = make_result(condition="good", confidence="high")
        aud = make_result(condition="uncertain", confidence="medium")
        v = evaluate_safety(consensus_of(ins, aud), ctx())
        assert v.verdict == "SAFE"
        assert v.confidence_level == "medium"
        assert GATE_MODEL_DISAGREEMENT in v.triggered_gates


class TestGate7Clean:
    def test_verified_clean_safe_high(self):
        ins = make_result(condition="good", confidence="high")
        aud = make_result(condition="good", confidence="high")
        v = evaluate_safety(consensus_of(ins, aud), ctx())
        assert v.verdict == "SAFE"
        assert v.confidence_level == "high"
        assert v.requires_human is False
        assert GATE_NO_DEFECTS in v.triggered_gates
        assert v.defect_summary["verification_passed"] is True

    def test_clean_image_forced_disagreement_safe_medium(self):
        # Zero defects with medium auditor confidence: consensus forces
        # disagreement, Gate 3 auto-decides SAFE at medium confidence.
        ins = make_result(condition="good", confidence="high")
        aud = make_result(condition="good", confidence="medium")
        v = evaluate_safety(consensus_of(ins, aud), ctx())
        assert v.verdict == "SAFE"
        assert v.confidence_level == "medium"


class TestGate4LowConfidence:
    def test_low_confidence_no_defects_safe_low(self):
        ins = make_result(condition="good", confidence="high")
        aud = make_result(condition="good", confidence="low")
        v = evaluate_safety(consensus_of(ins, aud), ctx())
        # Forced disagreement hits Gate 3 first (score 0.2+0.0=0.2 < 0.7)
        assert v.verdict == "SAFE"


class TestGate8Auditor:
    def test_auditor_uncertain_with_defects(self):
        d = make_defect(severity="MODERATE", confidence="high")
        # Both agree damaged, same types, but auditor condition uncertain.
        ins = make_result(condition="uncertain", confidence="high", defects=[d])
        aud = make_result(condition="uncertain", confidence="high",
                          defects=[make_defect(severity="MODERATE", confidence="high",
                                               bbox=(10.5, 10.5, 12, 8))])
        v = evaluate_safety(consensus_of(ins, aud), ctx())
        assert v.verdict == "UNSAFE"
        assert GATE_AUDITOR_UNCERTAIN in v.triggered_gates
        assert v.confidence_level == "low"


class TestDefaultConservative:
    def test_cosmetic_only_safe(self):
        d = make_defect(type="scratch", severity="COSMETIC", confidence="high")
        ins = make_result(condition="damaged", confidence="high", defects=[d])
        aud = make_result(condition="damaged", confidence="high",
                          defects=[make_defect(type="scratch", severity="COSMETIC",
                                               confidence="high", bbox=(10.5, 10.5, 12, 8))])
        v = evaluate_safety(consensus_of(ins, aud), ctx())
        assert v.verdict == "SAFE"
        assert v.confidence_level == "high"
        assert GATE_NO_DEFECTS in v.triggered_gates

    def test_cosmetic_only_high_criticality_still_safe(self):
        d = make_defect(type="scratch", severity="COSMETIC", confidence="high")
        ins = make_result(condition="damaged", confidence="high", defects=[d])
        aud = make_result(condition="damaged", confidence="high",
                          defects=[make_defect(type="scratch", severity="COSMETIC",
                                               confidence="high", bbox=(10.5, 10.5, 12, 8))])
        v = evaluate_safety(consensus_of(ins, aud), ctx(criticality="high"))
        # Gate 6 (high criticality + defects) blocks first -> UNSAFE
        assert v.verdict == "UNSAFE"

    def test_moderate_defect_unsafe(self):
        d = make_defect(type="corrosion", severity="MODERATE", confidence="high")
        ins = make_result(condition="damaged", confidence="high", defects=[d])
        aud = make_result(condition="damaged", confidence="high",
                          defects=[make_defect(type="rust", severity="MODERATE",
                                               confidence="high", bbox=(10.5, 10.5, 12, 8))])
        v = evaluate_safety(consensus_of(ins, aud), ctx())
        assert v.verdict == "UNSAFE"
        assert GATE_DEFAULT_CONSERVATIVE in v.triggered_gates


class TestPreFilter:
    def test_low_confidence_defect_filtered_on_medium_criticality(self):
        d = make_defect(severity="MODERATE", confidence="low")
        ins = make_result(condition="damaged", confidence="high", defects=[d])
        aud = make_result(condition="damaged", confidence="high",
                          defects=[make_defect(severity="MODERATE", confidence="low",
                                               bbox=(10.5, 10.5, 12, 8))])
        engine = SafetyGateEngine()
        c = consensus_of(ins, aud)
        kept = engine._filter_defects(c, ctx(criticality="medium"))
        assert kept == []
        kept_high = engine._filter_defects(c, ctx(criticality="high"))
        assert len(kept_high) == 1

    def test_false_positive_filtered_when_one_model_confidently_clean(self):
        d = make_defect(type="stain", severity="COSMETIC", confidence="medium")
        ins = make_result(condition="good", confidence="high")  # clean, HIGH
        aud = make_result(condition="damaged", confidence="medium", defects=[d])
        engine = SafetyGateEngine()
        kept = engine._filter_defects(consensus_of(ins, aud), ctx())
        assert kept == []

    def test_critical_defect_never_fp_filtered(self):
        d = make_defect(type="crack", severity="CRITICAL", confidence="high")
        ins = make_result(condition="good", confidence="high")
        aud = make_result(condition="damaged", confidence="high", defects=[d])
        engine = SafetyGateEngine()
        kept = engine._filter_defects(consensus_of(ins, aud), ctx())
        assert len(kept) == 1

    def test_tiny_bbox_filtered(self):
        d = make_defect(severity="MODERATE", confidence="high", bbox=(10, 10, 0.5, 0.5))
        ins = make_result(condition="damaged", confidence="high", defects=[d])
        aud = make_result(condition="damaged", confidence="high",
                          defects=[make_defect(severity="MODERATE", confidence="high",
                                               bbox=(10.1, 10.1, 0.5, 0.5))])
        engine = SafetyGateEngine()
        kept = engine._filter_defects(consensus_of(ins, aud), ctx())
        assert kept == []  # area 0.0025% < 0.05%


class TestAuditTrail:
    def test_all_gate_results_recorded(self):
        ins = make_result(condition="good", confidence="high")
        aud = make_result(condition="good", confidence="high")
        v = evaluate_safety(consensus_of(ins, aud), ctx())
        gates = v.defect_summary["all_gate_results"]
        assert len(gates) >= 9
        ids = [g["gate_id"] for g in gates]
        assert ids[0] == GATE_ERROR_STATE
        assert all("passed" in g and "display_name" in g for g in gates)

    def test_first_failure_wins_ordering(self):
        # Errors AND critical defects: Gate 0 must own the verdict.
        d = make_defect(severity="CRITICAL")
        ins = make_result(condition="damaged", confidence="high", defects=[d],
                          failed=True, failure_reason="oom")
        aud = make_result(condition="damaged", confidence="high",
                          defects=[make_defect(severity="CRITICAL", bbox=(10.5, 10.5, 12, 8))])
        v = evaluate_safety(consensus_of(ins, aud), ctx())
        assert v.triggered_gates[0] == GATE_ERROR_STATE
        assert v.requires_human is True
