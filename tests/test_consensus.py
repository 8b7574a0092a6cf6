"""Consensus-scoring golden tests (reference: tests/test_safety_gates.py:29-111
plus exact-score pins derived from the scoring formula)."""

import pytest

from tests.conftest import make_defect, make_result
from vis_tpu.safety.consensus import analyze_consensus


class TestAgreementScore:
    def test_clean_agreement_both_high(self):
        r = analyze_consensus(
            make_result(condition="good", confidence="high"),
            make_result(condition="good", confidence="high"),
        )
        assert r.models_agree
        assert r.agreement_score == 1.0
        assert r.disagreement_details is None

    def test_clean_but_not_dual_high_forced_disagreement(self):
        # Both report no defects, but auditor is medium confidence:
        # condition + type terms zeroed -> 0.2*1 + 0.1*0.5 = 0.25
        r = analyze_consensus(
            make_result(condition="good", confidence="high"),
            make_result(condition="good", confidence="medium"),
        )
        assert not r.models_agree
        assert r.agreement_score == pytest.approx(0.25)

    def test_condition_disagreement(self):
        d = make_defect()
        r = analyze_consensus(
            make_result(condition="damaged", confidence="high", defects=[d]),
            make_result(condition="good", confidence="high"),
        )
        # condition 0, types 0/1 -> 0, count diff 1 -> 1.0, conf match -> 1.0
        assert r.agreement_score == pytest.approx(0.3)
        assert not r.models_agree
        assert "Condition" in r.disagreement_details

    def test_same_findings_same_types(self):
        d1 = make_defect(type="crack")
        d2 = make_defect(type="crack", bbox=(50, 50, 10, 10))
        r = analyze_consensus(
            make_result(condition="damaged", confidence="high", defects=[d1]),
            make_result(condition="damaged", confidence="high", defects=[d2]),
        )
        assert r.agreement_score == 1.0
        assert r.models_agree

    def test_count_agreement_with_tolerance(self):
        # 1 vs 2 same-type defects: counts within +-1 -> full count credit.
        ins = make_result(condition="damaged", confidence="high", defects=[make_defect()])
        aud = make_result(
            condition="damaged",
            confidence="high",
            defects=[make_defect(bbox=(50, 50, 5, 5)), make_defect(bbox=(70, 70, 5, 5))],
        )
        r = analyze_consensus(ins, aud)
        assert r.agreement_score == 1.0

    def test_large_count_gap_penalized(self):
        ins = make_result(condition="damaged", confidence="high", defects=[make_defect()])
        aud_defects = [
            make_defect(type=f"type_{i}", bbox=(i * 10.0, 10, 5, 5)) for i in range(5)
        ]
        aud = make_result(condition="damaged", confidence="high", defects=aud_defects)
        r = analyze_consensus(ins, aud)
        # condition .4; types share 0/6 (crack vs 5 others) -> 0; count: diff 4/5 -> 0.2*0.2=0.04; conf .1
        assert r.agreement_score == pytest.approx(0.54)
        assert not r.models_agree

    def test_confidence_distance(self):
        r = analyze_consensus(
            make_result(condition="damaged", confidence="high", defects=[make_defect()]),
            make_result(condition="damaged", confidence="low", defects=[make_defect(bbox=(10.2, 10.2, 12, 8))]),
        )
        # 0.4 + 0.3 + 0.2 + 0.1*(1-1) = 0.9
        assert r.agreement_score == pytest.approx(0.9)

    def test_score_rounding_snap_to_one(self):
        r = analyze_consensus(
            make_result(condition="good", confidence="high"),
            make_result(condition="good", confidence="high"),
        )
        assert r.agreement_score == 1.0

    def test_threshold_is_0_7(self):
        # Exactly at the boundary: condition match + types + count, conf 2 apart.
        r = analyze_consensus(
            make_result(condition="damaged", confidence="high", defects=[make_defect()]),
            make_result(condition="damaged", confidence="low", defects=[make_defect(bbox=(10.2, 10.2, 12, 8))]),
        )
        assert r.models_agree  # 0.9 >= 0.7

    def test_disagreement_details_lists_unique_types(self):
        ins = make_result(condition="damaged", confidence="high", defects=[make_defect(type="crack")])
        aud = make_result(condition="good", confidence="high")
        r = analyze_consensus(ins, aud)
        assert "crack" in r.disagreement_details
