"""Schema contract tests (reference coverage: tests/test_safety_gates.py:298-341
plus golden cases pinning the defect-merge validator)."""

import pytest
from pydantic import ValidationError

from tests.conftest import make_defect, make_result
from vis_tpu.schemas.models import (
    BoundingBox,
    ConsensusResult,
    DefectInfo,
    defect_types_similar,
)


class TestBoundingBox:
    def test_valid_box(self):
        b = BoundingBox(x=10, y=20, width=30, height=40)
        assert b.area_percent == pytest.approx(12.0)

    def test_rejects_out_of_bounds(self):
        with pytest.raises(ValidationError):
            BoundingBox(x=90, y=0, width=20, height=10)  # x+width > 100
        with pytest.raises(ValidationError):
            BoundingBox(x=0, y=0, width=0, height=10)  # zero width
        with pytest.raises(ValidationError):
            BoundingBox(x=-1, y=0, width=10, height=10)

    def test_is_reasonable(self):
        small = BoundingBox(x=0, y=0, width=1, height=1)  # 0.01% area
        ok = BoundingBox(x=0, y=0, width=20, height=20)  # 4% area
        huge = BoundingBox(x=0, y=0, width=100, height=80)  # 80% area
        assert not small.is_reasonable()
        assert ok.is_reasonable()
        assert not huge.is_reasonable()

    def test_iou(self):
        a = BoundingBox(x=0, y=0, width=10, height=10)
        b = BoundingBox(x=5, y=0, width=10, height=10)
        # intersection 50, union 150
        assert a.iou(b) == pytest.approx(1 / 3)
        assert a.iou(a) == pytest.approx(1.0)
        c = BoundingBox(x=50, y=50, width=10, height=10)
        assert a.iou(c) == 0.0


class TestDefectInfo:
    def test_type_normalized(self):
        d = make_defect(type="  CRACK ")
        assert d.type == "crack"

    def test_critical_flag(self):
        assert make_defect(severity="CRITICAL").is_critical()
        assert not make_defect(severity="COSMETIC").is_critical()

    def test_invalid_severity_rejected(self):
        with pytest.raises(ValidationError):
            DefectInfo(
                type="crack",
                location="x",
                safety_impact="SEVERE",
                reasoning="r",
                confidence="high",
                recommended_action="a",
            )


class TestSemanticSimilarity:
    def test_groups(self):
        assert defect_types_similar("crack", "fracture")
        assert defect_types_similar("rust", "corrosion")
        assert defect_types_similar("dent", "deformation")
        assert not defect_types_similar("crack", "rust")
        assert defect_types_similar("scratch", "scratch")


class TestConsensusDefectMerge:
    def test_overlapping_same_type_merges(self):
        ins = make_result(
            condition="damaged",
            defects=[make_defect(type="crack", bbox=(10, 10, 10, 10))],
        )
        aud = make_result(
            condition="damaged",
            defects=[make_defect(type="fracture", bbox=(11, 11, 10, 10))],
        )
        c = ConsensusResult(
            models_agree=True,
            inspector_result=ins,
            auditor_result=aud,
            agreement_score=0.9,
        )
        assert len(c.combined_defects) == 1
        assert c.combined_defects[0].type == "crack"  # inspector record wins

    def test_same_type_different_location_kept_separate(self):
        ins = make_result(
            condition="damaged",
            defects=[make_defect(type="crack", bbox=(10, 10, 5, 5))],
        )
        aud = make_result(
            condition="damaged",
            defects=[make_defect(type="crack", bbox=(70, 70, 5, 5))],
        )
        c = ConsensusResult(
            models_agree=True,
            inspector_result=ins,
            auditor_result=aud,
            agreement_score=0.9,
        )
        assert len(c.combined_defects) == 2

    def test_disjoint_types_concatenated(self):
        ins = make_result(condition="damaged", defects=[make_defect(type="crack")])
        aud = make_result(condition="damaged", defects=[make_defect(type="stain", severity="COSMETIC")])
        c = ConsensusResult(
            models_agree=False,
            inspector_result=ins,
            auditor_result=aud,
            agreement_score=0.5,
        )
        assert {d.type for d in c.combined_defects} == {"crack", "stain"}

    def test_missing_bbox_prevents_merge(self):
        ins = make_result(condition="damaged", defects=[make_defect(type="crack", bbox=None)])
        aud = make_result(condition="damaged", defects=[make_defect(type="crack", bbox=(10, 10, 5, 5))])
        c = ConsensusResult(
            models_agree=True,
            inspector_result=ins,
            auditor_result=aud,
            agreement_score=0.9,
        )
        assert len(c.combined_defects) == 2

    def test_roundtrip_through_dict(self):
        ins = make_result(condition="damaged", defects=[make_defect()])
        aud = make_result(condition="damaged", defects=[make_defect(bbox=(10.5, 10.5, 12, 8))])
        c = ConsensusResult(
            models_agree=True,
            inspector_result=ins,
            auditor_result=aud,
            agreement_score=0.85,
        )
        c2 = ConsensusResult(**c.model_dump())
        assert len(c2.combined_defects) == len(c.combined_defects)
        assert c2.agreement_score == c.agreement_score
