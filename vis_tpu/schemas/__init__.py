from vis_tpu.schemas.models import (
    BoundingBox,
    ConsensusResult,
    DefectInfo,
    InspectionContext,
    SafetyVerdict,
    VLMAnalysisResult,
)

__all__ = [
    "BoundingBox",
    "DefectInfo",
    "VLMAnalysisResult",
    "ConsensusResult",
    "SafetyVerdict",
    "InspectionContext",
]
