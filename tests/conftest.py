"""Shared fixtures.  Tests run on CPU with a virtual 8-device mesh so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4)."""

import os

# Must be set before jax import anywhere in the test process.  Forced (not
# setdefault): the outer environment pins JAX_PLATFORMS to the tunneled TPU,
# which is far too slow for unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin takes priority over the JAX_PLATFORMS env var; the
# config update is the only reliable way to force CPU in-process.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

import numpy as np
import pytest
from PIL import Image

from vis_tpu.schemas.models import (
    BoundingBox,
    DefectInfo,
    InspectionContext,
    VLMAnalysisResult,
)


@pytest.fixture
def sample_image_path(tmp_path):
    """A small synthetic photo-like JPEG with texture (so sharpness > 0)."""
    rng = np.random.default_rng(0)
    base = rng.integers(60, 200, size=(96, 128, 3), dtype=np.uint8)
    # add some structure/edges
    base[30:60, 40:90] = [200, 40, 40]
    base[10:20, :] = [30, 30, 30]
    path = tmp_path / "sample.jpg"
    Image.fromarray(base).save(path, quality=90)
    return path


@pytest.fixture
def mock_context():
    return InspectionContext(
        image_id="test-image-001",
        criticality="medium",
        domain="general",
        user_notes="unit test",
    )


def make_defect(
    type="crack",
    severity="CRITICAL",
    confidence="high",
    bbox=(10.0, 10.0, 12.0, 8.0),
    location="upper left region",
):
    return DefectInfo(
        type=type,
        location=location,
        bbox=BoundingBox(x=bbox[0], y=bbox[1], width=bbox[2], height=bbox[3])
        if bbox
        else None,
        safety_impact=severity,
        reasoning="Clearly visible structural separation.",
        confidence=confidence,
        recommended_action="Replace the component.",
    )


def make_result(
    condition="good",
    confidence="high",
    defects=(),
    object_identified="hex bolt",
    failed=False,
    failure_reason=None,
):
    return VLMAnalysisResult(
        object_identified=object_identified,
        overall_condition=condition,
        defects=list(defects),
        overall_confidence=confidence,
        analysis_reasoning="synthetic test result",
        analysis_failed=failed,
        failure_reason=failure_reason,
    )


@pytest.fixture
def defect_factory():
    return make_defect


@pytest.fixture
def result_factory():
    return make_result
