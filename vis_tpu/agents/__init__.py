"""Agent factories and aggregate health checks
(reference: src/agents/__init__.py:11-68).

Unlike the reference, which builds a fresh HTTP client per call, these
factories cache agents per backend because a TPU backend owns device-resident
model weights — re-instantiating would reload checkpoints.  Backend selection:
`use_mock_responses` / provider "mock" -> deterministic MockVLMBackend;
provider "tpu" -> the on-pod serving engine (vis_tpu.serving).
"""

from __future__ import annotations

import threading
from typing import Dict, Optional

from vis_tpu.agents.auditor import AuditorAgent, VLMAuditorAgent
from vis_tpu.agents.base import InferenceBackend
from vis_tpu.agents.explainer import ExplainerAgent
from vis_tpu.agents.inspector import InspectorAgent, VLMInspectorAgent
from vis_tpu.agents.mock import MockVLMBackend
from vis_tpu.utils.config import config
from vis_tpu.utils.logger import setup_logger

logger = setup_logger(__name__, level="INFO", component="AGENTS")

_lock = threading.Lock()
_cache: Dict[str, object] = {}


def _resolve_backend(role: str, provider: str, model_name: str) -> InferenceBackend:
    """Pick the inference backend for an agent role."""
    if config.use_mock_responses or provider == "mock":
        return MockVLMBackend()
    if provider == "tpu":
        from vis_tpu.serving import get_engine_backend

        return get_engine_backend(role, model_name)
    raise ValueError(f"Unknown provider {provider!r} for {role}")


def get_inspector(backend: Optional[InferenceBackend] = None) -> VLMInspectorAgent:
    with _lock:
        key = f"inspector:{id(backend) if backend else 'default'}"
        if key not in _cache:
            resolved = backend or _resolve_backend(
                "inspector", config.vlm_inspector_provider, config.vlm_inspector_model
            )
            _cache[key] = VLMInspectorAgent(resolved)
        return _cache[key]  # type: ignore[return-value]


def get_auditor(backend: Optional[InferenceBackend] = None) -> VLMAuditorAgent:
    with _lock:
        key = f"auditor:{id(backend) if backend else 'default'}"
        if key not in _cache:
            resolved = backend or _resolve_backend(
                "auditor", config.vlm_auditor_provider, config.vlm_auditor_model
            )
            _cache[key] = VLMAuditorAgent(resolved)
        return _cache[key]  # type: ignore[return-value]


def get_explainer(backend: Optional[InferenceBackend] = None) -> ExplainerAgent:
    with _lock:
        key = f"explainer:{id(backend) if backend else 'default'}"
        if key not in _cache:
            resolved = backend or _resolve_backend(
                "explainer", config.explainer_provider, config.explainer_model
            )
            _cache[key] = ExplainerAgent(resolved)
        return _cache[key]  # type: ignore[return-value]


def reset_agent_cache() -> None:
    """Drop cached agents (used by tests and config reloads)."""
    with _lock:
        _cache.clear()


def health_check_agents() -> Dict[str, bool]:
    """Ping all three agents' backends (reference src/agents/__init__.py:26)."""
    results = {}
    for name, factory in (
        ("inspector", get_inspector),
        ("auditor", get_auditor),
        ("explainer", get_explainer),
    ):
        try:
            results[name] = factory().health_check()
        except Exception as exc:
            logger.error(f"{name} health check errored: {exc}")
            results[name] = False
    return results


__all__ = [
    "get_inspector",
    "get_auditor",
    "get_explainer",
    "health_check_agents",
    "reset_agent_cache",
    "VLMInspectorAgent",
    "InspectorAgent",
    "VLMAuditorAgent",
    "AuditorAgent",
    "ExplainerAgent",
    "MockVLMBackend",
]
