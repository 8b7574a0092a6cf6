"""On-pod serving tier: engines, continuous batching, tokenizers, sampling.

`get_engine_backend(role, model_name)` returns an InferenceBackend whose
generate() runs JAX prefill+decode on the local device(s); this indirection
keeps agent imports cheap when the mock backend is in use.
"""

from __future__ import annotations


def get_engine_backend(role: str, model_name: str):
    from vis_tpu.serving.engine import get_engine_backend as _impl

    return _impl(role, model_name)


def get_scheduler(*args, **kwargs):
    from vis_tpu.serving.scheduler import ContinuousBatchingScheduler

    return ContinuousBatchingScheduler(*args, **kwargs)


__all__ = ["get_engine_backend", "get_scheduler"]
