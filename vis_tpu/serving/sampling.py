"""Token sampling: greedy / temperature / top-p, jit-compatible.

Deterministic greedy decoding is the default for inspection requests — the
verdict contract requires reproducible model text for fixed inputs
(SURVEY.md §7 hard part 4); temperature sampling serves the chat path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0    # 0 => greedy
    top_p: float = 1.0
    top_k: int = 0              # 0 => disabled
    seed: int = 0


def sample_token(
    logits: jnp.ndarray,
    key: jax.Array,
    temperature: float = 0.0,
    top_p: float = 1.0,
    top_k: int = 0,
) -> jnp.ndarray:
    """Sample next-token ids from [b, vocab] logits (f32).

    temperature/top_p/top_k are static (compiled into the step function).
    """
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    scaled = logits / temperature
    if top_k > 0:
        kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    if top_p < 1.0:
        sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cumulative = jnp.cumsum(probs, axis=-1)
        # Keep the smallest prefix with cumulative mass >= top_p (always
        # keeping the first token).
        cutoff_mask = cumulative - probs < top_p
        threshold = jnp.min(
            jnp.where(cutoff_mask, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        scaled = jnp.where(scaled < threshold, -jnp.inf, scaled)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)


__all__ = ["SamplingParams", "sample_token"]
