"""Llama model family configurations.

The text decoder reuses the shared DecoderConfig (qkv_bias=False, standard
or Llama-3-scaled RoPE).  The explainer role maps to Llama-3.1-8B
(reference: src/agents/explainer.py called llama-3.3-70b/llama-3.1-8b via
Groq); the auditor role maps to Llama-3.2-11B-Vision (Mllama).
"""

from __future__ import annotations

import jax.numpy as jnp

from vis_tpu.models.common.decoder import DecoderConfig

_LLAMA3_SCALING = (
    ("rope_type", "llama3"),
    ("factor", 8.0),
    ("low_freq_factor", 1.0),
    ("high_freq_factor", 4.0),
    ("original_max_position_embeddings", 8192),
)


def llama31_8b(dtype=jnp.bfloat16) -> DecoderConfig:
    return DecoderConfig(
        vocab_size=128256, hidden_size=4096, num_layers=32, num_heads=32,
        num_kv_heads=8, intermediate_size=14336, rope_theta=500000.0,
        rms_norm_eps=1e-5, qkv_bias=False, rope_scaling=_LLAMA3_SCALING,
        dtype=dtype,
    )


def llama32_3b(dtype=jnp.bfloat16) -> DecoderConfig:
    return DecoderConfig(
        vocab_size=128256, hidden_size=3072, num_layers=28, num_heads=24,
        num_kv_heads=8, intermediate_size=8192, rope_theta=500000.0,
        rms_norm_eps=1e-5, qkv_bias=False, rope_scaling=_LLAMA3_SCALING,
        tie_word_embeddings=True, dtype=dtype,
    )


def from_hf_config(cfg: dict, dtype=jnp.bfloat16) -> DecoderConfig:
    """DecoderConfig from a Llama checkpoint's config.json (any size)."""
    rope_scaling = cfg.get("rope_scaling")
    scaling = None
    if rope_scaling and rope_scaling.get("rope_type", rope_scaling.get("type")) == "llama3":
        scaling = (
            ("rope_type", "llama3"),
            ("factor", rope_scaling["factor"]),
            ("low_freq_factor", rope_scaling["low_freq_factor"]),
            ("high_freq_factor", rope_scaling["high_freq_factor"]),
            ("original_max_position_embeddings",
             rope_scaling["original_max_position_embeddings"]),
        )
    return DecoderConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        num_kv_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
        intermediate_size=cfg["intermediate_size"],
        head_dim=cfg.get("head_dim"),
        rope_theta=cfg.get("rope_theta", 500000.0),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
        qkv_bias=False,
        rope_scaling=scaling,
        tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        dtype=dtype,
    )


def llama_tiny() -> DecoderConfig:
    """CPU-testable config for golden tests vs HF LlamaForCausalLM."""
    return DecoderConfig(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, rope_theta=500000.0,
        rms_norm_eps=1e-5, qkv_bias=False, rope_scaling=_LLAMA3_SCALING,
        dtype=jnp.float32,
    )


__all__ = ["llama31_8b", "llama32_3b", "llama_tiny", "from_hf_config"]
