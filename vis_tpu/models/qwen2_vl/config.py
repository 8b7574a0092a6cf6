"""Qwen2-VL model configurations (vision tower + decoder).

Shapes follow the public Qwen2-VL family (2B / 7B) and the HF
Qwen2VLConfig field names where they overlap; `tiny()` is a CPU-runnable
config for golden tests against the HF torch implementation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp

from vis_tpu.models.common.decoder import DecoderConfig


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    depth: int = 32
    embed_dim: int = 1280
    num_heads: int = 16
    mlp_ratio: int = 4
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    hidden_size: int = 3584          # output dim == decoder hidden size
    hidden_act: str = "quick_gelu"
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_input_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size ** 2


@dataclasses.dataclass(frozen=True)
class Qwen2VLConfig:
    vision: VisionConfig
    text: DecoderConfig
    image_token_id: int = 151655
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653
    eos_token_id: int = 151645

    @classmethod
    def tiny(cls) -> "Qwen2VLConfig":
        """CPU-testable config mirroring HF tiny-random proportions."""
        return cls(
            vision=VisionConfig(
                depth=2, embed_dim=64, num_heads=4, mlp_ratio=4,
                patch_size=14, spatial_merge_size=2, hidden_size=64,
                dtype=jnp.float32,
            ),
            text=DecoderConfig(
                vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                num_kv_heads=2, intermediate_size=128, rope_theta=1_000_000.0,
                qkv_bias=True, mrope_section=(2, 3, 3), dtype=jnp.float32,
            ),
            image_token_id=7, vision_start_token_id=5, vision_end_token_id=6,
            eos_token_id=2,
        )

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16) -> "Qwen2VLConfig":
        """Build from a checkpoint's config.json (HF Qwen2VLConfig fields) —
        production checkpoints carry their own shapes, so any model size
        loads without a named preset (reference loaded models by remote API
        id; here the checkout is the source of truth)."""
        # Original releases use flat text fields; newer transformers nests
        # them under text_config.  Accept both.
        t = cfg.get("text_config", cfg)
        v = cfg.get("vision_config", {})
        rope_scaling = t.get("rope_scaling") or {}
        mrope = tuple(rope_scaling.get("mrope_section", (16, 24, 24)))
        return cls(
            vision=VisionConfig(
                depth=v.get("depth", 32),
                embed_dim=v.get("embed_dim", 1280),
                num_heads=v.get("num_heads", 16),
                mlp_ratio=v.get("mlp_ratio", 4),
                in_channels=v.get("in_chans", v.get("in_channels", 3)),
                patch_size=v.get("patch_size", 14),
                temporal_patch_size=v.get("temporal_patch_size", 2),
                spatial_merge_size=v.get("spatial_merge_size", 2),
                hidden_size=v.get("hidden_size", t["hidden_size"]),
                dtype=dtype,
            ),
            text=DecoderConfig(
                vocab_size=t["vocab_size"],
                hidden_size=t["hidden_size"],
                num_layers=t["num_hidden_layers"],
                num_heads=t["num_attention_heads"],
                num_kv_heads=t.get(
                    "num_key_value_heads", t["num_attention_heads"]
                ),
                intermediate_size=t["intermediate_size"],
                rope_theta=t.get("rope_theta", 1_000_000.0),
                rms_norm_eps=t.get("rms_norm_eps", 1e-6),
                qkv_bias=True,
                mrope_section=mrope,
                tie_word_embeddings=t.get("tie_word_embeddings", False),
                dtype=dtype,
            ),
            image_token_id=cfg.get("image_token_id", 151655),
            vision_start_token_id=cfg.get("vision_start_token_id", 151652),
            vision_end_token_id=cfg.get("vision_end_token_id", 151653),
            eos_token_id=cfg.get("eos_token_id", 151645),
        )

    @classmethod
    def qwen2_vl_2b(cls, dtype=jnp.bfloat16) -> "Qwen2VLConfig":
        return cls(
            vision=VisionConfig(hidden_size=1536, dtype=dtype),
            text=DecoderConfig(
                vocab_size=151936, hidden_size=1536, num_layers=28,
                num_heads=12, num_kv_heads=2, intermediate_size=8960,
                rope_theta=1_000_000.0, qkv_bias=True,
                mrope_section=(16, 24, 24), tie_word_embeddings=True,
                dtype=dtype,
            ),
        )

    @classmethod
    def qwen2_vl_7b(cls, dtype=jnp.bfloat16) -> "Qwen2VLConfig":
        return cls(
            vision=VisionConfig(hidden_size=3584, dtype=dtype),
            text=DecoderConfig(
                vocab_size=152064, hidden_size=3584, num_layers=28,
                num_heads=28, num_kv_heads=4, intermediate_size=18944,
                rope_theta=1_000_000.0, qkv_bias=True,
                mrope_section=(16, 24, 24), dtype=dtype,
            ),
        )


__all__ = ["VisionConfig", "Qwen2VLConfig"]
