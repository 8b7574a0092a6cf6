"""Qwen2.5-VL configuration — the reference's actual inspector family
(reference README.md: "Qwen2.5-VL-7B" via HF API; src/agents/vlm_inspector.py).

The text stack is the same Qwen2 decoder with M-RoPE as Qwen2-VL (the
framework's common DecoderConfig covers it); the vision tower differs:
RMSNorm, SwiGLU MLPs (with biases), and WINDOW attention — most blocks
attend within 112px windows, with a few full-attention blocks
(fullatt_block_indexes).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax.numpy as jnp

from vis_tpu.models.common.decoder import DecoderConfig


@dataclasses.dataclass(frozen=True)
class Qwen25VisionConfig:
    depth: int = 32
    hidden_size: int = 1280          # per-patch width inside the tower
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    out_hidden_size: int = 3584      # == decoder hidden size
    window_size: int = 112           # pixels per attention window side
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_input_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size ** 2

    @property
    def window_cells(self) -> int:
        """Merged cells per window side (HF vit_merger_window_size)."""
        return self.window_size // self.spatial_merge_size // self.patch_size

    @property
    def window_patches(self) -> int:
        """Raw patches per attention window."""
        return (self.window_cells ** 2) * self.merge_unit


@dataclasses.dataclass(frozen=True)
class Qwen25VLConfig:
    vision: Qwen25VisionConfig
    text: DecoderConfig
    image_token_id: int = 151655
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653
    eos_token_id: int = 151645

    @staticmethod
    def tiny() -> "Qwen25VLConfig":
        """Matches tests/hf_reference_gen_25.py (CPU golden tests)."""
        return Qwen25VLConfig(
            vision=Qwen25VisionConfig(
                depth=4, hidden_size=64, intermediate_size=128, num_heads=4,
                out_hidden_size=64, window_size=56,
                fullatt_block_indexes=(1, 3), dtype=jnp.float32,
            ),
            text=DecoderConfig(
                vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                num_kv_heads=2, intermediate_size=128, qkv_bias=True,
                mrope_section=(2, 3, 3), dtype=jnp.float32,
            ),
            image_token_id=7, vision_start_token_id=5,
            vision_end_token_id=6, eos_token_id=4,
        )

    @staticmethod
    def qwen2_5_vl_7b() -> "Qwen25VLConfig":
        return Qwen25VLConfig(
            vision=Qwen25VisionConfig(),
            text=DecoderConfig(
                vocab_size=152064, hidden_size=3584, num_layers=28,
                num_heads=28, num_kv_heads=4, intermediate_size=18944,
                rope_theta=1_000_000.0, rms_norm_eps=1e-6, qkv_bias=True,
                mrope_section=(16, 24, 24), tie_word_embeddings=False,
            ),
        )

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16) -> "Qwen25VLConfig":
        """Build from a checkpoint's config.json (HF Qwen2_5_VLConfig)."""
        text = cfg.get("text_config", cfg)
        vis = cfg.get("vision_config", {})
        rope = text.get("rope_scaling") or cfg.get("rope_scaling") or {}
        return cls(
            vision=Qwen25VisionConfig(
                depth=vis.get("depth", 32),
                hidden_size=vis.get("hidden_size", 1280),
                intermediate_size=vis.get("intermediate_size", 3420),
                num_heads=vis.get("num_heads", 16),
                in_channels=vis.get("in_channels", vis.get("in_chans", 3)),
                patch_size=vis.get("patch_size", 14),
                temporal_patch_size=vis.get("temporal_patch_size", 2),
                spatial_merge_size=vis.get("spatial_merge_size", 2),
                out_hidden_size=vis.get(
                    "out_hidden_size", text.get("hidden_size", 3584)
                ),
                window_size=vis.get("window_size", 112),
                fullatt_block_indexes=tuple(
                    vis.get("fullatt_block_indexes", (7, 15, 23, 31))
                ),
                dtype=dtype,
            ),
            text=DecoderConfig(
                vocab_size=text["vocab_size"],
                hidden_size=text["hidden_size"],
                num_layers=text["num_hidden_layers"],
                num_heads=text["num_attention_heads"],
                num_kv_heads=text.get(
                    "num_key_value_heads", text["num_attention_heads"]
                ),
                intermediate_size=text["intermediate_size"],
                rope_theta=text.get("rope_theta", 1_000_000.0),
                rms_norm_eps=text.get("rms_norm_eps", 1e-6),
                qkv_bias=True,
                mrope_section=tuple(rope.get("mrope_section", (16, 24, 24))),
                tie_word_embeddings=cfg.get(
                    "tie_word_embeddings", text.get("tie_word_embeddings", False)
                ),
                dtype=dtype,
            ),
            image_token_id=cfg.get("image_token_id", 151655),
            vision_start_token_id=cfg.get("vision_start_token_id", 151652),
            vision_end_token_id=cfg.get("vision_end_token_id", 151653),
            eos_token_id=cfg.get("eos_token_id", 151645),
        )

    @staticmethod
    def qwen2_5_vl_3b() -> "Qwen25VLConfig":
        return Qwen25VLConfig(
            vision=Qwen25VisionConfig(out_hidden_size=2048),
            text=DecoderConfig(
                vocab_size=151936, hidden_size=2048, num_layers=36,
                num_heads=16, num_kv_heads=2, intermediate_size=11008,
                rope_theta=1_000_000.0, rms_norm_eps=1e-6, qkv_bias=True,
                mrope_section=(16, 24, 24), tie_word_embeddings=True,
            ),
        )


__all__ = ["Qwen25VisionConfig", "Qwen25VLConfig"]
