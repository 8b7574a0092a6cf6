"""Llama-4 (Maverick/Scout family) configuration.

The reference's auditor agent tries Llama-4-Maverick-17B-128E FIRST and only
falls back to Llama-3.2-11B-Vision (reference src/agents/vlm_auditor.py:34-56).
This module is the TPU-native equivalent of that primary family: an
interleaved dense/MoE decoder (sigmoid top-k router, shared expert), NoPE
layers every 4th with attention temperature tuning, chunked attention on the
RoPE layers, and a pixel-shuffle ViT vision tower merged at placeholder
tokens.

Unlike Mllama (cross-attention), Llama-4 is decoder-only with image features
scattered into the embedding sequence, so its serving engine shares the
placeholder-merge layout with the Qwen engines while the MoE feed-forward is
the one component that introduces expert parallelism (EP): expert weights are
sharded on the expert axis of the ("data", "model") mesh and combined with a
psum — see parallel/sharding.shard_llama4_params.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Llama4TextConfig:
    """Text decoder geometry + the Llama-4-specific layer pattern.

    `interleave_moe_layer_step=s` makes layers s-1, 2s-1, ... MoE (the rest
    dense with `intermediate_size_mlp`); `nope_interval=4` makes every 4th
    layer NoPE (no rotary, full attention, temperature-tuned queries) while
    RoPE layers use chunked attention of `attention_chunk_size`.
    """

    vocab_size: int = 202048
    hidden_size: int = 5120
    num_layers: int = 48
    num_heads: int = 40
    num_kv_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 8192        # per-expert (and shared) FFN width
    intermediate_size_mlp: int = 16384   # dense (non-MoE) layer FFN width
    num_experts: int = 128
    top_k: int = 1
    interleave_moe_layer_step: int = 2
    nope_interval: int = 4
    attention_chunk_size: int = 8192
    use_qk_norm: bool = True
    attn_temperature_tuning: bool = True
    floor_scale: float = 8192.0
    attn_scale: float = 0.1
    rope_theta: float = 500000.0
    rope_scaling: Optional[Tuple[Tuple[str, Any], ...]] = None
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    # Explicit overrides (HF checkpoints may pin these); None -> derived.
    moe_layers_override: Optional[Tuple[int, ...]] = None
    no_rope_override: Optional[Tuple[int, ...]] = None  # 1 = USE rope (HF)
    dtype: Any = jnp.bfloat16

    @property
    def rope_scaling_dict(self) -> Optional[Dict[str, Any]]:
        return dict(self.rope_scaling) if self.rope_scaling else None

    @property
    def moe_layers(self) -> Tuple[int, ...]:
        if self.moe_layers_override is not None:
            return self.moe_layers_override
        s = self.interleave_moe_layer_step
        return tuple(range(s - 1, self.num_layers, s))

    @property
    def use_rope_layers(self) -> Tuple[int, ...]:
        """1 per layer that applies rotary (HF no_rope_layers semantics:
        confusingly, value 1 means the layer DOES use RoPE)."""
        if self.no_rope_override is not None:
            return self.no_rope_override
        return tuple(
            int((i + 1) % self.nope_interval != 0)
            for i in range(self.num_layers)
        )


@dataclasses.dataclass(frozen=True)
class Llama4VisionConfig:
    """Pixel-shuffle ViT tower (HF Llama4VisionModel geometry).

    The adapter's MLP input is hidden_size / pixel_shuffle_ratio**2, which
    HF stores as `intermediate_size`-driven `projector_input_dim`; we keep
    the explicit fields so a dev profile can scale freely.
    """

    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1408
    num_layers: int = 34
    num_heads: int = 16
    intermediate_size: int = 5632
    pixel_shuffle_ratio: float = 0.5
    projector_input_dim: int = 4096
    projector_output_dim: int = 4096
    vision_output_dim: int = 4096
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid ** 2  # excluding the trailing CLS token

    @property
    def tokens_per_tile(self) -> int:
        """Output tokens after pixel shuffle (placeholders per image tile)."""
        r = self.pixel_shuffle_ratio
        return int(self.num_patches * r * r)


@dataclasses.dataclass(frozen=True)
class Llama4Config:
    text: Llama4TextConfig
    vision: Llama4VisionConfig
    image_token_id: int = 200092
    boi_token_id: int = 200080
    eoi_token_id: int = 200081

    # -- profiles ---------------------------------------------------------
    @classmethod
    def maverick_17b_128e(cls, dtype=jnp.bfloat16) -> "Llama4Config":
        """meta-llama/Llama-4-Maverick-17B-128E-Instruct geometry (the
        reference auditor's primary model, vlm_auditor.py:34)."""
        return cls(
            text=Llama4TextConfig(dtype=dtype),
            vision=Llama4VisionConfig(dtype=dtype),
        )

    @classmethod
    def scout_17b_16e(cls, dtype=jnp.bfloat16) -> "Llama4Config":
        """meta-llama/Llama-4-Scout-17B-16E: every layer MoE, 16 experts."""
        return cls(
            text=Llama4TextConfig(
                num_experts=16, interleave_moe_layer_step=1,
                intermediate_size_mlp=16384, dtype=dtype,
                rope_scaling=(
                    ("rope_type", "llama3"), ("factor", 8.0),
                    ("low_freq_factor", 1.0), ("high_freq_factor", 4.0),
                    ("original_max_position_embeddings", 8192),
                ),
            ),
            vision=Llama4VisionConfig(dtype=dtype),
        )

    @classmethod
    def dev_profile(cls, dtype=jnp.bfloat16) -> "Llama4Config":
        """Single-chip-dev-sized Maverick shape: same layer pattern
        (dense/MoE interleave, NoPE every 4th, chunked RoPE attention),
        scaled so random weights fit beside the other engines."""
        return cls(
            text=Llama4TextConfig(
                vocab_size=202048, hidden_size=2048, num_layers=8,
                num_heads=16, num_kv_heads=4, head_dim=128,
                intermediate_size=4096, intermediate_size_mlp=8192,
                num_experts=8, top_k=1, interleave_moe_layer_step=2,
                attention_chunk_size=2048, dtype=dtype,
            ),
            vision=Llama4VisionConfig(
                image_size=336, patch_size=14, hidden_size=512,
                num_layers=4, num_heads=8, intermediate_size=2048,
                projector_input_dim=2048, projector_output_dim=2048,
                vision_output_dim=2048, dtype=dtype,
            ),
        )

    @classmethod
    def tiny(cls) -> "Llama4Config":
        """CPU golden-test config vs HF Llama4 (f32; covers a full pattern
        period: dense/MoE interleave and one NoPE layer in 4 layers, plus
        chunked attention small enough to bind within a short prompt)."""
        return cls(
            text=Llama4TextConfig(
                vocab_size=256, hidden_size=64, num_layers=4, num_heads=4,
                num_kv_heads=2, head_dim=16, intermediate_size=112,
                intermediate_size_mlp=160, num_experts=4, top_k=2,
                interleave_moe_layer_step=2, nope_interval=4,
                attention_chunk_size=8, rope_theta=500000.0,
                floor_scale=4.0,  # tiny positions must exercise temp tuning
                dtype=jnp.float32,
            ),
            vision=Llama4VisionConfig(
                image_size=56, patch_size=14, hidden_size=32,
                num_layers=2, num_heads=2, intermediate_size=128,
                pixel_shuffle_ratio=0.5, projector_input_dim=48,
                projector_output_dim=48, vision_output_dim=48,
                dtype=jnp.float32,
            ),
            image_token_id=250,
            boi_token_id=248,
            eoi_token_id=249,
        )

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16) -> "Llama4Config":
        """Build from a Llama4 checkpoint's config.json (text+vision)."""
        tc = cfg.get("text_config", cfg)
        vc = cfg.get("vision_config", {})
        scaling = None
        rs = tc.get("rope_scaling")
        if rs and rs.get("rope_type", rs.get("type")) == "llama3":
            scaling = (
                ("rope_type", "llama3"), ("factor", rs["factor"]),
                ("low_freq_factor", rs["low_freq_factor"]),
                ("high_freq_factor", rs["high_freq_factor"]),
                ("original_max_position_embeddings",
                 rs["original_max_position_embeddings"]),
            )
        no_rope = tc.get("no_rope_layers")
        moe_layers = tc.get("moe_layers")
        text = Llama4TextConfig(
            vocab_size=tc["vocab_size"],
            hidden_size=tc["hidden_size"],
            num_layers=tc["num_hidden_layers"],
            num_heads=tc["num_attention_heads"],
            num_kv_heads=tc.get("num_key_value_heads",
                                tc["num_attention_heads"]),
            head_dim=tc.get("head_dim",
                            tc["hidden_size"] // tc["num_attention_heads"]),
            intermediate_size=tc["intermediate_size"],
            intermediate_size_mlp=tc.get("intermediate_size_mlp",
                                         tc["intermediate_size"]),
            num_experts=tc.get("num_local_experts", 16),
            top_k=tc.get("num_experts_per_tok", 1),
            interleave_moe_layer_step=tc.get("interleave_moe_layer_step", 1),
            attention_chunk_size=tc.get("attention_chunk_size", 8192),
            use_qk_norm=tc.get("use_qk_norm", True),
            attn_temperature_tuning=tc.get("attn_temperature_tuning", True),
            floor_scale=float(tc.get("floor_scale", 8192)),
            attn_scale=float(tc.get("attn_scale", 0.1)),
            rope_theta=tc.get("rope_theta", 500000.0),
            rope_scaling=scaling,
            rms_norm_eps=tc.get("rms_norm_eps", 1e-5),
            tie_word_embeddings=tc.get("tie_word_embeddings", False),
            moe_layers_override=tuple(moe_layers) if moe_layers else None,
            no_rope_override=tuple(no_rope) if no_rope else None,
            dtype=dtype,
        )
        vision = Llama4VisionConfig(
            image_size=vc.get("image_size", 336),
            patch_size=vc.get("patch_size", 14),
            hidden_size=vc.get("hidden_size", 1408),
            num_layers=vc.get("num_hidden_layers", 34),
            num_heads=vc.get("num_attention_heads", 16),
            intermediate_size=vc.get("intermediate_size", 5632),
            pixel_shuffle_ratio=vc.get("pixel_shuffle_ratio", 0.5),
            projector_input_dim=vc.get("projector_input_dim", 4096),
            projector_output_dim=vc.get("projector_output_dim", 4096),
            vision_output_dim=vc.get("vision_output_dim", 4096),
            rope_theta=vc.get("rope_theta", 10000.0),
            norm_eps=vc.get("norm_eps", 1e-5),
            dtype=dtype,
        ) if vc else Llama4VisionConfig(dtype=dtype)
        return cls(
            text=text, vision=vision,
            image_token_id=cfg.get("image_token_id", 200092),
            boi_token_id=cfg.get("boi_token_id", 200080),
            eoi_token_id=cfg.get("eoi_token_id", 200081),
        )


__all__ = ["Llama4TextConfig", "Llama4VisionConfig", "Llama4Config"]
