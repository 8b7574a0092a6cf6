"""Mllama (Llama-3.2 Vision) in JAX: tiled ViT + cross-attention decoder.

The auditor-role model (SURVEY.md §2 item 9: on-pod replacement for the
reference's Groq-hosted Llama-3.2-11B-Vision, reference vlm_auditor.py:56).
Architecture follows the public Mllama design, numerics verified against the
HF torch implementation (tests/test_models_mllama.py):

Vision: 448x448 tiles -> 14x14 patch conv -> per-tile aspect-ratio embedding
-> class token -> gated positional embedding -> pre-LN -> 32 local layers
(intermediates collected at [3,7,15,23,30]) -> post-LN -> post-tile embedding
-> 8 tanh-gated global layers -> concat(final, intermediates) = 7680-dim
features per patch.

Text: Llama decoder where layers at `cross_attention_layers` indices are
replaced by tanh-gated cross-attention blocks (q/k head-RMSNorm, KV from the
projected vision features).  Self-attention layers carry the KV cache; the
cross K/V are computed once per request at prefill and reused for decode.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vis_tpu.models.common.decoder import DecoderConfig, lm_logits
from vis_tpu.models.common.layers import (
    KVCache,
    apply_rope,
    attention_scores,
    causal_mask,
    decode_kv,
    layer_norm,
    linear,
    rms_norm,
    rope_cos_sin,
    swiglu_mlp,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MllamaVisionConfig:
    hidden_size: int = 1280
    num_layers: int = 32
    num_global_layers: int = 8
    attention_heads: int = 16
    image_size: int = 448
    patch_size: int = 14
    max_num_tiles: int = 4
    intermediate_size: int = 5120
    intermediate_layers_indices: Tuple[int, ...] = (3, 7, 15, 23, 30)
    num_aspect_ratios: int = 8   # len(supported_aspect_ratios)
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @property
    def patches_per_tile(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1  # +1 class token

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.attention_heads

    @property
    def output_dim(self) -> int:
        """Concat of final + intermediate layer states."""
        return self.hidden_size * (1 + len(self.intermediate_layers_indices))


@dataclasses.dataclass(frozen=True)
class MllamaConfig:
    vision: MllamaVisionConfig
    text: DecoderConfig
    cross_attention_layers: Tuple[int, ...] = (3, 8, 13, 18, 23, 28, 33, 38)
    image_token_id: int = 128256
    eos_token_id: int = 128009

    @classmethod
    def tiny(cls) -> "MllamaConfig":
        return cls(
            vision=MllamaVisionConfig(
                hidden_size=64, num_layers=2, num_global_layers=1,
                attention_heads=4, image_size=56, patch_size=14,
                max_num_tiles=2, intermediate_size=128,
                intermediate_layers_indices=(0,), num_aspect_ratios=3,
                dtype=jnp.float32,
            ),
            text=DecoderConfig(
                vocab_size=256, hidden_size=64, num_layers=4, num_heads=4,
                num_kv_heads=2, intermediate_size=128, rope_theta=500000.0,
                rms_norm_eps=1e-5, qkv_bias=False,
                rope_scaling=(
                    ("rope_type", "llama3"), ("factor", 8.0),
                    ("low_freq_factor", 1.0), ("high_freq_factor", 4.0),
                    ("original_max_position_embeddings", 8192),
                ),
                dtype=jnp.float32,
            ),
            cross_attention_layers=(1, 3),
            image_token_id=250, eos_token_id=2,
        )

    @classmethod
    def from_hf_config(cls, cfg: Dict[str, Any], dtype=jnp.bfloat16) -> "MllamaConfig":
        """Build from a checkpoint's config.json (HF MllamaConfig: nested
        text_config/vision_config) so any Mllama size loads without a preset."""
        from vis_tpu.models.llama.config import from_hf_config as text_from_hf

        t = cfg.get("text_config", cfg)
        v = cfg.get("vision_config", {})
        text = text_from_hf(t, dtype=dtype)
        return cls(
            vision=MllamaVisionConfig(
                hidden_size=v.get("hidden_size", 1280),
                num_layers=v.get("num_hidden_layers", 32),
                num_global_layers=v.get("num_global_layers", 8),
                attention_heads=v.get("attention_heads", 16),
                image_size=v.get("image_size", 448),
                patch_size=v.get("patch_size", 14),
                max_num_tiles=v.get("max_num_tiles", 4),
                intermediate_size=v.get("intermediate_size", 5120),
                intermediate_layers_indices=tuple(
                    v.get("intermediate_layers_indices", (3, 7, 15, 23, 30))
                ),
                num_aspect_ratios=len(v.get("supported_aspect_ratios", [0] * 8)),
                norm_eps=v.get("norm_eps", 1e-5),
                dtype=dtype,
            ),
            text=text,
            cross_attention_layers=tuple(
                t.get("cross_attention_layers", (3, 8, 13, 18, 23, 28, 33, 38))
            ),
            image_token_id=cfg.get("image_token_index", 128256),
            eos_token_id=128009,
        )

    @classmethod
    def llama32_11b_vision(cls, dtype=jnp.bfloat16) -> "MllamaConfig":
        return cls(
            vision=MllamaVisionConfig(dtype=dtype),
            text=DecoderConfig(
                vocab_size=128256, hidden_size=4096, num_layers=40,
                num_heads=32, num_kv_heads=8, intermediate_size=14336,
                rope_theta=500000.0, rms_norm_eps=1e-5, qkv_bias=False,
                rope_scaling=(
                    ("rope_type", "llama3"), ("factor", 8.0),
                    ("low_freq_factor", 1.0), ("high_freq_factor", 4.0),
                    ("original_max_position_embeddings", 8192),
                ),
                dtype=dtype,
            ),
        )

    @property
    def self_layer_indices(self) -> List[int]:
        return [
            i for i in range(self.text.num_layers)
            if i not in self.cross_attention_layers
        ]


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------

def _vision_attention(block: Params, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                      heads: int, head_dim: int) -> jnp.ndarray:
    b, s, _ = x.shape
    q = linear(x, block["q_proj"]).reshape(b, s, heads, head_dim)
    k = linear(x, block["k_proj"]).reshape(b, s, heads, head_dim)
    v = linear(x, block["v_proj"]).reshape(b, s, heads, head_dim)
    out = attention_scores(q, k, v, mask)
    return linear(out.reshape(b, s, heads * head_dim), block["o_proj"])


def _vision_layer(config: MllamaVisionConfig, block: Params, x: jnp.ndarray,
                  mask: Optional[jnp.ndarray], gated: bool) -> jnp.ndarray:
    h = layer_norm(x, block["input_norm"], block["input_norm_bias"],
                   eps=config.norm_eps)
    h = _vision_attention(block, h, mask, config.attention_heads, config.head_dim)
    if gated:
        h = jnp.tanh(block["gate_attn"].astype(jnp.float32)).astype(h.dtype) * h
    x = x + h
    h = layer_norm(x, block["post_attn_norm"], block["post_attn_norm_bias"],
                   eps=config.norm_eps)
    h = linear(h, block["fc1"], block["fc1_bias"])
    h = jax.nn.gelu(h, approximate=False)
    h = linear(h, block["fc2"], block["fc2_bias"])
    if gated:
        h = jnp.tanh(block["gate_ffn"].astype(jnp.float32)).astype(h.dtype) * h
    return x + h


def vision_forward(
    config: MllamaVisionConfig,
    params: Params,
    pixel_tiles: jnp.ndarray,
    aspect_ratio_id: jnp.ndarray,
    tile_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Encode one image's tiles.

    pixel_tiles: [num_tiles, C, H, W] normalized pixels;
    aspect_ratio_id: scalar int; tile_mask: [num_tiles] 1.0 = valid.
    Returns [num_tiles, patches_per_tile, output_dim] features.
    """
    t = pixel_tiles.shape[0]
    p = config.patch_size
    grid = config.image_size // p
    n_patches = grid * grid

    # Patch conv == linear over [C, P, P] blocks in row-major patch order.
    x = pixel_tiles.reshape(t, 3, grid, p, grid, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(t, n_patches, 3 * p * p)
    x = linear(x.astype(config.dtype), params["patch_embed"])  # [t, n, d]

    # Pre-tile aspect-ratio embedding (gated).
    pre_tile = params["pre_tile_emb"][aspect_ratio_id].reshape(
        config.max_num_tiles, 1, config.hidden_size
    )[:t]
    x = x + jnp.tanh(params["pre_tile_gate"].astype(jnp.float32)).astype(x.dtype) * pre_tile

    # Class token.
    cls = jnp.broadcast_to(
        params["class_embedding"][None, None, :], (t, 1, config.hidden_size)
    ).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)  # [t, n+1, d]
    n_tok = n_patches + 1

    # Gated positional embedding: (1 - tanh g) * pos + tanh g * tile_pos.
    gate = jnp.tanh(params["pos_gate"].astype(jnp.float32))
    pos = (1.0 - gate) * params["pos_embedding"].astype(jnp.float32)
    x = x + pos[None].astype(x.dtype)
    tile_pos = params["tile_pos_emb"][aspect_ratio_id].reshape(
        config.max_num_tiles, n_tok, config.hidden_size
    )[:t]
    x = x + (gate * tile_pos.astype(jnp.float32)).astype(x.dtype)

    x = layer_norm(x, params["ln_pre"], params["ln_pre_bias"], eps=1e-5)

    # Pad token dim to a multiple of 8 (HF parity).
    pad = (8 - n_tok % 8) % 8
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    padded_tok = n_tok + pad

    # Attention mask (HF semantics): valid-per-position vector v over the
    # flattened [t * padded_tok] axis; additive mask = outer(1-v, 1-v) * min.
    valid = jnp.broadcast_to(tile_mask[:, None], (t, padded_tok)).astype(jnp.float32)
    if pad:
        valid = valid.at[:, -pad:].set(0.0)
    valid_flat = valid.reshape(1, t * padded_tok)
    inv = 1.0 - valid_flat
    mask = (inv[:, :, None] * inv[:, None, :]) * (-3.3895e38)
    mask = mask[:, None]  # [1, 1, S, S]

    seq = x.reshape(1, t * padded_tok, config.hidden_size)
    intermediates = []
    for idx, block in enumerate(params["local_layers"]):
        seq = _vision_layer(config, block, seq, mask, gated=False)
        # HF's vision encoder records hidden_states AFTER each layer;
        # intermediate_layers_indices select those post-layer snapshots.
        if idx in config.intermediate_layers_indices:
            intermediates.append(seq)

    seq = layer_norm(seq, params["ln_post"], params["ln_post_bias"], eps=1e-5)

    post_tile = params["post_tile_emb"][aspect_ratio_id].reshape(
        config.max_num_tiles, 1, config.hidden_size
    )[:t]
    seq = seq.reshape(t, padded_tok, config.hidden_size)
    seq = seq + jnp.tanh(
        params["post_tile_gate"].astype(jnp.float32)
    ).astype(seq.dtype) * post_tile
    seq = seq.reshape(1, t * padded_tok, config.hidden_size)

    for block in params["global_layers"]:
        seq = _vision_layer(config, block, seq, mask, gated=True)

    final = seq.reshape(t, padded_tok, config.hidden_size)[:, :n_tok]
    inter = jnp.stack(
        [s.reshape(t, padded_tok, config.hidden_size)[:, :n_tok]
         for s in intermediates],
        axis=-1,
    )  # [t, n_tok, d, n_inter]
    inter = inter.reshape(t, n_tok, -1)
    return jnp.concatenate([final, inter], axis=-1)  # [t, n_tok, output_dim]


# ---------------------------------------------------------------------------
# Text model with cross-attention
# ---------------------------------------------------------------------------

def compute_cross_kv(
    config: MllamaConfig, params: Params, vision_features: jnp.ndarray
) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Project vision features and precompute each cross layer's K/V.

    vision_features: [num_tiles, n_tok, vision_output_dim].
    Returns per-cross-layer (k, v) of shape [1, S, kv_heads, head_dim].
    """
    tc = config.text
    projected = linear(
        vision_features.astype(tc.dtype), params["projector"],
        params["projector_bias"],
    )  # [t, n_tok, hidden]
    states = projected.reshape(1, -1, tc.hidden_size)
    out = []
    for layer_idx in config.cross_attention_layers:
        layer = params["text"]["layers"][layer_idx]
        s = states.shape[1]
        k = linear(states, layer["k_proj"]).reshape(
            1, s, tc.num_kv_heads, tc.head_dim_
        )
        k = rms_norm(k, layer["k_norm"], tc.rms_norm_eps)
        v = linear(states, layer["v_proj"]).reshape(
            1, s, tc.num_kv_heads, tc.head_dim_
        )
        out.append((k, v))
    return out


def _cross_attn_layer(
    tc: DecoderConfig, layer: Params, x: jnp.ndarray,
    cross_kv: Tuple[jnp.ndarray, jnp.ndarray],
) -> jnp.ndarray:
    b, s, _ = x.shape
    h = rms_norm(x, layer["input_norm"], tc.rms_norm_eps)
    q = linear(h, layer["q_proj"]).reshape(b, s, tc.num_heads, tc.head_dim_)
    q = rms_norm(q, layer["q_norm"], tc.rms_norm_eps)
    k, v = cross_kv
    k = jnp.broadcast_to(k, (b,) + k.shape[1:])
    v = jnp.broadcast_to(v, (b,) + v.shape[1:])
    out = attention_scores(q, k, v, None)
    out = linear(out.reshape(b, s, tc.num_heads * tc.head_dim_), layer["o_proj"])
    x = x + jnp.tanh(layer["gate_attn"].astype(jnp.float32)).astype(x.dtype) * out
    h = rms_norm(x, layer["post_attn_norm"], tc.rms_norm_eps)
    h = swiglu_mlp(h, layer["mlp"])
    return x + jnp.tanh(layer["gate_mlp"].astype(jnp.float32)).astype(x.dtype) * h


def _self_attn_layer(
    tc: DecoderConfig, layer: Params, self_idx: int, x: jnp.ndarray,
    cos: jnp.ndarray, sin: jnp.ndarray, cache: Optional[KVCache],
    mask: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    b, s, _ = x.shape
    hd = tc.head_dim_
    h = rms_norm(x, layer["input_norm"], tc.rms_norm_eps)
    if "qkv_proj" in layer:  # fused layout (fuse_mllama_projections)
        qdim = tc.num_heads * hd
        kvdim = tc.num_kv_heads * hd
        qkv = linear(h, layer["qkv_proj"])
        q = qkv[..., :qdim].reshape(b, s, tc.num_heads, hd)
        k = qkv[..., qdim : qdim + kvdim].reshape(b, s, tc.num_kv_heads, hd)
        v = qkv[..., qdim + kvdim :].reshape(b, s, tc.num_kv_heads, hd)
    else:
        q = linear(h, layer["q_proj"]).reshape(b, s, tc.num_heads, hd)
        k = linear(h, layer["k_proj"]).reshape(b, s, tc.num_kv_heads, hd)
        v = linear(h, layer["v_proj"]).reshape(b, s, tc.num_kv_heads, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if cache is not None:
        cache = cache.update(self_idx, k, v)
        k, v = cache.layer(self_idx)
        k = decode_kv(k, q.dtype, tc.num_kv_heads)
        v = decode_kv(v, q.dtype, tc.num_kv_heads)
    out = attention_scores(q, k, v, mask)
    out = linear(out.reshape(b, s, tc.num_heads * tc.head_dim_), layer["o_proj"])
    x = x + out
    h = rms_norm(x, layer["post_attn_norm"], tc.rms_norm_eps)
    return x + swiglu_mlp(h, layer["mlp"]), cache


def text_forward(
    config: MllamaConfig,
    params: Params,
    input_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    cross_kv: Optional[List[Tuple[jnp.ndarray, jnp.ndarray]]],
    cache: Optional[KVCache] = None,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Decoder over embedded inputs.  `cache` indexes SELF layers only
    (layer i in cache = i-th self-attention layer).  With cross_kv None the
    cross layers are skipped entirely (text-only mode; matches HF, which
    skips cross layers when no image is present)."""
    tc = config.text
    cos, sin = rope_cos_sin(
        positions, tc.head_dim_, tc.rope_theta, tc.rope_scaling_dict
    )
    x = input_embeds
    self_idx = 0
    for layer_idx, layer in enumerate(params["text"]["layers"]):
        if layer_idx in config.cross_attention_layers:
            if cross_kv is not None:
                pos_in_cross = config.cross_attention_layers.index(layer_idx)
                x = _cross_attn_layer(tc, layer, x, cross_kv[pos_in_cross])
            continue
        x, cache = _self_attn_layer(tc, layer, self_idx, x, cos, sin, cache, mask)
        self_idx += 1
    x = rms_norm(x, params["text"]["final_norm"], tc.rms_norm_eps)
    if cache is not None:
        cache = cache.advance(jnp.int32(input_embeds.shape[1]))
    return x, cache


def mllama_logits(config: MllamaConfig, params: Params,
                  hidden: jnp.ndarray) -> jnp.ndarray:
    return lm_logits(config.text, params["text"], hidden)




def fuse_mllama_projections(config: MllamaConfig, params: Params) -> Params:
    """Concat each SELF layer's Q/K/V into one projection and every text
    layer's gate/up into a gateup projection ([out, in] concat on the out
    axis — each output row is an independent dot product, so the math is
    unchanged and per-row quantization scales commute with the concat).

    The Mllama text stack's decode step otherwise runs 7 weight matmuls
    per self layer; fusing cuts that to 4 — the same layout law
    decoder.fuse_stacked_projections applies to the Llama/Qwen stacks.
    MEASURED on the tunneled v5e at 11B int4 (tools/probe_mllama_decode):
    latency-neutral — 13.8 vs 14.0 ms/tok plain, 10.7 vs 10.3 ms/tok on
    the constrained-window path.  (The probe's module docstring quotes the
    earlier r04 bench at ~15 ms/step: that number predates the frame-cache
    and device-tiling fixes; 13.8-14.0 is the post-fix baseline the probe
    itself measured.)  The decode step is int4-unpack/
    bandwidth-bound, not kernel-count-bound, so the win is layout
    consistency (one fused-projection convention across all single-device
    stacks), not speed.  Cross layers keep q_proj separate (their K/V are
    precomputed per image by compute_cross_kv, which reads the unfused
    k_proj/v_proj) but do fuse gate/up.

    NOT for tensor-parallel runs: slicing the fused output of a
    row-sharded matmul would force a mid-layer reshard — the engine only
    fuses when no mesh is attached.  Accepts raw [out, in] arrays or
    QuantizedWeight/QuantizedWeight4 leaves (q and per-row scales concat
    on axis 0); a layer whose projections mix leaf types is left unfused.
    """
    from vis_tpu.ops.quantized import QuantizedWeight, QuantizedWeight4

    def concat_out(ws):
        kinds = {type(w) for w in ws}
        if len(kinds) != 1:
            return None
        if isinstance(ws[0], QuantizedWeight):
            return QuantizedWeight(
                q=jnp.concatenate([w.q for w in ws], axis=0),
                scale=jnp.concatenate([w.scale for w in ws], axis=0),
            )
        if isinstance(ws[0], QuantizedWeight4):
            return QuantizedWeight4(
                q=jnp.concatenate([w.q for w in ws], axis=0),
                scale=jnp.concatenate([w.scale for w in ws], axis=0),
            )
        return jnp.concatenate(ws, axis=0)

    text = dict(params["text"])
    layers = []
    for idx, layer in enumerate(text["layers"]):
        qlayer = dict(layer)
        is_cross = idx in config.cross_attention_layers
        if not is_cross and all(
            n in qlayer for n in ("q_proj", "k_proj", "v_proj")
        ):
            fused = concat_out(
                [qlayer["q_proj"], qlayer["k_proj"], qlayer["v_proj"]]
            )
            if fused is not None:
                qlayer["qkv_proj"] = fused
                for n in ("q_proj", "k_proj", "v_proj"):
                    del qlayer[n]
        if "mlp" in qlayer:
            mlp = dict(qlayer["mlp"])
            if "gate_proj" in mlp and "up_proj" in mlp:
                fused = concat_out([mlp["gate_proj"], mlp["up_proj"]])
                if fused is not None:
                    mlp["gateup_proj"] = fused
                    del mlp["gate_proj"], mlp["up_proj"]
            qlayer["mlp"] = mlp
        layers.append(qlayer)
    text["layers"] = layers
    out = {k: v for k, v in params.items() if k != "text"}
    out["text"] = text
    return out


def quantize_mllama_params(params: Params, mode: str = "int8",
                           vocab_mode: str = None) -> Params:
    """Weight-only quantization (int8 or packed int4) of the Mllama text stack.

    The 11B auditor's text decoder is ~18 GB in bf16 — it does not fit one
    v5e chip without this (int4 halves it again, which is what lets the
    full 7B+11B+8B model set share one chip).  Self- and cross-attention
    projections, MLPs, and the vocab tables become QuantizedWeight /
    QuantizedWeight4 (linear()/embed()/lm_logits() dispatch on them);
    norms, gates, and the vision tower stay in their original dtype.
    Loop-path execution is unchanged.
    """
    from vis_tpu.ops.quantized import (
        QuantizedWeight,
        QuantizedWeight4,
        quantize_weight,
        quantize_weight4,
    )

    quantize = quantize_weight4 if mode == "int4" else quantize_weight
    # Vocab projection may run at a different precision than the layers
    # (int8 vocab halves the VPU-bound int4 vocab-matmul decode term).
    vocab_mode = vocab_mode or mode
    if vocab_mode == "int4":
        quantize_vocab = quantize_weight4
    elif vocab_mode == "none":
        quantize_vocab = None
    else:
        quantize_vocab = quantize_weight
    qtypes = (QuantizedWeight, QuantizedWeight4)

    text = dict(params["text"])
    layers = []
    for layer in text["layers"]:
        qlayer = dict(layer)
        for name in ("qkv_proj", "q_proj", "k_proj", "v_proj", "o_proj"):
            if name in qlayer and not isinstance(qlayer[name], qtypes):
                qlayer[name] = quantize(qlayer[name])
        if "mlp" in qlayer:
            mlp = dict(qlayer["mlp"])
            for name in ("gateup_proj", "gate_proj", "up_proj", "down_proj"):
                if name in mlp and not isinstance(mlp[name], qtypes):
                    mlp[name] = quantize(mlp[name])
            qlayer["mlp"] = mlp
        layers.append(qlayer)
    text["layers"] = layers
    for name in ("embed_tokens", "lm_head"):
        if name in text and not isinstance(text[name], qtypes):
            if quantize_vocab is not None:
                text[name] = quantize_vocab(text[name], pad_out_multiple=512)
    out = dict(params)
    out["text"] = text
    return out


def init_params(config: MllamaConfig, key: jax.Array, scale: float = 0.02) -> Params:
    """Random init of the full Mllama pytree (dev profiles / tests)."""
    vc, tc = config.vision, config.text
    keys = iter(jax.random.split(key, 4096))

    def norm(shape, dtype):
        return (scale * jax.random.normal(next(keys), shape)).astype(dtype)

    def zeros(shape, dtype):
        return jnp.zeros(shape, dtype)

    def ones(shape, dtype):
        return jnp.ones(shape, dtype)

    n_tok = vc.patches_per_tile
    max_ar = vc.num_aspect_ratios  # ids are 1..num_aspect_ratios; row 0 = pad

    def vision_block(gated: bool) -> Params:
        block = {
            "input_norm": ones((vc.hidden_size,), vc.dtype),
            "input_norm_bias": zeros((vc.hidden_size,), vc.dtype),
            "post_attn_norm": ones((vc.hidden_size,), vc.dtype),
            "post_attn_norm_bias": zeros((vc.hidden_size,), vc.dtype),
            "q_proj": norm((vc.hidden_size, vc.hidden_size), vc.dtype),
            "k_proj": norm((vc.hidden_size, vc.hidden_size), vc.dtype),
            "v_proj": norm((vc.hidden_size, vc.hidden_size), vc.dtype),
            "o_proj": norm((vc.hidden_size, vc.hidden_size), vc.dtype),
            "fc1": norm((vc.intermediate_size, vc.hidden_size), vc.dtype),
            "fc1_bias": zeros((vc.intermediate_size,), vc.dtype),
            "fc2": norm((vc.hidden_size, vc.intermediate_size), vc.dtype),
            "fc2_bias": zeros((vc.hidden_size,), vc.dtype),
        }
        if gated:
            block["gate_attn"] = zeros((1,), vc.dtype) + 0.785
            block["gate_ffn"] = zeros((1,), vc.dtype) + 0.785
        return block

    params: Params = {
        "patch_embed": norm((vc.hidden_size, 3 * vc.patch_size ** 2), vc.dtype),
        "class_embedding": norm((vc.hidden_size,), vc.dtype),
        "pos_gate": zeros((1,), vc.dtype),
        "pos_embedding": norm((n_tok, vc.hidden_size), vc.dtype),
        "tile_pos_emb": norm((max_ar + 1, vc.max_num_tiles * n_tok * vc.hidden_size), vc.dtype),
        "pre_tile_emb": norm((max_ar + 1, vc.max_num_tiles * vc.hidden_size), vc.dtype),
        "pre_tile_gate": zeros((1,), vc.dtype),
        "post_tile_emb": norm((max_ar + 1, vc.max_num_tiles * vc.hidden_size), vc.dtype),
        "post_tile_gate": zeros((1,), vc.dtype),
        "ln_pre": ones((vc.hidden_size,), vc.dtype),
        "ln_pre_bias": zeros((vc.hidden_size,), vc.dtype),
        "ln_post": ones((vc.hidden_size,), vc.dtype),
        "ln_post_bias": zeros((vc.hidden_size,), vc.dtype),
        "local_layers": [vision_block(False) for _ in range(vc.num_layers)],
        "global_layers": [vision_block(True) for _ in range(vc.num_global_layers)],
        "projector": norm((tc.hidden_size, vc.output_dim), tc.dtype),
        "projector_bias": zeros((tc.hidden_size,), tc.dtype),
    }

    hd = tc.head_dim_
    text: Params = {
        "embed_tokens": norm((tc.vocab_size + 8, tc.hidden_size), tc.dtype),
        "final_norm": ones((tc.hidden_size,), tc.dtype),
        "layers": [],
    }
    if not tc.tie_word_embeddings:
        text["lm_head"] = norm((tc.vocab_size, tc.hidden_size), tc.dtype)
    for i in range(tc.num_layers):
        common = {
            "input_norm": ones((tc.hidden_size,), tc.dtype),
            "post_attn_norm": ones((tc.hidden_size,), tc.dtype),
            "q_proj": norm((tc.num_heads * hd, tc.hidden_size), tc.dtype),
            "k_proj": norm((tc.num_kv_heads * hd, tc.hidden_size), tc.dtype),
            "v_proj": norm((tc.num_kv_heads * hd, tc.hidden_size), tc.dtype),
            "o_proj": norm((tc.hidden_size, tc.num_heads * hd), tc.dtype),
            "mlp": {
                "gate_proj": norm((tc.intermediate_size, tc.hidden_size), tc.dtype),
                "up_proj": norm((tc.intermediate_size, tc.hidden_size), tc.dtype),
                "down_proj": norm((tc.hidden_size, tc.intermediate_size), tc.dtype),
            },
        }
        if i in config.cross_attention_layers:
            common.update(
                q_norm=ones((hd,), tc.dtype),
                k_norm=ones((hd,), tc.dtype),
                gate_attn=zeros((1,), tc.dtype),
                gate_mlp=zeros((1,), tc.dtype),
            )
        text["layers"].append(common)
    params["text"] = text
    return params


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------

def _np(tensor) -> np.ndarray:
    if hasattr(tensor, "detach"):
        return tensor.detach().to("cpu").float().numpy()
    return np.asarray(tensor)


def convert_hf_state_dict(state_dict: Mapping[str, Any],
                          config: MllamaConfig) -> Params:
    """Map an HF MllamaForConditionalGeneration state dict onto our pytree."""
    vd = config.vision.dtype
    td = config.text.dtype
    flat = { }
    for name, tensor in state_dict.items():
        key = name
        # Two HF layouts: in-memory state_dicts use model.language_model.*
        # with a top-level lm_head; serialized checkpoints keep the legacy
        # language_model.model.* / language_model.lm_head.* nesting.
        if key.startswith("model."):
            key = key[len("model."):]
        if key.startswith("language_model.model."):
            key = "language_model." + key[len("language_model.model."):]
        if key == "language_model.lm_head.weight":
            key = "lm_head.weight"
        flat[key] = tensor

    def get(key: str, dtype) -> jnp.ndarray:
        return jnp.asarray(_np(flat[key]), dtype)

    vc = config.vision
    patch_w = _np(flat["vision_model.patch_embedding.weight"])  # [d, C, P, P]
    params: Params = {
        "patch_embed": jnp.asarray(patch_w.reshape(vc.hidden_size, -1), vd),
        "class_embedding": get("vision_model.class_embedding", vd),
        "pos_gate": get("vision_model.gated_positional_embedding.gate", vd),
        "pos_embedding": get("vision_model.gated_positional_embedding.embedding", vd),
        "tile_pos_emb": get(
            "vision_model.gated_positional_embedding.tile_embedding.weight", vd
        ),
        "pre_tile_emb": get(
            "vision_model.pre_tile_positional_embedding.embedding.weight", vd
        ),
        "pre_tile_gate": get(
            "vision_model.pre_tile_positional_embedding.gate", vd
        ),
        "post_tile_emb": get(
            "vision_model.post_tile_positional_embedding.embedding.weight", vd
        ),
        "post_tile_gate": get(
            "vision_model.post_tile_positional_embedding.gate", vd
        ),
        "ln_pre": get("vision_model.layernorm_pre.weight", vd),
        "ln_pre_bias": get("vision_model.layernorm_pre.bias", vd),
        "ln_post": get("vision_model.layernorm_post.weight", vd),
        "ln_post_bias": get("vision_model.layernorm_post.bias", vd),
        "local_layers": [],
        "global_layers": [],
        "projector": get("multi_modal_projector.weight", td),
        "projector_bias": get("multi_modal_projector.bias", td),
    }

    def vision_block(prefix: str, gated: bool) -> Params:
        block = {
            "input_norm": get(prefix + "input_layernorm.weight", vd),
            "input_norm_bias": get(prefix + "input_layernorm.bias", vd),
            "post_attn_norm": get(prefix + "post_attention_layernorm.weight", vd),
            "post_attn_norm_bias": get(prefix + "post_attention_layernorm.bias", vd),
            "q_proj": get(prefix + "self_attn.q_proj.weight", vd),
            "k_proj": get(prefix + "self_attn.k_proj.weight", vd),
            "v_proj": get(prefix + "self_attn.v_proj.weight", vd),
            "o_proj": get(prefix + "self_attn.o_proj.weight", vd),
            "fc1": get(prefix + "mlp.fc1.weight", vd),
            "fc1_bias": get(prefix + "mlp.fc1.bias", vd),
            "fc2": get(prefix + "mlp.fc2.weight", vd),
            "fc2_bias": get(prefix + "mlp.fc2.bias", vd),
        }
        if gated:
            block["gate_attn"] = get(prefix + "gate_attn", vd)
            block["gate_ffn"] = get(prefix + "gate_ffn", vd)
        return block

    for i in range(vc.num_layers):
        params["local_layers"].append(
            vision_block(f"vision_model.transformer.layers.{i}.", gated=False)
        )
    for i in range(vc.num_global_layers):
        params["global_layers"].append(
            vision_block(f"vision_model.global_transformer.layers.{i}.", gated=True)
        )

    tc = config.text
    text: Params = {
        "embed_tokens": get("language_model.embed_tokens.weight", td),
        "final_norm": get("language_model.norm.weight", td),
        "layers": [],
    }
    if not tc.tie_word_embeddings:
        if "lm_head.weight" in flat:
            text["lm_head"] = get("lm_head.weight", td)
        else:
            # Tied head serialized without lm_head.weight: Mllama's embed
            # table carries vocab_size + 8 special rows (image tokens);
            # the head must be SLICED to vocab_size or logits gain 8 live
            # rows the tokenizer cannot decode.
            text["lm_head"] = get(
                "language_model.embed_tokens.weight", td
            )[: tc.vocab_size]
    for i in range(tc.num_layers):
        prefix = f"language_model.layers.{i}."
        if i in config.cross_attention_layers:
            text["layers"].append({
                "input_norm": get(prefix + "input_layernorm.weight", td),
                "post_attn_norm": get(prefix + "post_attention_layernorm.weight", td),
                "q_proj": get(prefix + "cross_attn.q_proj.weight", td),
                "k_proj": get(prefix + "cross_attn.k_proj.weight", td),
                "v_proj": get(prefix + "cross_attn.v_proj.weight", td),
                "o_proj": get(prefix + "cross_attn.o_proj.weight", td),
                "q_norm": get(prefix + "cross_attn.q_norm.weight", td),
                "k_norm": get(prefix + "cross_attn.k_norm.weight", td),
                "gate_attn": get(prefix + "cross_attn_attn_gate", td),
                "gate_mlp": get(prefix + "cross_attn_mlp_gate", td),
                "mlp": {
                    "gate_proj": get(prefix + "mlp.gate_proj.weight", td),
                    "up_proj": get(prefix + "mlp.up_proj.weight", td),
                    "down_proj": get(prefix + "mlp.down_proj.weight", td),
                },
            })
        else:
            text["layers"].append({
                "input_norm": get(prefix + "input_layernorm.weight", td),
                "post_attn_norm": get(prefix + "post_attention_layernorm.weight", td),
                "q_proj": get(prefix + "self_attn.q_proj.weight", td),
                "k_proj": get(prefix + "self_attn.k_proj.weight", td),
                "v_proj": get(prefix + "self_attn.v_proj.weight", td),
                "o_proj": get(prefix + "self_attn.o_proj.weight", td),
                "mlp": {
                    "gate_proj": get(prefix + "mlp.gate_proj.weight", td),
                    "up_proj": get(prefix + "mlp.up_proj.weight", td),
                    "down_proj": get(prefix + "mlp.down_proj.weight", td),
                },
            })
    params["text"] = text
    return params


__all__ = [
    "quantize_mllama_params",
    "init_params",
    "MllamaVisionConfig",
    "MllamaConfig",
    "vision_forward",
    "compute_cross_kv",
    "text_forward",
    "mllama_logits",
    "convert_hf_state_dict",
]
