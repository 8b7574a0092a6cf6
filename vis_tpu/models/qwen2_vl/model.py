"""Full Qwen2-VL model: vision tower + M-RoPE decoder + weight loading.

On-pod replacement for the reference's remote Qwen2.5-VL inspector calls
(reference: src/agents/vlm_inspector.py:32,105).  The forward surface is
split for the serving engine:
  encode_image()        — vision tower over one padded patch bucket
  embed_multimodal()    — text embeddings with vision features scattered in
  (prefill/decode come from models.common.decoder with mrope positions)

Weight loading: convert_hf_state_dict() maps HF checkpoint tensors (torch or
numpy) onto the param pytree — used both by golden tests (tiny random HF
model) and by real safetensors checkpoints via vis_tpu.models.loader.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vis_tpu.models.common.decoder import (
    DecoderConfig,
    init_decoder_params,
)
from vis_tpu.models.common.layers import embed
from vis_tpu.models.qwen2_vl.config import Qwen2VLConfig, VisionConfig
from vis_tpu.models.qwen2_vl.vision import init_vision_params, vision_forward

Params = Dict[str, Any]


def init_params(config: Qwen2VLConfig, key: jax.Array) -> Params:
    k_vision, k_text = jax.random.split(key)
    return {
        "vision": init_vision_params(config.vision, k_vision),
        "text": init_decoder_params(config.text, k_text),
    }


def encode_image(
    config: Qwen2VLConfig,
    params: Params,
    patches: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    num_patches: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Vision tower: [seq, patch_dim] -> [seq/4, text_hidden]."""
    return vision_forward(config.vision, params["vision"], patches, cos, sin, num_patches)


def embed_multimodal(
    config: Qwen2VLConfig,
    params: Params,
    token_ids: jnp.ndarray,
    vision_embeds: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Token embeddings with vision features placed at image-token slots.

    token_ids: [b, s]; vision_embeds: [n_vision, hidden] in sequence order.
    Image-token positions are assumed contiguous per image (the engine builds
    prompts that way); scatter is implemented as a cumulative-index gather so
    it stays jit-able with static shapes.
    """
    embeds = embed(token_ids, params["text"]["embed_tokens"])
    if vision_embeds is None:
        return embeds
    is_image = token_ids == config.image_token_id  # [b, s]
    # Index of each image token among image tokens (row-major across batch).
    flat = is_image.reshape(-1)
    order = jnp.cumsum(flat) - 1  # [b*s]
    order = jnp.clip(order, 0, vision_embeds.shape[0] - 1)
    gathered = vision_embeds[order].reshape(embeds.shape).astype(embeds.dtype)
    return jnp.where(is_image[..., None], gathered, embeds)


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------

def _np(tensor) -> np.ndarray:
    if hasattr(tensor, "detach"):
        return tensor.detach().to("cpu").float().numpy()
    return np.asarray(tensor)


def _strip_prefix(name: str) -> str:
    for prefix in ("model.language_model.", "language_model.model.", "model.",
                   "language_model."):
        if name.startswith(prefix):
            return name[len(prefix):]
    return name


def convert_hf_state_dict(
    state_dict: Mapping[str, Any], config: Qwen2VLConfig
) -> Params:
    """Map an HF Qwen2VLForConditionalGeneration state dict onto our pytree.

    Handles both historical layouts ('visual.*' + 'model.*' and
    'model.visual.*' + 'model.language_model.*').
    """
    tdtype = config.text.dtype
    vdtype = config.vision.dtype

    visual: Dict[str, np.ndarray] = {}
    text: Dict[str, np.ndarray] = {}
    lm_head = None
    for name, tensor in state_dict.items():
        if ".visual." in f".{name}":
            key = name.split("visual.", 1)[1]
            visual[key] = _np(tensor)
        elif name.endswith("lm_head.weight"):
            lm_head = _np(tensor)
        else:
            text[_strip_prefix(name)] = _np(tensor)

    # Vision tower -------------------------------------------------------
    vc = config.vision
    patch_w = visual["patch_embed.proj.weight"]  # [d, C, T, P, P]
    vision_params: Params = {
        "patch_embed": jnp.asarray(
            patch_w.reshape(vc.embed_dim, -1), vdtype
        ),
        "blocks": [],
        "merger": {
            "ln_q": jnp.asarray(visual["merger.ln_q.weight"], vdtype),
            "ln_q_bias": jnp.asarray(visual["merger.ln_q.bias"], vdtype),
            "fc1": jnp.asarray(visual["merger.mlp.0.weight"], vdtype),
            "fc1_bias": jnp.asarray(visual["merger.mlp.0.bias"], vdtype),
            "fc2": jnp.asarray(visual["merger.mlp.2.weight"], vdtype),
            "fc2_bias": jnp.asarray(visual["merger.mlp.2.bias"], vdtype),
        },
    }
    for i in range(vc.depth):
        p = f"blocks.{i}."
        vision_params["blocks"].append({
            "norm1": jnp.asarray(visual[p + "norm1.weight"], vdtype),
            "norm1_bias": jnp.asarray(visual[p + "norm1.bias"], vdtype),
            "norm2": jnp.asarray(visual[p + "norm2.weight"], vdtype),
            "norm2_bias": jnp.asarray(visual[p + "norm2.bias"], vdtype),
            "qkv": jnp.asarray(visual[p + "attn.qkv.weight"], vdtype),
            "qkv_bias": jnp.asarray(visual[p + "attn.qkv.bias"], vdtype),
            "proj": jnp.asarray(visual[p + "attn.proj.weight"], vdtype),
            "proj_bias": jnp.asarray(visual[p + "attn.proj.bias"], vdtype),
            "mlp": {
                "fc1": jnp.asarray(visual[p + "mlp.fc1.weight"], vdtype),
                "fc1_bias": jnp.asarray(visual[p + "mlp.fc1.bias"], vdtype),
                "fc2": jnp.asarray(visual[p + "mlp.fc2.weight"], vdtype),
                "fc2_bias": jnp.asarray(visual[p + "mlp.fc2.bias"], vdtype),
            },
        })

    # Decoder ------------------------------------------------------------
    tc = config.text
    text_params: Params = {
        "embed_tokens": jnp.asarray(text["embed_tokens.weight"], tdtype),
        "final_norm": jnp.asarray(text["norm.weight"], tdtype),
        "layers": [],
    }
    if not tc.tie_word_embeddings:
        text_params["lm_head"] = jnp.asarray(
            lm_head if lm_head is not None else text["embed_tokens.weight"], tdtype
        )
    for i in range(tc.num_layers):
        p = f"layers.{i}."
        layer = {
            "input_norm": jnp.asarray(text[p + "input_layernorm.weight"], tdtype),
            "post_attn_norm": jnp.asarray(
                text[p + "post_attention_layernorm.weight"], tdtype
            ),
            "q_proj": jnp.asarray(text[p + "self_attn.q_proj.weight"], tdtype),
            "k_proj": jnp.asarray(text[p + "self_attn.k_proj.weight"], tdtype),
            "v_proj": jnp.asarray(text[p + "self_attn.v_proj.weight"], tdtype),
            "o_proj": jnp.asarray(text[p + "self_attn.o_proj.weight"], tdtype),
            "mlp": {
                "gate_proj": jnp.asarray(text[p + "mlp.gate_proj.weight"], tdtype),
                "up_proj": jnp.asarray(text[p + "mlp.up_proj.weight"], tdtype),
                "down_proj": jnp.asarray(text[p + "mlp.down_proj.weight"], tdtype),
            },
        }
        if tc.qkv_bias:
            layer["q_bias"] = jnp.asarray(text[p + "self_attn.q_proj.bias"], tdtype)
            layer["k_bias"] = jnp.asarray(text[p + "self_attn.k_proj.bias"], tdtype)
            layer["v_bias"] = jnp.asarray(text[p + "self_attn.v_proj.bias"], tdtype)
        text_params["layers"].append(layer)

    return {"vision": vision_params, "text": text_params}


__all__ = [
    "init_params",
    "encode_image",
    "embed_multimodal",
    "convert_hf_state_dict",
]
