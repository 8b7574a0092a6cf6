"""Qwen2.5-VL model assembly: vision tower + the framework's common Qwen2
decoder (M-RoPE), mirroring vis_tpu.models.qwen2_vl.model for the 2.5
family (reference inspector: "Qwen2.5-VL-7B", reference
src/agents/vlm_inspector.py:23)."""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from vis_tpu.models.common.decoder import init_decoder_params
from vis_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
from vis_tpu.models.qwen2_5_vl.vision import init_vision_params

Params = Dict[str, Any]


def init_params(config: Qwen25VLConfig, key: jax.Array) -> Params:
    kv, kt = jax.random.split(key)
    return {
        "vision": init_vision_params(config.vision, kv),
        "text": init_decoder_params(config.text, kt),
    }


def _np(tensor) -> np.ndarray:
    # Torch tensors (incl. bf16, which numpy cannot represent directly)
    # detach through float32 — same contract as qwen2_vl/model.py:_np.
    if hasattr(tensor, "detach"):
        return tensor.detach().to("cpu").float().numpy()
    return np.asarray(tensor)


def _strip_prefix(name: str) -> str:
    for prefix in ("model.language_model.", "language_model.model.",
                   "language_model.", "model."):
        if name.startswith(prefix):
            return name[len(prefix):]
    return name


def convert_hf_state_dict(
    state_dict: Mapping[str, Any], config: Qwen25VLConfig
) -> Params:
    """Map an HF Qwen2_5_VLForConditionalGeneration state dict onto our
    pytree (visual.* RMSNorm/SwiGLU naming; text side identical to Qwen2)."""
    tdtype = config.text.dtype
    vdtype = config.vision.dtype

    visual: Dict[str, np.ndarray] = {}
    text: Dict[str, np.ndarray] = {}
    lm_head = None
    for name, tensor in state_dict.items():
        if ".visual." in f".{name}":
            visual[name.split("visual.", 1)[1]] = _np(tensor)
        elif name.endswith("lm_head.weight"):
            lm_head = _np(tensor)
        else:
            text[_strip_prefix(name)] = _np(tensor)

    vc = config.vision
    patch_w = visual["patch_embed.proj.weight"]  # [d, C, T, P, P]
    vision_params: Params = {
        "patch_embed": jnp.asarray(
            patch_w.reshape(vc.hidden_size, -1), vdtype
        ),
        "blocks": [],
        "merger": {
            "ln_q": jnp.asarray(visual["merger.ln_q.weight"], vdtype),
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
            "norm2": jnp.asarray(visual[p + "norm2.weight"], vdtype),
            "qkv": jnp.asarray(visual[p + "attn.qkv.weight"], vdtype),
            "qkv_bias": jnp.asarray(visual[p + "attn.qkv.bias"], vdtype),
            "proj": jnp.asarray(visual[p + "attn.proj.weight"], vdtype),
            "proj_bias": jnp.asarray(visual[p + "attn.proj.bias"], vdtype),
            "mlp": {
                "gate_proj": jnp.asarray(visual[p + "mlp.gate_proj.weight"], vdtype),
                "gate_bias": jnp.asarray(visual[p + "mlp.gate_proj.bias"], vdtype),
                "up_proj": jnp.asarray(visual[p + "mlp.up_proj.weight"], vdtype),
                "up_bias": jnp.asarray(visual[p + "mlp.up_proj.bias"], vdtype),
                "down_proj": jnp.asarray(visual[p + "mlp.down_proj.weight"], vdtype),
                "down_bias": jnp.asarray(visual[p + "mlp.down_proj.bias"], vdtype),
            },
        })

    tc = config.text
    text_params: Params = {
        "embed_tokens": jnp.asarray(text["embed_tokens.weight"], tdtype),
        "final_norm": jnp.asarray(text["norm.weight"], tdtype),
        "layers": [],
    }
    if not tc.tie_word_embeddings:
        text_params["lm_head"] = jnp.asarray(
            lm_head if lm_head is not None else text["embed_tokens.weight"],
            tdtype,
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


__all__ = ["init_params", "convert_hf_state_dict"]
