"""Llama text model: thin wrapper over the shared decoder + HF conversion.

On-pod replacement for the reference's Groq-hosted explainer/chat model
(reference: src/agents/explainer.py:48,65,87).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from vis_tpu.models.common.decoder import DecoderConfig, init_decoder_params

Params = Dict[str, Any]


def init_params(config: DecoderConfig, key: jax.Array) -> Params:
    return init_decoder_params(config, key)


def _np(tensor) -> np.ndarray:
    if hasattr(tensor, "detach"):
        return tensor.detach().to("cpu").float().numpy()
    return np.asarray(tensor)


def convert_hf_state_dict(
    state_dict: Mapping[str, Any], config: DecoderConfig
) -> Params:
    """Map an HF LlamaForCausalLM state dict onto our decoder pytree."""
    dtype = config.dtype
    flat: Dict[str, np.ndarray] = {}
    lm_head = None
    for name, tensor in state_dict.items():
        if name.endswith("lm_head.weight"):
            lm_head = _np(tensor)
            continue
        key = name[len("model."):] if name.startswith("model.") else name
        flat[key] = _np(tensor)

    params: Params = {
        "embed_tokens": jnp.asarray(flat["embed_tokens.weight"], dtype),
        "final_norm": jnp.asarray(flat["norm.weight"], dtype),
        "layers": [],
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(
            lm_head if lm_head is not None else flat["embed_tokens.weight"], dtype
        )
    for i in range(config.num_layers):
        p = f"layers.{i}."
        params["layers"].append({
            "input_norm": jnp.asarray(flat[p + "input_layernorm.weight"], dtype),
            "post_attn_norm": jnp.asarray(
                flat[p + "post_attention_layernorm.weight"], dtype
            ),
            "q_proj": jnp.asarray(flat[p + "self_attn.q_proj.weight"], dtype),
            "k_proj": jnp.asarray(flat[p + "self_attn.k_proj.weight"], dtype),
            "v_proj": jnp.asarray(flat[p + "self_attn.v_proj.weight"], dtype),
            "o_proj": jnp.asarray(flat[p + "self_attn.o_proj.weight"], dtype),
            "mlp": {
                "gate_proj": jnp.asarray(flat[p + "mlp.gate_proj.weight"], dtype),
                "up_proj": jnp.asarray(flat[p + "mlp.up_proj.weight"], dtype),
                "down_proj": jnp.asarray(flat[p + "mlp.down_proj.weight"], dtype),
            },
        })
    return params


__all__ = ["init_params", "convert_hf_state_dict"]
