"""Sequence parallelism for high-resolution vision prefill (Ulysses style).

A 4K frame is a ~20k-patch sequence; its ViT encode is the prefill hot spot.
Ulysses SP shards the PATCH SEQUENCE over the mesh's "model" axis: every
device computes QKV/MLP on its sequence shard (weights replicated — the
per-device matmul work drops by n), and attention switches layouts with two
lax.all_to_all collectives per block:

    [seq/n, heads, hd] --a2a--> [seq, heads/n, hd]   (scatter heads,
                                                      gather sequence)
    ... full attention for this device's head subset ...
    [seq, heads/n, hd] --a2a--> [seq/n, heads, hd]

The collectives ride ICI; no host involvement.  Requires seq % n == 0 (pad
buckets already guarantee multiples of 128) and heads % n == 0.

Parity pinned by tests/test_sp.py: SP output equals the single-device
vision_forward to float tolerance on a virtual mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from vis_tpu.models.common.layers import gelu_mlp, layer_norm, linear
from vis_tpu.models.qwen2_vl.config import VisionConfig
from vis_tpu.models.qwen2_vl.vision import _apply_vision_rope
from vis_tpu.parallel.mesh import MODEL_AXIS

Params = Dict[str, Any]


def vision_forward_sp(
    config: VisionConfig,
    params: Params,
    patches: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mesh: Mesh,
    num_patches: Optional[jnp.ndarray] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Sequence-parallel vision_forward (same signature + mesh).

    patches: [seq, patch_input_dim] (seq divisible by the model-axis size
    times merge_unit); returns [seq / merge_unit, hidden_size].

    use_flash=None auto-selects the Pallas flash kernel on TPU for large
    block-aligned sequences — the einsum path materializes
    [heads/n, seq, seq] f32 scores per device, which at the 20k-patch
    4K-frame workload this module exists for is multiple GiB per block;
    flash keeps attention O(seq) memory exactly as the single-device
    vision_forward does (models/qwen2_vl/vision.py:160).
    """
    seq = patches.shape[0]
    n = mesh.shape[MODEL_AXIS]
    assert seq % (n * config.merge_unit) == 0, (seq, n)
    assert config.num_heads % n == 0, (config.num_heads, n)
    if use_flash is None:
        use_flash = (
            jax.default_backend() == "tpu" and seq % 128 == 0 and seq >= 1024
        )
    scale = config.head_dim ** -0.5
    valid_count = (
        jnp.int32(seq) if num_patches is None else num_patches.astype(jnp.int32)
    )

    def sp_fn(params, patches, cos, sin, valid_count):
        local = patches.shape[0]  # seq / n
        x = linear(patches.astype(config.dtype), params["patch_embed"])
        # Full-sequence key mask (same on every device).
        attn_bias = jnp.where(
            jnp.arange(seq) < valid_count, 0.0, -1e30
        ).astype(jnp.float32)[None, None, :]

        for block in params["blocks"]:
            h = layer_norm(x, block["norm1"], block["norm1_bias"], eps=1e-6)
            qkv = linear(h, block["qkv"], block["qkv_bias"])
            qkv = qkv.reshape(local, 3, config.num_heads, config.head_dim)
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            # Rotary is per-position: apply on the local shard with the
            # local table slice, before the layout switch.
            q = _apply_vision_rope(q, cos, sin)
            k = _apply_vision_rope(k, cos, sin)
            # Scatter heads / gather sequence.
            q = lax.all_to_all(q, MODEL_AXIS, 1, 0, tiled=True)
            k = lax.all_to_all(k, MODEL_AXIS, 1, 0, tiled=True)
            v = lax.all_to_all(v, MODEL_AXIS, 1, 0, tiled=True)
            if use_flash:
                from vis_tpu.ops.flash_attention import flash_attention

                out = flash_attention(
                    q[None], k[None], v[None],
                    lengths=valid_count[None],
                    causal=False, sm_scale=scale,
                )[0].astype(x.dtype)
            else:
                logits = jnp.einsum(
                    "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
                ) * scale
                logits = logits + attn_bias
                probs = jax.nn.softmax(logits, axis=-1)
                out = jnp.einsum(
                    "hqk,khd->qhd", probs.astype(v.dtype), v,
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
            # Back to sequence shards / all heads.
            out = lax.all_to_all(out, MODEL_AXIS, 0, 1, tiled=True)
            out = out.reshape(local, config.embed_dim)
            x = x + linear(out, block["proj"], block["proj_bias"])
            h = layer_norm(x, block["norm2"], block["norm2_bias"], eps=1e-6)
            x = x + gelu_mlp(
                h, block["mlp"], quick=(config.hidden_act == "quick_gelu")
            )

        merger = params["merger"]
        x = layer_norm(x, merger["ln_q"], merger["ln_q_bias"], eps=1e-6)
        x = x.reshape(
            local // config.merge_unit, config.merge_unit * config.embed_dim
        )
        h = linear(x, merger["fc1"], merger["fc1_bias"])
        h = jax.nn.gelu(h, approximate=False)
        return linear(h, merger["fc2"], merger["fc2_bias"])

    param_specs = jax.tree_util.tree_map(lambda _: P(), params)
    return shard_map(
        sp_fn, mesh=mesh,
        in_specs=(param_specs, P(MODEL_AXIS, None), P(MODEL_AXIS, None),
                  P(MODEL_AXIS, None), P()),
        out_specs=P(MODEL_AXIS, None),
        check_vma=False,
    )(params, patches, cos, sin, valid_count)


__all__ = ["vision_forward_sp"]
