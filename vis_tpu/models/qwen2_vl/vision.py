"""Qwen2-VL vision tower: dynamic-resolution ViT with 2D rotary embeddings
and a 2x2 spatial patch merger.

Numerics match the HF reference (transformers Qwen2VisionTransformer):
- patch embedding is a bias-free linear over flattened
  [C * temporal_patch * patch * patch] pixel patches (Conv3D with
  stride == kernel collapses to exactly this),
- patches arrive in merge-window-major order (the (h/m, w/m, m, m)
  flattening the Qwen2-VL image processor produces), and the 2D rotary
  tables are built for that same order,
- blocks: LayerNorm -> fused-QKV attention (full, non-causal) -> LayerNorm
  -> QuickGELU MLP, all with biases,
- merger: LayerNorm then [merge_unit*embed_dim -> same -> hidden] GELU MLP.

The sequence length is static per padded grid bucket; `num_patches` masks
padding so one compiled kernel serves all images in a bucket
(XLA static-shape rule; see SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vis_tpu.models.common.layers import gelu_mlp, layer_norm, linear
from vis_tpu.models.qwen2_vl.config import VisionConfig

Params = Dict[str, Any]


def init_vision_params(config: VisionConfig, key: jax.Array, scale: float = 0.02) -> Params:
    keys = iter(jax.random.split(key, config.depth * 10 + 6))

    def norm(shape):
        return (scale * jax.random.normal(next(keys), shape)).astype(config.dtype)

    def zeros(shape):
        return jnp.zeros(shape, config.dtype)

    def ones(shape):
        return jnp.ones(shape, config.dtype)

    d = config.embed_dim
    mlp_hidden = d * config.mlp_ratio
    merge_dim = d * config.merge_unit
    params: Params = {
        "patch_embed": norm((d, config.patch_input_dim)),
        "blocks": [],
        "merger": {
            "ln_q": ones((d,)),
            "ln_q_bias": zeros((d,)),
            "fc1": norm((merge_dim, merge_dim)),
            "fc1_bias": zeros((merge_dim,)),
            "fc2": norm((config.hidden_size, merge_dim)),
            "fc2_bias": zeros((config.hidden_size,)),
        },
    }
    for _ in range(config.depth):
        params["blocks"].append({
            "norm1": ones((d,)), "norm1_bias": zeros((d,)),
            "norm2": ones((d,)), "norm2_bias": zeros((d,)),
            "qkv": norm((3 * d, d)), "qkv_bias": zeros((3 * d,)),
            "proj": norm((d, d)), "proj_bias": zeros((d,)),
            "mlp": {
                "fc1": norm((mlp_hidden, d)), "fc1_bias": zeros((mlp_hidden,)),
                "fc2": norm((d, mlp_hidden)), "fc2_bias": zeros((d,)),
            },
        })
    return params


def vision_rotary_tables(
    config: VisionConfig, grid_h: int, grid_w: int, theta: float = 10000.0
) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin [seq, head_dim] for a (grid_h, grid_w) patch grid in
    merge-window-major patch order (HF rot_pos_emb semantics).

    Host-side numpy: grids are static per bucket, so the tables are computed
    once per shape and fed to the jit function as constants.
    """
    m = config.spatial_merge_size
    # Patch order: (h/m, w/m, m_h, m_w)
    h_ids = np.arange(grid_h).reshape(grid_h // m, m, 1, 1)
    h_ids = np.broadcast_to(h_ids, (grid_h // m, m, grid_w // m, m))
    h_ids = h_ids.transpose(0, 2, 1, 3).reshape(-1)
    w_ids = np.arange(grid_w).reshape(1, 1, grid_w // m, m)
    w_ids = np.broadcast_to(w_ids, (grid_h // m, m, grid_w // m, m))
    w_ids = w_ids.transpose(0, 2, 1, 3).reshape(-1)

    dim = config.head_dim // 2  # rotary dim; h and w each cover dim/2
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    h_angles = h_ids[:, None] * inv_freq[None, :]   # [seq, dim/2]
    w_angles = w_ids[:, None] * inv_freq[None, :]
    half = np.concatenate([h_angles, w_angles], axis=-1)  # [seq, dim]
    full = np.concatenate([half, half], axis=-1)          # [seq, head_dim]
    return np.cos(full).astype(np.float32), np.sin(full).astype(np.float32)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_vision_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    # x: [seq, heads, head_dim]; cos/sin: [seq, head_dim]
    x32 = x.astype(jnp.float32)
    out = x32 * cos[:, None, :] + _rotate_half(x32) * sin[:, None, :]
    return out.astype(x.dtype)


def vision_forward(
    config: VisionConfig,
    params: Params,
    patches: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    num_patches: Optional[jnp.ndarray] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Encode one image's patch sequence.

    patches: [seq, patch_input_dim] pixel patches in merge-window order
    (padded to the bucket length); cos/sin: [seq, head_dim] rotary tables;
    num_patches: scalar count of valid patches (None = all valid).
    Returns [seq / merge_unit, hidden_size] merged vision embeddings.

    Attention backend: the XLA einsum path materializes [heads, seq, seq]
    scores — fine up to a few thousand patches; for high-resolution grids
    the Pallas flash-attention kernel (O(seq) memory) is used instead.
    `use_flash=None` auto-selects: flash on TPU when seq is block-aligned
    and large enough to matter.
    """
    seq = patches.shape[0]
    if use_flash is None:
        use_flash = (
            jax.default_backend() == "tpu" and seq % 128 == 0 and seq >= 1024
        )

    x = linear(patches.astype(config.dtype), params["patch_embed"])  # [seq, d]

    if num_patches is not None:
        valid_count = num_patches
        valid = jnp.arange(seq) < num_patches
        attn_bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)[None, None, :]
    else:
        valid_count = jnp.int32(seq)
        attn_bias = None

    scale = config.head_dim ** -0.5
    for block in params["blocks"]:
        h = layer_norm(x, block["norm1"], block["norm1_bias"], eps=1e-6)
        qkv = linear(h, block["qkv"], block["qkv_bias"])  # [seq, 3d]
        qkv = qkv.reshape(seq, 3, config.num_heads, config.head_dim)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q = _apply_vision_rope(q, cos, sin)
        k = _apply_vision_rope(k, cos, sin)
        if use_flash:
            from vis_tpu.ops.flash_attention import flash_attention

            out = flash_attention(
                q[None], k[None], v[None],
                lengths=valid_count[None],
                causal=False, sm_scale=scale,
            )[0]
        else:
            logits = jnp.einsum(
                "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            if attn_bias is not None:
                logits = logits + attn_bias
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum(
                "hqk,khd->qhd", probs.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            )
        out = out.astype(x.dtype).reshape(seq, config.embed_dim)
        x = x + linear(out, block["proj"], block["proj_bias"])
        h = layer_norm(x, block["norm2"], block["norm2_bias"], eps=1e-6)
        x = x + gelu_mlp(h, block["mlp"], quick=(config.hidden_act == "quick_gelu"))

    merger = params["merger"]
    x = layer_norm(x, merger["ln_q"], merger["ln_q_bias"], eps=1e-6)
    x = x.reshape(seq // config.merge_unit, config.merge_unit * config.embed_dim)
    h = linear(x, merger["fc1"], merger["fc1_bias"])
    h = jax.nn.gelu(h, approximate=False)
    return linear(h, merger["fc2"], merger["fc2_bias"])


__all__ = ["init_vision_params", "vision_forward", "vision_rotary_tables"]
