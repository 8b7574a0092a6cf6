"""Qwen2.5-VL vision tower: windowed attention over a padded-window layout.

HF semantics (transformers Qwen2_5_VisionTransformerPretrainedModel):
patches arrive in merge-window-major order; merged 2x2 cells are REORDERED
into 112px attention windows (get_window_index), most blocks attend within
their window (cu_window_seqlens), fullatt_block_indexes blocks attend over
the whole image, and the merger output is scattered back to original order.

TPU-first reformulation (XLA needs static shapes; HF's variable per-window
seqlens would recompile per image):
- the window layout keeps EVERY window at its full size: partial edge
  windows are padded with masked slots, so the window-ordered sequence is
  always n_windows * window_patches long and pads up to the engine's patch
  buckets (all multiples of 64 = one 112px window at 14px patches),
- window attention is one BATCHED dense attention [n_windows, wp, heads, d]
  — tiny score tiles, MXU-friendly, no O(seq^2) memory,
- full-attention blocks run over the whole padded sequence with validity
  masking (einsum or the Pallas flash kernel, as in the Qwen2-VL tower),
- the permutation / inverse-permutation / validity arrays are computed on
  the host once per (grid_h, grid_w, bucket) and passed in as inputs.

Numerics match HF to float tolerance (golden test:
tests/test_models_qwen25vl.py).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vis_tpu.models.common.layers import linear, rms_norm
from vis_tpu.models.qwen2_5_vl.config import Qwen25VisionConfig
from vis_tpu.models.qwen2_vl.vision import (
    _apply_vision_rope,
    vision_rotary_tables,
)

Params = Dict[str, Any]


class WindowLayout(NamedTuple):
    """Host-computed static layout for one (grid_h, grid_w, bucket)."""

    gather_patch: np.ndarray   # [win_len] source patch index (0 for padding)
    valid: np.ndarray          # [win_len] bool — real patch slots
    inv_merged: np.ndarray     # [n_merged] window-layout merged slot per original cell
    inv_patch: np.ndarray      # [src_len] window slot per original patch (0 past seq)
    cos: np.ndarray            # [win_len, head_dim] rotary (window order)
    sin: np.ndarray            # [win_len, head_dim]
    n_windows: int
    win_len: int               # n_windows * window_patches (bucket-padded)


@lru_cache(maxsize=64)
def window_layout(
    config: Qwen25VisionConfig, grid_h: int, grid_w: int,
    min_len: int = 0, src_len: int = 0,
) -> WindowLayout:
    """Padded-window permutation for a patch grid (HF get_window_index with
    padding slots KEPT so every window is full-size).

    min_len pads the window-ordered sequence up to a bucket length with
    whole masked windows (must be a multiple of config.window_patches).
    """
    m = config.spatial_merge_size
    mu = config.merge_unit
    wc = config.window_cells
    llm_h, llm_w = grid_h // m, grid_w // m
    pad_h = (-llm_h) % wc
    pad_w = (-llm_w) % wc
    nwh, nww = (llm_h + pad_h) // wc, (llm_w + pad_w) // wc

    cell = np.full((llm_h + pad_h, llm_w + pad_w), -1, np.int64)
    cell[:llm_h, :llm_w] = np.arange(llm_h * llm_w).reshape(llm_h, llm_w)
    # window-major merged-cell order, padding kept as -1
    cells = (
        cell.reshape(nwh, wc, nww, wc).transpose(0, 2, 1, 3).reshape(-1)
    )
    n_windows = nwh * nww
    win_len = n_windows * config.window_patches
    if min_len > win_len:
        extra = min_len - win_len
        assert extra % config.window_patches == 0, (min_len, win_len)
        cells = np.concatenate(
            [cells, np.full(extra // mu, -1, np.int64)]
        )
        n_windows += extra // config.window_patches
        win_len = min_len

    # Patch-level gather: merged cell c contributes patches [c*mu, c*mu+mu).
    gather = (
        np.where(cells >= 0, cells, 0)[:, None] * mu + np.arange(mu)[None, :]
    ).reshape(-1)
    valid = np.repeat(cells >= 0, mu)

    inv_merged = np.zeros(llm_h * llm_w, np.int64)
    orig_of_slot = cells  # window slot -> original cell (-1 pad)
    slot_ids = np.nonzero(orig_of_slot >= 0)[0]
    inv_merged[orig_of_slot[slot_ids]] = slot_ids

    seq = grid_h * grid_w
    inv_patch = np.zeros(max(src_len, seq), np.int64)
    win_positions = np.arange(win_len)
    inv_patch[gather[valid]] = win_positions[valid]

    cos, sin = vision_rotary_tables(config, grid_h, grid_w)  # original order
    cos_w = np.zeros((win_len, cos.shape[1]), np.float32)
    sin_w = np.zeros((win_len, sin.shape[1]), np.float32)
    cos_w[valid] = cos[gather[valid]]
    sin_w[valid] = sin[gather[valid]]

    return WindowLayout(
        gather_patch=gather.astype(np.int32),
        valid=valid,
        inv_merged=inv_merged.astype(np.int32),
        inv_patch=inv_patch.astype(np.int32),
        cos=cos_w, sin=sin_w,
        n_windows=n_windows, win_len=win_len,
    )


def init_vision_params(
    config: Qwen25VisionConfig, key: jax.Array, scale: float = 0.02
) -> Params:
    keys = iter(jax.random.split(key, config.depth * 12 + 8))

    def norm(shape):
        return (scale * jax.random.normal(next(keys), shape)).astype(config.dtype)

    def zeros(shape):
        return jnp.zeros(shape, config.dtype)

    def ones(shape):
        return jnp.ones(shape, config.dtype)

    d = config.hidden_size
    inter = config.intermediate_size
    merge_dim = d * config.merge_unit
    params: Params = {
        "patch_embed": norm((d, config.patch_input_dim)),
        "blocks": [],
        "merger": {
            "ln_q": ones((d,)),
            "fc1": norm((merge_dim, merge_dim)),
            "fc1_bias": zeros((merge_dim,)),
            "fc2": norm((config.out_hidden_size, merge_dim)),
            "fc2_bias": zeros((config.out_hidden_size,)),
        },
    }
    for _ in range(config.depth):
        params["blocks"].append({
            "norm1": ones((d,)),
            "norm2": ones((d,)),
            "qkv": norm((3 * d, d)), "qkv_bias": zeros((3 * d,)),
            "proj": norm((d, d)), "proj_bias": zeros((d,)),
            "mlp": {
                "gate_proj": norm((inter, d)), "gate_bias": zeros((inter,)),
                "up_proj": norm((inter, d)), "up_bias": zeros((inter,)),
                "down_proj": norm((d, inter)), "down_bias": zeros((d,)),
            },
        })
    return params


def vision_forward_25(
    config: Qwen25VisionConfig,
    params: Params,
    patches: jnp.ndarray,       # [src_len, patch_input_dim] original order
    gather_patch: jnp.ndarray,  # [win_len] int32
    valid: jnp.ndarray,         # [win_len] bool
    cos: jnp.ndarray,           # [win_len, head_dim]
    sin: jnp.ndarray,
    inv_merged: jnp.ndarray,    # [n_merged_out] int32
    inv_patch: jnp.ndarray,     # [src_len] int32 (original order -> window slot)
    num_patches: Optional[jnp.ndarray] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Encode one image; returns [n_merged_out, out_hidden_size] merged
    vision embeddings in ORIGINAL merged order (rows past the real token
    count are garbage the caller slices off)."""
    wp = config.window_patches
    win_len = gather_patch.shape[0]
    src_len = inv_patch.shape[0]
    n_windows = win_len // wp
    if use_flash is None:
        use_flash = (
            jax.default_backend() == "tpu"
            and src_len % 128 == 0
            and src_len >= 1024
        )
    if num_patches is None:
        num_patches = jnp.int32(src_len)

    x = patches[gather_patch].astype(config.dtype)       # [win_len, in]
    x = linear(x, params["patch_embed"])                  # [win_len, d]
    x = jnp.where(valid[:, None], x, 0)

    scale = config.head_dim ** -0.5
    # full-attention key bias over the whole window-ordered sequence
    full_bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)[None, None, :]
    # window-attention key bias + a diagonal floor so fully-padded rows
    # softmax over themselves instead of an empty set (NaN guard)
    win_valid = valid.reshape(n_windows, wp)
    win_bias = jnp.where(win_valid, 0.0, -1e30).astype(jnp.float32)
    diag_floor = jnp.where(jnp.eye(wp, dtype=bool), -1e29, -jnp.inf)

    for i, block in enumerate(params["blocks"]):
        h = rms_norm(x, block["norm1"], eps=1e-6)
        qkv = linear(h, block["qkv"], block["qkv_bias"])
        qkv = qkv.reshape(win_len, 3, config.num_heads, config.head_dim)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q = _apply_vision_rope(q, cos, sin)
        k = _apply_vision_rope(k, cos, sin)
        if i in config.fullatt_block_indexes:
            if use_flash:
                from vis_tpu.ops.flash_attention import flash_attention

                # The flash kernel masks a VALID PREFIX; window order
                # interleaves padding, so swap to original patch order
                # (valid tokens form the prefix there), run flash, and swap
                # back — two cheap gathers buy O(seq) memory on 4K grids.
                qo, ko, vo = q[inv_patch], k[inv_patch], v[inv_patch]
                out = flash_attention(
                    qo[None], ko[None], vo[None],
                    lengths=num_patches[None], causal=False, sm_scale=scale,
                )[0]
                out = out[gather_patch]
            else:
                logits = jnp.einsum(
                    "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
                ) * scale
                logits = logits + full_bias
                probs = jax.nn.softmax(logits, axis=-1)
                out = jnp.einsum(
                    "hqk,khd->qhd", probs.astype(v.dtype), v,
                    preferred_element_type=jnp.float32,
                )
        else:
            qw = q.reshape(n_windows, wp, config.num_heads, config.head_dim)
            kw = k.reshape(n_windows, wp, config.num_heads, config.head_dim)
            vw = v.reshape(n_windows, wp, config.num_heads, config.head_dim)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", qw, kw, preferred_element_type=jnp.float32
            ) * scale
            logits = logits + win_bias[:, None, None, :]
            logits = jnp.maximum(logits, diag_floor[None, None])
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum(
                "bhqk,bkhd->bqhd", probs.astype(vw.dtype), vw,
                preferred_element_type=jnp.float32,
            ).reshape(win_len, config.num_heads, config.head_dim)
        out = out.astype(x.dtype).reshape(win_len, config.hidden_size)
        x = x + linear(out, block["proj"], block["proj_bias"])
        h = rms_norm(x, block["norm2"], eps=1e-6)
        mlp = block["mlp"]
        gate = linear(h, mlp["gate_proj"], mlp["gate_bias"])
        up = linear(h, mlp["up_proj"], mlp["up_bias"])
        x = x + linear(
            jax.nn.silu(gate) * up, mlp["down_proj"], mlp["down_bias"]
        )

    merger = params["merger"]
    x = rms_norm(x, merger["ln_q"], eps=1e-6)
    x = x.reshape(win_len // config.merge_unit,
                  config.merge_unit * config.hidden_size)
    h = linear(x, merger["fc1"], merger["fc1_bias"])
    h = jax.nn.gelu(h, approximate=False)
    merged = linear(h, merger["fc2"], merger["fc2_bias"])
    # back to original merged order
    return merged[inv_merged]


__all__ = ["init_vision_params", "vision_forward_25", "window_layout",
           "WindowLayout"]
