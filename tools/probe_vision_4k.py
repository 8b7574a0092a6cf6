"""Bisect the 4K vision-encode cost (BASELINE config 3, VERDICT r4 #6).

The 7B-class Qwen2.5 window tower encodes a 4K frame (20480 patches) in
~8 s on one chip, yet the whole forward is only ~27 TFLOP — ~3.5 TFLOP/s
effective, far off both the MXU and HBM rooflines.  This probe times, at
the exact production geometry (src_len=20480, hidden=1280, depth=32,
16 heads x d80, fullatt blocks {7,15,23,31}), each as ONE dispatch:

  1. full vision_forward_25 (production path, int4 projections)
  2. full vision_forward_25 (bf16 projections — is it the int4
     dequant fallback at batch>128?)
  3. matmul-only tower (attention replaced by identity)
  4. window-attention-only tower (matmuls replaced by slice/pad)
  5. flash-attention layer alone x4 (the fullatt blocks)

Run: python tools/probe_vision_4k.py
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from vis_tpu.models.qwen2_5_vl.config import Qwen25VisionConfig
from vis_tpu.models.qwen2_5_vl.vision import (
    init_vision_params,
    vision_forward_25,
    window_layout,
)

# 7B tower geometry (models/qwen2_5_vl/config.py target profile)
CFG = Qwen25VisionConfig(
    depth=32, hidden_size=1280, intermediate_size=3420, num_heads=16,
    patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
    window_size=112, fullatt_block_indexes=(7, 15, 23, 31),
    out_hidden_size=3584, dtype=jnp.bfloat16,
)

GRID_H, GRID_W = 128, 160   # 20480 patches == 4x default pixel budget


def _sync(x):
    jax.tree.leaves(x)[0].block_until_ready()


def timeit(fn, *args, n=3):
    out = fn(*args)
    _sync(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    params = init_vision_params(CFG, key)

    layout = window_layout(CFG, GRID_H, GRID_W, src_len=GRID_H * GRID_W)
    src_len = GRID_H * GRID_W
    patches = jax.random.normal(
        key, (src_len, CFG.patch_input_dim), jnp.float32
    ).astype(jnp.bfloat16)

    args = (
        patches,
        jnp.asarray(layout.gather_patch),
        jnp.asarray(layout.valid),
        jnp.asarray(layout.cos),
        jnp.asarray(layout.sin),
        jnp.asarray(layout.inv_merged),
        jnp.asarray(layout.inv_patch),
        jnp.int32(src_len),
    )

    from vis_tpu.serving.engine import _quantize_vision_tree

    params_q4 = _quantize_vision_tree(params, "int4")

    fwd = jax.jit(partial(vision_forward_25, CFG))

    t = timeit(fwd, params_q4, *args)
    print(f"1. full forward, int4 projections:  {t*1e3:8.1f} ms", flush=True)

    t = timeit(fwd, params, *args)
    print(f"2. full forward, bf16 projections:  {t*1e3:8.1f} ms", flush=True)

    # --- 3. matmul-only: monkeypatch attention away ------------------------
    import vis_tpu.models.qwen2_5_vl.vision as V

    def fwd_no_attn(config, p, *a):
        return _forward_variant(config, p, *a, do_attn=False, do_mlp=True)

    def fwd_attn_only(config, p, *a):
        return _forward_variant(config, p, *a, do_attn=True, do_mlp=False)

    t = timeit(jax.jit(partial(fwd_no_attn, CFG)), params, *args)
    print(f"3. matmuls only (no attention):     {t*1e3:8.1f} ms", flush=True)

    t = timeit(jax.jit(partial(fwd_attn_only, CFG)), params, *args)
    print(f"4. attention only (no matmuls):     {t*1e3:8.1f} ms", flush=True)


def _forward_variant(config, params, patches, gather_patch, valid, cos, sin,
                     inv_merged, inv_patch, num_patches,
                     *, do_attn: bool, do_mlp: bool):
    """Stripped copy of vision_forward_25's loop with attention or matmuls
    removed, to attribute the 4K encode cost (same shapes/layout)."""
    from vis_tpu.models.common.layers import linear, rms_norm
    from vis_tpu.models.qwen2_5_vl.vision import _apply_vision_rope
    from vis_tpu.ops.flash_attention import flash_attention

    wp = config.window_patches
    win_len = gather_patch.shape[0]
    n_windows = win_len // wp

    x = patches[gather_patch].astype(config.dtype)
    x = linear(x, params["patch_embed"])
    x = jnp.where(valid[:, None], x, 0)

    scale = config.head_dim ** -0.5
    win_valid = valid.reshape(n_windows, wp)
    win_bias = jnp.where(win_valid, 0.0, -1e30).astype(jnp.float32)
    diag_floor = jnp.where(jnp.eye(wp, dtype=bool), -1e29, -jnp.inf)

    for i, block in enumerate(params["blocks"]):
        h = rms_norm(x, block["norm1"], eps=1e-6)
        if do_mlp:
            qkv = linear(h, block["qkv"], block["qkv_bias"])
        else:
            qkv = jnp.concatenate([h, h, h], axis=-1)
        qkv = qkv.reshape(win_len, 3, config.num_heads, config.head_dim)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        if do_attn:
            q = _apply_vision_rope(q, cos, sin)
            k = _apply_vision_rope(k, cos, sin)
            if i in config.fullatt_block_indexes:
                qo, ko, vo = q[inv_patch], k[inv_patch], v[inv_patch]
                out = flash_attention(
                    qo[None], ko[None], vo[None],
                    lengths=jnp.asarray(num_patches)[None],
                    causal=False, sm_scale=scale,
                )[0]
                out = out[gather_patch]
            else:
                qw = q.reshape(n_windows, wp, config.num_heads, config.head_dim)
                kw = k.reshape(n_windows, wp, config.num_heads, config.head_dim)
                vw = v.reshape(n_windows, wp, config.num_heads, config.head_dim)
                logits = jnp.einsum(
                    "bqhd,bkhd->bhqk", qw, kw,
                    preferred_element_type=jnp.float32,
                ) * scale
                logits = logits + win_bias[:, None, None, :]
                logits = jnp.maximum(logits, diag_floor[None, None])
                probs = jax.nn.softmax(logits, axis=-1)
                out = jnp.einsum(
                    "bhqk,bkhd->bqhd", probs.astype(vw.dtype), vw,
                    preferred_element_type=jnp.float32,
                ).reshape(win_len, config.num_heads, config.head_dim)
        else:
            out = v
        out = out.astype(x.dtype).reshape(win_len, config.hidden_size)
        if do_mlp:
            x = x + linear(out, block["proj"], block["proj_bias"])
            h = rms_norm(x, block["norm2"], eps=1e-6)
            mlp = block["mlp"]
            gate = linear(h, mlp["gate_proj"], mlp["gate_bias"])
            up = linear(h, mlp["up_proj"], mlp["up_bias"])
            x = x + linear(
                jax.nn.silu(gate) * up, mlp["down_proj"], mlp["down_bias"]
            )
        else:
            x = x + out
    return x


if __name__ == "__main__":
    main()
