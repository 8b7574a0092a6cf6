"""Functional transformer primitives shared by all model families.

Pure functions over parameter pytrees — no module framework — so every model
composes cleanly with jit / pjit / shard_map and parameters carry explicit
NamedSharding.  Design rules (TPU-first):
- weights live in bf16, all reductions/normalizations accumulate in f32,
- matmuls always pass preferred_element_type=f32 so the MXU accumulates wide,
- attention is einsum-based here; the TPU hot path swaps in the Pallas flash
  kernel (vis_tpu.ops.flash_attention) behind the same signature,
- KV caches are preallocated static-shape buffers updated with
  lax.dynamic_update_slice (no dynamic shapes under jit).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm with f32 accumulation regardless of input dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    variance = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    x32 = x32 * lax.rsqrt(variance + eps)
    return (x32 * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


# ---------------------------------------------------------------------------
# Linear / embedding
# ---------------------------------------------------------------------------

def linear(x: jnp.ndarray, weight: Any,
           bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x @ W^T (+ b).  Weight layout [out, in] matches HF checkpoints so
    loading needs no transpose.  Accepts an int8 QuantizedWeight or packed
    int4 QuantizedWeight4, routed through the Pallas dequantizing matmuls
    (vis_tpu.ops.quantized)."""
    from vis_tpu.ops.quantized import (
        QuantizedWeight,
        QuantizedWeight4,
        QuantizedWeight4Pick,
        quantized_linear,
        quantized_linear4,
        quantized_linear4_stacked,
    )

    if isinstance(weight, QuantizedWeight):
        return quantized_linear(x, weight, bias)
    if isinstance(weight, QuantizedWeight4):
        return quantized_linear4(x, weight, bias)
    if isinstance(weight, QuantizedWeight4Pick):
        return quantized_linear4_stacked(x, weight, bias)
    out = jnp.einsum(
        "...i,oi->...o", x, weight, preferred_element_type=jnp.float32
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def embed(token_ids: jnp.ndarray, table: Any) -> jnp.ndarray:
    """Embedding lookup; accepts an int8 QuantizedWeight or packed int4
    QuantizedWeight4 table (tied-embedding models quantize the vocab table
    for decode bandwidth — the gathered rows are dequantized on the fly,
    bf16 out)."""
    from vis_tpu.ops.quantized import QuantizedWeight, QuantizedWeight4, embed_rows4

    if isinstance(table, QuantizedWeight):
        rows = jnp.take(table.q, token_ids, axis=0).astype(jnp.float32)
        scales = jnp.take(table.scale, token_ids, axis=0)
        return (rows * scales[..., None]).astype(jnp.bfloat16)
    if isinstance(table, QuantizedWeight4):
        return embed_rows4(table, token_ids)
    return jnp.take(table, token_ids, axis=0)


# ---------------------------------------------------------------------------
# Rotary position embeddings
# ---------------------------------------------------------------------------

def rope_frequencies(
    head_dim: int,
    theta: float = 10000.0,
    rope_scaling: Optional[Dict[str, Any]] = None,
) -> jnp.ndarray:
    """Inverse frequencies, shape [head_dim // 2], f32.

    rope_scaling supports the Llama-3 scheme ({"rope_type": "llama3",
    "factor", "low_freq_factor", "high_freq_factor",
    "original_max_position_embeddings"}): low-frequency components are
    divided by `factor`, high-frequency kept, and the band between is
    smoothly interpolated (HF _compute_llama3_parameters parity).
    """
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    inv_freq = 1.0 / (theta ** exponent)
    if rope_scaling and rope_scaling.get("rope_type") == "llama3":
        factor = rope_scaling["factor"]
        low = rope_scaling["low_freq_factor"]
        high = rope_scaling["high_freq_factor"]
        old_len = rope_scaling["original_max_position_embeddings"]
        low_wavelen = old_len / low
        high_wavelen = old_len / high
        wavelen = 2 * jnp.pi / inv_freq
        scaled = inv_freq / factor
        smooth = (old_len / wavelen - low) / (high - low)
        interp = (1 - smooth) / factor * inv_freq + smooth * inv_freq
        inv_freq = jnp.where(
            wavelen < high_wavelen,
            inv_freq,
            jnp.where(wavelen > low_wavelen, scaled, interp),
        )
    return inv_freq


def rope_cos_sin(
    positions: jnp.ndarray,
    head_dim: int,
    theta: float = 10000.0,
    rope_scaling: Optional[Dict[str, Any]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for integer positions [...]; returns [..., head_dim]
    with the half-split (non-interleaved) layout used by Llama/Qwen."""
    inv_freq = rope_frequencies(head_dim, theta, rope_scaling)
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., hd/2]
    angles = jnp.concatenate([angles, angles], axis=-1)  # [..., hd]
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Apply rotary embedding.  x: [..., seq, heads, head_dim];
    cos/sin: [..., seq, head_dim] (broadcast over the heads axis)."""
    cos = cos[..., :, None, :]
    sin = sin[..., :, None, :]
    x32 = x.astype(jnp.float32)
    return (x32 * cos + _rotate_half(x32) * sin).astype(x.dtype)


def mrope_cos_sin(
    positions: jnp.ndarray,
    head_dim: int,
    mrope_section: Tuple[int, int, int],
    theta: float = 1000000.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multimodal RoPE (Qwen2-VL): three position streams (temporal, height,
    width) each own a slice of the frequency spectrum.

    positions: [3, ...seq] integer positions per stream.
    Returns cos/sin of shape [...seq, head_dim] assembled so that frequency
    index f takes its angle from stream s where f falls in that stream's
    mrope_section span (sections are specified in half-dim units and the
    pattern repeats for the duplicated second half).
    Reference semantics: HF Qwen2VL apply_multimodal_rotary_pos_emb.
    """
    if sum(mrope_section) != head_dim // 2:
        raise ValueError(
            f"mrope_section {mrope_section} must sum to head_dim//2 = {head_dim // 2}"
        )
    inv_freq = rope_frequencies(head_dim, theta)  # [hd/2]
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [3, ..., hd/2]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)

    # Sections are static: stream i owns frequencies [start_i, start_i + s_i).
    def select(table: jnp.ndarray) -> jnp.ndarray:
        chunks = []
        start = 0
        for stream, span in enumerate(mrope_section):
            chunks.append(table[stream, ..., start : start + span])
            start += span
        return jnp.concatenate(chunks, axis=-1)

    cos_half = select(cos)
    sin_half = select(sin)
    cos_full = jnp.concatenate([cos_half, cos_half], axis=-1)
    sin_full = jnp.concatenate([sin_half, sin_half], axis=-1)
    return cos_full, sin_full


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """Expand KV heads for grouped-query attention.
    x: [batch, seq, kv_heads, head_dim] -> [batch, seq, kv_heads*n_rep, hd]."""
    if n_rep == 1:
        return x
    b, s, kvh, hd = x.shape
    return jnp.broadcast_to(
        x[:, :, :, None, :], (b, s, kvh, n_rep, hd)
    ).reshape(b, s, kvh * n_rep, hd)


def attention_scores(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference (XLA) scaled-dot-product attention with native GQA.

    q: [b, sq, h, d], k/v: [b, skv, kvh, d] with h = kvh * rep; mask
    broadcastable to [b, h, sq, skv] (additive, -inf for disallowed).
    Softmax in f32.  Grouped heads contract directly against the shared KV —
    the KV tensors are never materialized at h width, which matters on the
    decode path where k/v are the full cache buffers.
    """
    b, sq, h, d = q.shape
    kvh = k.shape[2]
    rep = h // kvh
    scale = scale if scale is not None else d ** -0.5
    qg = q.reshape(b, sq, kvh, rep, d)
    logits = jnp.einsum(
        "bqgrd,bkgd->bgrqk", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        # Masks are head-agnostic ([b|1, 1, sq, skv]); lift into the grouped
        # [b, g, r, q, k] layout by inserting the rep axis.
        if mask.shape[1] != 1:
            raise ValueError(
                f"attention mask must be head-agnostic, got head dim {mask.shape[1]}"
            )
        logits = logits + mask[:, :, None]
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bgrqk,bkgd->bqgrd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, sq, h, d).astype(q.dtype)


def causal_mask(sq: int, skv: int, offset: int = 0) -> jnp.ndarray:
    """Additive causal mask [1, 1, sq, skv]: query i attends keys <= i+offset."""
    qi = jnp.arange(sq)[:, None] + offset
    kj = jnp.arange(skv)[None, :]
    allowed = kj <= qi
    return jnp.where(allowed, 0.0, -1e30)[None, None, :, :].astype(jnp.float32)


def length_mask(skv: int, lengths: jnp.ndarray) -> jnp.ndarray:
    """Additive padding mask [b, 1, 1, skv] hiding keys >= length."""
    kj = jnp.arange(skv)[None, :]
    allowed = kj < lengths[:, None]
    return jnp.where(allowed, 0.0, -1e30)[:, None, None, :].astype(jnp.float32)


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------
#
# Optional int8 storage (config.kv_quantization="int8"): K/V rows are
# quantized per (token, kv-head) with the bf16 scales PACKED INTO ONE EXTRA
# HEAD ROW of the same array — cache shape [L, B, S, H+1, D] int8 instead
# of [L, B, S, H, D] bf16.  Keeping scales inside the buffer means every
# carry, donation, scheduler insert-jit, page table, and hand-off path
# works untouched: only the encode (write) and decode (attention read)
# helpers below know the format.  Storage is (H+1)*D bytes/token vs 2*H*D
# — 1.6x-1.8x less HBM; dequantization is a fused elementwise multiply on
# the XLA attention path (never inside a Mosaic kernel, which cannot cast
# i8->bf16 on this toolchain).


def kv_store_heads(kv_heads: int, dtype) -> int:
    """Physical head rows a KV buffer needs: +1 scale row when int8."""
    return kv_heads + 1 if dtype == jnp.int8 else kv_heads


def kv_cache_dtype(model_dtype):
    """Storage dtype for KV buffers under the active config:
    KV_QUANTIZATION=int8 -> jnp.int8 (encode_kv format), else the model
    compute dtype unchanged."""
    from vis_tpu.utils.config import config as app_config

    return jnp.int8 if app_config.kv_quantization == "int8" else model_dtype


def encode_kv(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """[..., H, D] float -> KV storage format ([..., H+1, D] int8 with
    per-(token, head) bf16 scales packed in the extra head, or a plain
    astype for float caches)."""
    if dtype != jnp.int8:
        return x.astype(dtype)
    h, d = x.shape[-2], x.shape[-1]
    if d < 2 * h:
        raise ValueError(
            f"KV_QUANTIZATION=int8 packs 2*kv_heads={2 * h} scale bytes "
            f"into one head row but head_dim={d} < {2 * h}; this geometry "
            "needs a different scale layout — disable the kv_quantization "
            "config knob for this model"
        )
    # Arithmetic stays in bf16: integers <= 256 are exact in bf16, so the
    # rounded code differs from f32 math by at most 1 LSB (inside the
    # quantization noise) while the elementwise intermediates are half the
    # bytes — prefill encodes whole [L, b, s, H, D] stacks, where an f32
    # staging copy would cost hundreds of MB of transient HBM at 8B scale.
    scale = jnp.max(jnp.abs(x), axis=-1).astype(jnp.float32) / 127.0
    scale = jnp.maximum(scale, 1e-8).astype(jnp.bfloat16)
    q = jnp.clip(
        jnp.round(x.astype(jnp.bfloat16) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    # bf16 scale -> 2 int8 lanes each; lay the 2H bytes at the front of the
    # extra head row (D >= 2H for every supported geometry).
    sbytes = jax.lax.bitcast_convert_type(scale, jnp.int8)  # [..., H, 2]
    srow = sbytes.reshape(*x.shape[:-2], 1, 2 * h)
    srow = jnp.pad(srow, [(0, 0)] * (x.ndim - 1) + [(0, d - 2 * h)])
    return jnp.concatenate([q, srow], axis=-2)


def decode_kv(buf: jnp.ndarray, dtype, kv_heads: int) -> jnp.ndarray:
    """KV storage format -> [..., H, D] `dtype` (inverse of encode_kv)."""
    if buf.dtype != jnp.int8:
        return buf.astype(dtype)
    q = buf[..., :kv_heads, :]
    sbytes = buf[..., kv_heads, : 2 * kv_heads]
    scale = jax.lax.bitcast_convert_type(
        sbytes.reshape(*sbytes.shape[:-1], kv_heads, 2), jnp.bfloat16
    )  # [..., H]
    return (
        q.astype(jnp.float32) * scale.astype(jnp.float32)[..., None]
    ).astype(dtype)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    """Static-shape per-layer KV buffers with PER-ROW write cursors.

    k/v: [n_layers, batch, max_len, kv_heads, head_dim]; `lengths`: [batch]
    int32 — how many positions are valid in each row.  Per-row cursors let
    rows at different fill levels share one buffer, which is what the
    continuous-batching scheduler's decode slots need; uniform batches are
    the degenerate case.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    lengths: jnp.ndarray  # [batch] int32

    def tree_flatten(self):
        return (self.k, self.v, self.lengths), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(
        cls, n_layers: int, batch: int, max_len: int, kv_heads: int,
        head_dim: int, dtype=jnp.bfloat16,
    ) -> "KVCache":
        """dtype=jnp.int8 selects quantized storage (one extra head row
        holds the packed per-(token, head) scales — see encode_kv)."""
        shape = (
            n_layers, batch, max_len, kv_store_heads(kv_heads, dtype),
            head_dim,
        )
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            lengths=jnp.zeros((batch,), jnp.int32),
        )

    def update(
        self, layer: int, k_new: jnp.ndarray, v_new: jnp.ndarray
    ) -> "KVCache":
        """Write k/v for `layer` at each row's cursor.  k_new: [b, s, kvh, d].
        Cursors only advance via advance() so all layers write at the same
        offsets within a step."""

        def write_row(buf_row, new_row, start):
            # buf_row: [max_len, kvh, d]; new_row: [s, kvh, d]
            return lax.dynamic_update_slice(buf_row, new_row, (start, 0, 0))

        k_buf = jax.vmap(write_row)(
            self.k[layer], encode_kv(k_new, self.k.dtype), self.lengths
        )
        v_buf = jax.vmap(write_row)(
            self.v[layer], encode_kv(v_new, self.v.dtype), self.lengths
        )
        return KVCache(
            k=self.k.at[layer].set(k_buf),
            v=self.v.at[layer].set(v_buf),
            lengths=self.lengths,
        )

    def advance(self, n: jnp.ndarray) -> "KVCache":
        """Advance cursors by n (scalar or [batch])."""
        return KVCache(k=self.k, v=self.v, lengths=self.lengths + n)

    def layer(self, layer: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.k[layer], self.v[layer]

    def decode_mask(self) -> jnp.ndarray:
        """Additive mask [b, 1, 1, max_len] for one-token decode: key j of
        row b is visible iff j <= lengths[b] (the new token writes AT the
        cursor within the same step)."""
        max_len = self.k.shape[2]
        kj = jnp.arange(max_len)[None, None, None, :]
        return jnp.where(
            kj <= self.lengths[:, None, None, None], 0.0, -1e30
        ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# MLP blocks
# ---------------------------------------------------------------------------

def swiglu_mlp(x: jnp.ndarray, params: Params) -> jnp.ndarray:
    """SwiGLU feed-forward: down(silu(gate(x)) * up(x)).  Accepts the fused
    gate+up layout (decoder.fuse_stacked_projections) — one matmul, split.
    With int8 weights on TPU the whole MLP runs as a single Pallas kernel
    (decode steps are latency-bound on serialized kernel regions)."""
    from vis_tpu.ops.quantized import QuantizedWeight, fused_swiglu_mlp

    if "gateup_proj" in params:
        gateup = params["gateup_proj"]
        down = params["down_proj"]
        if isinstance(gateup, QuantizedWeight) and isinstance(down, QuantizedWeight):
            fused = fused_swiglu_mlp(x, gateup, down)
            if fused is not None:
                return fused
        gu = linear(x, gateup)
        gate, up = jnp.split(gu, 2, axis=-1)
    else:
        gate = linear(x, params["gate_proj"])
        up = linear(x, params["up_proj"])
    return linear(jax.nn.silu(gate) * up, params["down_proj"])


def gelu_mlp(x: jnp.ndarray, params: Params, quick: bool = False) -> jnp.ndarray:
    """Two-layer GELU MLP (ViT style), with optional quick-GELU (x*sigmoid(1.702x))."""
    h = linear(x, params["fc1"], params.get("fc1_bias"))
    if quick:
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = jax.nn.gelu(h, approximate=False)
    return linear(h, params["fc2"], params.get("fc2_bias"))


__all__ = [
    "Params",
    "rms_norm",
    "layer_norm",
    "linear",
    "embed",
    "rope_frequencies",
    "rope_cos_sin",
    "apply_rope",
    "mrope_cos_sin",
    "repeat_kv",
    "attention_scores",
    "causal_mask",
    "length_mask",
    "KVCache",
    "swiglu_mlp",
    "gelu_mlp",
]
