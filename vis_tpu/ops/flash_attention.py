"""Pallas flash-attention kernel for TPU.

Online-softmax tiled attention (never materializes the [sq, skv] score
matrix in HBM) for the framework's two prefill hot paths:
- vision-encoder full attention over padded patch buckets (non-causal,
  per-batch valid-length masking) — required for high-resolution dynamic
  grids where XLA's einsum path would need O(seq^2) HBM, and
- decoder prompt prefill (causal, with valid-length masking).

Decode (single-query) stays on the XLA path — its cost is KV bandwidth, not
scores materialization.

Layout: the public API takes the models' native [batch, seq, heads,
head_dim]; internally q/k/v fold to [batch*heads, seq, head_dim] so block
shapes satisfy Mosaic's (8, 128) tiling on the last two dims (head_dim rides
as a full-array dim, so 80-dim Qwen2-VL vision heads work).  Grid is
(batch*heads, sq/block_q, skv/block_k) with the KV dimension innermost so
the m/l/acc scratch accumulators persist across KV tiles of one Q tile.
Numerics: f32 softmax statistics and accumulation, bf16/f32 inputs.

Kernel structure follows the public JAX Pallas flash-attention design
(jax.experimental.pallas.ops.tpu); see /opt/skills/guides docs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def _flash_kernel(
    lengths_ref,  # scalar-prefetch: [batch] int32 valid KV lengths
    q_ref,        # [1, block_q, d]
    k_ref,        # [1, block_k, d]
    v_ref,        # [1, block_k, d]
    o_ref,        # [1, block_q, d]
    m_scratch,    # [block_q, 128] f32
    l_scratch,    # [block_q, 128] f32
    acc_scratch,  # [block_q, d] f32
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    num_heads: int,
):
    bh_idx = pl.program_id(0)
    q_idx = pl.program_id(1)
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    valid_len = lengths_ref[bh_idx // num_heads]

    # Causal: skip KV tiles entirely above the diagonal.  Padding: skip KV
    # tiles entirely beyond the batch row's valid length.
    run = kv_idx * block_k < valid_len
    if causal:
        run = jnp.logical_and(
            run, (q_idx + 1) * block_q - 1 >= kv_idx * block_k
        )

    @pl.when(run)
    def _tile():
        q = q_ref[0]  # [block_q, d]
        k = k_ref[0]  # [block_k, d]
        v = v_ref[0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, block_k]
        if sm_scale != 1.0:
            s = s * sm_scale

        col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
        mask = col_ids < valid_len
        if causal:
            row_ids = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_idx * block_q
            )
            mask = jnp.logical_and(mask, col_ids <= row_ids)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scratch[...]  # [block_q, 128] (lane-replicated max)
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # [block_q, 1]
        m_curr_rep = jnp.broadcast_to(m_curr, m_prev.shape)
        m_next = jnp.maximum(m_prev, m_curr_rep)
        alpha = jnp.exp(m_prev - m_next)

        p = jnp.exp(s - jnp.broadcast_to(m_next[:, :1], s.shape))
        l_corr = alpha * l_prev
        l_next = l_corr + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape
        )
        m_scratch[...] = m_next
        l_scratch[...] = l_next

        acc_scratch[...] = acc_scratch[...] * jnp.broadcast_to(
            alpha[:, :1], acc_scratch.shape
        )
        acc_scratch[...] += jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        l_final = l_scratch[...][:, :1]  # [block_q, 1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0] = (
            acc_scratch[...] * jnp.broadcast_to(l_inv, acc_scratch.shape)
        ).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jnp.ndarray:
    """Tiled flash attention.

    q: [b, sq, h, d]; k/v: [b, skv, h, d] (same head count — expand GQA
    before calling, or use the XLA path for GQA decode); lengths: [b] valid
    KV lengths (None = all valid).  Sequence lengths must be multiples of
    the block sizes (callers pad; padded keys are masked out, padded query
    rows produce garbage rows the caller slices off).
    """
    b, sq, h, d = q.shape
    skv = k.shape[1]
    # Auto-tile: larger blocks amortize per-grid-step overhead and give the
    # MXU wider dots (the d=80 vision heads under-fill the lane dim, so the
    # kv-axis width is where utilization comes from).  Measured on v5e at
    # 4096x16h d80: 128/128 -> 12 TFLOP/s, 256/512 -> 15, 256/1024 -> 19.2.
    # VMEM stays small at d<=128: scores 256x1024 f32 = 1 MB.
    if block_q is None:
        block_q = next(
            (c for c in (256, DEFAULT_BLOCK_Q) if sq % c == 0),
            DEFAULT_BLOCK_Q,
        )
    if block_k is None:
        block_k = next(
            (c for c in (1024, 512, 256, DEFAULT_BLOCK_K) if skv % c == 0),
            DEFAULT_BLOCK_K,
        )
    if sq % block_q or skv % block_k:
        raise ValueError(
            f"seq lengths ({sq}, {skv}) must be multiples of blocks "
            f"({block_q}, {block_k})"
        )
    scale = sm_scale if sm_scale is not None else d ** -0.5
    if lengths is None:
        lengths = jnp.full((b,), skv, jnp.int32)

    # Fold heads into the leading grid axis: [b, s, h, d] -> [b*h, s, d].
    def fold(x, s):
        return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)

    qf, kf, vf = fold(q, sq), fold(k, skv), fold(v, skv)

    grid = (b * h, sq // block_q, skv // block_k)

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        sm_scale=scale,
        block_q=block_q,
        block_k=block_k,
        num_heads=h,
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, block_q, d), lambda bh, q_, kv, lens: (bh, q_, 0)
                ),
                pl.BlockSpec(
                    (1, block_k, d), lambda bh, q_, kv, lens: (bh, kv, 0)
                ),
                pl.BlockSpec(
                    (1, block_k, d), lambda bh, q_, kv, lens: (bh, kv, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, d), lambda bh, q_, kv, lens: (bh, q_, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
    )(lengths.astype(jnp.int32), qf, kf, vf)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def flash_attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Unfused XLA reference used for kernel validation."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = sm_scale if sm_scale is not None else d ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    mask = jnp.ones((b, 1, sq, skv), bool)
    if lengths is not None:
        mask = mask & (jnp.arange(skv)[None, None, None, :] < lengths[:, None, None, None])
    if causal:
        mask = mask & (
            jnp.arange(skv)[None, None, None, :]
            <= jnp.arange(sq)[None, None, :, None]
        )
    logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


__all__ = ["flash_attention", "flash_attention_reference"]
