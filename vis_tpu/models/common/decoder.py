"""Generic GQA transformer decoder with KV cache — the text backbone for
every model family in the framework.

One implementation covers Qwen2 / Qwen2-VL (attention bias, M-RoPE) and
Llama 3.x (no bias, standard RoPE) via DecoderConfig switches; numerics match
the HF torch reference implementations (verified by golden tests in
tests/test_models_qwen2vl.py).  Functional design: params are nested dicts of
jnp arrays, forward passes are pure and jit/pjit-friendly with static shapes.

Reference mapping (for parity review): the reference system called these
models remotely (reference: src/agents/vlm_inspector.py:32 HF API,
vlm_auditor.py:56 Groq); this module is their on-pod replacement.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
from jax import lax
import jax.numpy as jnp

from vis_tpu.models.common.layers import (
    KVCache,
    apply_rope,
    attention_scores,
    causal_mask,
    decode_kv,
    embed,
    encode_kv,
    length_mask,
    linear,
    mrope_cos_sin,
    rms_norm,
    rope_cos_sin,
    swiglu_mlp,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    num_layers: int = 16
    num_heads: int = 16
    num_kv_heads: int = 2
    intermediate_size: int = 5504
    head_dim: Optional[int] = None
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    qkv_bias: bool = True              # Qwen2 style; False for Llama
    mrope_section: Optional[Tuple[int, int, int]] = None  # Qwen2-VL M-RoPE
    rope_scaling: Optional[Tuple[Tuple[str, Any], ...]] = None  # llama3 scheme
    tie_word_embeddings: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def rope_scaling_dict(self) -> Optional[Dict[str, Any]]:
        return dict(self.rope_scaling) if self.rope_scaling else None

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads


def init_decoder_params(
    config: DecoderConfig, key: jax.Array, scale: float = 0.02
) -> Params:
    """Random-normal initialization (tests / benchmarks use this; production
    loads converted checkpoints)."""
    hd = config.head_dim_
    keys = iter(jax.random.split(key, config.num_layers * 8 + 4))

    def norm(shape):
        return (scale * jax.random.normal(next(keys), shape)).astype(config.dtype)

    params: Params = {
        "embed_tokens": norm((config.vocab_size, config.hidden_size)),
        "final_norm": jnp.ones((config.hidden_size,), config.dtype),
        "layers": [],
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = norm((config.vocab_size, config.hidden_size))
    for _ in range(config.num_layers):
        layer = {
            "input_norm": jnp.ones((config.hidden_size,), config.dtype),
            "post_attn_norm": jnp.ones((config.hidden_size,), config.dtype),
            "q_proj": norm((config.num_heads * hd, config.hidden_size)),
            "k_proj": norm((config.num_kv_heads * hd, config.hidden_size)),
            "v_proj": norm((config.num_kv_heads * hd, config.hidden_size)),
            "o_proj": norm((config.hidden_size, config.num_heads * hd)),
            "mlp": {
                "gate_proj": norm((config.intermediate_size, config.hidden_size)),
                "up_proj": norm((config.intermediate_size, config.hidden_size)),
                "down_proj": norm((config.hidden_size, config.intermediate_size)),
            },
        }
        if config.qkv_bias:
            layer["q_bias"] = jnp.zeros((config.num_heads * hd,), config.dtype)
            layer["k_bias"] = jnp.zeros((config.num_kv_heads * hd,), config.dtype)
            layer["v_bias"] = jnp.zeros((config.num_kv_heads * hd,), config.dtype)
        params["layers"].append(layer)
    return params


def _position_tables(
    config: DecoderConfig, positions: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin for the configured RoPE variant.

    positions: [b, s] for standard RoPE, or [3, b, s] for M-RoPE.
    Returns tables shaped [b, s, head_dim].
    """
    if config.mrope_section is not None:
        if positions.ndim == 2:  # text-only caller: replicate across streams
            positions = jnp.broadcast_to(
                positions[None], (3,) + positions.shape
            )
        return mrope_cos_sin(
            positions, config.head_dim_, config.mrope_section, config.rope_theta
        )
    return rope_cos_sin(
        positions, config.head_dim_, config.rope_theta,
        config.rope_scaling_dict,
    )


def _attention_block(
    config: DecoderConfig,
    layer: Params,
    layer_idx: int,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cache: Optional[KVCache],
    mask: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    b, s, _ = x.shape
    hd = config.head_dim_

    q = linear(x, layer["q_proj"], layer.get("q_bias"))
    k = linear(x, layer["k_proj"], layer.get("k_bias"))
    v = linear(x, layer["v_proj"], layer.get("v_bias"))
    q = q.reshape(b, s, config.num_heads, hd)
    k = k.reshape(b, s, config.num_kv_heads, hd)
    v = v.reshape(b, s, config.num_kv_heads, hd)

    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache is not None:
        cache = cache.update(layer_idx, k, v)
        k_all, v_all = cache.layer(layer_idx)  # [b, max_len, kvh(+1), hd]
        k_all = decode_kv(k_all, k.dtype, config.num_kv_heads)
        v_all = decode_kv(v_all, v.dtype, config.num_kv_heads)
    else:
        k_all, v_all = k, v

    # attention_scores groups query heads against the shared KV heads (GQA)
    # without materializing repeated KV — critical for decode bandwidth.
    out = attention_scores(q, k_all, v_all, mask)
    out = out.reshape(b, s, config.num_heads * hd)
    return linear(out, layer["o_proj"]), cache


def decoder_forward(
    config: DecoderConfig,
    params: Params,
    input_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    cache: Optional[KVCache] = None,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the decoder stack over embedded inputs.

    input_embeds: [b, s, hidden]; positions: [b, s] (or [3, b, s] M-RoPE).
    With a cache, writes K/V at the cache cursor and attends over the full
    buffer (mask must hide unwritten slots); cursor advances once at the end.
    Returns (hidden_states [b, s, hidden], updated cache).
    """
    x = input_embeds
    cos, sin = _position_tables(config, positions)
    if cache is None:
        for layer in params["layers"]:
            x = decoder_layer_nocache(config, layer, x, cos, sin, mask)
        return rms_norm(x, params["final_norm"], config.rms_norm_eps), None
    for idx, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_norm"], config.rms_norm_eps)
        attn_out, cache = _attention_block(
            config, layer, idx, h, cos, sin, cache, mask
        )
        x = x + attn_out
        h = rms_norm(x, layer["post_attn_norm"], config.rms_norm_eps)
        x = x + swiglu_mlp(h, layer["mlp"])
    x = rms_norm(x, params["final_norm"], config.rms_norm_eps)
    cache = cache.advance(jnp.int32(input_embeds.shape[1]))
    return x, cache


def decoder_layer_nocache(
    config: DecoderConfig,
    layer: Params,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """One decoder layer without a KV cache — THE statement of the layer
    law (norm -> attention -> residual -> norm -> swiglu -> residual).
    Shared by cache-free decoder_forward and the trainer's per-layer
    jax.checkpoint wrapper, so training can never silently diverge from
    inference semantics."""
    h = rms_norm(x, layer["input_norm"], config.rms_norm_eps)
    attn_out, _ = _attention_block(config, layer, 0, h, cos, sin, None, mask)
    x = x + attn_out
    h = rms_norm(x, layer["post_attn_norm"], config.rms_norm_eps)
    return x + swiglu_mlp(h, layer["mlp"])


def lm_logits(config: DecoderConfig, params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    from vis_tpu.ops.quantized import (
        QuantizedWeight,
        QuantizedWeight4,
        quantized_matmul,
        quantized_matmul4,
    )

    table = params["embed_tokens"] if config.tie_word_embeddings else params["lm_head"]
    if isinstance(table, (QuantizedWeight, QuantizedWeight4)):
        # f32 logits via the dequantizing matmul kernel (argmax ties must not
        # be decided in bf16).  The quantized table may carry zero-padded
        # rows (tile alignment) — slice back to the true vocab.
        matmul = (
            quantized_matmul if isinstance(table, QuantizedWeight)
            else quantized_matmul4
        )
        flat = hidden.reshape(-1, hidden.shape[-1])
        out = matmul(flat, table)[:, : config.vocab_size]
        return out.reshape(*hidden.shape[:-1], config.vocab_size)
    # Slice defensively: tables can carry rows past the true vocab (Mllama
    # embed tables have +8 special rows; tied heads reuse them) and an
    # argmax over those rows would emit ids the tokenizer cannot decode.
    return jnp.einsum(
        "bsh,vh->bsv", hidden, table, preferred_element_type=jnp.float32
    )[..., : config.vocab_size]


def cache_key_mask(lengths, width) -> "jnp.ndarray":
    """[b, 1, 1, width] additive mask: 0 on cached positions < each row's
    cursor, -1e30 beyond — the shared "attend only to valid KV" law every
    decode/extend variant applies."""
    kj = jnp.arange(width)[None, None, None, :]
    return jnp.where(
        kj < lengths[:, None, None, None], 0.0, -1e30
    ).astype(jnp.float32)


def prefill(
    config: DecoderConfig,
    params: Params,
    input_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    cache: KVCache,
    prompt_lengths: jnp.ndarray,
) -> Tuple[jnp.ndarray, KVCache]:
    """Prefill a (padded) prompt into the cache; returns logits for the final
    valid position of each sequence and the updated cache.

    input_embeds: [b, s_pad]; prompt_lengths: [b] true lengths (<= s_pad) —
    rows may differ (per-row cache cursors); padded tail keys are masked and
    later overwritten by decode writes at each row's own cursor.
    Call on a fresh cache (all cursors zero).
    """
    b, s = input_embeds.shape[:2]
    # Causal over the cache buffer + hide each row's padded tail keys.
    mask = causal_mask(s, cache.k.shape[2], offset=0) + length_mask(
        cache.k.shape[2], prompt_lengths
    )
    hidden, cache = decoder_forward(
        config, params, input_embeds, positions, cache, mask
    )
    last_idx = jnp.maximum(prompt_lengths - 1, 0)
    last_hidden = jnp.take_along_axis(
        hidden, last_idx[:, None, None].astype(jnp.int32), axis=1
    )  # [b, 1, h]
    logits = lm_logits(config, params, last_hidden)[:, 0]
    # decoder_forward advanced every cursor by s_pad; reset to true lengths
    # so decode writes land right after each row's own prompt.
    cache = KVCache(k=cache.k, v=cache.v, lengths=prompt_lengths.astype(jnp.int32))
    return logits, cache


def decode_step(
    config: DecoderConfig,
    params: Params,
    token_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    cache: KVCache,
) -> Tuple[jnp.ndarray, KVCache]:
    """One-token decode: token_embeds [b, 1]; returns next-token logits [b, v]."""
    hidden, cache = decoder_forward(
        config, params, token_embeds, positions, cache, cache.decode_mask()
    )
    return lm_logits(config, params, hidden)[:, 0], cache


def decode_loop(
    config: DecoderConfig,
    params: Params,
    first_logits: jnp.ndarray,
    start_position: jnp.ndarray,
    cache: KVCache,
    num_steps: int,
    eos_id: int = -1,
) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache]:
    """Greedy-decode `num_steps` tokens in ONE compiled call (lax.fori_loop).

    Avoids per-token host round-trips — critical when the host↔device link
    has latency (tunneled chips) and the XLA-right way to drive decode.
    first_logits: [b, v] from prefill (or the previous chunk); start_position:
    scalar or [b] int32 position(s) of the first generated token.  Tokens
    after an EOS are still computed (static shapes); callers truncate at the
    first EOS.  Returns (tokens [b, num_steps], final_logits [b, v], cache)
    so chunks chain: feed final_logits back as the next chunk's first_logits.
    """
    b = first_logits.shape[0]
    start_vec = jnp.broadcast_to(jnp.asarray(start_position, jnp.int32), (b,))

    def body(step, carry):
        logits, cache, tokens = carry
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [b]
        tokens = lax.dynamic_update_slice(tokens, token[:, None], (0, step))
        pos_vec = start_vec + step  # [b]
        if config.mrope_section is not None:
            positions = jnp.broadcast_to(pos_vec[None, :, None], (3, b, 1))
        else:
            positions = pos_vec[:, None]
        embeds = embed(token[:, None], params["embed_tokens"])
        logits, cache = decode_step(config, params, embeds, positions, cache)
        return logits, cache, tokens

    tokens0 = jnp.zeros((b, num_steps), jnp.int32)
    logits, cache, tokens = lax.fori_loop(
        0, num_steps, body, (first_logits, cache, tokens0)
    )
    return tokens, logits, cache


# ---------------------------------------------------------------------------
# Scan-based execution (production path)
#
# The per-layer python loop above is the readable reference; the functions
# below run the same math restructured for the compiler and the HBM:
# - layer parameters are STACKED ([L, ...] leaves) and the layer body runs
#   under lax.scan — one layer traced once, so 28-layer programs compile in
#   seconds instead of minutes;
# - prefill attends only over its own (bucketed) chunk, not the whole cache
#   buffer, and writes all layers' K/V with ONE fused dynamic_update_slice;
# - decode attends over (cache, new-token) separately — the updated cache
#   slice is never materialized per layer; new K/V are written once per step.
# Equality with the loop implementation is pinned by tests.
# ---------------------------------------------------------------------------

_QUANT_TARGETS = ("q_proj", "k_proj", "v_proj", "qkv_proj", "o_proj")
_QUANT_MLP_TARGETS = ("gate_proj", "up_proj", "gateup_proj", "down_proj")


def quantize_stacked_params(
    stacked: Params, quantize_embeddings: bool = False, mode: str = "int8",
    vocab_mode: Optional[str] = None,
) -> Params:
    """Weight-only quantization of a scan-layout decoder pytree.

    Attention and MLP projection weights ([L, O, I]) become QuantizedWeight
    (mode="int8": per-row int8 + f32 scales) or QuantizedWeight4
    (mode="int4": packed nibbles + per-(row, input-half) scales), vmapped
    over layers; norms and biases stay bf16.  lax.scan slices the quantized
    leaves per layer, so the scan execution path is unchanged — linear()
    dispatches to the matching Pallas dequantizing matmul.

    quantize_embeddings additionally quantizes the vocab projection
    (embed_tokens / lm_head).  At 2B scale the bf16 lm head is ~470 MB read
    per decode step, ~0.6 ms of pure HBM time; embed() and lm_logits()
    dequantize on the fly (gathered rows / the Pallas kernel).

    vocab_mode (default = mode) sets the vocab projection's precision
    independently of the layers'.  Measured on-chip at 7B dims (152k
    vocab, tools/probe_vocab_head.py): int4 2.40 / int8 2.60 / bf16
    3.63 ms per evaluation — int4's extra nibble unpack is offset by
    halved HBM bytes, so vocab precision is a CAPACITY knob (int4 head =
    -0.25 GB vs int8, -0.76 GB vs bf16), not a latency one.
    """
    from vis_tpu.ops.quantized import (
        QuantizedWeight,
        QuantizedWeight4,
        quantize_weight,
        quantize_weight4,
    )

    vocab_mode = vocab_mode or mode
    if mode == "int4":
        def quantize_stack(w):
            qw = jax.vmap(quantize_weight4)(w)
            return QuantizedWeight4(q=qw.q, scale=qw.scale)
    else:
        def quantize_stack(w):
            qw = jax.vmap(quantize_weight)(w)  # leaves stacked over L
            return QuantizedWeight(q=qw.q, scale=qw.scale)

    if vocab_mode == "int4":
        def quantize_vocab(w):
            return quantize_weight4(w, pad_out_multiple=512)
    elif vocab_mode == "none":
        def quantize_vocab(w):
            return w
    else:
        def quantize_vocab(w):
            return quantize_weight(w, pad_out_multiple=512)

    out = {k: v for k, v in stacked.items() if k != "layers_stacked"}
    if quantize_embeddings:
        for name in ("embed_tokens", "lm_head"):
            if name in out:
                # Pad rows to a 512 multiple: the vocab projection then runs
                # with large kernel tiles (297 grid steps instead of 1187 for
                # Qwen's 151936 vocab); lm_logits slices back to vocab_size,
                # and embedding gathers never touch the zero rows.
                out[name] = quantize_vocab(out[name])
    layers = dict(stacked["layers_stacked"])
    for name in _QUANT_TARGETS:
        if name in layers:
            layers[name] = quantize_stack(layers[name])
    mlp = dict(layers["mlp"])
    for name in _QUANT_MLP_TARGETS:
        if name in mlp:
            mlp[name] = quantize_stack(mlp[name])
    layers["mlp"] = mlp
    out["layers_stacked"] = layers
    return out


def stack_decoder_layers(params: Params) -> Params:
    """Stack the per-layer dicts into [L, ...] leaves for scan execution."""
    layers = params["layers"]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers_stacked"] = stacked
    return out


def fuse_stacked_projections(stacked: Params) -> Params:
    """Concatenate Q/K/V into one projection and gate/up into another
    (scan layout, [L, O, I] leaves).

    Decode is weight-bandwidth-bound and each matmul carries fixed
    dispatch/pipeline overhead; fusing cuts the per-step matmul count from
    7 to 4 per layer and streams larger contiguous weight reads.  The math
    per output row is unchanged (each row is an independent dot product),
    and per-row int8 quantization commutes with the concat.

    NOT for tensor-parallel runs: slicing the fused output of a row-sharded
    matmul would force a mid-layer reshard — keep projections separate when
    a mesh is attached.
    """
    layers = dict(stacked["layers_stacked"])
    layers["qkv_proj"] = jnp.concatenate(
        [layers.pop("q_proj"), layers.pop("k_proj"), layers.pop("v_proj")],
        axis=1,
    )
    if "q_bias" in layers:
        layers["qkv_bias"] = jnp.concatenate(
            [layers.pop("q_bias"), layers.pop("k_bias"), layers.pop("v_bias")],
            axis=1,
        )
    mlp = dict(layers["mlp"])
    mlp["gateup_proj"] = jnp.concatenate(
        [mlp.pop("gate_proj"), mlp.pop("up_proj")], axis=1
    )
    layers["mlp"] = mlp
    out = {k: v for k, v in stacked.items() if k != "layers_stacked"}
    out["layers_stacked"] = layers
    return out


def _pick_layer(stacked: Params, idx: jnp.ndarray) -> Params:
    """Layer `idx`'s view of the stacked-layer pytree for decode scans.

    Packed-int4 leaves become QuantizedWeight4Pick — the layer's weight
    blocks are DMA'd inside the Pallas matmul kernel, NOT sliced by XLA.
    Measured (tools/probe_scan_slice.py, v5e, 7B MLP dims): lax.scan xs
    slicing materializes a copy of every layer's packed weights each step,
    capping the decode weight stream at ~294 GB/s; the in-kernel pick runs
    ~478 GB/s.  Small leaves (norms, biases, int8 weights) are gathered
    with dynamic_index_in_dim — byte-identical to what scan xs did."""
    from vis_tpu.ops.quantized import (
        QuantizedWeight,
        QuantizedWeight4,
        QuantizedWeight4Pick,
    )

    def pick(w):
        if isinstance(w, QuantizedWeight4):
            return QuantizedWeight4Pick(w.q, w.scale, idx)
        if isinstance(w, QuantizedWeight):
            return QuantizedWeight(
                q=lax.dynamic_index_in_dim(w.q, idx, 0, keepdims=False),
                scale=lax.dynamic_index_in_dim(
                    w.scale, idx, 0, keepdims=False
                ),
            )
        return lax.dynamic_index_in_dim(w, idx, 0, keepdims=False)

    return jax.tree.map(
        pick, stacked,
        is_leaf=lambda x: isinstance(x, (QuantizedWeight, QuantizedWeight4)),
    )


def _num_stacked_layers(stacked: Params) -> int:
    return jax.tree.leaves(stacked)[0].shape[0]


def _layer_body(
    config: DecoderConfig,
    x: jnp.ndarray,
    layer: Params,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    cache_k: Optional[jnp.ndarray],
    cache_v: Optional[jnp.ndarray],
    cache_mask: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decoder layer; returns (x_out, k_new, v_new).

    Self-attention covers the fresh chunk (causal `mask`) plus, when
    cache_k/v are given, the previously cached keys (additive `cache_mask`
    hiding unwritten slots) — softmax is computed jointly over both key sets
    via a single concatenated logits row, without materializing an updated
    cache.
    """
    b, s, _ = x.shape
    hd = config.head_dim_
    h = rms_norm(x, layer["input_norm"], config.rms_norm_eps)
    if "qkv_proj" in layer:  # fused layout (fuse_stacked_projections)
        qdim = config.num_heads * hd
        kvdim = config.num_kv_heads * hd
        qkv = linear(h, layer["qkv_proj"], layer.get("qkv_bias"))
        q = qkv[..., :qdim].reshape(b, s, config.num_heads, hd)
        k = qkv[..., qdim : qdim + kvdim].reshape(b, s, config.num_kv_heads, hd)
        v = qkv[..., qdim + kvdim :].reshape(b, s, config.num_kv_heads, hd)
    else:
        q = linear(h, layer["q_proj"], layer.get("q_bias")).reshape(
            b, s, config.num_heads, hd
        )
        k = linear(h, layer["k_proj"], layer.get("k_bias")).reshape(
            b, s, config.num_kv_heads, hd
        )
        v = linear(h, layer["v_proj"], layer.get("v_bias")).reshape(
            b, s, config.num_kv_heads, hd
        )
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    kvh = config.num_kv_heads
    rep = config.num_heads // kvh
    scale = hd ** -0.5
    qg = q.reshape(b, s, kvh, rep, hd)

    logits_new = jnp.einsum(
        "bqgrd,bkgd->bgrqk", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits_new = logits_new + mask[:, :, None]

    if cache_k is not None:
        # decode_kv: int8-quantized caches dequantize here, fused into the
        # attention einsum's operand read (float caches are a plain astype).
        logits_cache = jnp.einsum(
            "bqgrd,bkgd->bgrqk", qg, decode_kv(cache_k, q.dtype, kvh),
            preferred_element_type=jnp.float32,
        ) * scale
        logits_cache = logits_cache + cache_mask[:, :, None]
        joint = jnp.concatenate([logits_cache, logits_new], axis=-1)
        probs = jax.nn.softmax(joint, axis=-1)
        n_cache = cache_k.shape[1]
        probs_cache = probs[..., :n_cache]
        probs_new = probs[..., n_cache:]
        out = jnp.einsum(
            "bgrqk,bkgd->bqgrd", probs_cache.astype(v.dtype),
            decode_kv(cache_v, v.dtype, kvh),
            preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "bgrqk,bkgd->bqgrd", probs_new.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
    else:
        probs = jax.nn.softmax(logits_new, axis=-1)
        out = jnp.einsum(
            "bgrqk,bkgd->bqgrd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
    out = out.reshape(b, s, config.num_heads * hd).astype(x.dtype)
    x = x + linear(out, layer["o_proj"])
    h = rms_norm(x, layer["post_attn_norm"], config.rms_norm_eps)
    x = x + swiglu_mlp(h, layer["mlp"])
    return x, k, v


def prefill_scan(
    config: DecoderConfig,
    params: Params,
    input_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    cache: KVCache,
    prompt_lengths: jnp.ndarray,
) -> Tuple[jnp.ndarray, KVCache]:
    """Scan-based prefill into a FRESH cache (cursors zero).

    Attention runs over the padded chunk only (causal + per-row length
    mask); all layers' K/V are written into the cache with one
    dynamic_update_slice after the scan.
    """
    b, s = input_embeds.shape[:2]
    cos, sin = _position_tables(config, positions)
    mask = causal_mask(s, s) + length_mask(s, prompt_lengths)

    def body(x, layer):
        x, k, v = _layer_body(config, x, layer, cos, sin, mask, None, None, None)
        return x, (k, v)

    x, (k_all, v_all) = lax.scan(body, input_embeds, params["layers_stacked"])
    x = rms_norm(x, params["final_norm"], config.rms_norm_eps)

    # k_all: [L, b, s, kvh, hd] -> write at position 0 of every row.
    new_k = lax.dynamic_update_slice(
        cache.k, encode_kv(k_all, cache.k.dtype), (0, 0, 0, 0, 0)
    )
    new_v = lax.dynamic_update_slice(
        cache.v, encode_kv(v_all, cache.v.dtype), (0, 0, 0, 0, 0)
    )
    cache = KVCache(k=new_k, v=new_v, lengths=prompt_lengths.astype(jnp.int32))

    last_idx = jnp.maximum(prompt_lengths - 1, 0)
    last_hidden = jnp.take_along_axis(
        x, last_idx[:, None, None].astype(jnp.int32), axis=1
    )
    logits = lm_logits(config, params, last_hidden)[:, 0]
    return logits, cache


def _extend_chunk(
    config: DecoderConfig,
    params: Params,
    input_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    cache: KVCache,
    new_lengths: jnp.ndarray,
) -> Tuple[jnp.ndarray, KVCache]:
    """Shared body of extend_scan / verify_scan: run a padded chunk through
    the stacked layers attending jointly over valid cached KV + the causal
    chunk, write the chunk's K/V at each row's cursor, and return the
    final-norm hidden states [b, s, h] with the advanced cache.

    OVERRUN CONTRACT: the write is a dynamic_update_slice of the WHOLE
    padded chunk at the cursor; XLA CLAMPS a start index that does not fit
    (cursor + s_pad > max_len) backward over the newest valid KV instead of
    erroring — silent corruption.  Every caller must budget against the
    padded chunk length host-side BEFORE dispatch (engine chat turns, the
    +32 lookahead slack in generate_stream, and the prefix-suffix fit check
    all do; cite those guards when adding a new call site)."""
    s = input_embeds.shape[1]
    cos, sin = _position_tables(config, positions)
    max_len = cache.k.shape[2]
    cache_mask = cache_key_mask(cache.lengths, max_len)
    chunk_mask = causal_mask(s, s) + length_mask(s, new_lengths)

    stacked = params["layers_stacked"]

    def body(x, idx_and_cache):
        idx, ck, cv = idx_and_cache
        x, k, v = _layer_body(
            config, x, _pick_layer(stacked, idx), cos, sin, chunk_mask,
            ck, cv, cache_mask
        )
        return x, (k, v)

    x, (k_new, v_new) = lax.scan(
        body, input_embeds,
        (jnp.arange(_num_stacked_layers(stacked)), cache.k, cache.v),
    )
    x = rms_norm(x, params["final_norm"], config.rms_norm_eps)

    def write_row(kb_row, vb_row, k_row, v_row, start):
        kb = lax.dynamic_update_slice(
            kb_row, encode_kv(k_row, kb_row.dtype), (0, start, 0, 0)
        )
        vb = lax.dynamic_update_slice(
            vb_row, encode_kv(v_row, vb_row.dtype), (0, start, 0, 0)
        )
        return kb, vb

    k_buf, v_buf = jax.vmap(
        write_row, in_axes=(1, 1, 1, 1, 0), out_axes=1
    )(cache.k, cache.v, k_new, v_new, cache.lengths)
    cache = KVCache(
        k=k_buf, v=v_buf,
        lengths=cache.lengths + new_lengths.astype(jnp.int32),
    )
    return x, cache


def extend_scan(
    config: DecoderConfig,
    params: Params,
    input_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    cache: KVCache,
    new_lengths: jnp.ndarray,
) -> Tuple[jnp.ndarray, KVCache]:
    """Append a (padded) chunk to an EXISTING cache — KV-cached follow-ups.

    Chat turns re-use the conversation's cache instead of re-prefilling the
    whole history: queries attend jointly over the cached keys (all valid
    up to each row's cursor) and the causal new chunk.  input_embeds:
    [b, s_pad]; new_lengths: [b] true chunk lengths.  Batch rows should share
    one true length (chat sessions run batch-1).  Returns logits for the last
    valid position and the cache advanced by the true lengths.
    """
    x, cache = _extend_chunk(
        config, params, input_embeds, positions, cache, new_lengths
    )
    last_idx = jnp.maximum(new_lengths - 1, 0)
    last_hidden = jnp.take_along_axis(
        x, last_idx[:, None, None].astype(jnp.int32), axis=1
    )
    logits = lm_logits(config, params, last_hidden)[:, 0]
    return logits, cache


def _write_new_kv(
    k_buf: jnp.ndarray,
    v_buf: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    lengths: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Write ONE new token's K/V per row at that row's cursor.

    k_buf/v_buf: [L, b, max_len, kvh, hd]; k_new/v_new: [L, b, 1, kvh, hd];
    lengths: [b] cursors.  The lowering matters a lot on TPU: a vmap'd
    per-row dynamic_update_slice doubles the whole decode step at b=4
    (measured 9.95 vs 5.30 ms/step on v5e, 2B-class — the batched-index DUS
    lowers to a serialized scatter loop).  So: b == 1 keeps the single fused
    dynamic_update_slice (fastest, 5.10 ms/step) and b > 1 uses a flat
    advanced-index scatter over (row, cursor) pairs (5.30 ms/step at b=4,
    within noise of skipping the write entirely).
    """
    b = k_buf.shape[1]
    k_new = encode_kv(k_new, k_buf.dtype)
    v_new = encode_kv(v_new, v_buf.dtype)
    if b == 1:
        start = lengths[0]
        k_buf = lax.dynamic_update_slice(k_buf, k_new, (0, 0, start, 0, 0))
        v_buf = lax.dynamic_update_slice(v_buf, v_new, (0, 0, start, 0, 0))
        return k_buf, v_buf
    rows = jnp.arange(b)
    k_buf = k_buf.at[:, rows, lengths].set(k_new[:, :, 0])
    v_buf = v_buf.at[:, rows, lengths].set(v_new[:, :, 0])
    return k_buf, v_buf


def verify_scan(
    config: DecoderConfig,
    params: Params,
    input_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    cache: KVCache,
    new_lengths: jnp.ndarray,
) -> Tuple[jnp.ndarray, KVCache]:
    """Speculative-decoding verification: like extend_scan, but returns the
    GREEDY TOKEN at every chunk position ([b, s] int32) instead of only the
    last logits.  greedy[:, i] is the model's next token after consuming
    chunk position i — comparing it against a drafted continuation yields
    the accepted prefix length (prompt-lookup decoding; greedy outputs are
    exactly preserved by construction).  The cache gains the chunk's K/V at
    the cursors; the caller rewinds `lengths` to the accepted count."""
    x, cache = _extend_chunk(
        config, params, input_embeds, positions, cache, new_lengths
    )
    greedy = jnp.argmax(lm_logits(config, params, x), axis=-1).astype(jnp.int32)
    return greedy, cache


def decode_step_scan(
    config: DecoderConfig,
    params: Params,
    token_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    cache: KVCache,
) -> Tuple[jnp.ndarray, KVCache]:
    """Scan-based one-token decode (sampling path): token_embeds [b, 1]."""
    b = token_embeds.shape[0]
    cos, sin = _position_tables(config, positions)
    max_len = cache.k.shape[2]
    cache_mask = cache_key_mask(cache.lengths, max_len)

    stacked = params["layers_stacked"]

    def body(x, idx_and_cache):
        idx, ck, cv = idx_and_cache
        x, k, v = _layer_body(
            config, x, _pick_layer(stacked, idx), cos, sin, None,
            ck, cv, cache_mask
        )
        return x, (k, v)

    x, (k_new, v_new) = lax.scan(
        body, token_embeds,
        (jnp.arange(_num_stacked_layers(stacked)), cache.k, cache.v),
    )
    x = rms_norm(x, params["final_norm"], config.rms_norm_eps)
    logits = lm_logits(config, params, x)[:, 0]

    k_buf, v_buf = _write_new_kv(cache.k, cache.v, k_new, v_new, cache.lengths)
    return logits, KVCache(k=k_buf, v=v_buf, lengths=cache.lengths + 1)


def _dense_token_step(
    config: DecoderConfig,
    params: Params,
    token: jnp.ndarray,
    pos_vec: jnp.ndarray,
    k_buf: jnp.ndarray,
    v_buf: jnp.ndarray,
    lengths: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused decode step over a DENSE cache, shared by every decode-loop
    variant (greedy / sampled / constrained): embed the chosen token [b],
    scan the stacked layers reading valid cached KV (cursor-masked), and
    write all layers' new K/V at the per-row cursors in one fused update.
    Returns (new_logits, k_buf, v_buf); the caller advances `lengths`."""
    b = token.shape[0]
    if config.mrope_section is not None:
        positions = jnp.broadcast_to(pos_vec[None, :, None], (3, b, 1))
    else:
        positions = pos_vec[:, None]
    cos, sin = _position_tables(config, positions)
    x = embed(token[:, None], params["embed_tokens"])
    cache_mask = cache_key_mask(lengths, k_buf.shape[2])

    stacked = params["layers_stacked"]

    def body(x, idx_and_cache):
        idx, ck, cv = idx_and_cache
        x, k, v = _layer_body(
            config, x, _pick_layer(stacked, idx), cos, sin, None,
            ck, cv, cache_mask
        )
        return x, (k, v)

    x, (k_new, v_new) = lax.scan(
        body, x, (jnp.arange(_num_stacked_layers(stacked)), k_buf, v_buf)
    )
    x = rms_norm(x, params["final_norm"], config.rms_norm_eps)
    logits = lm_logits(config, params, x)[:, 0]
    k_buf, v_buf = _write_new_kv(k_buf, v_buf, k_new, v_new, lengths)
    return logits, k_buf, v_buf


def _paged_token_step(
    config: DecoderConfig,
    params: Params,
    token: jnp.ndarray,
    pos_vec: jnp.ndarray,
    pool_k: jnp.ndarray,
    pool_v: jnp.ndarray,
    page_tables: jnp.ndarray,
    lengths: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """_dense_token_step's PAGED twin: each layer gathers the slot's pages
    into a [slots, max_pages*page] key window (masked past each cursor) and
    the new K/V lands at (page_tables[i, len//page], len % page) with one
    fused scatter across layers.  Returns (new_logits, pool_k, pool_v)."""
    slots, max_pages = page_tables.shape
    page = pool_k.shape[2]
    width = max_pages * page
    if config.mrope_section is not None:
        positions = jnp.broadcast_to(pos_vec[None, :, None], (3, slots, 1))
    else:
        positions = pos_vec[:, None]
    cos, sin = _position_tables(config, positions)
    x = embed(token[:, None], params["embed_tokens"])
    cache_mask = cache_key_mask(lengths, width)

    stacked = params["layers_stacked"]

    def body(x, idx_and_pool):
        idx, pk, pv = idx_and_pool  # pk/pv: [n_pages, page, kvh, hd]
        ck = pk[page_tables].reshape(slots, width, *pk.shape[2:])
        cv = pv[page_tables].reshape(slots, width, *pv.shape[2:])
        x, k, v = _layer_body(
            config, x, _pick_layer(stacked, idx), cos, sin, None,
            ck, cv, cache_mask
        )
        return x, (k, v)

    x, (k_new, v_new) = lax.scan(
        body, x, (jnp.arange(_num_stacked_layers(stacked)), pool_k, pool_v)
    )
    x = rms_norm(x, params["final_norm"], config.rms_norm_eps)
    logits = lm_logits(config, params, x)[:, 0]

    rows = jnp.arange(slots)
    page_idx = page_tables[rows, lengths // page]
    offset = lengths % page
    pool_k = pool_k.at[:, page_idx, offset].set(
        encode_kv(k_new[:, :, 0], pool_k.dtype)
    )
    pool_v = pool_v.at[:, page_idx, offset].set(
        encode_kv(v_new[:, :, 0], pool_v.dtype)
    )
    return logits, pool_k, pool_v


def _eos_while_loop(b, num_steps, eos_id, budget, init_inner, step_fn):
    """The device-side early-exit scaffold shared by every eos-aware decode
    loop: run `step_fn(inner_carry, step_idx) -> (inner_carry, token)` until
    every row has emitted EOS or spent its per-row `budget` (rows with
    budget<=0 start done: inactive scheduler slots).  Token slots past a
    row's EOS read eos_id.  Returns (tokens [b, num_steps], final inner
    carry tuple).

    CURSOR CONTRACT: done rows keep stepping (their recorded token is
    masked to eos_id, but the model still runs and their KV cursor still
    ADVANCES past garbage writes) — callers that chain chunks on the
    returned cache/lengths must rewind done rows host-side first
    (serving.scheduler._postprocess_chunk and the engine's chunked decode
    both do).  decode_loop_lookahead instead freezes done rows' cursors on
    device; see its docstring for why the contract differs there."""
    tokens0 = jnp.full((b, num_steps), eos_id, jnp.int32)
    done0 = jnp.zeros((b,), bool) if budget is None else (budget <= 0)

    def cond(carry):
        return (carry[0] < num_steps) & ~jnp.all(carry[1])

    def while_body(carry):
        step_idx, done, tokens = carry[0], carry[1], carry[2]
        inner, token = step_fn(carry[3:], step_idx)
        token = jnp.where(done, eos_id, token)
        tokens = lax.dynamic_update_slice(
            tokens, token[:, None], (0, step_idx)
        )
        done = done | (token == eos_id)
        if budget is not None:
            done = done | (step_idx + 1 >= budget)
        return (step_idx + 1, done, tokens) + tuple(inner)

    out = lax.while_loop(
        cond, while_body, (jnp.int32(0), done0, tokens0) + tuple(init_inner)
    )
    return out[2], out[3:]


def decode_loop_scan(
    config: DecoderConfig,
    params: Params,
    first_logits: jnp.ndarray,
    start_position: jnp.ndarray,
    cache: KVCache,
    num_steps: int,
    eos_id: Optional[int] = None,
    budget: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache]:
    """Fused greedy decode of up to `num_steps` tokens.

    Per step: scan over layers reading the cache (read-only xs) with the new
    token's K/V handled out-of-cache, then ONE fused write of all layers'
    new K/V at the per-row cursors.

    eos_id: when given, the loop is a lax.while_loop that EXITS ON DEVICE
    once every row has emitted EOS — a request that finishes at token 190
    of a 512-token chunk stops paying weight passes there instead of
    decoding 322 garbage tokens (the dominant waste on chunked decode over
    high-RTT links, where chunks are sized to the whole budget).  Token
    slots past a row's EOS read eos_id.  With eos_id=None the loop is the
    original fixed-trip scan.

    budget ([b] int32, only with eos_id): per-row token allowance for this
    chunk — a row also counts done after `budget` steps (and starts done
    at budget<=0: inactive scheduler slots).  The chunk then ends at
    max-over-live-rows of min(EOS step, budget) instead of always running
    `num_steps` for every slot.
    """
    b = first_logits.shape[0]
    start_vec = jnp.broadcast_to(jnp.asarray(start_position, jnp.int32), (b,))

    def step(carry, step_idx):
        logits, k_buf, v_buf, lengths = carry
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logits, k_buf, v_buf = _dense_token_step(
            config, params, token, start_vec + step_idx, k_buf, v_buf, lengths
        )
        return (logits, k_buf, v_buf, lengths + 1), token

    init = (first_logits, cache.k, cache.v, cache.lengths)
    if eos_id is None:
        (logits, k_buf, v_buf, lengths), tokens = lax.scan(
            step, init, jnp.arange(num_steps)
        )
        cache = KVCache(k=k_buf, v=v_buf, lengths=lengths)
        return tokens.T, logits, cache  # tokens: [steps, b] -> [b, steps]

    tokens, final = _eos_while_loop(b, num_steps, eos_id, budget, init, step)
    logits, k_buf, v_buf, lengths = final[:4]
    cache = KVCache(k=k_buf, v=v_buf, lengths=lengths)
    return tokens, logits, cache


class DecodeConstraint(NamedTuple):
    """Grammar-constraint state threaded through the fused decode scan
    (tables from vis_tpu.serving.constrained.json_constraint_tables).

    token_ok/token_trans/cost_after are [S, K] with K <= vocab: tokens past
    the table width are implicitly disallowed.  state/remaining are per-row;
    the allowed set at each step is
        token_ok[state] & (cost_after[state] < remaining)
    which keeps the emitted prefix completable within the budget.
    """

    token_ok: jnp.ndarray     # [S, K] bool (or [T, S, K] with table_idx)
    token_trans: jnp.ndarray  # [S, K] int32 (or [T, S, K])
    cost_after: jnp.ndarray   # [S, K] int32 (or [T, S, K])
    state: jnp.ndarray        # [b] int32
    remaining: jnp.ndarray    # [b] int32
    active: jnp.ndarray       # [b] bool — rows with the mask applied
    # Document-length floor: completing the root (cost_after == 0) is
    # blocked while remaining > min_remaining, so a greedy model can't
    # close `{}` after two tokens; every state keeps a cost>0 continuation
    # (verified at table build), so this never dead-ends.
    min_remaining: jnp.ndarray  # [b] int32
    # Per-row grammar selection over STACKED tables: when the table arrays
    # are [T, S_max, K] (scheduler slots mixing e.g. generic-JSON rows with
    # schema-exact rows in one batched chunk), table_idx [b] picks each
    # row's grammar.  None with 2-D tables = the classic single-table path.
    table_idx: Optional[jnp.ndarray] = None
    # Column-class compression (real-vocab tables): K is the number of
    # distinct token BEHAVIORS, and class_of [V] (or [T, V] stacked) maps
    # each vocab id to its column.  None = dense tables (K == vocab head
    # width), the byte-level/dev path.
    class_of: Optional[jnp.ndarray] = None


def constrained_pick(
    logits: jnp.ndarray, constraint: DecodeConstraint, pick_fn
) -> Tuple[jnp.ndarray, DecodeConstraint]:
    """Grammar-mask the logits, pick a token with `pick_fn(masked_logits)`
    (argmax or a sampler), and advance the DFA; returns (token, constraint').

    Inactive rows see the raw logits (scheduler slots mixing JSON and
    free-form requests share one batched step); active rows are restricted
    to grammar-legal, budget-feasible tokens."""
    stacked = constraint.token_ok.ndim == 3
    if stacked:
        cost_row = constraint.cost_after[constraint.table_idx, constraint.state]
        ok_row = constraint.token_ok[constraint.table_idx, constraint.state]
    else:
        cost_row = constraint.cost_after[constraint.state]
        ok_row = constraint.token_ok[constraint.state]
    if constraint.class_of is not None:
        # Compressed tables: expand the [b, C] class rows to [b, V]
        # through each row's vocab -> column map before masking.
        if stacked:
            cls_rows = constraint.class_of[constraint.table_idx]  # [b, V]
        else:
            cls_rows = jnp.broadcast_to(
                constraint.class_of[None],
                (ok_row.shape[0],) + constraint.class_of.shape,
            )
        ok_row = jnp.take_along_axis(ok_row, cls_rows, axis=-1)
        cost_row = jnp.take_along_axis(cost_row, cls_rows, axis=-1)
    k = ok_row.shape[-1]
    feasible = ok_row & (cost_row < constraint.remaining[:, None])
    # Document-length floor: block closing moves (cost_after == 0) while
    # above the floor — but only where an open continuation exists at all
    # (schema DFAs have forced-close states, e.g. the final '}').
    open_opts = feasible & (cost_row > 0)
    floor_on = (constraint.remaining > constraint.min_remaining) & (
        open_opts.any(axis=-1)
    )
    allowed = jnp.where(floor_on[:, None], open_opts, feasible)
    allowed = allowed | ~constraint.active[:, None]
    head = jnp.where(allowed, logits[:, :k], -1e30)
    if logits.shape[-1] > k:
        tail = jnp.where(constraint.active[:, None], -1e30, logits[:, k:])
        masked = jnp.concatenate([head, tail], axis=-1)
    else:
        masked = head
    token = pick_fn(masked).astype(jnp.int32)
    clipped = jnp.minimum(token, k - 1)
    if constraint.class_of is not None:
        b_idx = jnp.arange(clipped.shape[0])
        col = cls_rows[b_idx, clipped]  # picked token's table column
    else:
        col = clipped
    if stacked:
        trans = constraint.token_trans[
            constraint.table_idx, constraint.state, col
        ]
    else:
        trans = constraint.token_trans[constraint.state, col]
    new_state = jnp.where(constraint.active, trans, constraint.state)
    return token, constraint._replace(
        state=new_state, remaining=constraint.remaining - 1
    )


def constrained_argmax(
    logits: jnp.ndarray, constraint: DecodeConstraint
) -> Tuple[jnp.ndarray, DecodeConstraint]:
    """Greedy constrained_pick (see above)."""
    return constrained_pick(
        logits, constraint, lambda masked: jnp.argmax(masked, axis=-1)
    )


def gumbel_sample_token(
    logits: jnp.ndarray, key: jnp.ndarray, temperature: jnp.ndarray
) -> jnp.ndarray:
    """Categorical sampling via the Gumbel-max trick — runs INSIDE the fused
    decode scan, so sampled decode costs the same device dispatches as
    greedy (the old per-token host loop paid one tunnel round-trip per
    token).  Already-masked logits (-1e30 for disallowed) stay unpickable.

    temperature may be a scalar or a per-row [b] vector; rows with
    temperature <= 0 take the EXACT greedy argmax (scheduler slots mix
    sampled and greedy requests in one batched step)."""
    temp = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32), logits.shape[:1]
    )
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, logits.shape, jnp.float32, 1e-20, 1.0)
    ))
    sampled = jnp.argmax(
        logits / jnp.maximum(temp, 1e-6)[:, None] + gumbel, axis=-1
    )
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(temp > 0, sampled, greedy).astype(jnp.int32)


def decode_loop_scan_sampled(
    config: DecoderConfig,
    params: Params,
    first_logits: jnp.ndarray,
    start_position: jnp.ndarray,
    cache: KVCache,
    key: jnp.ndarray,
    temperature: jnp.ndarray,
    num_steps: int,
    eos_id: Optional[int] = None,
    budget: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache, jnp.ndarray]:
    """decode_loop_scan with in-scan temperature sampling (Gumbel-max);
    returns the advanced PRNG key so chunked callers continue the stream.
    eos_id: device-side early exit once every row emitted EOS (see
    decode_loop_scan)."""
    b = first_logits.shape[0]
    start_vec = jnp.broadcast_to(jnp.asarray(start_position, jnp.int32), (b,))

    def step(carry, step_idx):
        logits, k_buf, v_buf, lengths, key = carry
        key, sub = jax.random.split(key)
        token = gumbel_sample_token(logits, sub, temperature)
        logits, k_buf, v_buf = _dense_token_step(
            config, params, token, start_vec + step_idx, k_buf, v_buf, lengths
        )
        return (logits, k_buf, v_buf, lengths + 1, key), token

    init = (first_logits, cache.k, cache.v, cache.lengths, key)
    if eos_id is None:
        (logits, k_buf, v_buf, lengths, key), tokens = lax.scan(
            step, init, jnp.arange(num_steps)
        )
        cache = KVCache(k=k_buf, v=v_buf, lengths=lengths)
        return tokens.T, logits, cache, key

    tokens, final = _eos_while_loop(b, num_steps, eos_id, budget, init, step)
    logits, k_buf, v_buf, lengths, key = final[:5]
    cache = KVCache(k=k_buf, v=v_buf, lengths=lengths)
    return tokens, logits, cache, key


def decode_loop_lookahead(
    config: DecoderConfig,
    params: Params,
    first_logits: jnp.ndarray,
    start_position: jnp.ndarray,
    cache: KVCache,
    constraint: DecodeConstraint,
    forced_token: jnp.ndarray,
    forced_state: jnp.ndarray,
    num_windows: int,
    window: int,
    key: Optional[jnp.ndarray] = None,
    temperature: Optional[jnp.ndarray] = None,
    eos_id: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, KVCache, DecodeConstraint]:
    """Constrained decode emitting up to `window` tokens per weight pass.

    Schema-constrained documents (serving/schema.py) are dominated by
    FORCED runs — keys, punctuation, enum bodies — where the DFA allows
    exactly one token and the model has no choice.  Decoding those one
    step at a time reads all the weights once per token for a foregone
    conclusion.  Here every step is a `window`-token extend_scan: position
    0 is the model-chosen (grammar-masked) token, positions 1.. follow
    ``forced_token``/``forced_state`` ([S] int32, -1 where the state has a
    real choice).  Bandwidth-bound decode reads the weights ONCE for the
    whole window, so skeleton runs cost ~1/window of their step-by-step
    time; free regions degrade to 1 token per pass of the same price.

    Returns (tokens [b, num_windows, window], valid [b, num_windows,
    window], last_logits, cache, constraint).  Only positions with valid
    True were emitted; the KV cursor advanced per-row by the valid count
    (padding KV is overwritten by the next window).  EOS at the ACCEPT
    state is itself a forced move, so the document's closing run ends with
    EOS in the same pass.
    """
    b = first_logits.shape[0]
    start_vec = jnp.broadcast_to(jnp.asarray(start_position, jnp.int32), (b,))
    sampled = key is not None

    def step(carry, _):
        if sampled:
            logits, k_buf, v_buf, lengths, pos, con, rng = carry
            rng, sub = jax.random.split(rng)
            t0, con = constrained_pick(
                logits, con,
                lambda m: gumbel_sample_token(m, sub, temperature),
            )
        else:
            logits, k_buf, v_buf, lengths, pos, con = carry
            t0, con = constrained_argmax(logits, con)

        def chain(cc, _):
            state, remaining, alive = cc
            ft = forced_token[state]
            ok = alive & (ft >= 0)
            tok = jnp.where(ok, ft, 0)
            nxt = jnp.where(ok, forced_state[state], state)
            return (nxt, remaining - ok.astype(jnp.int32), ok), (tok, ok)

        (cstate, cremaining, _), (ctoks, cok) = lax.scan(
            chain,
            (con.state, con.remaining, jnp.ones((b,), bool)),
            None,
            length=window - 1,
        )
        w_tokens = jnp.concatenate([t0[:, None], ctoks.T], axis=1)
        w_valid = jnp.concatenate(
            [jnp.ones((b, 1), bool), cok.T], axis=1
        )
        valid_len = w_valid.sum(axis=1).astype(jnp.int32)
        con = con._replace(state=cstate, remaining=cremaining)

        embeds = embed(w_tokens, params["embed_tokens"])
        offs = jnp.arange(window, dtype=jnp.int32)
        pos_mat = pos[:, None] + offs[None, :]
        if config.mrope_section is not None:
            positions = jnp.broadcast_to(pos_mat[None], (3, b, window))
        else:
            positions = pos_mat
        logits, new_cache = extend_scan(
            config, params, embeds, positions,
            KVCache(k=k_buf, v=v_buf, lengths=lengths), valid_len,
        )
        out = (logits, new_cache.k, new_cache.v, new_cache.lengths,
               pos + valid_len, con)
        if sampled:
            out = out + (rng,)
        return out, (w_tokens, w_valid)

    init = (first_logits, cache.k, cache.v, cache.lengths, start_vec,
            constraint)
    if sampled:
        init = init + (key,)

    if eos_id is None:
        carry, (tokens, valid) = lax.scan(
            step, init, None, length=num_windows
        )
        logits, k_buf, v_buf, lengths = (
            carry[0], carry[1], carry[2], carry[3]
        )
        constraint = carry[5]
        cache = KVCache(k=k_buf, v=v_buf, lengths=lengths)
        # [n, b, w] -> [b, n, w]
        return (
            tokens.transpose(1, 0, 2), valid.transpose(1, 0, 2),
            logits, cache, constraint,
        )

    # Device-side early exit: a window whose valid span contains EOS ends
    # that row (EOS is the forced move at ACCEPT, so finishing documents
    # stop paying weight passes the moment they close).
    tokens0 = jnp.full((num_windows, b, window), eos_id, jnp.int32)
    valid0 = jnp.zeros((num_windows, b, window), bool)

    def cond(carry):
        return (carry[0] < num_windows) & ~jnp.all(carry[1])

    def while_body(carry):
        win_idx, done, tokens_buf, valid_buf = (
            carry[0], carry[1], carry[2], carry[3]
        )
        prev_lengths, prev_pos = carry[4 + 3], carry[4 + 4]
        inner, (w_tokens, w_valid) = step(carry[4:], None)
        w_valid = w_valid & ~done[:, None]
        # Freeze finished rows' KV cursor and position: the loop only
        # exits when EVERY row is done, and letting a done row's cursor
        # keep advancing would hand the caller a cache whose lengths
        # point past garbage KV (their window outputs are already
        # invalidated above, but the cursor is part of the contract).
        inner = (
            inner[:3]
            + (jnp.where(done, prev_lengths, inner[3]),
               jnp.where(done, prev_pos, inner[4]))
            + inner[5:]
        )
        tokens_buf = lax.dynamic_update_slice(
            tokens_buf, w_tokens[None], (win_idx, 0, 0)
        )
        valid_buf = lax.dynamic_update_slice(
            valid_buf, w_valid[None], (win_idx, 0, 0)
        )
        done = done | (w_valid & (w_tokens == eos_id)).any(axis=1)
        return (win_idx + 1, done, tokens_buf, valid_buf) + inner

    out = lax.while_loop(
        cond, while_body,
        (jnp.int32(0), jnp.zeros((b,), bool), tokens0, valid0) + init,
    )
    tokens, valid = out[2], out[3]
    logits, k_buf, v_buf, lengths = out[4], out[5], out[6], out[7]
    constraint = out[9]
    cache = KVCache(k=k_buf, v=v_buf, lengths=lengths)
    return (
        tokens.transpose(1, 0, 2), valid.transpose(1, 0, 2),
        logits, cache, constraint,
    )


def decode_loop_scan_constrained(
    config: DecoderConfig,
    params: Params,
    first_logits: jnp.ndarray,
    start_position: jnp.ndarray,
    cache: KVCache,
    constraint: DecodeConstraint,
    num_steps: int,
    key: Optional[jnp.ndarray] = None,
    temperature: Optional[jnp.ndarray] = None,
    eos_id: Optional[int] = None,
    budget: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache, DecodeConstraint]:
    """decode_loop_scan with a JSON-grammar logit mask per step (SURVEY §7
    hard part 6: constrained decoding instead of parse-and-repair).  Same
    fused per-step structure; adds two table gathers + one compare.
    Returns the constraint carry so chunked callers continue the DFA.
    With key/temperature, picks are sampled (Gumbel-max over the masked
    logits) instead of greedy — same device cost either way.
    eos_id: device-side early exit once every row emitted EOS (see
    decode_loop_scan)."""
    b = first_logits.shape[0]
    start_vec = jnp.broadcast_to(jnp.asarray(start_position, jnp.int32), (b,))
    sampled = key is not None

    def step(carry, step_idx):
        if sampled:
            logits, k_buf, v_buf, lengths, con, rng = carry
            rng, sub = jax.random.split(rng)
            token, con = constrained_pick(
                logits, con,
                lambda masked: gumbel_sample_token(masked, sub, temperature),
            )
        else:
            logits, k_buf, v_buf, lengths, con = carry
            token, con = constrained_argmax(logits, con)
        logits, k_buf, v_buf = _dense_token_step(
            config, params, token, start_vec + step_idx, k_buf, v_buf, lengths
        )
        if sampled:
            return (logits, k_buf, v_buf, lengths + 1, con, rng), token
        return (logits, k_buf, v_buf, lengths + 1, con), token

    init = (first_logits, cache.k, cache.v, cache.lengths, constraint)
    if sampled:
        init = init + (key,)

    if eos_id is None:
        carry, tokens = lax.scan(step, init, jnp.arange(num_steps))
        logits, k_buf, v_buf, lengths, constraint = carry[:5]
        cache = KVCache(k=k_buf, v=v_buf, lengths=lengths)
        return tokens.T, logits, cache, constraint

    tokens, final = _eos_while_loop(b, num_steps, eos_id, budget, init, step)
    logits, k_buf, v_buf, lengths, constraint = final[:5]
    cache = KVCache(k=k_buf, v=v_buf, lengths=lengths)
    return tokens, logits, cache, constraint


def decode_loop_paged(
    config: DecoderConfig,
    params: Params,
    first_logits: jnp.ndarray,
    start_position: jnp.ndarray,
    pool_k: jnp.ndarray,
    pool_v: jnp.ndarray,
    page_tables: jnp.ndarray,
    lengths: jnp.ndarray,
    num_steps: int,
    eos_id: Optional[int] = None,
    budget: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused greedy decode over a PAGED KV pool (vis_tpu.serving.paged_kv).

    eos_id/budget: device-side early exit (see decode_loop_scan) — with
    eos_id given, the loop is a while_loop ending once every row has hit
    EOS or its per-row `budget`; rows with budget<=0 start done (inactive
    slots), so a mostly-idle slot batch stops at the live rows' needs.

    pool_k/pool_v: [L, n_pages, page, kvh, hd] shared page pool;
    page_tables: [slots, max_pages] int32 — page_tables[i, j] is the pool
    page holding slot i's tokens [j*page, (j+1)*page); unused entries point
    at the reserved trash page (0).  lengths: [slots] valid-token cursors.
    The caller must have enough pages mapped for `num_steps` more tokens per
    active slot (the scheduler reserves a request's full budget upfront).

    Per step, each layer's attention gathers the slot's pages into a
    [slots, max_pages*page] key window (masked past each cursor) — the
    same static width as the dense path, so XLA compiles one program; the
    memory win is the pool itself (sized to the sum of per-request budgets,
    not slots x max_len).  New K/V are written at (page_tables[i, len//page],
    len % page) with one fused scatter across layers.
    """
    slots = page_tables.shape[0]
    start_vec = jnp.broadcast_to(jnp.asarray(start_position, jnp.int32), (slots,))

    def step(carry, step_idx):
        logits, pool_k, pool_v, lengths = carry
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logits, pool_k, pool_v = _paged_token_step(
            config, params, token, start_vec + step_idx,
            pool_k, pool_v, page_tables, lengths,
        )
        return (logits, pool_k, pool_v, lengths + 1), token

    init = (first_logits, pool_k, pool_v, lengths)
    if eos_id is None:
        (logits, pool_k, pool_v, lengths), tokens = lax.scan(
            step, init, jnp.arange(num_steps)
        )
        return tokens.T, logits, pool_k, pool_v, lengths

    tokens, final = _eos_while_loop(
        slots, num_steps, eos_id, budget, init, step
    )
    logits, pool_k, pool_v, lengths = final[:4]
    return tokens, logits, pool_k, pool_v, lengths


def decode_loop_paged_constrained(
    config: DecoderConfig,
    params: Params,
    first_logits: jnp.ndarray,
    start_position: jnp.ndarray,
    pool_k: jnp.ndarray,
    pool_v: jnp.ndarray,
    page_tables: jnp.ndarray,
    lengths: jnp.ndarray,
    constraint: DecodeConstraint,
    num_steps: int,
    key: Optional[jnp.ndarray] = None,
    temperature: Optional[jnp.ndarray] = None,
    eos_id: Optional[int] = None,
    budget: Optional[jnp.ndarray] = None,
):
    """decode_loop_paged with the per-row JSON-grammar mask (scheduler slots
    in json_mode carry a DFA row; free-form slots pass active=False).
    With key/temperature, picks are per-row Gumbel-sampled (temperature<=0
    rows stay exact-greedy)."""
    slots = page_tables.shape[0]
    start_vec = jnp.broadcast_to(jnp.asarray(start_position, jnp.int32), (slots,))
    sampled = key is not None

    def step(carry, step_idx):
        if sampled:
            logits, pool_k, pool_v, lengths, con, rng = carry
            rng, sub = jax.random.split(rng)
            token, con = constrained_pick(
                logits, con,
                lambda m: gumbel_sample_token(m, sub, temperature),
            )
        else:
            logits, pool_k, pool_v, lengths, con = carry
            token, con = constrained_argmax(logits, con)
        logits, pool_k, pool_v = _paged_token_step(
            config, params, token, start_vec + step_idx,
            pool_k, pool_v, page_tables, lengths,
        )
        if sampled:
            return (logits, pool_k, pool_v, lengths + 1, con, rng), token
        return (logits, pool_k, pool_v, lengths + 1, con), token

    init = (first_logits, pool_k, pool_v, lengths, constraint)
    if sampled:
        init = init + (key,)

    if eos_id is None:
        carry, tokens = lax.scan(step, init, jnp.arange(num_steps))
        logits, pool_k, pool_v, lengths, constraint = carry[:5]
        return tokens.T, logits, pool_k, pool_v, lengths, constraint

    tokens, final = _eos_while_loop(
        slots, num_steps, eos_id, budget, init, step
    )
    logits, pool_k, pool_v, lengths, constraint = final[:5]
    return tokens, logits, pool_k, pool_v, lengths, constraint


__all__ = [
    "DecoderConfig",
    "init_decoder_params",
    "decoder_forward",
    "lm_logits",
    "prefill",
    "decode_step",
    "decode_loop",
    "stack_decoder_layers",
    "quantize_stacked_params",
    "prefill_scan",
    "extend_scan",
    "verify_scan",
    "decode_step_scan",
    "decode_loop_scan",
]
