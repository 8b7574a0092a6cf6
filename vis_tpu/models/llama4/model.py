"""Llama-4 forward passes: interleaved dense/MoE decoder + pixel-shuffle ViT.

TPU-native equivalent of the reference auditor's PRIMARY model family
(reference src/agents/vlm_auditor.py:34-56 tries Llama-4-Maverick before the
Llama-3.2 fallback; the fallback lives in models/llama/mllama.py).

Architecture facts this module pins down (HF Llama4 parity, verified by
tests/test_models_llama4.py golden tests):

- Rotary is INTERLEAVED (adjacent pairs rotated as complex numbers), unlike
  the half-split layout of Llama-3/Qwen; every `nope_interval`-th layer has
  no rotary at all and instead scales queries by
  ``log1p(floor((pos+1)/floor_scale)) * attn_scale + 1`` (attention
  temperature tuning).
- RoPE layers use CHUNKED causal attention (block-diagonal chunks of
  `attention_chunk_size` on absolute positions); NoPE layers attend fully.
- QK L2-norm (weightless RMS) after rotary, on RoPE layers only.
- MoE layers route with sigmoid(top-k) scores applied to the expert INPUT
  (unselected experts receive exactly-zero input, so computing them is a
  no-op numerically — the dense-dispatch einsum below is bit-equal to a
  gather-dispatch) and always add a shared swiglu expert.
- Expert weights keep their native stacked layout (gate_up [E, H, 2I],
  down [E, I, H]): the leading expert axis is the EP sharding axis — see
  parallel/sharding.shard_llama4_params.
"""

from __future__ import annotations

from typing import Any, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vis_tpu.models.common.layers import (
    KVCache,
    attention_scores,
    embed,
    layer_norm,
    linear,
    rms_norm,
    rope_frequencies,
    swiglu_mlp,
)
from vis_tpu.models.llama4.config import (
    Llama4Config,
    Llama4TextConfig,
    Llama4VisionConfig,
)

Params = Any


# ---------------------------------------------------------------------------
# Rotary (interleaved / complex form) + QK norm
# ---------------------------------------------------------------------------

def rope_angles(
    positions: jnp.ndarray, head_dim: int, theta: float,
    rope_scaling=None,
) -> jnp.ndarray:
    """Per-position rotation angles [..., head_dim//2], f32 (the complex
    phase HF builds as freqs_cis)."""
    inv_freq = rope_frequencies(head_dim, theta, rope_scaling)
    return positions.astype(jnp.float32)[..., None] * inv_freq


def apply_rope_interleaved(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate ADJACENT element pairs (x0,x1),(x2,x3),... by the per-pair
    angle — HF llama4's view_as_complex layout, NOT the half-split rotate.

    x: [..., seq, heads, head_dim]; cos/sin: [..., seq, head_dim//2]
    (broadcast over heads)."""
    x32 = x.astype(jnp.float32)
    xe = x32[..., 0::2]
    xo = x32[..., 1::2]
    cos = cos[..., :, None, :]
    sin = sin[..., :, None, :]
    out_e = xe * cos - xo * sin
    out_o = xe * sin + xo * cos
    return jnp.stack([out_e, out_o], axis=-1).reshape(x.shape).astype(x.dtype)


def l2_norm(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Weightless RMS norm (HF Llama4TextL2Norm), f32 math."""
    x32 = x.astype(jnp.float32)
    return (x32 * jax.lax.rsqrt(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps
    )).astype(x.dtype)


# ---------------------------------------------------------------------------
# MoE feed-forward
# ---------------------------------------------------------------------------

def moe_ffn(tc: Llama4TextConfig, p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid top-k input-scaled MoE + shared expert (HF Llama4TextMoe).

    x: [b, s, H].  Dense dispatch over the stacked expert weights: each
    expert's bmm sees every token, scaled by its (possibly zero) routing
    score.  Zero-input tokens contribute exactly zero (no biases anywhere),
    so this is numerically identical to gather-dispatch while keeping the
    expert axis a plain array dim XLA can shard (EP: gate_up/down are
    sharded on axis 0; the sum over experts below becomes a psum).
    """
    b, s, hidden = x.shape
    flat = x.reshape(-1, hidden)                       # [T, H]
    logits = linear(flat, p["router"])                 # [T, E] (f32->dtype)
    top_vals, top_idx = jax.lax.top_k(logits, tc.top_k)
    mask = jax.nn.one_hot(top_idx, tc.num_experts, dtype=logits.dtype)
    mask = mask.sum(axis=1)                            # [T, E] 0/1
    scores = (jax.nn.sigmoid(logits.astype(jnp.float32))
              .astype(x.dtype)) * mask.astype(x.dtype)
    routed_in = flat[None, :, :] * scores.T[:, :, None]      # [E, T, H]
    gate_up = jnp.einsum(
        "eth,ehi->eti", routed_in, p["gate_up"],
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)                                  # [E, T, 2I]
    inter = gate_up.shape[-1] // 2
    gated = jax.nn.silu(gate_up[..., :inter]) * gate_up[..., inter:]
    routed_out = jnp.einsum(
        "eti,eih->eth", gated, p["down"],
        preferred_element_type=jnp.float32,
    )                                                  # [E, T, H] f32
    routed_sum = routed_out.sum(axis=0).astype(x.dtype)      # [T, H]
    shared = swiglu_mlp(flat, p["shared"])
    return (shared + routed_sum).reshape(b, s, hidden)


# ---------------------------------------------------------------------------
# Text decoder
# ---------------------------------------------------------------------------

def _self_attn(
    tc: Llama4TextConfig, layer: Params, layer_idx: int, x: jnp.ndarray,
    cos: jnp.ndarray, sin: jnp.ndarray, positions: jnp.ndarray,
    use_rope: bool, cache: Optional[KVCache], mask: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    b, s, _ = x.shape
    hd = tc.head_dim
    h = rms_norm(x, layer["input_norm"], tc.rms_norm_eps)
    q = linear(h, layer["q_proj"]).reshape(b, s, tc.num_heads, hd)
    k = linear(h, layer["k_proj"]).reshape(b, s, tc.num_kv_heads, hd)
    v = linear(h, layer["v_proj"]).reshape(b, s, tc.num_kv_heads, hd)
    if use_rope:
        q = apply_rope_interleaved(q, cos, sin)
        k = apply_rope_interleaved(k, cos, sin)
        if tc.use_qk_norm:
            q = l2_norm(q, tc.rms_norm_eps)
            k = l2_norm(k, tc.rms_norm_eps)
    elif tc.attn_temperature_tuning:
        pos = positions.astype(jnp.float32)
        scales = jnp.log1p(
            jnp.floor((pos + 1.0) / tc.floor_scale)
        ) * tc.attn_scale + 1.0                         # [..., s]
        q = (q.astype(jnp.float32)
             * scales[..., :, None, None]).astype(q.dtype)
    if cache is not None:
        from vis_tpu.models.common.layers import decode_kv

        cache = cache.update(layer_idx, k, v)
        k, v = cache.layer(layer_idx)
        k = decode_kv(k, q.dtype, tc.num_kv_heads)
        v = decode_kv(v, q.dtype, tc.num_kv_heads)
    out = attention_scores(q, k, v, mask, scale=hd ** -0.5)
    out = linear(out.reshape(b, s, tc.num_heads * hd), layer["o_proj"])
    x = x + out
    h = rms_norm(x, layer["post_attn_norm"], tc.rms_norm_eps)
    if "moe" in layer:
        h = moe_ffn(tc, layer["moe"], h)
    else:
        h = swiglu_mlp(h, layer["mlp"])
    return x + h, cache


def _chunk_overlay(
    q_pos: jnp.ndarray, k_pos: jnp.ndarray, chunk: int
) -> jnp.ndarray:
    """Additive overlay [-inf where q,k fall in different chunks].

    q_pos: [..., sq]; k_pos: [skv].  Combined with the caller's causal mask
    this reproduces HF's chunked_causal_mask (same floor(pos/chunk) AND
    causal) on absolute positions.
    """
    qc = q_pos[..., :, None] // chunk                 # [..., sq, 1]
    kc = k_pos[None, :] // chunk                      # [1, skv]
    same = qc == kc
    return jnp.where(same, 0.0, -1e30).astype(jnp.float32)[..., None, :, :]


def text_forward(
    config: Llama4Config,
    params: Params,
    input_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    cache: Optional[KVCache] = None,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Decoder over embedded inputs.

    positions: absolute positions, [s] or [b, s] (rope + temperature
    tuning + chunk assignment all use them).  `mask` is the FULL-attention
    additive mask ([b|1, 1, sq, skv]); the chunked variant for RoPE layers
    is derived here by overlaying same-chunk visibility on top of it.
    """
    tc = config.text
    x = input_embeds
    angles = rope_angles(
        positions, tc.head_dim, tc.rope_theta, tc.rope_scaling_dict
    )
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    if cache is not None:
        k_pos = jnp.arange(cache.k.shape[2])
    else:
        k_pos = positions.reshape(-1)
    if mask is not None:
        chunked_mask = mask + _chunk_overlay(
            positions, k_pos, tc.attention_chunk_size
        )
    else:
        chunked_mask = None
    use_rope = tc.use_rope_layers
    for i, layer in enumerate(params["layers"]):
        x, cache = _self_attn(
            tc, layer, i, x, cos, sin, positions, bool(use_rope[i]),
            cache, chunked_mask if use_rope[i] else mask,
        )
    x = rms_norm(x, params["final_norm"], tc.rms_norm_eps)
    if cache is not None:
        cache = cache.advance(jnp.int32(input_embeds.shape[1]))
    return x, cache


def llama4_logits(config: Llama4Config, params: Params,
                  hidden: jnp.ndarray) -> jnp.ndarray:
    tc = config.text
    table = (params["embed_tokens"] if tc.tie_word_embeddings
             else params["lm_head"])
    return jnp.einsum(
        "bsh,vh->bsv", hidden, table, preferred_element_type=jnp.float32
    )[..., : tc.vocab_size]


# ---------------------------------------------------------------------------
# Vision tower (pixel-shuffle ViT)
# ---------------------------------------------------------------------------

def vision_rope_angles(vc: Llama4VisionConfig) -> np.ndarray:
    """[num_patches + 1, head_dim//2] 2D rotary angles; CLS row (last) = 0.

    Per position the first half of the angle vector comes from the x
    coordinate and the second half from y (HF Llama4VisionRotaryEmbedding's
    repeat_interleave(2) followed by [..., ::2] reduces to exactly this).
    """
    idx = vc.grid
    head_dim = vc.hidden_size // vc.num_heads
    freq_dim = head_dim // 2
    n_freq = freq_dim // 2
    pos = np.arange(idx * idx)
    fx = (pos % idx + 1).astype(np.float32)
    fy = (pos // idx + 1).astype(np.float32)
    rope_freq = 1.0 / (
        vc.rope_theta ** (np.arange(0, freq_dim, 2)[:n_freq] / freq_dim)
    )
    angles = np.concatenate(
        [fx[:, None] * rope_freq[None, :], fy[:, None] * rope_freq[None, :]],
        axis=-1,
    )  # [P, head_dim//2]
    return np.concatenate(
        [angles, np.zeros((1, angles.shape[1]), np.float32)], axis=0
    )


def pixel_shuffle(x: jnp.ndarray, ratio: float) -> jnp.ndarray:
    """[N, P, C] -> [N, P*ratio^2, C/ratio^2] (HF llama4 pixel_shuffle)."""
    n, p, c = x.shape
    side = int(np.sqrt(p))
    x = x.reshape(n, side, side, c)
    x = x.reshape(n, side, int(side * ratio), int(c / ratio))
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(
        n, int(side * ratio), int(side * ratio), int(c / (ratio * ratio))
    )
    x = jnp.transpose(x, (0, 2, 1, 3))
    return x.reshape(n, -1, x.shape[-1])


def _vision_layer(
    vc: Llama4VisionConfig, block: Params, x: jnp.ndarray,
    cos: jnp.ndarray, sin: jnp.ndarray,
) -> jnp.ndarray:
    n, s, _ = x.shape
    heads = vc.num_heads
    hd = vc.hidden_size // heads
    h = layer_norm(x, block["input_norm"], block["input_norm_bias"])
    q = linear(h, block["q_proj"], block["q_bias"]).reshape(n, s, heads, hd)
    k = linear(h, block["k_proj"], block["k_bias"]).reshape(n, s, heads, hd)
    v = linear(h, block["v_proj"], block["v_bias"]).reshape(n, s, heads, hd)
    q = apply_rope_interleaved(q, cos, sin)
    k = apply_rope_interleaved(k, cos, sin)
    out = attention_scores(q, k, v, None, scale=hd ** -0.5)
    out = linear(out.reshape(n, s, heads * hd), block["o_proj"],
                 block["o_bias"])
    x = x + out
    h = layer_norm(x, block["post_attn_norm"], block["post_attn_norm_bias"])
    h = linear(h, block["fc1"], block["fc1_bias"])
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    h = linear(h, block["fc2"], block["fc2_bias"])
    return x + h


def vision_forward(
    config: Llama4Config, params: Params, pixel_values: jnp.ndarray
) -> jnp.ndarray:
    """pixel_values [tiles, 3, H, W] (normalized f32) -> image features
    [tiles, tokens_per_tile, vision_output_dim] (HF Llama4VisionModel
    boundary: post-adapter, pre-projector; project_vision() maps them into
    the text residual stream)."""
    vc = config.vision
    p = vc.patch_size
    n, c, hh, ww = pixel_values.shape
    gh, gw = hh // p, ww // p
    x = pixel_values.astype(vc.dtype).reshape(n, c, gh, p, gw, p)
    # torch.nn.Unfold ordering: per block the feature vector is
    # channel-major (c, ki, kj).
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(n, gh * gw, c * p * p)
    x = linear(x, params["patch_embed"])                       # [N, P, hid]
    cls = jnp.broadcast_to(
        params["class_embedding"], (n, 1, vc.hidden_size)
    ).astype(x.dtype)
    x = jnp.concatenate([x, cls], axis=1)                      # CLS LAST
    x = x + params["pos_embedding"].astype(x.dtype)
    x = layer_norm(x, params["ln_pre"], params["ln_pre_bias"])
    angles = jnp.asarray(vision_rope_angles(vc))
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    for block in params["layers"]:
        x = _vision_layer(vc, block, x, cos, sin)
    x = layer_norm(x, params["ln_post"], params["ln_post_bias"])
    x = x[:, :-1, :]                                           # drop CLS
    x = pixel_shuffle(x, vc.pixel_shuffle_ratio)
    h = linear(x, params["adapter_fc1"])
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    h = linear(h, params["adapter_fc2"])
    return jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)


def project_vision(config: Llama4Config, params: Params,
                   features: jnp.ndarray) -> jnp.ndarray:
    """Multi-modal projector: vision features -> text residual stream."""
    return linear(features.astype(config.text.dtype), params["projector"])


# ---------------------------------------------------------------------------
# Init + HF conversion
# ---------------------------------------------------------------------------

def init_params(config: Llama4Config, key: jax.Array,
                scale: float = 0.02) -> Params:
    """Random init of the full Llama-4 pytree (dev profiles / tests)."""
    tc, vc = config.text, config.vision
    keys = iter(jax.random.split(key, 8192))

    def norm(shape, dtype):
        return (scale * jax.random.normal(next(keys), shape)).astype(dtype)

    def zeros(shape, dtype):
        return jnp.zeros(shape, dtype)

    def ones(shape, dtype):
        return jnp.ones(shape, dtype)

    hd = tc.head_dim
    layers: List[Params] = []
    moe_set = set(config.text.moe_layers)
    for i in range(tc.num_layers):
        layer: Params = {
            "input_norm": ones((tc.hidden_size,), tc.dtype),
            "post_attn_norm": ones((tc.hidden_size,), tc.dtype),
            "q_proj": norm((tc.num_heads * hd, tc.hidden_size), tc.dtype),
            "k_proj": norm((tc.num_kv_heads * hd, tc.hidden_size), tc.dtype),
            "v_proj": norm((tc.num_kv_heads * hd, tc.hidden_size), tc.dtype),
            "o_proj": norm((tc.hidden_size, tc.num_heads * hd), tc.dtype),
        }
        if i in moe_set:
            layer["moe"] = {
                "router": norm((tc.num_experts, tc.hidden_size), tc.dtype),
                "gate_up": norm(
                    (tc.num_experts, tc.hidden_size,
                     2 * tc.intermediate_size), tc.dtype),
                "down": norm(
                    (tc.num_experts, tc.intermediate_size, tc.hidden_size),
                    tc.dtype),
                "shared": {
                    "gate_proj": norm(
                        (tc.intermediate_size, tc.hidden_size), tc.dtype),
                    "up_proj": norm(
                        (tc.intermediate_size, tc.hidden_size), tc.dtype),
                    "down_proj": norm(
                        (tc.hidden_size, tc.intermediate_size), tc.dtype),
                },
            }
        else:
            layer["mlp"] = {
                "gate_proj": norm(
                    (tc.intermediate_size_mlp, tc.hidden_size), tc.dtype),
                "up_proj": norm(
                    (tc.intermediate_size_mlp, tc.hidden_size), tc.dtype),
                "down_proj": norm(
                    (tc.hidden_size, tc.intermediate_size_mlp), tc.dtype),
            }
        layers.append(layer)

    params: Params = {
        "embed_tokens": norm((tc.vocab_size, tc.hidden_size), tc.dtype),
        "layers": layers,
        "final_norm": ones((tc.hidden_size,), tc.dtype),
    }
    if not tc.tie_word_embeddings:
        params["lm_head"] = norm((tc.vocab_size, tc.hidden_size), tc.dtype)

    vhd = vc.hidden_size
    vision_layers = []
    for _ in range(vc.num_layers):
        vision_layers.append({
            "input_norm": ones((vhd,), vc.dtype),
            "input_norm_bias": zeros((vhd,), vc.dtype),
            "post_attn_norm": ones((vhd,), vc.dtype),
            "post_attn_norm_bias": zeros((vhd,), vc.dtype),
            "q_proj": norm((vhd, vhd), vc.dtype),
            "q_bias": zeros((vhd,), vc.dtype),
            "k_proj": norm((vhd, vhd), vc.dtype),
            "k_bias": zeros((vhd,), vc.dtype),
            "v_proj": norm((vhd, vhd), vc.dtype),
            "v_bias": zeros((vhd,), vc.dtype),
            "o_proj": norm((vhd, vhd), vc.dtype),
            "o_bias": zeros((vhd,), vc.dtype),
            "fc1": norm((vc.intermediate_size, vhd), vc.dtype),
            "fc1_bias": zeros((vc.intermediate_size,), vc.dtype),
            "fc2": norm((vhd, vc.intermediate_size), vc.dtype),
            "fc2_bias": zeros((vhd,), vc.dtype),
        })
    r2 = vc.pixel_shuffle_ratio ** 2
    params["vision"] = {
        "patch_embed": norm((vhd, 3 * vc.patch_size ** 2), vc.dtype),
        "class_embedding": norm((vhd,), vc.dtype),
        "pos_embedding": norm((vc.num_patches + 1, vhd), vc.dtype),
        "ln_pre": ones((vhd,), vc.dtype),
        "ln_pre_bias": zeros((vhd,), vc.dtype),
        "ln_post": ones((vhd,), vc.dtype),
        "ln_post_bias": zeros((vhd,), vc.dtype),
        "layers": vision_layers,
        "adapter_fc1": norm(
            (vc.projector_input_dim, int(vhd / r2)), vc.dtype),
        "adapter_fc2": norm(
            (vc.projector_output_dim, vc.projector_output_dim), vc.dtype),
        "projector": norm(
            (tc.hidden_size, vc.vision_output_dim), tc.dtype),
    }
    return params


def _np(tensor) -> np.ndarray:
    if hasattr(tensor, "detach"):
        return tensor.detach().to("cpu").float().numpy()
    return np.asarray(tensor)


def convert_hf_state_dict(state_dict: Mapping[str, Any],
                          config: Llama4Config) -> Params:
    """Map an HF Llama4ForConditionalGeneration (or Llama4ForCausalLM)
    state dict onto our pytree.  Accepts both the full-VLM prefix
    (language_model.model. / vision_model.) and the text-only prefix."""
    tc, vc = config.text, config.vision
    sd = dict(state_dict)

    def pick(*names):
        for name in names:
            if name in sd:
                return _np(sd[name])
        raise KeyError(f"none of {names} in state dict")

    def maybe(*names):
        try:
            return pick(*names)
        except KeyError:
            return None

    def t(name_suffix, i=None):
        """Text-decoder tensor at layer i under either prefix."""
        stems = ("language_model.model.", "model.", "language_model.")
        names = []
        for stem in stems:
            if i is None:
                names.append(f"{stem}{name_suffix}")
            else:
                names.append(f"{stem}layers.{i}.{name_suffix}")
        return pick(*names)

    cast_t = lambda a: jnp.asarray(a, tc.dtype)  # noqa: E731
    layers: List[Params] = []
    moe_set = set(tc.moe_layers)
    for i in range(tc.num_layers):
        layer: Params = {
            "input_norm": cast_t(t("input_layernorm.weight", i)),
            "post_attn_norm": cast_t(t("post_attention_layernorm.weight", i)),
            "q_proj": cast_t(t("self_attn.q_proj.weight", i)),
            "k_proj": cast_t(t("self_attn.k_proj.weight", i)),
            "v_proj": cast_t(t("self_attn.v_proj.weight", i)),
            "o_proj": cast_t(t("self_attn.o_proj.weight", i)),
        }
        if i in moe_set:
            layer["moe"] = {
                "router": cast_t(t("feed_forward.router.weight", i)),
                "gate_up": cast_t(t("feed_forward.experts.gate_up_proj", i)),
                "down": cast_t(t("feed_forward.experts.down_proj", i)),
                "shared": {
                    "gate_proj": cast_t(
                        t("feed_forward.shared_expert.gate_proj.weight", i)),
                    "up_proj": cast_t(
                        t("feed_forward.shared_expert.up_proj.weight", i)),
                    "down_proj": cast_t(
                        t("feed_forward.shared_expert.down_proj.weight", i)),
                },
            }
        else:
            layer["mlp"] = {
                "gate_proj": cast_t(t("feed_forward.gate_proj.weight", i)),
                "up_proj": cast_t(t("feed_forward.up_proj.weight", i)),
                "down_proj": cast_t(t("feed_forward.down_proj.weight", i)),
            }
        layers.append(layer)

    params: Params = {
        "embed_tokens": cast_t(t("embed_tokens.weight")),
        "layers": layers,
        "final_norm": cast_t(t("norm.weight")),
    }
    head = maybe("language_model.lm_head.weight", "lm_head.weight")
    if head is not None and not tc.tie_word_embeddings:
        params["lm_head"] = cast_t(head)

    if not any(k.startswith("vision_model.") for k in sd):
        return params

    cast_v = lambda a: jnp.asarray(a, vc.dtype)  # noqa: E731
    vision_layers = []
    for i in range(vc.num_layers):
        stem = f"vision_model.model.layers.{i}."
        vision_layers.append({
            "input_norm": cast_v(pick(stem + "input_layernorm.weight")),
            "input_norm_bias": cast_v(pick(stem + "input_layernorm.bias")),
            "post_attn_norm": cast_v(
                pick(stem + "post_attention_layernorm.weight")),
            "post_attn_norm_bias": cast_v(
                pick(stem + "post_attention_layernorm.bias")),
            "q_proj": cast_v(pick(stem + "self_attn.q_proj.weight")),
            "q_bias": cast_v(pick(stem + "self_attn.q_proj.bias")),
            "k_proj": cast_v(pick(stem + "self_attn.k_proj.weight")),
            "k_bias": cast_v(pick(stem + "self_attn.k_proj.bias")),
            "v_proj": cast_v(pick(stem + "self_attn.v_proj.weight")),
            "v_bias": cast_v(pick(stem + "self_attn.v_proj.bias")),
            "o_proj": cast_v(pick(stem + "self_attn.o_proj.weight")),
            "o_bias": cast_v(pick(stem + "self_attn.o_proj.bias")),
            "fc1": cast_v(pick(stem + "mlp.fc1.weight")),
            "fc1_bias": cast_v(pick(stem + "mlp.fc1.bias")),
            "fc2": cast_v(pick(stem + "mlp.fc2.weight")),
            "fc2_bias": cast_v(pick(stem + "mlp.fc2.bias")),
        })
    params["vision"] = {
        "patch_embed": cast_v(
            pick("vision_model.patch_embedding.linear.weight")),
        "class_embedding": cast_v(pick("vision_model.class_embedding")),
        "pos_embedding": cast_v(
            pick("vision_model.positional_embedding_vlm")),
        "ln_pre": cast_v(pick("vision_model.layernorm_pre.weight")),
        "ln_pre_bias": cast_v(pick("vision_model.layernorm_pre.bias")),
        "ln_post": cast_v(pick("vision_model.layernorm_post.weight")),
        "ln_post_bias": cast_v(pick("vision_model.layernorm_post.bias")),
        "layers": vision_layers,
        "adapter_fc1": cast_v(
            pick("vision_model.vision_adapter.mlp.fc1.weight")),
        "adapter_fc2": cast_v(
            pick("vision_model.vision_adapter.mlp.fc2.weight")),
        "projector": cast_t(pick("multi_modal_projector.linear_1.weight")),
    }
    return params


__all__ = [
    "apply_rope_interleaved",
    "convert_hf_state_dict",
    "init_params",
    "l2_norm",
    "llama4_logits",
    "moe_ffn",
    "pixel_shuffle",
    "project_vision",
    "text_forward",
    "vision_forward",
    "vision_rope_angles",
]
