"""Parameter and cache sharding rules (tensor parallelism over the mesh).

Megatron-style TP layout expressed as NamedSharding over the ("data",
"model") mesh — XLA inserts the all-reduce after o_proj / down_proj
(SURVEY.md §5.8: jax.sharding + pjit replaces the reference's absent
distributed backend):

  decoder  q/k/v_proj  [heads*hd, hidden]   -> P("model", None)   column
           o_proj      [hidden, heads*hd]   -> P(None, "model")   row
           gate/up     [inter, hidden]      -> P("model", None)
           down        [hidden, inter]      -> P(None, "model")
           embed/lm_head [vocab, hidden]    -> P("model", None)   vocab shard
           norms                            -> replicated
  vision   qkv [3d, d] -> P("model", None); proj row-sharded; MLP likewise
  KV cache [layers, b, len, kv_heads, hd]   -> P(None, "data", None, "model")
           when kv_heads divides the model axis; else replicated heads.

Apply with shard_params(); jit then runs SPMD with no code changes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vis_tpu.parallel.mesh import MODEL_AXIS


def _put(x, mesh: Mesh, spec: P):
    """device_put with a sharding, falling back to replication when the
    dimension does not divide the mesh axis.  Int8 QuantizedWeight leaves
    shard like their q tensor; the per-output-row scales drop the trailing
    (input) axis of the spec.  Packed int4 QuantizedWeight4 scales share
    the q spec on every leading axis but force the trailing axis to None:
    that axis is the size-2 lo/hi scale pair, and on row-sharded
    projections (o_proj/down_proj, spec ending in MODEL_AXIS) reusing the
    q spec would split lo from hi across a tp=2 model axis even though
    every device's packed-nibble shard needs BOTH halves' scales."""
    from vis_tpu.ops.quantized import QuantizedWeight, QuantizedWeight4

    if isinstance(x, QuantizedWeight):
        return QuantizedWeight(
            q=_put(x.q, mesh, spec),
            scale=_put(x.scale, mesh, P(*tuple(spec)[:-1])),
        )
    if isinstance(x, QuantizedWeight4):
        return QuantizedWeight4(
            q=_put(x.q, mesh, spec),
            scale=_put(x.scale, mesh, P(*tuple(spec)[:-1], None)),
        )
    if isinstance(x, jax.ShapeDtypeStruct):
        # Abstract leaf (AOT lowering at target scale without materializing
        # the weights — tools/tp8_projection.py): attach the sharding to the
        # ShapeDtypeStruct, mirroring device_put's replicate-on-indivisible
        # fallback explicitly since no placement happens to raise for us.
        if not _spec_fits(x.shape, mesh, spec):
            spec = P()
        return jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, spec)
        )
    try:
        return jax.device_put(x, NamedSharding(mesh, spec))
    except ValueError:
        return jax.device_put(x, NamedSharding(mesh, P()))


def _spec_fits(shape, mesh: Mesh, spec: P) -> bool:
    """True when every sharded dim divides its mesh-axes product."""
    for dim, s in zip(shape, tuple(spec)):
        if s is None:
            continue
        axes = s if isinstance(s, tuple) else (s,)
        n = 1
        for a in axes:
            n *= mesh.shape[a]
        if n and dim % n:
            return False
    return True


def _divisible(dim: int, mesh: Mesh, axis: str) -> bool:
    return dim % mesh.shape[axis] == 0


def shard_decoder_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    out["embed_tokens"] = _put(params["embed_tokens"], mesh, P(MODEL_AXIS, None))
    out["final_norm"] = _put(params["final_norm"], mesh, P())
    if "lm_head" in params:
        out["lm_head"] = _put(params["lm_head"], mesh, P(MODEL_AXIS, None))
    out["layers"] = []
    for layer in params["layers"]:
        sharded = {
            "input_norm": _put(layer["input_norm"], mesh, P()),
            "post_attn_norm": _put(layer["post_attn_norm"], mesh, P()),
            "q_proj": _put(layer["q_proj"], mesh, P(MODEL_AXIS, None)),
            "k_proj": _put(layer["k_proj"], mesh, P(MODEL_AXIS, None)),
            "v_proj": _put(layer["v_proj"], mesh, P(MODEL_AXIS, None)),
            "o_proj": _put(layer["o_proj"], mesh, P(None, MODEL_AXIS)),
            "mlp": {
                "gate_proj": _put(layer["mlp"]["gate_proj"], mesh, P(MODEL_AXIS, None)),
                "up_proj": _put(layer["mlp"]["up_proj"], mesh, P(MODEL_AXIS, None)),
                "down_proj": _put(layer["mlp"]["down_proj"], mesh, P(None, MODEL_AXIS)),
            },
        }
        for bias in ("q_bias", "k_bias", "v_bias"):
            if bias in layer:
                sharded[bias] = _put(layer[bias], mesh, P(MODEL_AXIS))
        out["layers"].append(sharded)
    return out


def shard_vision_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "patch_embed": _put(params["patch_embed"], mesh, P(MODEL_AXIS, None)),
        "merger": {
            "ln_q": _put(params["merger"]["ln_q"], mesh, P()),
            "ln_q_bias": _put(params["merger"]["ln_q_bias"], mesh, P()),
            "fc1": _put(params["merger"]["fc1"], mesh, P(MODEL_AXIS, None)),
            "fc1_bias": _put(params["merger"]["fc1_bias"], mesh, P(MODEL_AXIS)),
            "fc2": _put(params["merger"]["fc2"], mesh, P(None, MODEL_AXIS)),
            "fc2_bias": _put(params["merger"]["fc2_bias"], mesh, P()),
        },
        "blocks": [],
    }
    for block in params["blocks"]:
        out["blocks"].append({
            "norm1": _put(block["norm1"], mesh, P()),
            "norm1_bias": _put(block["norm1_bias"], mesh, P()),
            "norm2": _put(block["norm2"], mesh, P()),
            "norm2_bias": _put(block["norm2_bias"], mesh, P()),
            "qkv": _put(block["qkv"], mesh, P(MODEL_AXIS, None)),
            "qkv_bias": _put(block["qkv_bias"], mesh, P(MODEL_AXIS)),
            "proj": _put(block["proj"], mesh, P(None, MODEL_AXIS)),
            "proj_bias": _put(block["proj_bias"], mesh, P()),
            "mlp": {
                "fc1": _put(block["mlp"]["fc1"], mesh, P(MODEL_AXIS, None)),
                "fc1_bias": _put(block["mlp"]["fc1_bias"], mesh, P(MODEL_AXIS)),
                "fc2": _put(block["mlp"]["fc2"], mesh, P(None, MODEL_AXIS)),
                "fc2_bias": _put(block["mlp"]["fc2_bias"], mesh, P()),
            },
        })
    return out


def shard_qwen2vl_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    return {
        "vision": shard_vision_params(params["vision"], mesh),
        "text": shard_decoder_params(params["text"], mesh),
    }


def shard_stacked_decoder_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """TP-shard a scan-layout decoder pytree (layers stacked on a leading
    [L, ...] axis — the layer axis is never partitioned)."""
    out: Dict[str, Any] = {
        "embed_tokens": _put(params["embed_tokens"], mesh, P(MODEL_AXIS, None)),
        "final_norm": _put(params["final_norm"], mesh, P()),
    }
    if "lm_head" in params:
        out["lm_head"] = _put(params["lm_head"], mesh, P(MODEL_AXIS, None))

    stacked = params["layers_stacked"]
    sharded = {
        "input_norm": _put(stacked["input_norm"], mesh, P()),
        "post_attn_norm": _put(stacked["post_attn_norm"], mesh, P()),
        "q_proj": _put(stacked["q_proj"], mesh, P(None, MODEL_AXIS, None)),
        "k_proj": _put(stacked["k_proj"], mesh, P(None, MODEL_AXIS, None)),
        "v_proj": _put(stacked["v_proj"], mesh, P(None, MODEL_AXIS, None)),
        "o_proj": _put(stacked["o_proj"], mesh, P(None, None, MODEL_AXIS)),
        "mlp": {
            "gate_proj": _put(stacked["mlp"]["gate_proj"], mesh,
                              P(None, MODEL_AXIS, None)),
            "up_proj": _put(stacked["mlp"]["up_proj"], mesh,
                            P(None, MODEL_AXIS, None)),
            "down_proj": _put(stacked["mlp"]["down_proj"], mesh,
                              P(None, None, MODEL_AXIS)),
        },
    }
    for bias in ("q_bias", "k_bias", "v_bias"):
        if bias in stacked:
            sharded[bias] = _put(stacked[bias], mesh, P(None, MODEL_AXIS))
    out["layers_stacked"] = sharded
    return out


def replicate_tree(params: Any, mesh: Mesh) -> Any:
    """device_put every leaf fully replicated over the mesh."""
    return jax.tree_util.tree_map(lambda x: _put(x, mesh, P()), params)


def shard_mllama_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """TP rules for the Mllama auditor (loop-path per-layer params).

    Text decoder layers (self AND cross attention — identical projection
    shapes) shard Megatron-style like shard_decoder_params; cross-layer
    q/k-norms and tanh gates are tiny and stay replicated, as do the vision
    tower and the multimodal projector (vision is a per-request prefill cost,
    the decode loop only reads the text stack)."""
    text_in = params["text"]
    text: Dict[str, Any] = {
        "embed_tokens": _put(text_in["embed_tokens"], mesh, P(MODEL_AXIS, None)),
        "final_norm": _put(text_in["final_norm"], mesh, P()),
    }
    if "lm_head" in text_in:
        text["lm_head"] = _put(text_in["lm_head"], mesh, P(MODEL_AXIS, None))
    text["layers"] = []
    for layer in text_in["layers"]:
        sharded = {
            "q_proj": _put(layer["q_proj"], mesh, P(MODEL_AXIS, None)),
            "k_proj": _put(layer["k_proj"], mesh, P(MODEL_AXIS, None)),
            "v_proj": _put(layer["v_proj"], mesh, P(MODEL_AXIS, None)),
            "o_proj": _put(layer["o_proj"], mesh, P(None, MODEL_AXIS)),
            "mlp": {
                "gate_proj": _put(layer["mlp"]["gate_proj"], mesh, P(MODEL_AXIS, None)),
                "up_proj": _put(layer["mlp"]["up_proj"], mesh, P(MODEL_AXIS, None)),
                "down_proj": _put(layer["mlp"]["down_proj"], mesh, P(None, MODEL_AXIS)),
            },
        }
        for name in ("input_norm", "post_attn_norm", "q_norm", "k_norm",
                     "gate_attn", "gate_mlp"):
            if name in layer:
                sharded[name] = _put(layer[name], mesh, P())
        text["layers"].append(sharded)
    out = {
        k: (replicate_tree(v, mesh) if k != "text" else None)
        for k, v in params.items()
    }
    out["text"] = text
    return out


def shard_llama4_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """TP + EP rules for the Llama-4 MoE auditor.

    Attention and dense-MLP layers shard Megatron-style over "model" (same
    as shard_decoder_params).  MoE layers use EXPERT parallelism on the same
    axis: the stacked expert tensors (gate_up [E, H, 2I], down [E, I, H])
    are sharded on the leading expert dim, so each device runs its E/D local
    experts over the (replicated) token batch and moe_ffn's sum over the
    expert axis becomes the psum that combines them — dense-dispatch EP with
    zero resharding of activations.  Routers stay replicated (tiny, and
    every device needs all scores to scale its local experts' inputs); the
    shared expert is TP like a dense MLP, so its down_proj all-reduce fuses
    with the EP psum.  Vision tower + projector stay replicated (prefill
    cost, not in the decode loop)."""
    out: Dict[str, Any] = {
        "embed_tokens": _put(params["embed_tokens"], mesh, P(MODEL_AXIS, None)),
        "final_norm": _put(params["final_norm"], mesh, P()),
    }
    if "lm_head" in params:
        out["lm_head"] = _put(params["lm_head"], mesh, P(MODEL_AXIS, None))
    out["layers"] = []
    for layer in params["layers"]:
        sharded = {
            "input_norm": _put(layer["input_norm"], mesh, P()),
            "post_attn_norm": _put(layer["post_attn_norm"], mesh, P()),
            "q_proj": _put(layer["q_proj"], mesh, P(MODEL_AXIS, None)),
            "k_proj": _put(layer["k_proj"], mesh, P(MODEL_AXIS, None)),
            "v_proj": _put(layer["v_proj"], mesh, P(MODEL_AXIS, None)),
            "o_proj": _put(layer["o_proj"], mesh, P(None, MODEL_AXIS)),
        }
        if "moe" in layer:
            moe = layer["moe"]
            sharded["moe"] = {
                "router": _put(moe["router"], mesh, P()),
                "gate_up": _put(moe["gate_up"], mesh, P(MODEL_AXIS, None, None)),
                "down": _put(moe["down"], mesh, P(MODEL_AXIS, None, None)),
                "shared": {
                    "gate_proj": _put(moe["shared"]["gate_proj"], mesh,
                                      P(MODEL_AXIS, None)),
                    "up_proj": _put(moe["shared"]["up_proj"], mesh,
                                    P(MODEL_AXIS, None)),
                    "down_proj": _put(moe["shared"]["down_proj"], mesh,
                                      P(None, MODEL_AXIS)),
                },
            }
        else:
            sharded["mlp"] = {
                "gate_proj": _put(layer["mlp"]["gate_proj"], mesh,
                                  P(MODEL_AXIS, None)),
                "up_proj": _put(layer["mlp"]["up_proj"], mesh,
                                P(MODEL_AXIS, None)),
                "down_proj": _put(layer["mlp"]["down_proj"], mesh,
                                  P(None, MODEL_AXIS)),
            }
        out["layers"].append(sharded)
    if "vision" in params:
        out["vision"] = replicate_tree(params["vision"], mesh)
    return out


def kv_cache_sharding(mesh: Mesh, kv_heads: int) -> NamedSharding:
    """[layers, batch, len, kv_heads, head_dim] — heads over "model" when
    divisible, batch over "data"."""
    if _divisible(kv_heads, mesh, MODEL_AXIS):
        return NamedSharding(mesh, P(None, "data", None, MODEL_AXIS, None))
    return NamedSharding(mesh, P(None, "data", None, None, None))


__all__ = [
    "shard_decoder_params",
    "shard_stacked_decoder_params",
    "shard_vision_params",
    "shard_qwen2vl_params",
    "shard_llama4_params",
    "shard_mllama_params",
    "replicate_tree",
    "kv_cache_sharding",
]
