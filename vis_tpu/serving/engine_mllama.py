"""Mllama serving engine: tiled vision encode + cross-attention decode.

The auditor-role fallback engine (heterogeneous second model, SURVEY.md §7
step 5): same InferenceBackend contract as the Qwen2-VL engine, different
execution shape — cross-attention K/V are computed once from the vision
features at prefill and stay resident for the whole decode (threaded as the
loop engine's `aux`); only self-attention layers use the KV cache.

Decode orchestration lives in serving/loop_engine.py (shared with the
Llama-4 MoE engine); this module is only the Mllama-specific forward
bindings, vision preprocessing, and parameter preparation.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Any, List, Optional

import jax
import jax.numpy as jnp

from vis_tpu.models.common.layers import embed, kv_cache_dtype
from vis_tpu.models.llama.mllama import (
    MllamaConfig,
    compute_cross_kv,
    mllama_logits,
    text_forward,
    vision_forward,
)
from vis_tpu.ops.preprocess_mllama import preprocess_image_mllama
from vis_tpu.serving.loop_engine import LoopDecodeEngine, LoopEngineBackend
from vis_tpu.serving.tokenizer import Tokenizer
from vis_tpu.utils.config import config as app_config
from vis_tpu.utils.logger import setup_logger, span

logger = setup_logger(__name__, level="INFO", component="ENGINE_MLLAMA")


class MllamaEngine(LoopDecodeEngine):
    """Single-request Mllama engine with chunked greedy decode."""

    span_prefix = "mllama"

    def __init__(
        self,
        name: str,
        config: MllamaConfig,
        params: Any,
        tokenizer: Tokenizer,
        max_cache_tokens: Optional[int] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        role: Optional[str] = None,
    ):
        self.config = config
        if mesh is None and not any(
            "qkv_proj" in layer for layer in params["text"]["layers"]
        ):
            # Single-device runs fuse Q/K/V and gate/up — the same fused
            # layout the Llama/Qwen stacks use (measured latency-neutral
            # at 11B int4; see fuse_mllama_projections docstring).  The
            # dev-target build path fuses under eval_shape already (this
            # is a no-op there); real checkpoints fuse here, before
            # quantization.  TP meshes keep projections separate for
            # clean row-sharding.
            from vis_tpu.models.llama.mllama import fuse_mllama_projections

            params = fuse_mllama_projections(config, params)
        if app_config.quantization in ("int8", "int4"):
            from vis_tpu.models.llama.mllama import quantize_mllama_params
            from vis_tpu.serving.engine import _vocab_quant_mode

            # Per-role vocab override ({ROLE}_VOCAB_QUANTIZATION): the role
            # comes from build_engine — an Mllama checkpoint can back the
            # inspector too, so hardcoding the auditor override here would
            # apply the wrong engine's HBM-budget shaping.  Defaults to the
            # auditor (the flagship assignment) when no role is threaded.
            params = quantize_mllama_params(
                params, mode=app_config.quantization,
                vocab_mode=_vocab_quant_mode(role or "auditor"),
            )
            logger.info(
                f"{name}: {app_config.quantization} weight-only "
                "quantization applied"
            )
        if mesh is not None:
            # Tensor-parallel text stack over the mesh's "model" axis; the
            # same jit functions then run SPMD (XLA inserts the collectives).
            from vis_tpu.parallel.sharding import shard_mllama_params

            params = shard_mllama_params(params, mesh)
            logger.info(f"{name}: TP-sharded over mesh {dict(mesh.shape)}")
        super().__init__(name, params, tokenizer, max_cache_tokens, mesh)
        self._vision_jit = jax.jit(partial(vision_forward, config.vision))
        self._cross_kv_jit = jax.jit(partial(compute_cross_kv, config))

    # -- LoopDecodeEngine contract ---------------------------------------
    def _model_forward(self, params, embeds, positions, aux, cache, mask):
        return text_forward(
            self.config, params, embeds, positions, aux, cache, mask
        )

    def _model_logits(self, params, hidden):
        return mllama_logits(self.config, params, hidden)

    def _embed_tokens(self, params, token_ids):
        return embed(token_ids, params["text"]["embed_tokens"])

    def _prepare_aux(self, image_path: Optional[Path]):
        """Tiled vision encode -> per-cross-layer K/V (resident for the
        whole decode)."""
        if image_path is None:
            return None
        with span("mllama.preprocess", logger):
            if app_config.device_preprocess:
                # Resize/pad/normalize/tile on the MXU; only the shared
                # u8 frame crosses the tunnel (frame_cache — one decode
                # + one transfer per inspection across BOTH engines).
                from vis_tpu.ops.preprocess_mllama_device import (
                    preprocess_image_mllama_device,
                )

                tiles = preprocess_image_mllama_device(
                    image_path, device=getattr(self, "_device", None)
                )
            else:
                tiles = preprocess_image_mllama(image_path)
        with span("mllama.vision", logger):
            features = self._vision_jit(
                self.params,
                jnp.asarray(tiles.tiles),
                jnp.asarray(tiles.aspect_ratio_id),
                jnp.asarray(tiles.tile_mask),
            )
            return self._cross_kv_jit(self.params, features)

    def _prompt_ids(self, prompt: str, aux) -> List[int]:
        ids: List[int] = []
        if aux is not None:
            ids.append(self.tokenizer.image_token_id)
        ids.extend(self.tokenizer.encode(prompt))
        return ids

    def _cache_geometry(self):
        tc = self.config.text
        return (
            len(self.config.self_layer_indices), tc.num_kv_heads,
            tc.head_dim_, kv_cache_dtype(tc.dtype),
        )

    def _decode_param_tree(self):
        """The text tree includes the cross-attention layers' q/o
        projections the decode pass really reads; the vision tower and the
        embedding gather are excluded."""
        return self.params["text"]

    @property
    def _vocab_size(self) -> int:
        return self.config.text.vocab_size


class MllamaEngineBackend(LoopEngineBackend):
    pass


__all__ = ["MllamaEngine", "MllamaEngineBackend"]
