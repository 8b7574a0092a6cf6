"""Llama-4 serving engine: MoE decoder with placeholder-merged vision.

The auditor role's PRIMARY model family (reference src/agents/vlm_auditor.py
:34-56 tries Llama-4-Maverick first; engine_mllama.py is the Llama-3.2
fallback it degrades to).  Decoder-only: the pixel-shuffle ViT's projected
features are scattered into the embedding sequence at placeholder tokens
inside the prefill jit — the Qwen-engine layout, not Mllama's cross
attention — and thread through decode as the loop engine's `aux` (unused
there, the decode loop is pure text).

Expert parallelism: under a mesh, expert weights shard on the expert axis
(parallel/sharding.shard_llama4_params) and every jitted call here runs
SPMD — the moe_ffn expert-sum becomes the EP psum.  Single-chip target
scale is impossible for Maverick (128 experts ~ 400B params total; ~17B
activated per token); DEV_PROFILE=target therefore builds the dev-profile
geometry and logs that real Maverick deployment requires EP over a pod.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, List, Optional

import jax
import jax.numpy as jnp

from vis_tpu.models.common.layers import embed, kv_cache_dtype
from vis_tpu.models.llama4.config import Llama4Config
from vis_tpu.models.llama4.model import (
    llama4_logits,
    project_vision,
    text_forward,
    vision_forward,
)
from vis_tpu.ops.preprocess_llama4 import preprocess_image_llama4
from vis_tpu.serving.loop_engine import LoopDecodeEngine, LoopEngineBackend
from vis_tpu.serving.tokenizer import Tokenizer
from vis_tpu.utils.config import config as app_config
from vis_tpu.utils.logger import setup_logger, span

logger = setup_logger(__name__, level="INFO", component="ENGINE_LLAMA4")


class Llama4Engine(LoopDecodeEngine):
    """Single-request Llama-4 engine with chunked greedy decode."""

    span_prefix = "llama4"

    def __init__(
        self,
        name: str,
        config: Llama4Config,
        params: Any,
        tokenizer: Tokenizer,
        max_cache_tokens: Optional[int] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        role: Optional[str] = None,
    ):
        self.config = config
        if app_config.quantization in ("int8", "int4"):
            # Weight-only quantization of the stacked expert tensors needs
            # a 3D-aware kernel path (QuantizedWeight4Pick is the stacked
            # analog); until that lands the MoE engine runs at the config
            # dtype.  Loud, not silent: the operator asked for a smaller
            # footprint and did not get it.
            logger.warning(
                f"{name}: QUANTIZATION={app_config.quantization} is not yet "
                "supported for the Llama-4 MoE engine; running "
                f"{config.text.dtype} weights"
            )
        if mesh is not None:
            from vis_tpu.parallel.sharding import shard_llama4_params

            params = shard_llama4_params(params, mesh)
            logger.info(
                f"{name}: TP+EP sharded over mesh {dict(mesh.shape)} "
                f"({config.text.num_experts} experts on the model axis)"
            )
        super().__init__(name, params, tokenizer, max_cache_tokens, mesh)
        self._vision_jit = jax.jit(
            lambda p, px: project_vision(
                config, p, vision_forward(config, p, px)
            )
        )

    # -- LoopDecodeEngine contract ---------------------------------------
    def _model_forward(self, params, embeds, positions, aux, cache, mask):
        # aux (projected image features) is prefill-only; decode is text.
        return text_forward(
            self.config, params, embeds, positions, cache, mask
        )

    def _model_logits(self, params, hidden):
        return llama4_logits(self.config, params, hidden)

    def _embed_tokens(self, params, token_ids):
        return embed(token_ids, params["embed_tokens"])

    def _merge_prefill_embeds(self, params, embeds, padded_ids, aux):
        if aux is None:
            return embeds
        b, s, h = embeds.shape
        feats = aux.reshape(-1, h)
        is_img = (padded_ids == self.tokenizer.image_token_id).reshape(-1)
        # Feature row j lands at the j-th placeholder position.
        slot = jnp.clip(jnp.cumsum(is_img) - 1, 0, feats.shape[0] - 1)
        flat = jnp.where(
            is_img[:, None], feats[slot].astype(embeds.dtype),
            embeds.reshape(-1, h),
        )
        return flat.reshape(b, s, h)

    def _prepare_aux(self, image_path: Optional[Path]):
        if image_path is None:
            return None
        with span("llama4.preprocess", logger):
            inputs = preprocess_image_llama4(
                image_path, self.config.vision.image_size
            )
        with span("llama4.vision", logger):
            return self._vision_jit(
                self.params["vision"], jnp.asarray(inputs.pixel_values)
            )

    def _prompt_ids(self, prompt: str, aux) -> List[int]:
        ids: List[int] = []
        if aux is not None:
            n_img = int(aux.shape[0] * aux.shape[1])
            ids.extend([self.tokenizer.image_token_id] * n_img)
        ids.extend(self.tokenizer.encode(prompt))
        return ids

    def _cache_geometry(self):
        tc = self.config.text
        return (
            tc.num_layers, tc.num_kv_heads, tc.head_dim,
            kv_cache_dtype(tc.dtype),
        )

    def _decode_param_tree(self):
        """Everything but the vision tower; dense-dispatch MoE really does
        stream ALL experts per decode pass (the roofline denominator) —
        top-k gather dispatch is the optimization that would shrink it."""
        return {k: v for k, v in self.params.items() if k != "vision"}

    @property
    def _vocab_size(self) -> int:
        return self.config.text.vocab_size


class Llama4EngineBackend(LoopEngineBackend):
    pass


__all__ = ["Llama4Engine", "Llama4EngineBackend"]
