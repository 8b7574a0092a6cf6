"""On-pod inference engine: tokenize -> (vision encode) -> prefill -> decode.

This is the transport that replaces the reference's HTTPS clients
(reference: src/agents/vlm_inspector.py:105 HF InferenceClient,
vlm_auditor.py:117 Groq, explainer.py:87): agents call
EngineBackend.generate()/generate_stream() with the same signature they used
for remote APIs, and the request executes as device computation.

TPU-first structure:
- every device function is jit-compiled once per (bucket, batch) shape:
  vision encode per patch bucket, prefill per token bucket, decode step once;
- prompts pad up to config.prefill_bucket_list buckets; patch grids pad up to
  ops.preprocess.PATCH_BUCKETS — a handful of compiled shapes total;
- KV cache is a preallocated bf16 buffer (config.kv_cache_max_tokens);
- decode runs greedy by default (deterministic verdicts), streaming tokens
  to the caller as they materialize;
- with a multi-chip mesh, params are sharded by vis_tpu.parallel and the
  same jit functions run SPMD (collectives inserted by XLA).

Model registry: role -> config builder; weights load from
config.checkpoint_dir/<model>/ safetensors when present, else random init at
a reduced "dev profile" size so the full pipeline runs (and benchmarks
measure real compute) without shipped checkpoints.
"""

from __future__ import annotations

import threading
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vis_tpu.models.common.decoder import (
    DecodeConstraint,
    DecoderConfig,
    decode_loop_scan,
    decode_loop_lookahead,
    decode_loop_scan_constrained,
    decode_loop_scan_sampled,
    decode_step_scan,
    extend_scan,
    init_decoder_params,
    prefill_scan,
    stack_decoder_layers,
    verify_scan,
)
from vis_tpu.models.common.layers import KVCache, embed, kv_cache_dtype
from vis_tpu.models.llama import config as llama_configs
from vis_tpu.models.llama import model as llama_model
from vis_tpu.models.loader import find_checkpoint, read_safetensors_dir
from vis_tpu.models.qwen2_vl import model as qwen_model
from vis_tpu.models.qwen2_vl.config import Qwen2VLConfig
from vis_tpu.models.qwen2_vl.vision import vision_rotary_tables
from vis_tpu.ops.preprocess import (
    ImagePatches,
    build_mrope_positions,
    preprocess_image,
)
from vis_tpu.serving.tokenizer import ByteTokenizer, Tokenizer, load_tokenizer
from vis_tpu.utils.config import config as app_config
from vis_tpu.utils.logger import setup_logger, span

logger = setup_logger(__name__, level="INFO", component="ENGINE")


def _bucket_for(n: int, buckets: List[int]) -> int:
    for b in buckets:
        if b >= n:
            return b
    return ((n + 127) // 128) * 128


def load_constraint_tables(
    tokenizer, vocab_size: int, schema: Optional[str] = None,
    engine_name: str = "engine",
):
    """Compile + device-place constraint tables (generic JSON when
    schema=None, else the registered schema's exact-document tables).
    Returns (token_ok, token_trans, cost_after, class_of-or-None, host
    ConstraintTables) or None when the tokenizer/vocab is unsupported;
    class_of is the column-compression map for real-vocab tables (see
    serving/constrained.py), None for dense byte-level tables."""
    if schema is not None:
        from vis_tpu.serving.schema import schema_constraint_tables

        tables = schema_constraint_tables(tokenizer, vocab_size, schema)
    else:
        from vis_tpu.serving.constrained import json_constraint_tables

        tables = json_constraint_tables(tokenizer, vocab_size)
    if tables is None:
        logger.warning(
            f"{engine_name}: constrained decoding "
            f"({'schema ' + schema if schema else 'generic JSON'}) "
            "unavailable for this tokenizer/vocab; falling back"
        )
        return None
    return (
        jnp.asarray(tables.token_ok),
        jnp.asarray(tables.token_trans),
        jnp.asarray(tables.cost_after),
        None if tables.class_of is None else jnp.asarray(tables.class_of),
        tables,
    )


def _vocab_quant_mode(role: Optional[str] = None):
    """Vocab-projection quantization override: None = follow the layer
    mode; "int8"/"int4"/"none" = mixed precision.  Measured on-chip at
    152k-vocab 7B dims (tools/probe_vocab_head.py): int4 2.40 / int8
    2.60 / bf16 3.63 ms per evaluation — precision is an HBM-capacity
    knob (int4 head saves 0.25-0.76 GB), not a latency one.  Per-role
    overrides (<role>_vocab_quantization) shape a single chip's HBM
    budget."""
    vq = None
    if role is not None:
        vq = getattr(app_config, f"{role}_vocab_quantization", "") or None
    vq = vq or app_config.vocab_quantization
    return None if vq == "same" else vq


def _pld_draft(context: List[int], k: int, ngram: int = 2) -> List[int]:
    """Prompt-lookup draft: the continuation after the most recent earlier
    occurrence of the trailing `ngram` (up to k tokens; [] when no match).
    Structured outputs (JSON field names, units, repeated phrasing) give
    long matches; the verifier keeps greedy outputs exact either way."""
    n = len(context)
    if n < ngram + 1:
        return []
    key = context[-ngram:]
    arr = np.asarray(context, np.int64)
    match = np.ones(n - ngram, bool)  # starts 0..n-ngram-1 (excludes the key itself)
    for j in range(ngram):
        match &= arr[j : j + n - ngram] == key[j]
    starts = np.flatnonzero(match)
    if starts.size == 0:
        return []
    s = int(starts[-1]) + ngram
    return context[s : s + k]


import dataclasses


@dataclasses.dataclass
class ChatSession:
    """Host-side handle for a KV-cached conversation (see Engine.chat_start)."""

    cache: KVCache
    logits: Any
    position: int


class Engine:
    """Single-model inference engine with bucketed jit compilation."""

    # Telemetry: tokens decoded by the most recent completed request, and
    # a monotonically growing total across requests (bench.py diffs it per
    # run — per-role counts survive the batched/scheduler path this way).
    last_decode_tokens: Optional[int] = None
    decode_tokens_total: int = 0
    # Wall seconds spent inside the decode dispatch+sync block (chip time;
    # bench.py divides token deltas by this for per-model tokens/s and the
    # weight-stream roofline fraction).  Batched requests accrue on the
    # scheduler's own counter — see decode_seconds_total.
    decode_device_s_total: float = 0.0

    def __init__(
        self,
        name: str,
        text_config: DecoderConfig,
        text_params: Any,
        tokenizer: Tokenizer,
        vlm_config: Optional[Qwen2VLConfig] = None,
        vlm_params: Optional[Any] = None,
        max_cache_tokens: Optional[int] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        role: Optional[str] = None,
    ):
        self.name = name
        # Pipeline role ("inspector"/"auditor"/"explainer") — resolves the
        # per-role vocab-head override ({ROLE}_VOCAB_QUANTIZATION) for
        # real-checkpoint quantization here in _finish; the weightless
        # dev-target path resolves it in _build_target_dev_engine.
        self.role = role
        self.text_config = text_config
        self.tokenizer = tokenizer
        self.vlm_config = vlm_config
        self.max_cache_tokens = max_cache_tokens or app_config.kv_cache_max_tokens
        self.mesh = mesh
        self._lock = threading.Lock()

        # Scan-execution layout: stack decoder layers once at init (the
        # original per-layer list is dropped so weights aren't held twice).
        # With a mesh, parameters get tensor-parallel NamedShardings and the
        # same jit functions run SPMD (XLA inserts the collectives).
        # Idempotent: params arriving pre-stacked/fused/quantized (the
        # fused-init path for large weightless models, where staging the
        # full-precision weights through separate dispatches would not fit
        # HBM) skip the corresponding steps.
        def _finish(stacked):
            from vis_tpu.ops.quantized import QuantizedWeight, QuantizedWeight4

            if "layers_stacked" not in stacked:
                stacked = stack_decoder_layers(stacked)
            layers = stacked["layers_stacked"]
            already_quantized = isinstance(
                layers["o_proj"], (QuantizedWeight, QuantizedWeight4)
            )
            if mesh is None and "qkv_proj" not in layers and not already_quantized:
                # Single-chip: fuse QKV and gate/up projections (fewer,
                # larger matmuls on the bandwidth-bound decode path).  Under
                # TP the projections stay separate (see
                # fuse_stacked_projections).
                from vis_tpu.models.common.decoder import fuse_stacked_projections

                stacked = fuse_stacked_projections(stacked)
            if app_config.quantization in ("int8", "int4") and not already_quantized:
                from vis_tpu.models.common.decoder import quantize_stacked_params

                stacked = quantize_stacked_params(
                    stacked, quantize_embeddings=True,
                    mode=app_config.quantization,
                    vocab_mode=_vocab_quant_mode(role),
                )
                logger.info(
                    f"{name}: {app_config.quantization} weight-only "
                    "quantization applied"
                )
            if mesh is None:
                return stacked
            from vis_tpu.parallel.sharding import shard_stacked_decoder_params

            return shard_stacked_decoder_params(stacked, mesh)

        # Vision variant: Qwen2-VL (full attention) or Qwen2.5-VL (window
        # attention + RMSNorm/SwiGLU tower — the reference's actual
        # inspector family, reference vlm_inspector.py:23).
        from vis_tpu.models.qwen2_5_vl.config import Qwen25VLConfig

        self._is_qwen25 = isinstance(vlm_config, Qwen25VLConfig)
        # Multi-chip vision strategy: "tp" shards the tower's heads/MLPs via
        # param shardings (XLA inserts collectives); "sp" keeps params
        # replicated and shards the SEQUENCE, exchanging heads<->sequence
        # with all-to-all (parallel/sp.py) — the right shape for huge
        # dynamic-resolution grids (SURVEY §5.7).  SP covers the Qwen2-VL
        # tower; the 2.5 window tower is already sequence-local per window.
        self._vision_sp = (
            mesh is not None
            and vlm_config is not None
            and not self._is_qwen25
            and app_config.vision_parallel == "sp"
            and dict(mesh.shape).get("model", 1) > 1
        )
        if vlm_params is not None:
            vlm_params = dict(vlm_params)
            vlm_params["text"] = _finish(vlm_params["text"])
            if mesh is not None and not self._vision_sp and not self._is_qwen25:
                # TP rules cover the Qwen2-VL tower; the 2.5 window tower
                # runs replicated under a mesh (window attention is tiny
                # per-step — TP the 28-layer text stack where the FLOPs are).
                from vis_tpu.parallel.sharding import shard_vision_params

                vlm_params["vision"] = shard_vision_params(
                    vlm_params["vision"], mesh
                )
            self.vlm_params = vlm_params
            self.text_params = None
        else:
            self.vlm_params = None
            self.text_params = _finish(text_params)

        self._prefill_jit = jax.jit(partial(prefill_scan, text_config))
        self._decode_jit = jax.jit(partial(decode_step_scan, text_config))
        # Fused greedy decode: one device dispatch per chunk instead of per
        # token (lax.scan inside jit) — host only checks EOS between chunks.
        # Config-tunable: on high-RTT links (tunneled dev chips) the per-chunk
        # host sync dominates, so the bench raises it to the full budget.
        self.decode_chunk = app_config.decode_chunk
        self._decode_loop_jit = jax.jit(
            partial(decode_loop_scan, text_config),
            static_argnames=("num_steps", "eos_id"), donate_argnums=(3,),
        )
        # JSON-grammar constrained decode (vis_tpu.serving.constrained):
        # same fused chunk loop with a DFA carry; tables compiled lazily.
        self._decode_loop_json_jit = jax.jit(
            partial(decode_loop_scan_constrained, text_config),
            static_argnames=("num_steps", "eos_id"), donate_argnums=(3,),
        )
        # Fused SAMPLED decode (in-scan Gumbel-max): temperature>0 costs the
        # same chunked dispatches as greedy.  The per-token host sampling
        # loop this replaces paid one tunnel round-trip per token.
        self._decode_loop_sampled_jit = jax.jit(
            partial(decode_loop_scan_sampled, text_config),
            static_argnames=("num_steps", "eos_id"), donate_argnums=(3,),
        )
        # Forced-run fast-forward (CONSTRAINED_LOOKAHEAD>=2): window-token
        # extend passes emit the model-chosen token plus the DFA-forced
        # continuation — schema skeletons ride one weight read per window.
        self._decode_loop_lookahead_jit = jax.jit(
            partial(decode_loop_lookahead, text_config),
            static_argnames=("num_windows", "window", "eos_id"),
            donate_argnums=(3,),
        )
        self._json_constraint: Dict[Optional[str], Any] = {}
        self._extend_jit = jax.jit(partial(extend_scan, text_config))
        self._verify_jit = jax.jit(partial(verify_scan, text_config))
        if vlm_config is None:
            self._encode_image_jit = None
        elif self._is_qwen25:
            from vis_tpu.models.qwen2_5_vl.vision import vision_forward_25

            self._encode_image_jit = jax.jit(
                partial(vision_forward_25, vlm_config.vision)
            )
        elif self._vision_sp:
            from vis_tpu.parallel.sp import vision_forward_sp

            def _encode_sp(vlm_params, patches, cos, sin, num_patches):
                return vision_forward_sp(
                    vlm_config.vision, vlm_params["vision"], patches,
                    cos, sin, mesh, num_patches,
                )

            self._encode_image_jit = jax.jit(_encode_sp)
        else:
            self._encode_image_jit = jax.jit(
                partial(qwen_model.encode_image, vlm_config)
            )
        self._embed_jit = jax.jit(lambda table, ids: embed(ids, table))

    @property
    def _params(self):
        return (
            self.text_params if self.vlm_config is None
            else self.vlm_params["text"]
        )

    # -- KV-cached chat sessions ------------------------------------------
    def chat_start(self, system_context: str) -> "ChatSession":
        """Open a conversation: the system/context prompt prefills ONCE into
        a session-resident cache; every follow-up turn appends to it instead
        of re-prefilling the whole history (BASELINE config 4)."""
        with self._lock:
            # Reserve nothing at prefill time; per-turn budget checks guard
            # the cache (chat_start itself decodes no tokens).
            cache, logits, next_pos, _, _ = self._prefill_request(
                system_context, None, max_tokens=1, max_image_dim=0
            )
        return ChatSession(cache=cache, logits=logits, position=next_pos)

    def chat_turn(
        self, session: "ChatSession", question: str, max_tokens: int = 512
    ) -> Iterator[str]:
        """One user turn: append the question's tokens to the session cache
        (extend_scan) then greedy-decode the reply in fused chunks.  The
        reply's KV stays in the cache, so the next turn continues from the
        full conversation state."""
        turn_ids = self.tokenizer.encode(f"\nUser: {question}\nAssistant:")
        seq_len = len(turn_ids)
        bucket = 128
        while bucket < seq_len:
            bucket *= 2
        # Budget against the PADDED bucket, not the true turn length:
        # extend_scan writes the whole padded chunk with a dynamic slice,
        # and a write that does not fit would CLAMP backward over the
        # newest valid history instead of erroring.
        budget = self.max_cache_tokens - max_tokens - 1
        used = int(np.asarray(session.cache.lengths)[0])
        if used + bucket > budget:
            raise RuntimeError(
                f"chat session KV budget exhausted ({used} used of {budget})"
            )
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :seq_len] = turn_ids
        positions = np.arange(bucket, dtype=np.int32)[None] + session.position

        with self._lock:
            params = self._params
            embeds = self._embed_jit(params["embed_tokens"], jnp.asarray(padded))
            logits, cache = self._extend_jit(
                params, embeds, jnp.asarray(positions), session.cache,
                jnp.asarray([seq_len]),
            )
            session.position += seq_len
            generated: List[int] = []
            emitted = ""
            remaining = max_tokens
            done = False
            # Host cursor mirror, seeded from the turn's single device read
            # (`used`): reading cache.lengths per chunk would pay a blocking
            # tunnel round-trip every iteration (the scheduler avoids the
            # same read with _lengths_host).  When a chunk ends without EOS
            # the device ran all `steps`, so the mirror advances exactly.
            chunk_start = used + seq_len
            while remaining > 0 and not done:
                steps = min(self.decode_chunk, remaining)
                tokens, logits, cache = self._decode_loop_jit(
                    params, logits, jnp.int32(session.position), cache,
                    num_steps=steps, eos_id=self.tokenizer.eos_id,
                )
                token_list = np.asarray(tokens)[0].tolist()
                kept = 0
                for token_id in token_list:
                    if token_id == self.tokenizer.eos_id:
                        done = True
                        break
                    generated.append(token_id)
                    kept += 1
                if done:
                    # Rewind the cursor past the EOS + post-EOS garbage so the
                    # next extend overwrites them.
                    cache = KVCache(
                        k=cache.k, v=cache.v,
                        lengths=jnp.asarray([chunk_start + kept], jnp.int32),
                    )
                session.position += kept
                chunk_start += kept
                remaining -= steps
                text = self.tokenizer.decode(generated)
                if len(text) > len(emitted) and not text.endswith("�"):
                    yield text[len(emitted):]
                    emitted = text
            session.cache = cache
            session.logits = logits
            # Telemetry parity with generate(): chat-session tokens count
            # toward the per-role totals the bench diffs (still under the
            # engine lock — += is a read-modify-write).
            self.last_decode_tokens = len(generated)
            self.decode_tokens_total += len(generated)
        final = self.tokenizer.decode(generated)
        if len(final) > len(emitted):
            yield final[len(emitted):]

    # -- prompt assembly ------------------------------------------------
    def _build_prompt_ids(
        self, prompt: str, image: Optional[ImagePatches]
    ) -> Tuple[np.ndarray, Optional[np.ndarray], int]:
        """Token ids, mrope positions (or None), and next decode position."""
        tok = self.tokenizer
        if image is None:
            ids = tok.encode(prompt)
            return np.array([ids]), None, len(ids)

        n_vision = image.num_tokens
        # Chat-standard layout: the vision block precedes the instruction
        # text — [vision_start][image * n][vision_end][prompt tokens].
        text_ids = tok.encode(prompt)
        ids = (
            [tok.vision_start_id]
            + [tok.image_token_id] * n_vision
            + [tok.vision_end_id]
            + text_ids
        )
        positions, next_pos = build_mrope_positions(
            1, image.grid_h, image.grid_w, len(text_ids) + 1
        )
        return np.array([ids]), positions, next_pos

    # -- scheduler attachment --------------------------------------------
    def attach_scheduler(self, num_slots: Optional[int] = None,
                         paged: Optional[bool] = None) -> None:
        """Enable continuous-batched decode: concurrent requests prefill
        under the engine lock (vision + prompt), then decode TOGETHER in the
        shared scheduler's slots — many inspections in flight share every
        decode step's weight reads.  paged=None follows
        config.paged_kv_cache (slot KV from a shared page pool instead of
        dense decode_batch_size x kv_cache_max_tokens buffers)."""
        from vis_tpu.serving.constrained import json_constraint_tables
        from vis_tpu.serving.schema import SCHEMAS, schema_constraint_tables
        from vis_tpu.serving.scheduler import ContinuousBatchingScheduler

        params = (
            self.text_params if self.vlm_config is None
            else self.vlm_params["text"]
        )
        # Generic JSON first (json_mode rows), then the registered schemas:
        # the scheduler stacks what fits its size budget so schema-exact
        # rows (e.g. the explainer bundle's decision_support) batch with
        # free-form and generic rows; has_table() tells generate_stream
        # which schemas can ride the batched path.
        tables = {
            None: json_constraint_tables(
                self.tokenizer, self.text_config.vocab_size
            )
        }
        for schema_name in SCHEMAS:
            tables[schema_name] = schema_constraint_tables(
                self.tokenizer, self.text_config.vocab_size, schema_name
            )
        self.scheduler = ContinuousBatchingScheduler(
            self.text_config, params, self.tokenizer,
            num_slots=num_slots, max_len=self.max_cache_tokens, paged=paged,
            json_tables=tables, mesh=self.mesh,
        )
        self.scheduler.start()

    def detach_scheduler(self) -> None:
        if getattr(self, "scheduler", None) is not None:
            self.scheduler.stop()
            self.scheduler = None

    # -- decode-stream telemetry -----------------------------------------
    @property
    def decode_seconds_total(self) -> float:
        """Chip seconds attributable to this engine's decode streams —
        own unbatched decode blocks plus (when a scheduler is attached)
        the shared batched decode dispatches."""
        sched = getattr(self, "scheduler", None)
        extra = getattr(sched, "decode_device_s_total", 0.0) if sched else 0.0
        return self.decode_device_s_total + extra

    @property
    def weight_bytes_per_pass(self) -> int:
        """Bytes of decoder+head parameters one decode forward streams from
        HBM.  Embedding tables are excluded (decode gathers one row, it
        does not stream the table); the vocab-head matmul reads its full
        weight, so head leaves stay in.  With CONSTRAINED_LOOKAHEAD, a
        DFA-forced window shares ONE pass across up to `window` tokens, so
        tokens/s x this value can legitimately exceed the raw HBM read
        rate — bench.py publishes that ratio as the roofline fraction."""
        params = (
            self.text_params if self.vlm_config is None
            else self.vlm_params["text"]
        )
        total = 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            if "embed" in jax.tree_util.keystr(path).lower():
                continue
            total += getattr(leaf, "nbytes", 0)
        return total

    # -- generation -----------------------------------------------------
    def generate_stream(
        self,
        prompt: str,
        image_path: Optional[Path] = None,
        *,
        max_tokens: int = 1024,
        temperature: float = 0.0,
        max_image_dim: int = 2048,
        json_mode: bool = False,
        json_schema: Optional[str] = None,
        schema_batched: bool = False,
        min_tokens: Optional[int] = None,
    ) -> Iterator[str]:
        scheduler = getattr(self, "scheduler", None)
        if not json_mode:
            json_schema = None
        if json_mode and self._json_tables(json_schema) is None:
            json_mode = False  # tokenizer unsupported; robust parser catches
            json_schema = None
        if json_schema is not None and self._json_constraint.get(json_schema) is None:
            json_schema = None  # schema tables unavailable; generic fallback
        sched_ok = scheduler is not None
        if sched_ok and json_schema is not None:
            # Schema rows batch via the scheduler's stacked tables only
            # when the caller opts in (schema_batched): a LONE schema
            # request is faster on the unbatched fused path (forced-run
            # lookahead fast-forwards the skeleton in one weight pass per
            # window), while concurrent bundles — the explainer's
            # narration + counterfactual + decision_support — win ~2x from
            # sharing every decode step's weight reads.
            if not (schema_batched and scheduler.has_table(json_schema)):
                sched_ok = False
        if sched_ok and json_mode and json_schema is None \
                and not scheduler.has_table(None):
            # The stacked tables may hold only schema grammars (generic
            # compile failed while schemas succeeded); submit_prefilled
            # would reject a generic row, so fall back to unbatched.
            sched_ok = False
        if (sched_ok and temperature > 0.0 and scheduler.paged
                and scheduler._json_dev is None):
            sched_ok = False  # sampled paged rides the constrained path
        if sched_ok:
            # Prefill under the lock, decode batched in the scheduler
            # (json_mode rows carry a per-slot DFA, temp>0 rows sample
            # in-chunk; greedy rows stay token-exact in mixed batches).
            if json_mode:
                max_tokens = max(
                    max_tokens,
                    self._json_tables(json_schema)[-1].min_budget,
                )
            with self._lock:
                cache, logits, next_pos, kv_len, _ = self._prefill_request(
                    prompt, image_path, max_tokens=max_tokens,
                    max_image_dim=max_image_dim, prompt_only_cache=True,
                )
            request = scheduler.submit_prefilled(
                cache, logits, next_pos, max_tokens=max_tokens, kv_len=kv_len,
                json_mode=json_mode, temperature=temperature,
                schema=json_schema, min_tokens=min_tokens,
            )
            while True:
                chunk = request.out.get()
                if chunk is None:
                    break
                yield chunk
            if request.error:
                raise RuntimeError(request.error)
            # Telemetry parity with the unbatched path: batched requests
            # count their decoded tokens too (the bench's per-role token
            # accounting went dark when the explainer became batched).
            # Under the lock: the bundle's three requests stream through
            # this path concurrently and += is a read-modify-write.
            with self._lock:
                self.last_decode_tokens = len(request.generated)
                self.decode_tokens_total += len(request.generated)
            return
        with self._lock:  # unbatched path: one request at a time per engine
            yield from self._generate_locked(
                prompt, image_path, max_tokens=max_tokens,
                temperature=temperature, max_image_dim=max_image_dim,
                json_mode=json_mode, json_schema=json_schema,
                min_tokens=min_tokens,
            )

    def _json_tables(self, schema: Optional[str] = None):
        """Lazily compile + device-place constraint tables; None when the
        tokenizer/vocab is unsupported (dense tables too large).

        schema=None gives the generic JSON grammar; a registered schema
        name (serving/schema.py) gives the exact-document-shape tables —
        same format, so the fused decode path is identical either way."""
        if schema not in self._json_constraint:
            self._json_constraint[schema] = load_constraint_tables(
                self.tokenizer, self.text_config.vocab_size, schema,
                engine_name=self.name,
            )
        cached = self._json_constraint[schema]
        if cached is None and schema is not None:
            return self._json_tables(None)  # fall back to generic JSON
        return cached

    def encode_vision(self, image) -> jnp.ndarray:
        """Vision-tower forward for preprocessed patches -> merged embeds
        trimmed to the image's real token count.  Shared by the prefill
        path and the bench's high-res TTFT leg (bench.py drives a 4K frame
        through exactly this path)."""
        padded, bucket = image.padded()
        if self._is_qwen25:
            from vis_tpu.models.qwen2_5_vl.vision import window_layout
            from vis_tpu.ops.preprocess import PATCH_BUCKETS

            base = window_layout(
                self.vlm_config.vision, image.grid_h, image.grid_w,
                src_len=bucket,
            )
            # Bucket padding adds WHOLE masked windows, so the bucket
            # must stay a multiple of window_patches (64 for the
            # production 112px window, but config-dependent — a
            # checkpoint with window_size=84 has 36).
            wp = self.vlm_config.vision.window_patches
            win_bucket = next(
                (b for b in PATCH_BUCKETS
                 if b >= base.win_len and b % wp == 0),
                ((base.win_len + wp - 1) // wp) * wp,
            )
            layout = window_layout(
                self.vlm_config.vision, image.grid_h, image.grid_w,
                min_len=win_bucket, src_len=bucket,
            )
            with span("engine.vision_encode", logger):
                vision_embeds = self._encode_image_jit(
                    self.vlm_params["vision"],
                    jnp.asarray(padded),
                    jnp.asarray(layout.gather_patch),
                    jnp.asarray(layout.valid),
                    jnp.asarray(layout.cos),
                    jnp.asarray(layout.sin),
                    jnp.asarray(layout.inv_merged),
                    jnp.asarray(layout.inv_patch),
                    jnp.asarray(image.num_patches),
                )
                vision_embeds = vision_embeds[: image.num_tokens]
        else:
            cos, sin = vision_rotary_tables(
                self.vlm_config.vision, image.grid_h, image.grid_w
            )
            cos_p = np.zeros((bucket, cos.shape[1]), np.float32)
            sin_p = np.zeros((bucket, sin.shape[1]), np.float32)
            cos_p[: cos.shape[0]] = cos
            sin_p[: sin.shape[0]] = sin
            with span("engine.vision_encode", logger):
                vision_embeds = self._encode_image_jit(
                    self.vlm_params,
                    jnp.asarray(padded),
                    jnp.asarray(cos_p),
                    jnp.asarray(sin_p),
                    jnp.asarray(image.num_patches),
                )
                vision_embeds = vision_embeds[: image.num_tokens]
        return vision_embeds

    def _prefill_request(
        self, prompt, image_path, *, max_tokens, max_image_dim,
        right_size_cache: bool = False, prompt_only_cache: bool = False,
    ):
        """Vision encode + multimodal/text prefill into a fresh batch-1
        cache; returns (cache, first_logits, next_position, kv_len, ids).
        right_size_cache sizes the KV buffer to this request's budget
        (unbatched path); prompt_only_cache sizes it to the prompt bucket
        alone (scheduler hand-offs: generation KV lives in the scheduler's
        shared slots/page pool, so staging the full budget would triple the
        transient HBM held while a bundle of requests waits for admission);
        chat sessions keep the full budget."""
        tc = self.text_config
        image = None
        vision_embeds = None
        if image_path is not None and self.vlm_config is not None:
            with span("engine.preprocess", logger):
                if app_config.device_preprocess:
                    # Ship the u8 frame, do resize/normalize/patchify on
                    # the MXU (ops/preprocess_device.py) — ~8x less
                    # host->HBM traffic than f32 patches.
                    from vis_tpu.ops.preprocess_device import (
                        preprocess_image_device,
                    )

                    image = preprocess_image_device(
                        image_path, max_image_dim=max_image_dim,
                        device=getattr(self, "_device", None),
                    )
                else:
                    image = preprocess_image(
                        image_path, max_image_dim=max_image_dim
                    )
            vision_embeds = self.encode_vision(image)

        ids, mrope_positions, next_pos = self._build_prompt_ids(prompt, image)
        seq_len = ids.shape[1]
        bucket = _bucket_for(seq_len, app_config.prefill_bucket_list)
        # Reserve 32 tokens of slack past the decode budget: lookahead
        # windows and speculative-verify chunks write whole fixed-size
        # chunks, and a chunk that does not fit the buffer would clamp
        # backward over valid KV (dynamic_update_slice semantics) rather
        # than error.  _request_cache_len carries the same +32.
        bucket = min(bucket, self.max_cache_tokens - max_tokens - 32)
        if prompt_only_cache:
            # Scheduler-bound request: the paged pool's per-slot budget
            # (prompt + max_tokens + one decode chunk of slack, bounded by
            # the page-table window) can be TIGHTER than max_cache_tokens.
            # Truncate against it here, or the scheduler rejects the
            # request outright after the prefill was already paid (r5
            # batch leg: a 2128-token explainer bundle + 448 budget hit
            # the 2560-token slot limit and the explanation was lost).
            sched = getattr(self, "scheduler", None)
            pool = getattr(sched, "pool", None) if sched is not None else None
            if pool is not None:
                slot_tokens = (
                    min(pool.n_pages - 1, pool.max_pages) * pool.page_size
                )
                paged_room = slot_tokens - max_tokens - sched.decode_chunk
                if 2 <= paged_room < bucket:
                    bucket = paged_room
        if bucket < 2:
            # A budget that leaves no room for even a truncated prompt
            # must fail loudly: negative buckets would otherwise slice
            # nonsense ids and crash inside np.zeros.
            raise RuntimeError(
                f"max_tokens={max_tokens} leaves no prompt room in a "
                f"{self.max_cache_tokens}-token KV cache (32 tokens of "
                "chunk slack are reserved); lower max_tokens or raise "
                "KV_CACHE_MAX_TOKENS"
            )
        if seq_len > bucket:
            keep_head = bucket // 2
            keep_tail = bucket - keep_head
            ids = np.concatenate([ids[:, :keep_head], ids[:, -keep_tail:]], axis=1)
            seq_len = bucket
            mrope_positions = None
            next_pos = seq_len
            logger.warning(f"Prompt truncated to {bucket} tokens")

        params = (
            self.text_params if self.vlm_config is None
            else self.vlm_params["text"]
        )

        if prompt_only_cache:
            # PAGE-aligned so the paged insert's page reshape stays exact
            # even for KV_PAGE_SIZE > 128 (the pool validates max_len is a
            # page multiple, so min() keeps the alignment).  The ATTACHED
            # scheduler's pool is authoritative: attach_scheduler(paged=...)
            # can override the config flag.
            sched = getattr(self, "scheduler", None)
            pool = getattr(sched, "pool", None) if sched is not None else None
            if pool is not None:
                page = max(128, pool.page_size)
            else:
                page = max(128, app_config.kv_page_size
                           if app_config.paged_kv_cache else 128)
            cache_len = min(
                self.max_cache_tokens,
                ((bucket + page - 1) // page) * page,
            )
        elif right_size_cache:
            cache_len = self._request_cache_len(
                bucket, max_tokens, self.max_cache_tokens
            )
        else:
            cache_len = self.max_cache_tokens

        # Text prompts often share a static head (system prompt, report
        # template): reuse its KV from the prefix cache and prefill only
        # the suffix (reference parity: the remote APIs re-processed the
        # full prompt on every call).
        if image is None and app_config.prefix_caching:
            hit = self._prefix_lookup(ids[0].tolist())
            if hit is not None:
                seeded = self._prefill_from_prefix(
                    params, ids, seq_len, hit, cache_len
                )
                if seeded is not None:
                    logits, cache = seeded
                    return cache, logits, seq_len, seq_len, ids

        padded_ids = np.zeros((1, bucket), dtype=np.int32)
        padded_ids[0, :seq_len] = ids[0]

        if image is not None:
            embeds = qwen_model.embed_multimodal(
                self.vlm_config, self.vlm_params, jnp.asarray(padded_ids),
                vision_embeds,
            )
        else:
            embeds = self._embed_jit(params["embed_tokens"], jnp.asarray(padded_ids))

        if mrope_positions is not None:
            positions = np.zeros((3, 1, bucket), dtype=np.int32)
            positions[:, 0, :seq_len] = mrope_positions
            positions[:, 0, seq_len:] = mrope_positions.max()
        else:
            positions = np.arange(bucket, dtype=np.int32)[None]
            next_pos = seq_len

        cache = KVCache.create(
            tc.num_layers, 1, cache_len, tc.num_kv_heads,
            tc.head_dim_, dtype=kv_cache_dtype(tc.dtype),
        )
        with span("engine.prefill", logger):
            logits, cache = self._prefill_jit(
                params, embeds, jnp.asarray(positions), cache,
                jnp.asarray([seq_len]),
            )
        if image is None and app_config.prefix_caching:
            self._prefix_store(ids[0].tolist(), cache)
        return cache, logits, next_pos, seq_len, ids

    # -- prefix caching ----------------------------------------------------
    _PREFIX_UNIT = 256     # cached prefixes are multiples of this
    _PREFIX_MAX_LEN = 1024
    _PREFIX_ENTRIES = 4    # LRU capacity

    def _prefix_lookup(self, ids: List[int]):
        """Longest usable cached prefix.  KV at position i depends only on
        tokens <= i (causality), so ANY common token-prefix of a stored
        entry is reusable — the match is the longest common prefix across
        entries, rounded down to 128 so the seed copy compiles for only a
        few shapes.  Returns (T, k[:T], v[:T]) or None."""
        entries = getattr(self, "_prefix_cache", None)
        if not entries:
            return None
        arr = np.asarray(ids, np.int64)
        best_t, best_kv, best_key = 0, None, None
        for key, kv in entries.items():
            n = min(len(key), len(arr) - 1)
            if n < 128:
                continue
            k_arr = np.asarray(key[:n], np.int64)
            neq = np.flatnonzero(k_arr != arr[:n])
            common = int(neq[0]) if neq.size else n
            t = (common // 128) * 128
            if t > best_t:
                best_t, best_kv, best_key = t, kv, key
        if best_t < 128:
            return None
        entries[best_key] = entries.pop(best_key)  # LRU bump
        self.prefix_hits = getattr(self, "prefix_hits", 0) + 1
        return best_t, best_kv

    def _prefix_store(self, ids: List[int], cache: KVCache) -> None:
        """Remember the head of this prompt's KV for future requests."""
        p = min((len(ids) - 1) // self._PREFIX_UNIT * self._PREFIX_UNIT,
                self._PREFIX_MAX_LEN)
        if p < self._PREFIX_UNIT:
            return
        key = tuple(ids[:p])
        entries = getattr(self, "_prefix_cache", None)
        if entries is None:
            entries = self._prefix_cache = {}
        if key in entries:
            return
        # Trim to the prefix length (device slice; a few MB per entry).
        entries[key] = (cache.k[:, :, :p], cache.v[:, :, :p])
        while len(entries) > self._PREFIX_ENTRIES:
            entries.pop(next(iter(entries)))  # evict oldest

    def _prefill_from_prefix(self, params, ids, seq_len, hit, cache_len):
        """Seed a fresh cache with the stored prefix KV, then extend_scan
        over only the suffix tokens.  Returns (logits, cache), or None when
        the padded suffix chunk would not fit the cache (caller falls back
        to a full prefill)."""
        tc = self.text_config
        p, (k_pref, v_pref) = hit
        k_pref = k_pref[:, :, :p]
        v_pref = v_pref[:, :, :p]
        suffix = ids[0, p:].tolist()
        s_bucket = _bucket_for(len(suffix), [128, 256, 512, 1024, 2048])
        if p + s_bucket > cache_len:
            # extend_scan writes the whole padded suffix chunk at cursor p
            # with a dynamic slice; a chunk that does not fit would CLAMP
            # backward and silently overwrite the seeded prefix KV.  Tight
            # caches (prompt_only / right-sized) fall back to full prefill.
            return None
        padded = np.zeros((1, s_bucket), np.int32)
        padded[0, : len(suffix)] = suffix
        cache = KVCache.create(
            tc.num_layers, 1, cache_len, tc.num_kv_heads,
            tc.head_dim_, dtype=kv_cache_dtype(tc.dtype),
        )
        cache = self._seed_prefix_jit(cache, k_pref, v_pref, jnp.int32(p))
        embeds = self._embed_jit(params["embed_tokens"], jnp.asarray(padded))
        positions = jnp.asarray(
            (p + np.arange(s_bucket, dtype=np.int32))[None]
        )
        with span("engine.prefill_suffix", logger):
            logits, cache = self._extend_jit(
                params, embeds, positions, cache,
                jnp.asarray([len(suffix)], jnp.int32),
            )
        return logits, cache

    @staticmethod
    @jax.jit
    def _seed_prefix_jit(cache: KVCache, k_pref, v_pref, p):
        k = jax.lax.dynamic_update_slice(
            cache.k, k_pref.astype(cache.k.dtype), (0, 0, 0, 0, 0)
        )
        v = jax.lax.dynamic_update_slice(
            cache.v, v_pref.astype(cache.v.dtype), (0, 0, 0, 0, 0)
        )
        return KVCache(k=k, v=v, lengths=jnp.reshape(p.astype(jnp.int32), (1,)))

    @staticmethod
    def _request_cache_len(bucket: int, max_tokens: int, cap: int) -> int:
        """Right-size a single request's KV buffer: decode attention reads
        the FULL buffer width every step (static shapes), so a 1k request in
        an 8k buffer pays 8x the cache-read traffic and mask work.  Rounded
        to 512-multiples so only a handful of decode shapes compile (+32
        slack covers the speculative-verify chunk overhang)."""
        need = bucket + max_tokens + 32
        return min(cap, ((need + 511) // 512) * 512)

    def _generate_locked(
        self, prompt, image_path, *, max_tokens, temperature, max_image_dim,
        json_mode: bool = False, json_schema: Optional[str] = None,
        min_tokens: Optional[int] = None,
    ) -> Iterator[str]:
        tc = self.text_config
        params = self.text_params if self.vlm_config is None else self.vlm_params["text"]
        json_tables = self._json_tables(json_schema) if json_mode else None
        sampled = temperature > 0.0
        if json_tables is not None:
            max_tokens = max(max_tokens, json_tables[-1].min_budget)
        cache, logits, next_pos, _, ids = self._prefill_request(
            prompt, image_path, max_tokens=max_tokens,
            max_image_dim=max_image_dim, right_size_cache=True,
        )

        key = jax.random.PRNGKey(0)
        emitted = ""
        generated: List[int] = []

        def emit_progress() -> Iterator[str]:
            nonlocal emitted
            text = self.tokenizer.decode(generated)
            if len(text) > len(emitted) and not text.endswith("�"):
                chunk_text = text[len(emitted):]
                emitted = text
                yield chunk_text

        _t_decode = time.perf_counter()
        with span("engine.decode", logger):
            if json_tables is not None:
                # Grammar-constrained decode (greedy or in-scan sampled):
                # fused chunks with a DFA carry; the budget-feasibility mask
                # guarantees the emitted JSON closes before the budget runs
                # out, ending at EOS.
                ok_t, trans_t, cost_t, cls_t, tables = json_tables
                floor = (
                    min_tokens if min_tokens is not None
                    else app_config.constrained_json_min_tokens
                )
                min_tok = min(max(floor, 0), max_tokens - 32)
                constraint = DecodeConstraint(
                    token_ok=ok_t, token_trans=trans_t, cost_after=cost_t,
                    class_of=cls_t,
                    state=jnp.full((1,), tables.init_state, jnp.int32),
                    remaining=jnp.full((1,), max_tokens, jnp.int32),
                    active=jnp.ones((1,), bool),
                    min_remaining=jnp.full(
                        (1,), max_tokens - max(min_tok, 0), jnp.int32
                    ),
                )
                remaining = max_tokens
                step0 = 0
                done = False
                chunk_idx = 0
                temp_arr = jnp.float32(temperature)
                window = max(0, int(app_config.constrained_lookahead))
                use_lookahead = (
                    2 <= window <= 16
                    and tables.forced_token is not None
                )
                if use_lookahead:
                    forced_tok_dev = jnp.asarray(tables.forced_token)
                    forced_state_dev = jnp.asarray(tables.forced_state)
                while remaining > 0 and not done:
                    kwargs = {}
                    if sampled:
                        kwargs = dict(
                            key=jax.random.fold_in(key, chunk_idx),
                            temperature=temp_arr,
                        )
                    if use_lookahead:
                        # Constant window count: `remaining` is data-
                        # dependent (each window emits 1..window tokens),
                        # and num_windows is a STATIC jit arg — sizing the
                        # chunk to it would recompile the full decode loop
                        # per distinct tail value.  The device-side EOS
                        # exit already stops unused windows, and the host
                        # emitted_n>=remaining guard enforces the budget.
                        n_win = self.decode_chunk
                        tokens, valid, logits, cache, constraint = (
                            self._decode_loop_lookahead_jit(
                                params, logits, jnp.int32(next_pos + step0),
                                cache, constraint, forced_tok_dev,
                                forced_state_dev, num_windows=n_win,
                                window=window,
                                eos_id=self.tokenizer.eos_id, **kwargs,
                            )
                        )
                        tok_mat = np.asarray(tokens)[0]
                        val_mat = np.asarray(valid)[0]
                        emitted_n = 0
                        for wi in range(tok_mat.shape[0]):
                            for token_id, ok in zip(
                                tok_mat[wi].tolist(), val_mat[wi].tolist()
                            ):
                                if not ok:
                                    break
                                emitted_n += 1
                                if token_id == self.tokenizer.eos_id:
                                    done = True
                                    break
                                generated.append(token_id)
                                if emitted_n >= remaining:
                                    # Budget exhausted mid-window: stop
                                    # appending (the EOS branch above
                                    # breaks; this one must too, or the
                                    # window's tail overruns max_tokens).
                                    done = True
                                    break
                            if done:
                                break
                        yield from emit_progress()
                        remaining -= emitted_n
                        step0 += emitted_n
                        chunk_idx += 1
                        continue
                    steps = min(self.decode_chunk, remaining)
                    tokens, logits, cache, constraint = (
                        self._decode_loop_json_jit(
                            params, logits, jnp.int32(next_pos + step0),
                            cache, constraint, num_steps=steps,
                            eos_id=self.tokenizer.eos_id, **kwargs,
                        )
                    )
                    for token_id in np.asarray(tokens)[0].tolist():
                        if token_id == self.tokenizer.eos_id:
                            done = True
                            break
                        generated.append(token_id)
                    yield from emit_progress()
                    remaining -= steps
                    step0 += steps
                    chunk_idx += 1
            elif temperature <= 0.0 and app_config.speculative_decoding == "pld":
                # Prompt-lookup speculative decoding: draft continuations by
                # n-gram lookup in (prompt + generated), verify the whole
                # draft in one device pass; greedy outputs exactly preserved.
                yield from self._decode_pld(
                    params, logits, cache, next_pos, ids[0].tolist(),
                    generated, emit_progress, max_tokens,
                )
            elif temperature <= 0.0:
                # Greedy: fused multi-token decode (one dispatch per chunk),
                # EOS checked host-side between chunks; chunks chain via the
                # final logits returned by decode_loop.
                yield from self._greedy_chunk_loop(
                    params, logits, cache, next_pos, generated,
                    emit_progress, max_tokens,
                )
            else:
                # Temperature sampling, fused: in-scan Gumbel-max chunks —
                # one device dispatch per chunk like greedy (the previous
                # per-token host loop paid one tunnel RTT per token).
                remaining = max_tokens
                step0 = 0
                done = False
                chunk_idx = 0
                temp_arr = jnp.float32(temperature)
                while remaining > 0 and not done:
                    steps = min(self.decode_chunk, remaining)
                    tokens, logits, cache, _ = self._decode_loop_sampled_jit(
                        params, logits, jnp.int32(next_pos + step0), cache,
                        jax.random.fold_in(key, chunk_idx), temp_arr,
                        num_steps=steps, eos_id=self.tokenizer.eos_id,
                    )
                    for token_id in np.asarray(tokens)[0].tolist():
                        if token_id == self.tokenizer.eos_id:
                            done = True
                            break
                        generated.append(token_id)
                    yield from emit_progress()
                    remaining -= steps
                    step0 += steps
                    chunk_idx += 1

        self.decode_device_s_total += time.perf_counter() - _t_decode
        self.last_decode_tokens = len(generated)
        self.decode_tokens_total += len(generated)
        final = self.tokenizer.decode(generated)
        if len(final) > len(emitted):
            yield final[len(emitted):]

    def _greedy_chunk_loop(self, params, logits, cache, start_pos,
                           generated, emit_progress,
                           budget) -> Iterator[str]:
        """Fused greedy chunks until EOS or `budget` tokens: one device
        dispatch per chunk (device-side EOS exit inside), host EOS check
        between chunks, chunks chained through decode_loop's final logits.
        Shared by the plain greedy path and the PLD tail — the two copies
        had already begun to drift before this helper."""
        remaining = budget
        step0 = 0
        done = False
        while remaining > 0 and not done:
            steps = min(self.decode_chunk, remaining)
            tokens, logits, cache = self._decode_loop_jit(
                params, logits, jnp.int32(start_pos + step0), cache,
                num_steps=steps, eos_id=self.tokenizer.eos_id,
            )
            for token_id in np.asarray(tokens)[0].tolist():
                if token_id == self.tokenizer.eos_id:
                    done = True
                    break
                generated.append(token_id)
            yield from emit_progress()
            remaining -= steps
            step0 += steps

    def _decode_pld(self, params, logits, cache, next_pos, context,
                    generated, emit_progress, max_tokens) -> Iterator[str]:
        """Greedy decode with prompt-lookup speculation (SPECULATIVE_DECODING
        =pld).  Loop invariant: `cur` is the last generated token, already
        emitted, with its K/V NOT yet in the cache.  Each iteration verifies
        [cur] + draft in ONE device pass (verify_scan), accepts the longest
        matching prefix plus the model's correction token, and rewinds the
        cache cursor over the rejected tail.  Exactly reproduces plain greedy
        decode by construction.  Falls back to the fused chunk path when
        acceptance stays low (non-repetitive outputs)."""
        tc = self.text_config
        K = 8
        bucket = K + 1
        table = params["embed_tokens"]
        cur = int(np.argmax(np.asarray(logits)[0]))
        if cur == self.tokenizer.eos_id:
            return
        generated.append(cur)
        yield from emit_progress()
        kv = len(context)
        rope = int(next_pos)
        remaining = max_tokens - 1
        recent: List[int] = []
        cache_cap = int(cache.k.shape[2])  # may be right-sized below max

        while remaining > 0 and kv + bucket <= cache_cap:
            if len(recent) >= 4 and sum(recent) / len(recent) < 2.0:
                break  # poor acceptance: fused chunks beat 1-2 tokens/pass
            draft = _pld_draft(context + generated, K)
            seq = [cur] + draft
            n_valid = len(seq)
            padded = np.zeros((1, bucket), np.int32)
            padded[0, :n_valid] = seq
            if tc.mrope_section is not None:
                pos = np.broadcast_to(
                    rope + np.arange(bucket, dtype=np.int32), (3, 1, bucket)
                ).copy()
            else:
                pos = (rope + np.arange(bucket, dtype=np.int32))[None]
            embeds = self._embed_jit(table, jnp.asarray(padded))
            greedy, cache = self._verify_jit(
                params, embeds, jnp.asarray(pos), cache,
                jnp.asarray([n_valid], jnp.int32),
            )
            g = np.asarray(greedy)[0]
            accepted = 0
            while accepted < len(draft) and g[accepted] == draft[accepted]:
                accepted += 1
            emitted = list(draft[:accepted]) + [int(g[accepted])]
            # verify advanced the cursor by n_valid; keep only the verified
            # prefix ([cur] + accepted draft tokens) — the garbage tail is
            # overwritten by later writes.
            kv += accepted + 1
            rope += accepted + 1
            cache = KVCache(
                k=cache.k, v=cache.v, lengths=jnp.asarray([kv], jnp.int32)
            )
            recent.append(len(emitted))
            if len(recent) > 4:
                recent.pop(0)
            for token_id in emitted:
                if token_id == self.tokenizer.eos_id:
                    yield from emit_progress()
                    return
                generated.append(token_id)
                remaining -= 1
                if remaining <= 0:
                    break
            yield from emit_progress()
            if remaining <= 0:
                return
            cur = generated[-1]

        if remaining <= 0:
            return
        # Tail via the fused chunk path.  cur's K/V is not yet written: one
        # decode_step writes it and produces the next distribution.
        if tc.mrope_section is not None:
            step_positions = jnp.full((3, 1, 1), rope, jnp.int32)
        else:
            step_positions = jnp.full((1, 1), rope, jnp.int32)
        emb = self._embed_jit(table, jnp.asarray([[cur]], jnp.int32))
        logits, cache = self._decode_jit(params, emb, step_positions, cache)
        rope += 1
        yield from self._greedy_chunk_loop(
            params, logits, cache, rope, generated, emit_progress, remaining
        )

    def generate(self, prompt, image_path=None, **kwargs) -> str:
        return "".join(self.generate_stream(prompt, image_path, **kwargs))

    def health_check(self) -> bool:
        try:
            out = self.generate("OK?", None, max_tokens=2)
            return out is not None
        except Exception as exc:
            logger.error(f"Engine health check failed: {exc}")
            return False


class EngineBackend:
    """InferenceBackend adapter over an Engine (what agents talk to)."""

    def __init__(self, engine: Engine):
        self.engine = engine
        self.name = f"tpu:{engine.name}"

    def generate(self, prompt, image_path=None, *, max_tokens=1024,
                 temperature=0.0, max_image_dim=2048,
                 json_mode: bool = False,
                 json_schema: Optional[str] = None,
                 schema_batched: bool = False,
                 min_tokens: Optional[int] = None) -> str:
        return self.engine.generate(
            prompt, image_path, max_tokens=max_tokens,
            temperature=temperature, max_image_dim=max_image_dim,
            json_mode=json_mode, json_schema=json_schema,
            schema_batched=schema_batched, min_tokens=min_tokens,
        )

    def generate_stream(self, prompt, image_path=None, *, max_tokens=1024,
                        temperature=0.0, max_image_dim=2048,
                        json_mode: bool = False,
                        json_schema: Optional[str] = None,
                        schema_batched: bool = False,
                        min_tokens: Optional[int] = None):
        yield from self.engine.generate_stream(
            prompt, image_path, max_tokens=max_tokens,
            temperature=temperature, max_image_dim=max_image_dim,
            json_mode=json_mode, json_schema=json_schema,
            schema_batched=schema_batched, min_tokens=min_tokens,
        )

    def health_check(self) -> bool:
        return self.engine.health_check()


# ---------------------------------------------------------------------------
# Engine construction / registry
# ---------------------------------------------------------------------------

_engines: Dict[str, Engine] = {}
_engine_lock = threading.Lock()


def _dev_vlm_config() -> Qwen2VLConfig:
    """Reduced-size Qwen2-VL for weightless operation: real compute path,
    random weights, byte-level tokenizer."""
    return Qwen2VLConfig(
        vision=__import__(
            "vis_tpu.models.qwen2_vl.config", fromlist=["VisionConfig"]
        ).VisionConfig(
            depth=8, embed_dim=640, num_heads=8, mlp_ratio=4, hidden_size=1024,
        ),
        text=DecoderConfig(
            vocab_size=1024, hidden_size=1024, num_layers=8, num_heads=8,
            num_kv_heads=2, intermediate_size=2816, rope_theta=1_000_000.0,
            qkv_bias=True, mrope_section=(16, 24, 24), tie_word_embeddings=True,
        ),
        image_token_id=261, vision_start_token_id=259, vision_end_token_id=260,
        eos_token_id=256,
    )


def _dev_text_config() -> DecoderConfig:
    return DecoderConfig(
        vocab_size=1024, hidden_size=1024, num_layers=8, num_heads=8,
        num_kv_heads=2, intermediate_size=2816, rope_theta=500000.0,
        qkv_bias=False, tie_word_embeddings=True,
    )


def _is_qwen25(model_name: str) -> bool:
    lower = model_name.lower()
    return "qwen2.5-vl" in lower or "qwen2_5_vl" in lower or "qwen2.5vl" in lower


def _is_mllama(model_name: str) -> bool:
    lname = model_name.lower()
    return "llama" in lname and "vision" in lname


def _is_llama4(model_name: str) -> bool:
    """The reference auditor's primary family (vlm_auditor.py:34:
    Llama-4-Maverick-17B-128E, falling back to Llama-3.2 Vision)."""
    lname = model_name.lower()
    return ("llama-4" in lname or "llama4" in lname
            or "maverick" in lname or "scout" in lname)


# Projection weights inside vision towers (Qwen ViT blocks/merger, Mllama
# ViT blocks/projector) quantized by name; embeddings, norms and gates are
# ADDED to activations (not matmul'd) and must stay full precision.
_VISION_QUANT_KEYS = frozenset({
    "qkv", "proj", "fc1", "fc2", "patch_embed",
    "q_proj", "k_proj", "v_proj", "o_proj", "projector",
    "gate_proj", "up_proj", "down_proj",  # Qwen2.5-VL SwiGLU tower
})


def _quantize_vision_tree(tree: Any, mode: str) -> Any:
    """Weight-only quantization of a vision tower's projection weights."""
    from vis_tpu.ops.quantized import quantize_weight, quantize_weight4

    quantize = quantize_weight4 if mode == "int4" else quantize_weight

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for key, value in node.items():
                if (key in _VISION_QUANT_KEYS and hasattr(value, "ndim")
                        and value.ndim == 2 and value.shape[1] % 2 == 0):
                    out[key] = quantize(value)
                else:
                    out[key] = walk(value)
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(tree)


def _byte_token_ids(cfg: Qwen2VLConfig) -> Qwen2VLConfig:
    """Point the config's multimodal token ids at the ByteTokenizer's
    specials (weightless profiles pair real-size configs with the byte
    tokenizer; embed_multimodal splices vision embeds by config id)."""
    import dataclasses as _dc

    return _dc.replace(
        cfg, image_token_id=261, vision_start_token_id=259,
        vision_end_token_id=260, eos_token_id=256,
    )


def _materialize_like(shape_tree, seed: int):
    """Materialize random arrays matching a pytree of ShapeDtypeStructs —
    WITHOUT running the computation that defined it.

    jax.eval_shape over the init+quantize composition yields the exact
    quantized parameter structure; generating each leaf directly keeps the
    peak footprint at the OUTPUT size (int4: ~4-5 GB per model) instead of
    staging bf16 intermediates (a 7B init+quantize program peaks at ~21 GB
    — past one v5e chip's 16 GB HBM).  Values are random: latency is
    weight-value independent.  Scales are small positive constants so
    activations stay finite through deep stacks.
    """
    leaves, treedef = jax.tree.flatten(shape_tree)

    def make(key):
        out = []
        keys = jax.random.split(key, len(leaves))
        for k, leaf in zip(keys, leaves):
            if jnp.issubdtype(leaf.dtype, jnp.unsignedinteger) or jnp.issubdtype(
                leaf.dtype, jnp.signedinteger
            ):
                out.append(jax.random.bits(k, leaf.shape, jnp.uint32 if
                           leaf.dtype == jnp.uint32 else jnp.uint8
                           ).astype(leaf.dtype))
            else:
                out.append(
                    (jax.random.normal(k, leaf.shape, jnp.float32) * 0.005
                     + 0.01).astype(leaf.dtype)
                )
        return treedef.unflatten(out)

    return jax.jit(make)(jax.random.PRNGKey(seed))


def _build_target_dev_engine(role: str, model_name: str, is_vlm: bool, mesh):
    """Weightless engines at TARGET model scale (DEV_PROFILE=target).

    Real 7B/11B/8B dimensions with random weights — the honest latency
    profile for BASELINE comparisons (weight values don't change timing).
    The quantized parameter structure comes from jax.eval_shape over the
    production init+quantize composition; leaves are materialized directly
    (see _materialize_like) so no bf16 intermediate ever touches HBM.
    """
    mode = app_config.quantization
    quantize = mode in ("int8", "int4")
    key = jax.random.PRNGKey(hash(role) % (2**31))

    if is_vlm and _is_llama4(model_name):
        # Single-chip "target scale" does not exist for Maverick (128
        # experts ~ 400B total params); the honest dev stand-in is the
        # dev-profile MoE geometry — EP over a pod is the deployment path
        # (parallel/sharding.shard_llama4_params + __graft_entry__ EP leg).
        from vis_tpu.models.llama4.config import Llama4Config
        from vis_tpu.models.llama4.model import init_params as init_llama4
        from vis_tpu.serving.engine_llama4 import Llama4Engine

        cfg4 = Llama4Config.dev_profile()
        params = _materialize_like(
            jax.eval_shape(lambda k: init_llama4(cfg4, k), key),
            hash(role) % (2**31),
        )
        tokenizer = ByteTokenizer(vocab_size=cfg4.text.vocab_size)
        logger.warning(
            f"{role}: Llama-4 at true Maverick scale needs EP over a pod; "
            "building the dev-profile MoE geometry "
            f"({cfg4.text.num_experts} experts, {cfg4.text.num_layers} "
            "layers) for single-chip latency work"
        )
        return Llama4Engine(
            f"target-{role}-llama4-dev-moe", cfg4, params, tokenizer,
            mesh=mesh, role=role,
        )

    if is_vlm and _is_mllama(model_name):
        from vis_tpu.models.llama.mllama import (
            MllamaConfig,
            fuse_mllama_projections,
            init_params as init_mllama,
            quantize_mllama_params,
        )
        from vis_tpu.serving.engine_mllama import MllamaEngine

        cfg = MllamaConfig.llama32_11b_vision()

        def make_mllama(k):
            p = init_mllama(cfg, k)
            if mesh is None:
                # Fuse under eval_shape so materialization creates the
                # fused layout directly (no transient double-residency).
                p = fuse_mllama_projections(cfg, p)
            if quantize:
                p = quantize_mllama_params(
                    p, mode=mode, vocab_mode=_vocab_quant_mode(role)
                )
                p = {
                    name: (_quantize_vision_tree(v, mode) if name != "text" else v)
                    for name, v in p.items()
                }
            return p

        params = _materialize_like(
            jax.eval_shape(make_mllama, key), hash(role) % (2**31)
        )
        tokenizer = ByteTokenizer(vocab_size=cfg.text.vocab_size)
        logger.info(f"{role}: target-scale Mllama-11B dev profile ({mode})")
        return MllamaEngine(
            f"target-{role}-mllama-11b", cfg, params, tokenizer, mesh=mesh,
            role=role,
        )

    if is_vlm and _is_qwen25(model_name):
        import dataclasses as _dc

        from vis_tpu.models import qwen2_5_vl as q25

        cfg25 = q25.Qwen25VLConfig.qwen2_5_vl_7b()
        cfg25 = _dc.replace(
            cfg25, image_token_id=261, vision_start_token_id=259,
            vision_end_token_id=260, eos_token_id=256,
        )

        def make_qwen25(k):
            from vis_tpu.models.common.decoder import (
                fuse_stacked_projections,
                quantize_stacked_params,
            )

            p = q25.init_params(cfg25, k)
            text = stack_decoder_layers(p["text"])
            if mesh is None:
                text = fuse_stacked_projections(text)
            if quantize:
                text = quantize_stacked_params(
                    text, quantize_embeddings=True, mode=mode,
                    vocab_mode=_vocab_quant_mode(role),
                )
                p["vision"] = _quantize_vision_tree(p["vision"], mode)
            p["text"] = text
            return p

        params = _materialize_like(
            jax.eval_shape(make_qwen25, key), hash(role) % (2**31)
        )
        tokenizer = ByteTokenizer(vocab_size=cfg25.text.vocab_size)
        logger.info(f"{role}: target-scale Qwen2.5-VL-7B dev profile ({mode})")
        return Engine(
            f"target-{role}-qwen25vl-7b", cfg25.text, None, tokenizer,
            vlm_config=cfg25, vlm_params=params, mesh=mesh,
        )

    if is_vlm:
        cfg = _byte_token_ids(Qwen2VLConfig.qwen2_vl_7b())

        def make_qwen(k):
            from vis_tpu.models.common.decoder import (
                fuse_stacked_projections,
                quantize_stacked_params,
            )

            p = qwen_model.init_params(cfg, k)
            text = stack_decoder_layers(p["text"])
            if mesh is None:
                text = fuse_stacked_projections(text)
            if quantize:
                text = quantize_stacked_params(
                    text, quantize_embeddings=True, mode=mode,
                    vocab_mode=_vocab_quant_mode(role),
                )
                p["vision"] = _quantize_vision_tree(p["vision"], mode)
            p["text"] = text
            return p

        params = _materialize_like(
            jax.eval_shape(make_qwen, key), hash(role) % (2**31)
        )
        tokenizer = ByteTokenizer(vocab_size=cfg.text.vocab_size)
        logger.info(f"{role}: target-scale Qwen2-VL-7B dev profile ({mode})")
        return Engine(
            f"target-{role}-qwen2vl-7b", cfg.text, None, tokenizer,
            vlm_config=cfg, vlm_params=params, mesh=mesh,
        )

    cfg = llama_configs.llama31_8b()

    def make_llama(k):
        from vis_tpu.models.common.decoder import (
            fuse_stacked_projections,
            quantize_stacked_params,
        )

        text = stack_decoder_layers(init_decoder_params(cfg, k))
        if mesh is None:
            text = fuse_stacked_projections(text)
        if quantize:
            text = quantize_stacked_params(
                text, quantize_embeddings=True, mode=mode,
                vocab_mode=_vocab_quant_mode(role),
            )
        return text

    params = _materialize_like(
        jax.eval_shape(make_llama, key), hash(role) % (2**31)
    )
    tokenizer = ByteTokenizer(vocab_size=cfg.vocab_size)
    logger.info(f"{role}: target-scale Llama-3.1-8B dev profile ({mode})")
    return Engine(f"target-{role}-llama31-8b", cfg, params, tokenizer, mesh=mesh)


def serving_mesh() -> Optional[jax.sharding.Mesh]:
    """Mesh for production serving, from config.mesh_shape.

    Returns None for "1x1" (single chip — engines then use the fused
    single-device layouts).  When the configured shape doesn't match the
    available device count, create_mesh falls back to (1, n_devices); a
    resulting 1-device mesh degrades to None rather than paying SPMD
    overhead on one chip."""
    shape = app_config.mesh_shape_tuple
    if int(np.prod(shape)) <= 1:
        return None
    from vis_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()
    if mesh.size <= 1:
        logger.warning(
            f"mesh_shape {app_config.mesh_shape} requested but only "
            f"{jax.device_count()} device(s) available; serving single-device"
        )
        return None
    logger.info(f"serving mesh: {dict(mesh.shape)} ({mesh.size} devices)")
    return mesh


_MESH_DEFAULT = object()


def dp_submeshes() -> Optional[List[jax.sharding.Mesh]]:
    """Data-parallel serving layout: for mesh_shape "DxM" with D > 1,
    return D disjoint TP submeshes of M devices each (None when the data
    axis is 1 or the devices aren't there).  Each submesh hosts a full
    engine REPLICA; requests round-robin across replicas (SURVEY §5.8 —
    throughput scales with the data axis while per-request latency keeps
    the TP speedup of the model axis).  A 1-device submesh returns as None
    in the list slot semantics below: callers pass mesh=None so the replica
    uses the fused single-device layouts."""
    dp, tp = app_config.mesh_shape_tuple
    if dp <= 1:
        return None
    if jax.device_count() < dp * tp:
        logger.warning(
            f"mesh_shape {app_config.mesh_shape} needs {dp * tp} devices, "
            f"have {jax.device_count()}; data-parallel serving disabled"
        )
        return None
    from vis_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    devices = jax.devices()[: dp * tp]
    meshes: List[Optional[jax.sharding.Mesh]] = []
    for i in range(dp):
        group = np.array(devices[i * tp:(i + 1) * tp]).reshape(1, tp)
        meshes.append(
            jax.sharding.Mesh(group, (DATA_AXIS, MODEL_AXIS))
            if tp > 1 else None
        )
    return meshes


class ReplicatedEngineBackend:
    """InferenceBackend over data-parallel engine replicas.

    Each replica is a full engine on its own TP submesh (disjoint chips);
    a generate call picks the replica with the fewest requests in flight,
    so run_batch_inspection's concurrent per-image threads spread the batch
    across the data axis with no orchestration-layer changes."""

    def __init__(self, backends: List["EngineBackend"]):
        assert backends
        self.backends = backends
        self.name = f"dp{len(backends)}:{backends[0].name}"
        self._inflight = [0] * len(backends)
        self._lock = threading.Lock()
        # Chat sessions pin KV state to one engine; expose replica 0 for
        # the session-capable consumers (ExplainerAgent.chat_session_stream).
        self.engine = backends[0].engine

    def _acquire(self) -> int:
        with self._lock:
            i = min(range(len(self.backends)), key=lambda j: self._inflight[j])
            self._inflight[i] += 1
            return i

    def _release(self, i: int) -> None:
        with self._lock:
            self._inflight[i] -= 1

    def generate(self, prompt, image_path=None, **kwargs) -> str:
        i = self._acquire()
        try:
            return self.backends[i].generate(prompt, image_path, **kwargs)
        finally:
            self._release(i)

    def generate_stream(self, prompt, image_path=None, **kwargs):
        i = self._acquire()
        try:
            yield from self.backends[i].generate_stream(
                prompt, image_path, **kwargs
            )
        finally:
            self._release(i)

    def health_check(self) -> bool:
        return all(b.health_check() for b in self.backends)


def build_engine(role: str, model_name: str, mesh: Any = _MESH_DEFAULT):
    """Create an engine for a role, loading real weights when available.

    When config.mesh_shape spans more than one device, engines are built
    tensor-parallel over the ("data", "model") mesh (SURVEY.md §5.8).
    mesh: explicit mesh override (None = single-device) — used by the
    data-parallel replica builder; default = serving_mesh()."""
    ckpt_root = app_config.get_checkpoint_dir()
    ckpt_dir = find_checkpoint(model_name, ckpt_root)
    is_vlm = role in ("inspector", "auditor")
    if mesh is _MESH_DEFAULT:
        mesh = serving_mesh()

    if ckpt_dir is not None:
        tokenizer = load_tokenizer(ckpt_dir)

        def _converted(convert_fn):
            """Convert the safetensors state dict lazily; with
            ORBAX_CONVERT_CACHE=true the framework pytree is cached next
            to the checkpoint after the first conversion and later builds
            restore it directly (skips the shard merge + tensor-name
            mapping — minutes at 7B+ scale on a slow host)."""
            from vis_tpu.models.loader import (
                load_converted_cache,
                save_converted_cache,
                source_stamp,
            )

            if not app_config.orbax_convert_cache:
                return convert_fn(read_safetensors_dir(ckpt_dir))
            cache = Path(ckpt_dir) / ".orbax_conversion_cache"
            stamp = source_stamp(ckpt_dir)
            params = load_converted_cache(cache, stamp)
            if params is not None:
                logger.info(f"Restored converted params from {cache}")
                return params
            params = convert_fn(read_safetensors_dir(ckpt_dir))
            try:
                save_converted_cache(params, cache, stamp)
                logger.info(f"Cached converted params at {cache}")
            except Exception as exc:
                logger.warning(f"Conversion cache save failed: {exc}")
            return params

        # The checkpoint's own config.json is the source of truth for shapes
        # (any model size loads); model-name presets are the fallback for
        # bare weight dirs.
        hf_cfg = None
        cfg_file = Path(ckpt_dir) / "config.json"
        if cfg_file.exists():
            import json

            hf_cfg = json.loads(cfg_file.read_text())
        model_type = (hf_cfg or {}).get("model_type", "")
        if is_vlm and (model_type == "llama4" or
                       (not model_type and _is_llama4(model_name))):
            from vis_tpu.models.llama4.config import Llama4Config
            from vis_tpu.models.llama4.model import (
                convert_hf_state_dict as convert_llama4,
            )
            from vis_tpu.serving.engine_llama4 import Llama4Engine

            cfg = (
                Llama4Config.from_hf_config(hf_cfg) if hf_cfg is not None
                else Llama4Config.maverick_17b_128e()
            )
            params = _converted(lambda state: convert_llama4(state, cfg))
            logger.info(f"{role}: loaded Llama-4 {model_name} from {ckpt_dir}")
            return Llama4Engine(model_name, cfg, params, tokenizer,
                                mesh=mesh, role=role)
        if is_vlm and (model_type == "mllama" or
                       (not model_type and _is_mllama(model_name))):
            from vis_tpu.models.llama.mllama import (
                MllamaConfig,
                convert_hf_state_dict as convert_mllama,
            )
            from vis_tpu.serving.engine_mllama import MllamaEngine

            cfg = (
                MllamaConfig.from_hf_config(hf_cfg) if hf_cfg is not None
                else MllamaConfig.llama32_11b_vision()
            )
            params = _converted(lambda state: convert_mllama(state, cfg))
            logger.info(f"{role}: loaded Mllama {model_name} from {ckpt_dir}")
            return MllamaEngine(model_name, cfg, params, tokenizer,
                                mesh=mesh, role=role)
        if is_vlm and (model_type == "qwen2_5_vl" or
                       (not model_type and _is_qwen25(model_name))):
            from vis_tpu.models import qwen2_5_vl as q25

            cfg = (
                q25.Qwen25VLConfig.from_hf_config(hf_cfg)
                if hf_cfg is not None else q25.Qwen25VLConfig.qwen2_5_vl_7b()
            )
            params = _converted(
                lambda state: q25.convert_hf_state_dict(state, cfg)
            )
            logger.info(f"{role}: loaded Qwen2.5-VL {model_name} from {ckpt_dir}")
            return Engine(
                model_name, cfg.text, None, tokenizer,
                vlm_config=cfg, vlm_params=params, mesh=mesh, role=role,
            )
        if is_vlm:
            if hf_cfg is not None:
                cfg = Qwen2VLConfig.from_hf_config(hf_cfg)
            else:
                cfg = (
                    Qwen2VLConfig.qwen2_vl_2b() if "2b" in model_name.lower()
                    else Qwen2VLConfig.qwen2_vl_7b()
                )
            params = _converted(
                lambda state: qwen_model.convert_hf_state_dict(state, cfg)
            )
            logger.info(f"{role}: loaded {model_name} from {ckpt_dir}")
            return Engine(
                model_name, cfg.text, None, tokenizer,
                vlm_config=cfg, vlm_params=params, mesh=mesh, role=role,
            )
        if hf_cfg is not None:
            cfg = llama_configs.from_hf_config(hf_cfg)
        else:
            cfg = (
                llama_configs.llama31_8b() if "8b" in model_name.lower()
                else llama_configs.llama32_3b()
            )
        params = _converted(
            lambda state: llama_model.convert_hf_state_dict(state, cfg)
        )
        logger.info(f"{role}: loaded {model_name} from {ckpt_dir}")
        return Engine(model_name, cfg, params, tokenizer, mesh=mesh,
                      role=role)

    # Weightless dev profile: random params, byte tokenizer.
    logger.warning(
        f"{role}: no checkpoint for {model_name} under {ckpt_root}; "
        "running dev-profile random weights (outputs are not meaningful text; "
        "use USE_MOCK_RESPONSES=true for deterministic pipeline behavior)"
    )
    if app_config.dev_profile == "target":
        return _build_target_dev_engine(role, model_name, is_vlm, mesh)
    key = jax.random.PRNGKey(hash(role) % (2**31))
    if is_vlm and _is_llama4(model_name):
        from vis_tpu.models.llama4.config import (
            Llama4Config,
            Llama4TextConfig,
            Llama4VisionConfig,
        )
        from vis_tpu.models.llama4.model import init_params as init_llama4
        from vis_tpu.serving.engine_llama4 import Llama4Engine

        cfg4 = Llama4Config(
            text=Llama4TextConfig(
                vocab_size=1024, hidden_size=512, num_layers=4,
                num_heads=8, num_kv_heads=2, head_dim=64,
                intermediate_size=1024, intermediate_size_mlp=2048,
                num_experts=4, top_k=1, interleave_moe_layer_step=2,
                attention_chunk_size=512, dtype=jnp.bfloat16,
            ),
            vision=Llama4VisionConfig(
                image_size=336, patch_size=14, hidden_size=128,
                num_layers=2, num_heads=4, intermediate_size=512,
                projector_input_dim=512, projector_output_dim=512,
                vision_output_dim=512, dtype=jnp.bfloat16,
            ),
        )
        params = init_llama4(cfg4, key)
        tokenizer = ByteTokenizer(vocab_size=cfg4.text.vocab_size)
        return Llama4Engine(f"dev-{role}-llama4", cfg4, params, tokenizer,
                            mesh=mesh, role=role)
    if is_vlm and _is_mllama(model_name):
        from vis_tpu.models.llama.mllama import MllamaConfig, MllamaVisionConfig
        from vis_tpu.serving.engine_mllama import MllamaEngine

        cfg = MllamaConfig(
            vision=MllamaVisionConfig(
                hidden_size=256, num_layers=4, num_global_layers=2,
                attention_heads=4, intermediate_size=704,
                intermediate_layers_indices=(1, 3),
            ),
            text=DecoderConfig(
                vocab_size=1024, hidden_size=1024, num_layers=8, num_heads=8,
                num_kv_heads=2, intermediate_size=2816, rope_theta=500000.0,
                qkv_bias=False, tie_word_embeddings=True,
            ),
            cross_attention_layers=(1, 5),
            image_token_id=261, eos_token_id=256,
        )
        from vis_tpu.models.llama.mllama import init_params as init_mllama

        params = init_mllama(cfg, key)
        tokenizer = ByteTokenizer(vocab_size=cfg.text.vocab_size)
        return MllamaEngine(f"dev-{role}-mllama", cfg, params, tokenizer,
                            mesh=mesh, role=role)
    if is_vlm and _is_qwen25(model_name):
        from vis_tpu.models import qwen2_5_vl as q25

        cfg = q25.Qwen25VLConfig(
            vision=q25.Qwen25VisionConfig(
                depth=4, hidden_size=256, intermediate_size=704, num_heads=4,
                out_hidden_size=1024, window_size=112,
                fullatt_block_indexes=(1, 3),
            ),
            text=DecoderConfig(
                vocab_size=1024, hidden_size=1024, num_layers=8, num_heads=8,
                num_kv_heads=2, intermediate_size=2816,
                rope_theta=1_000_000.0, qkv_bias=True,
                mrope_section=(16, 24, 24), tie_word_embeddings=True,
            ),
            image_token_id=261, vision_start_token_id=259,
            vision_end_token_id=260, eos_token_id=256,
        )
        params = q25.init_params(cfg, key)
        tokenizer = ByteTokenizer(vocab_size=cfg.text.vocab_size)
        return Engine(
            f"dev-{role}-qwen25", cfg.text, None, tokenizer,
            vlm_config=cfg, vlm_params=params, mesh=mesh, role=role,
        )
    if is_vlm:
        cfg = _dev_vlm_config()
        params = qwen_model.init_params(cfg, key)
        tokenizer = ByteTokenizer(vocab_size=cfg.text.vocab_size)
        return Engine(
            f"dev-{role}", cfg.text, None, tokenizer,
            vlm_config=cfg, vlm_params=params, mesh=mesh, role=role,
        )
    cfg = _dev_text_config()
    params = init_decoder_params(cfg, key)
    tokenizer = ByteTokenizer(vocab_size=cfg.vocab_size)
    return Engine(f"dev-{role}", cfg, params, tokenizer, mesh=mesh,
                  role=role)


_dp_backends: Dict[str, "ReplicatedEngineBackend"] = {}


def _commit_engine_params(engine, dev) -> None:
    """Commit an engine's parameter trees to `dev` (sticky placement).

    Arrays built under jax.default_device(dev) live on dev but stay
    UNCOMMITTED — a later dispatch outside that context would default back
    to device 0 and silently migrate the whole model.  device_put with an
    explicit device is a zero-copy commit for already-resident arrays;
    every subsequent jit then runs on the replica's own chip (uncommitted
    host inputs follow the committed params)."""
    import jax as _jax

    def _put(tree):
        return (
            None if tree is None else _jax.device_put(tree, dev)
        )

    for attr in ("text_params", "vlm_params", "params"):
        if getattr(engine, attr, None) is not None:
            setattr(engine, attr, _put(getattr(engine, attr)))
    # Device preprocess must land its frames on THIS chip too (a committed
    # frame on another device would not colocate with the params in jit).
    engine._device = dev


def _maybe_attach_scheduler(role: str, engine) -> None:
    # Opt-in serving mode: per-request prefill + shared batched
    # decode slots (CONTINUOUS_BATCHING=true).  Slot KV memory is
    # decode_batch_size x kv_cache_max_tokens per model — size the
    # config accordingly for large models.
    roles = {r.strip() for r in app_config.batching_roles.split(",") if r}
    if (
        app_config.continuous_batching
        and hasattr(engine, "attach_scheduler")
        and ("all" in roles or role in roles)
    ):
        engine.attach_scheduler()


def get_engine_backend(role: str, model_name: str) -> EngineBackend:
    with _engine_lock:
        key = f"{role}:{model_name}"
        submeshes = dp_submeshes()
        if submeshes is not None:
            # Data-parallel serving: one full engine replica per TP
            # submesh of the data axis; the shared backend routes each
            # request to the least-loaded replica.
            if key not in _dp_backends:
                _, tp = app_config.mesh_shape_tuple
                replicas = []
                for i, sub in enumerate(submeshes):
                    rkey = f"{key}#dp{i}"
                    if rkey not in _engines:
                        if sub is None:
                            # tp==1 replicas ("Dx1"): the submesh is None
                            # (fused single-device layouts), so pin replica
                            # i's params/caches/compute to ITS chip — all
                            # replicas landing on the JAX default device
                            # would defeat data parallelism and stack D
                            # full engines into one chip's HBM.
                            dev = jax.devices()[i * tp]
                            with jax.default_device(dev):
                                engine = build_engine(
                                    role, model_name, mesh=None
                                )
                                _commit_engine_params(engine, dev)
                                # Scheduler state (slot KV caches / paged
                                # pool — hundreds of MB at target dims)
                                # must also allocate on THIS replica's
                                # chip, not the global default device.
                                _maybe_attach_scheduler(role, engine)
                        else:
                            engine = build_engine(role, model_name, mesh=sub)
                            _maybe_attach_scheduler(role, engine)
                        _engines[rkey] = engine
                    replicas.append(EngineBackend(_engines[rkey]))
                _dp_backends[key] = ReplicatedEngineBackend(replicas)
            return _dp_backends[key]
        if key not in _engines:
            engine = build_engine(role, model_name)
            _maybe_attach_scheduler(role, engine)
            _engines[key] = engine
        return EngineBackend(_engines[key])


def reset_engines() -> None:
    with _engine_lock:
        _engines.clear()
        _dp_backends.clear()


__all__ = ["Engine", "EngineBackend", "ReplicatedEngineBackend",
           "build_engine", "dp_submeshes", "get_engine_backend",
           "reset_engines"]
