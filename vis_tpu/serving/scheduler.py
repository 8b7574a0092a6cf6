"""Continuous-batching scheduler: many requests share one model's decode.

The serving tier the reference lacked (SURVEY.md §7 step 6; the reference
processed requests strictly sequentially over HTTP).  One scheduler thread
owns a model's device state; concurrency discipline is a queue + the single
scheduler thread (SURVEY.md §5.2 plan):

- S decode slots share one KVCache with per-row cursors,
- a new request is prefilled alone (bucketed batch-1 compile) and its KV
  rows are copied into a free slot,
- all active slots decode together in one batched device step (decode is
  HBM-bandwidth-bound, so batching is nearly free),
- tokens stream to per-request queues; EOS/max-token slots free up and
  waiting requests take their place (pending admissions drain into free
  slots between decode chunks — prefill is ~an order of magnitude cheaper
  than a chunk, so simultaneous arrivals share the first chunk).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
import uuid
from functools import partial
from typing import Any, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vis_tpu.models.common.decoder import (
    DecodeConstraint,
    DecoderConfig,
    decode_loop_paged,
    decode_loop_paged_constrained,
    decode_loop_scan,
    decode_loop_scan_constrained,
    decode_loop_scan_sampled,
    decode_step_scan,
    extend_scan,
    prefill_scan,
    stack_decoder_layers,
)
from vis_tpu.models.common.layers import KVCache, embed, kv_cache_dtype
from vis_tpu.serving.tokenizer import Tokenizer
from vis_tpu.utils.config import config as app_config
from vis_tpu.utils.logger import setup_logger, span

logger = setup_logger(__name__, level="INFO", component="SCHEDULER")

# Stacked-tables size budget (T * S_max * K entries; three such arrays live
# on device).  Generous for narrow byte-level tables; at a real 152k vocab
# it admits the generic grammar plus the small schemas.
_MAX_STACKED_ENTRIES = 64_000_000


@dataclasses.dataclass
class Request:
    prompt: str
    max_tokens: int = 512
    request_id: str = dataclasses.field(
        default_factory=lambda: str(uuid.uuid4())[:8]
    )
    # Stream of decoded text chunks; a final None marks completion.
    out: "queue.Queue[Optional[str]]" = dataclasses.field(
        default_factory=queue.Queue
    )
    generated: List[int] = dataclasses.field(default_factory=list)
    emitted: str = ""
    error: Optional[str] = None
    # Prefilled hand-off (engines do their own — possibly multimodal —
    # prefill and submit the resulting KV rows + first logits for batched
    # decode): (src_cache KVCache[b=1], logits [1, v], next_position int,
    # kv_len int|None).
    prefilled: Optional[Any] = None
    # JSON-grammar-constrained decode for this request (requires the
    # scheduler to have been built with constraint tables).
    json_mode: bool = False
    # Schema-exact grammar for this request: a table name registered at
    # scheduler build (None = the generic JSON grammar).  Schema rows and
    # generic rows mix in one batched chunk via stacked tables.
    schema: Optional[str] = None
    # Sampling temperature (0 = greedy); per-slot in the batched chunk.
    temperature: float = 0.0
    # Per-request JSON-close floor override (tokens): None = the global
    # config floor.  Bench fixtures pin floor≈budget so decode lengths
    # reproduce a recorded transcript instead of drifting with
    # compiled-graph content (VERDICT r4 #2).
    min_tokens: Optional[int] = None


@dataclasses.dataclass
class _Slot:
    request: Optional[Request] = None
    position: int = 0          # next decode position (rope)
    remaining: int = 0
    # False while a chunked prefill is still filling this slot's cache
    # (the slot is reserved but must not join batched decode yet).
    ready: bool = True

    @property
    def active(self) -> bool:
        return self.request is not None and self.ready


class ContinuousBatchingScheduler:
    """Text-model scheduler (vision prefill is handled by the engine before
    submission in the VLM path; this class batches the decode phase)."""

    def __init__(
        self,
        text_config: DecoderConfig,
        params: Any,
        tokenizer: Tokenizer,
        num_slots: Optional[int] = None,
        max_len: Optional[int] = None,
        paged: Optional[bool] = None,
        json_tables: Optional[Any] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        self.config = text_config
        self.mesh = mesh
        # Scan-execution layout (stacked layer params).
        self.params = (
            params if "layers_stacked" in params else stack_decoder_layers(params)
        )
        self.tokenizer = tokenizer
        self.num_slots = num_slots or app_config.decode_batch_size
        self.max_len = max_len or app_config.kv_cache_max_tokens
        self.paged = app_config.paged_kv_cache if paged is None else paged

        if self.paged:
            # Paged layout: one shared page pool sized to the workload
            # (kv_pool_tokens) instead of slots x max_len dense rows; pages
            # are reserved per request at admission (vis_tpu.serving.paged_kv).
            from vis_tpu.serving.paged_kv import PagedKVPool

            self.pool = PagedKVPool(
                text_config.num_layers, self.num_slots, self.max_len,
                text_config.num_kv_heads, text_config.head_dim_,
                page_size=app_config.kv_page_size,
                pool_tokens=app_config.kv_pool_tokens,
                dtype=kv_cache_dtype(text_config.dtype),
            )
            self.cache = None
            dense_tokens = self.num_slots * self.max_len
            pool_tokens = (self.pool.n_pages - 1) * self.pool.page_size
            logger.info(
                f"paged KV: {self.pool.n_pages - 1} pages x "
                f"{self.pool.page_size} tokens = {pool_tokens} pooled tokens "
                f"({self.pool.memory_bytes() / 1e6:.0f} MB; dense layout "
                f"would hold {dense_tokens})"
            )
        else:
            self.pool = None
            cache = KVCache.create(
                text_config.num_layers, self.num_slots, self.max_len,
                text_config.num_kv_heads, text_config.head_dim_,
                dtype=kv_cache_dtype(text_config.dtype),
            )
            if mesh is not None:
                # TP-sharded engines pass their mesh: the shared slot cache
                # lives head-sharded over the "model" axis (replicated when
                # kv_heads doesn't divide it — e.g. 4 kv heads on tp=8),
                # matching the per-request caches the engine prefills, so
                # batched decode stays SPMD with no resharding transfers.
                from vis_tpu.parallel.sharding import kv_cache_sharding

                sharding = kv_cache_sharding(mesh, text_config.num_kv_heads)
                try:
                    cache = KVCache(
                        k=jax.device_put(cache.k, sharding),
                        v=jax.device_put(cache.v, sharding),
                        lengths=jax.device_put(
                            cache.lengths,
                            jax.sharding.NamedSharding(
                                mesh, jax.sharding.PartitionSpec()
                            ),
                        ),
                    )
                except ValueError as exc:
                    # Do NOT silently fall back: a mis-sharded slot cache on
                    # a real pod decodes correctly but reshards every chunk.
                    logger.warning(
                        "slot KV cache could not take the TP sharding "
                        f"(kv_heads={text_config.num_kv_heads}, "
                        f"slots={self.num_slots}, mesh={mesh.shape}): {exc}; "
                        "leaving default placement"
                    )
            self.cache = cache
        self.slots = [_Slot() for _ in range(self.num_slots)]
        # Host mirror of the cache cursors: the decode loop must never
        # np.asarray(cache.lengths) — that is a device sync (a full tunnel
        # round-trip per chunk on remote chips).
        self._lengths_host = np.zeros((self.num_slots,), np.int32)
        self._logits = jnp.zeros(
            (self.num_slots, text_config.vocab_size), jnp.float32
        )
        # Per-slot JSON-grammar DFA rows (vis_tpu.serving.constrained): when
        # tables are provided, every chunk runs the constrained loop — rows
        # without json_mode stay inactive (raw argmax), so mixed batches
        # share one compiled program.
        #
        # json_tables is either a single ConstraintTables (generic JSON) or
        # a dict {name-or-None: ConstraintTables}; multiple grammars are
        # S-padded and STACKED to [T, S_max, K] with a per-slot table index,
        # so schema-exact rows (e.g. decision_support) batch with free-form
        # and generic-JSON rows in one compiled chunk.  Tables are admitted
        # in dict order until the stacked size budget is hit; callers check
        # has_table() and fall back to unbatched decode for the rest.
        if json_tables is None:
            tables_map = {}
        elif isinstance(json_tables, dict):
            tables_map = {
                k: v for k, v in json_tables.items() if v is not None
            }
        else:
            tables_map = {None: json_tables}
        kept: dict = {}
        entries = 0
        for name, tbl in tables_map.items():
            smax = max(
                [t.token_ok.shape[0] for t in kept.values()]
                + [tbl.token_ok.shape[0]]
            )
            # Both axes pad to the max: the stacked arrays are
            # [T, smax, kmax], so the size estimate must use the widest K
            # too (a narrow compressed grammar next to a dense one costs
            # the dense width).
            kmax = max(
                [t.token_ok.shape[1] for t in kept.values()]
                + [tbl.token_ok.shape[1]]
            )
            new_entries = (len(kept) + 1) * smax * kmax
            if kept and new_entries > _MAX_STACKED_ENTRIES:
                logger.info(
                    f"constraint table '{name}' skipped: stacked size "
                    f"{new_entries} entries over budget"
                )
                continue
            kept[name] = tbl
            entries = new_entries
        self._tables_map = kept
        self._table_index = {name: i for i, name in enumerate(kept)}
        self._json_tables = kept.get(None)  # generic JSON (back-compat)
        if kept:
            smax = max(t.token_ok.shape[0] for t in kept.values())
            # Column-compressed tables (real vocabs) have per-grammar K:
            # pad K to the max as well and stack each grammar's vocab ->
            # column map ([T, V]); padded columns are unreachable (every
            # class_of value is < that grammar's own K).  Compression is
            # per-TOKENIZER (constrained.py), so dense and compressed
            # grammars never mix within one engine's stack.
            kmax = max(t.token_ok.shape[1] for t in kept.values())
            compressed = any(t.class_of is not None for t in kept.values())
            oks, transs, costs, classes = [], [], [], []
            for t in kept.values():
                pad = ((0, smax - t.token_ok.shape[0]),
                       (0, kmax - t.token_ok.shape[1]))
                oks.append(np.pad(t.token_ok, pad))
                transs.append(np.pad(t.token_trans, pad))
                costs.append(
                    np.pad(t.cost_after, pad, constant_values=2**30)
                )
                if compressed:
                    classes.append(t.class_of)
            self._json_dev = (
                jnp.asarray(np.stack(oks)),
                jnp.asarray(np.stack(transs)),
                jnp.asarray(np.stack(costs)),
                jnp.asarray(np.stack(classes)) if compressed else None,
            )
        else:
            self._json_dev = None
        self._fsm_table = jnp.zeros((self.num_slots,), jnp.int32)
        self._fsm_state = jnp.zeros((self.num_slots,), jnp.int32)
        self._fsm_remaining = jnp.ones((self.num_slots,), jnp.int32)
        self._fsm_active = jnp.zeros((self.num_slots,), bool)
        self._fsm_min_remaining = jnp.zeros((self.num_slots,), jnp.int32)
        # Per-slot sampling temperatures (0 = greedy); rows mix freely in
        # one batched chunk (gumbel_sample_token keeps temp<=0 rows
        # exact-greedy).
        self._temps_host = np.zeros((self.num_slots,), np.float32)
        self._sample_base_key = jax.random.PRNGKey(0)
        self._chunk_counter = 0
        # Chip seconds inside batched decode dispatch+sync blocks; the
        # owning Engine folds this into decode_seconds_total for the
        # bench's per-model tokens/s.
        self.decode_device_s_total = 0.0

        self._pending: "queue.Queue[Request]" = queue.Queue()
        self._shutdown = threading.Event()
        self._thread: Optional[threading.Thread] = None

        self._prefill_jit = jax.jit(partial(prefill_scan, text_config))
        self._decode_jit = jax.jit(partial(decode_step_scan, text_config))
        # Chunked batched decode: all slots advance `decode_chunk` tokens in
        # ONE device dispatch (host round-trips amortize; a slot finishing
        # mid-chunk wastes its tail, and admissions wait at most one chunk).
        # Tunnel round-trips cost ~10-30 ms each, so the chunk must amortize
        # them: 32 steps at ~5 ms/step keeps overhead under 20%.  Budget-
        # aware device-side early exit bounds a chunk's tail, so high-RTT
        # links can raise this (SCHEDULER_DECODE_CHUNK) without paying the
        # full chunk on short answers.
        self.decode_chunk = app_config.scheduler_decode_chunk
        # Donate the cache: without donation every chunk copies the full
        # [L, slots, max_len, kvh, hd] k/v buffers.
        self._decode_loop_jit = jax.jit(
            partial(decode_loop_scan, text_config),
            static_argnames=("num_steps", "eos_id"), donate_argnums=(3,),
        )
        self._insert_jit = jax.jit(self._insert_rows, donate_argnums=(0, 4))
        self._decode_paged_jit = jax.jit(
            partial(decode_loop_paged, text_config),
            static_argnames=("num_steps", "eos_id"), donate_argnums=(3, 4),
        )
        self._insert_paged_jit = jax.jit(
            self._insert_pages, donate_argnums=(0, 1, 5),
            static_argnames=("page",),
        )
        self._decode_loop_con_jit = jax.jit(
            partial(decode_loop_scan_constrained, text_config),
            static_argnames=("num_steps", "eos_id"), donate_argnums=(3,),
        )
        self._decode_paged_con_jit = jax.jit(
            partial(decode_loop_paged_constrained, text_config),
            static_argnames=("num_steps", "eos_id"), donate_argnums=(3, 4),
        )
        self._decode_loop_sampled_jit = jax.jit(
            partial(decode_loop_scan_sampled, text_config),
            static_argnames=("num_steps", "eos_id"), donate_argnums=(3,),
        )
        self._embed_jit = jax.jit(lambda table, ids: embed(ids, table))
        # Chunked prefill (SURVEY §7 hard part 3): long prompts fill their
        # slot's cache in fixed-size segments interleaved with decode
        # chunks, so an in-flight request's TTFT/throughput is not stalled
        # behind a multi-thousand-token admission.
        self.chunked_prefill = app_config.chunked_prefill_tokens
        # Donate the staging cache: each segment rebinds it to the result,
        # and an undonated call copies the full max_len buffer per segment.
        self._extend_jit = jax.jit(
            partial(extend_scan, text_config), donate_argnums=(3,)
        )
        self._prefilling: Optional[dict] = None
        self.prefill_segments_done = 0  # observability/testing

    # -- device helpers --------------------------------------------------
    @staticmethod
    def _insert_rows(cache: KVCache, src: KVCache, slot: jnp.ndarray,
                     length: jnp.ndarray, logits_buf: jnp.ndarray,
                     row_logits: jnp.ndarray):
        """Copy the batch-1 prefill cache (src) into slot `slot` of the
        shared cache, set its cursor, and stash its first-token logits."""
        src_len = src.k.shape[2]
        k = jax.lax.dynamic_update_slice(
            cache.k, src.k, (0, slot, 0, 0, 0)
        )
        v = jax.lax.dynamic_update_slice(
            cache.v, src.v, (0, slot, 0, 0, 0)
        )
        lengths = cache.lengths.at[slot].set(length)
        logits_buf = jax.lax.dynamic_update_slice(
            logits_buf, row_logits, (slot, 0)
        )
        return KVCache(k=k, v=v, lengths=lengths), logits_buf

    @staticmethod
    def _insert_pages(pool_k: jnp.ndarray, pool_v: jnp.ndarray, src: KVCache,
                      idx_vec: jnp.ndarray, slot: jnp.ndarray,
                      logits_buf: jnp.ndarray, row_logits: jnp.ndarray,
                      *, page: int):
        """Scatter a batch-1 prefill cache into the slot's reserved pages.

        idx_vec [max_pages]: destination pool page per source page; entries
        beyond the reservation point at the trash page (0) so the scatter
        compiles once regardless of prompt length."""
        n_layers, _, max_len = src.k.shape[:3]
        tail = src.k.shape[3:]
        src_k = src.k[:, 0].reshape(n_layers, max_len // page, page, *tail)
        src_v = src.v[:, 0].reshape(n_layers, max_len // page, page, *tail)
        pool_k = pool_k.at[:, idx_vec].set(src_k.astype(pool_k.dtype))
        pool_v = pool_v.at[:, idx_vec].set(src_v.astype(pool_v.dtype))
        logits_buf = jax.lax.dynamic_update_slice(
            logits_buf, row_logits, (slot, 0)
        )
        return pool_k, pool_v, logits_buf

    # -- public API ------------------------------------------------------
    def start(self) -> None:
        if self._thread is not None:
            return
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="vis-tpu-scheduler")
        self._thread.start()

    def stop(self) -> None:
        self._shutdown.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None

    def _check_alive(self) -> None:
        """Fail fast when the scheduler loop is gone: a request queued to a
        dead thread blocks its caller for the full generate() timeout (10+
        minutes) — the r5 batch leg hung its whole bench that way."""
        t = getattr(self, "_thread", None)
        if self._shutdown.is_set() or (t is not None and not t.is_alive()):
            raise RuntimeError(
                "scheduler thread is not running; restart the scheduler "
                "(attach_scheduler) before submitting"
            )

    def submit(self, prompt: str, max_tokens: int = 512,
               json_mode: bool = False,
               temperature: float = 0.0,
               schema: Optional[str] = None,
               min_tokens: Optional[int] = None) -> Request:
        self._check_alive()
        self._check_modes(json_mode, temperature, schema)
        max_tokens = self._feasible_budget(json_mode, max_tokens, schema)
        request = Request(prompt=prompt, max_tokens=max_tokens,
                          json_mode=json_mode, temperature=temperature,
                          schema=schema, min_tokens=min_tokens)
        self._pending.put(request)
        return request

    def has_table(self, schema: Optional[str]) -> bool:
        """True when `schema` (None = generic JSON) is in the stacked
        device tables, i.e. requests with it can join batched decode."""
        return schema in self._table_index

    def _feasible_budget(self, json_mode: bool, max_tokens: int,
                         schema: Optional[str] = None) -> int:
        """json_mode needs max_tokens >= the tables' min_budget, or the
        feasibility mask is all-False from step one and argmax emits
        arbitrary tokens.  Engine callers bump before submitting; the
        public scheduler API must enforce the same invariant."""
        if json_mode:
            tables = self._tables_map.get(schema) or self._json_tables
            if tables is not None:
                return max(max_tokens, int(tables.min_budget))
        return max_tokens

    def _check_modes(self, json_mode: bool, temperature: float,
                     schema: Optional[str] = None) -> None:
        if json_mode and self._json_dev is None:
            raise ValueError(
                "json_mode requires the scheduler to be built with "
                "constraint tables (json_tables=)"
            )
        if json_mode and schema is None and self._json_tables is None:
            raise ValueError(
                "generic json_mode requires the scheduler's tables to "
                "include the generic JSON grammar (key None)"
            )
        if schema is not None and not json_mode:
            raise ValueError("schema= requires json_mode=True")
        if schema is not None and schema not in self._table_index:
            raise ValueError(
                f"schema '{schema}' is not in this scheduler's stacked "
                f"tables (have: {sorted(k for k in self._table_index if k)})"
            )
        if temperature > 0.0 and self.paged and self._json_dev is None:
            raise ValueError(
                "sampled decode over the paged pool requires constraint "
                "tables (the sampled paged loop rides the constrained path)"
            )

    def submit_prefilled(
        self,
        src_cache: KVCache,
        first_logits: jnp.ndarray,
        next_position: int,
        max_tokens: int = 512,
        kv_len: Optional[int] = None,
        json_mode: bool = False,
        temperature: float = 0.0,
        schema: Optional[str] = None,
        min_tokens: Optional[int] = None,
    ) -> Request:
        """Hand off an externally prefilled request (e.g. a VLM engine's
        vision+multimodal prefill) for batched decode.  src_cache is a
        batch-1 cache with its cursor set; its length may be anything up to
        this scheduler's max_len (128-aligned for paged pools) — prompt-
        bucket-sized staging keeps bundle admissions cheap in HBM.
        Pass kv_len (the cursor value) when known host-side — it saves a
        blocking device read at admission (kv_len != next_position for
        M-RoPE models, where rope positions run ahead of cache slots)."""
        self._check_alive()
        self._check_modes(json_mode, temperature, schema)
        max_tokens = self._feasible_budget(json_mode, max_tokens, schema)
        request = Request(prompt="", max_tokens=max_tokens,
                          json_mode=json_mode, temperature=temperature,
                          schema=schema, min_tokens=min_tokens)
        request.prefilled = (src_cache, first_logits, int(next_position), kv_len)
        self._pending.put(request)
        return request

    def generate(self, prompt: str, max_tokens: int = 512,
                 timeout: Optional[float] = None) -> str:
        """Blocking helper: submit and drain the stream.  The default
        deadline scales the reference's API_TIMEOUT (its per-HTTP-call
        budget) to a whole on-pod generation."""
        timeout = timeout or 10.0 * max(60, app_config.api_timeout)
        request = self.submit(prompt, max_tokens)
        chunks = []
        deadline = time.time() + timeout
        while True:
            chunk = request.out.get(timeout=max(0.1, deadline - time.time()))
            if chunk is None:
                break
            chunks.append(chunk)
        if request.error:
            raise RuntimeError(request.error)
        return "".join(chunks)

    def stream(self, prompt: str, max_tokens: int = 512,
               timeout: Optional[float] = None) -> Iterator[str]:
        timeout = timeout or 10.0 * max(60, app_config.api_timeout)
        request = self.submit(prompt, max_tokens)
        deadline = time.time() + timeout
        while True:
            chunk = request.out.get(timeout=max(0.1, deadline - time.time()))
            if chunk is None:
                break
            yield chunk

    @property
    def active_count(self) -> int:
        return sum(1 for s in self.slots if s.active)

    # -- scheduler loop --------------------------------------------------
    def _reserve_paged(self, free: int, request: Request, kv_len: int) -> bool:
        """Reserve the request's full KV budget in the page pool.

        The budget is prompt + max_tokens + one decode chunk of slack (a
        chunk always runs its full static step count; the tail past a slot's
        budget lands in its own reserved pages and is rewound).  On a full
        pool the request is requeued and retried when pages free up; a
        request that can NEVER fit errors out immediately."""
        if not self.paged:
            return True
        budget = kv_len + request.max_tokens + self.decode_chunk
        need = self.pool.pages_for(budget)
        # Infeasible EVER: beyond the pool, or beyond one slot's
        # addressable window (max_pages entries) — requeueing would spin.
        if need > self.pool.n_pages - 1 or need > self.pool.max_pages:
            limit = min(
                (self.pool.n_pages - 1) * self.pool.page_size,
                self.pool.max_pages * self.pool.page_size,
            )
            request.error = (
                f"request KV budget ({budget} tokens) exceeds the paged-KV "
                f"limit ({limit} tokens)"
            )
            request.out.put(None)
            logger.error(f"{request.request_id}: {request.error}")
            return False
        if not self.pool.try_reserve(free, budget):
            logger.info(
                f"page pool full ({self.pool.free_pages} pages free); "
                f"requeueing {request.request_id}"
            )
            self._pending.put(request)
            return False
        return True

    def _admit_one(self) -> bool:
        """Prefill one waiting request into a free slot.  Returns True if a
        request was admitted."""
        free = next(
            (i for i, s in enumerate(self.slots) if s.request is None), None
        )
        if free is None:
            return False
        try:
            request = self._pending.get_nowait()
        except queue.Empty:
            return False
        if self.paged:
            # Idle pools release their device buffers (see _run); re-create
            # them before the first insert of a new burst of work.
            self.pool.ensure_buffers()

        try:
            if request.prefilled is not None:
                tmp_cache, logits, next_position, kv_len = request.prefilled
                seq_len = next_position
                if kv_len is None:
                    kv_len = int(np.asarray(tmp_cache.lengths)[0])
                if (
                    not self.paged
                    and kv_len + request.max_tokens + self.decode_chunk
                    > self.max_len
                ):
                    # Dense slots have no reservation step: without this
                    # check decode writes past max_len would CLAMP onto the
                    # last KV slot and silently corrupt attention (the
                    # paged path rejects the same case in _reserve_paged).
                    request.error = (
                        f"prefilled KV ({kv_len}) + max_tokens "
                        f"({request.max_tokens}) + chunk slack exceeds the "
                        f"scheduler's max_len ({self.max_len})"
                    )
                    request.out.put(None)
                    logger.error(f"{request.request_id}: {request.error}")
                    return False
                if not self._reserve_paged(free, request, kv_len):
                    return False  # requeued; prefilled hand-off kept intact
                request.prefilled = None  # free the reference
            else:
                ids = self.tokenizer.encode(request.prompt)
                budget = self.max_len - request.max_tokens - 1
                if budget < 2:
                    request.error = (
                        f"max_tokens ({request.max_tokens}) leaves no "
                        f"prompt room in max_len ({self.max_len})"
                    )
                    request.out.put(None)
                    logger.error(f"{request.request_id}: {request.error}")
                    return False
                if len(ids) > budget:
                    ids = ids[: budget // 2] + ids[-(budget - budget // 2):]
                seq_len = len(ids)
                kv_len = seq_len
                if not self._reserve_paged(free, request, kv_len):
                    return False  # requeued before spending the prefill
                if (
                    self.chunked_prefill > 0
                    and seq_len > self.chunked_prefill
                    and self.active_count > 0
                ):
                    # Long prompt while others decode: reserve the slot and
                    # fill it one segment per scheduler iteration instead of
                    # stalling the decode loop for the whole prefill.
                    self.slots[free].request = request
                    self.slots[free].ready = False
                    self._prefilling = {
                        "request": request,
                        "free": free,
                        "ids": ids,
                        "done": 0,
                        "cache": KVCache.create(
                            self.config.num_layers, 1, self.max_len,
                            self.config.num_kv_heads, self.config.head_dim_,
                            dtype=kv_cache_dtype(self.config.dtype),
                        ),
                        "logits": None,
                    }
                    logger.info(
                        f"Chunked prefill started for {request.request_id}: "
                        f"{seq_len} tokens in {self.chunked_prefill}-token "
                        "segments"
                    )
                    return True
                # Paged pools reshape the staging cache into page_size rows
                # at insert; start the bucket at one page so KV_PAGE_SIZE >
                # 128 stays page-aligned (max_len is validated to be a
                # page multiple, and doubling preserves divisibility).
                bucket = max(128, self.pool.page_size if self.paged else 0)
                while bucket < seq_len:
                    bucket *= 2
                bucket = min(bucket, self.max_len)
                padded = np.zeros((1, bucket), np.int32)
                padded[0, :seq_len] = ids
                embeds = self._embed_jit(
                    self.params["embed_tokens"], jnp.asarray(padded)
                )
                positions = jnp.asarray(np.arange(bucket, dtype=np.int32)[None])
                # Staging only holds the PROMPT's KV (decode writes go to
                # the shared slots/pool), so size it to the bucket, not
                # max_len — a bundle of admissions would otherwise hold
                # several max_len transients at once.
                tmp_cache = KVCache.create(
                    self.config.num_layers, 1, bucket,
                    self.config.num_kv_heads, self.config.head_dim_,
                    dtype=kv_cache_dtype(self.config.dtype),
                )
                logits, tmp_cache = self._prefill_jit(
                    self.params, embeds, positions, tmp_cache,
                    jnp.asarray([seq_len]),
                )
            self._activate_slot(free, request, tmp_cache, logits,
                                seq_len, kv_len)
            return True
        except Exception as exc:
            logger.error(f"Prefill failed for {request.request_id}: {exc}",
                         exc_info=True)
            # Unblock the caller FIRST: pool.release is device-touching
            # cleanup and can fail on the same full chip that failed the
            # admission — the caller must not hang on out.get() for that.
            request.error = str(exc)
            request.out.put(None)
            if self.paged:
                # The reservation made above must not outlive the failed
                # admission: leaked pages shrink the pool forever and
                # disable the idle release_buffers() path (its guard
                # requires an empty owned map).
                self.pool.release(free)
            return False

    def _activate_slot(self, free: int, request: Request, tmp_cache: KVCache,
                       logits: jnp.ndarray, seq_len: int, kv_len: int) -> None:
        """Copy a finished batch-1 prefill into slot `free` and arm it for
        batched decode (shared by whole-prompt and chunked prefill)."""
        if self.paged:
            # idx_vec matches the STAGING cache's page count (hand-offs are
            # prompt-bucket-sized, not max_len — see Engine._prefill_request
            # prompt_only_cache); pages past the reservation scatter to the
            # trash page, pages past the prompt are written later by decode
            # through the slot's page table.
            n_src = tmp_cache.k.shape[2] // self.pool.page_size
            row = np.zeros((n_src,), np.int32)
            owned = self.pool._owned[free]
            n_live = min(len(owned), n_src)
            row[:n_live] = owned[:n_live]
            self.pool.k, self.pool.v, self._logits = self._insert_paged_jit(
                self.pool.k, self.pool.v, tmp_cache, jnp.asarray(row),
                jnp.int32(free), self._logits, logits,
                page=self.pool.page_size,
            )
        else:
            self.cache, self._logits = self._insert_jit(
                self.cache, tmp_cache, jnp.int32(free), jnp.int32(kv_len),
                self._logits, logits,
            )
        slot = self.slots[free]
        slot.request = request
        slot.position = seq_len
        slot.remaining = request.max_tokens
        slot.ready = True
        self._lengths_host[free] = kv_len
        self._temps_host[free] = max(0.0, request.temperature)
        if self._json_dev is not None:
            tables = (
                self._tables_map.get(request.schema)
                if request.json_mode else None
            )
            init_state = tables.init_state if tables is not None else 0
            table_idx = (
                self._table_index.get(request.schema, 0)
                if request.json_mode else 0
            )
            floor = (
                request.min_tokens
                if request.min_tokens is not None
                else app_config.constrained_json_min_tokens
            )
            min_tok = min(max(floor, 0), request.max_tokens - 32)
            self._fsm_table = self._fsm_table.at[free].set(table_idx)
            self._fsm_state = self._fsm_state.at[free].set(init_state)
            self._fsm_remaining = self._fsm_remaining.at[free].set(
                request.max_tokens
            )
            self._fsm_active = self._fsm_active.at[free].set(
                bool(request.json_mode)
            )
            self._fsm_min_remaining = self._fsm_min_remaining.at[free].set(
                request.max_tokens - max(min_tok, 0)
            )
        logger.info(
            f"Admitted {request.request_id} into slot {free} "
            f"(prompt {seq_len} tokens, active {self.active_count})"
        )

    def _advance_prefill(self) -> None:
        """Run ONE chunked-prefill segment (extend_scan appends it to the
        reserved slot's staging cache); activates the slot when the last
        segment lands.  Called between decode chunks by the run loop."""
        st = self._prefilling
        request: Request = st["request"]
        try:
            seg_size = self.chunked_prefill
            ids = st["ids"]
            start = st["done"]
            end = min(start + seg_size, len(ids))
            padded = np.zeros((1, seg_size), np.int32)
            padded[0, : end - start] = ids[start:end]
            embeds = self._embed_jit(
                self.params["embed_tokens"], jnp.asarray(padded)
            )
            positions = jnp.asarray(
                np.arange(seg_size, dtype=np.int32)[None] + start
            )
            logits, cache = self._extend_jit(
                self.params, embeds, positions, st["cache"],
                jnp.asarray([end - start]),
            )
            st["cache"] = cache
            st["logits"] = logits
            st["done"] = end
            self.prefill_segments_done += 1
            if end == len(ids):
                self._activate_slot(
                    st["free"], request, cache, logits, len(ids), len(ids)
                )
                self._prefilling = None
        except Exception as exc:
            logger.error(
                f"Chunked prefill failed for {request.request_id}: {exc}",
                exc_info=True,
            )
            self.slots[st["free"]].request = None
            self.slots[st["free"]].ready = True
            if self.paged:
                self.pool.release(st["free"])
            self._prefilling = None
            request.error = str(exc)
            request.out.put(None)

    def _decode_once(self) -> None:
        """One CHUNK of batched decode over all slots: `decode_chunk` tokens
        per active slot in a single device dispatch.

        Inactive rows compute garbage at their (zeroed) cursors — harmless,
        their rows are fully overwritten at admission.  A slot that hits EOS
        or its token budget mid-chunk has its cursor rewound to the last
        kept token so the garbage tail is overwritten by later writes.
        """
        # Constant chunk size: a varying `steps` would recompile the fused
        # decode per distinct value.  Tokens beyond a slot's budget are
        # computed and discarded (bounded waste, zero recompiles).
        steps = self.decode_chunk
        positions_vec = np.zeros((self.num_slots,), np.int32)
        for i, slot in enumerate(self.slots):
            if slot.active:
                positions_vec[i] = slot.position
        # Cursors come from the host mirror: reading cache.lengths off the
        # device would add a blocking round-trip per chunk.
        prev_lengths = self._lengths_host.copy()

        constraint = None
        if self._json_dev is not None:
            ok_t, trans_t, cost_t, cls_t = self._json_dev
            constraint = DecodeConstraint(
                token_ok=ok_t, token_trans=trans_t, cost_after=cost_t,
                state=self._fsm_state, remaining=self._fsm_remaining,
                active=self._fsm_active,
                min_remaining=self._fsm_min_remaining,
                table_idx=self._fsm_table,
                class_of=cls_t,
            )
        # Per-slot sampling: any temp>0 row switches the chunk to the
        # sampled program (greedy rows stay EXACT via the in-kernel where).
        any_sampled = bool(
            any(s.active and self._temps_host[i] > 0
                for i, s in enumerate(self.slots))
        )
        sample_kwargs = {}
        if any_sampled:
            self._chunk_counter += 1
            sample_kwargs = dict(
                key=jax.random.fold_in(
                    self._sample_base_key, self._chunk_counter
                ),
                temperature=jnp.asarray(self._temps_host),
            )
        # Device-side early exit: the chunk ends at max-over-live-rows of
        # min(EOS step, per-row budget) — a batch whose every live slot
        # needs 5 more tokens stops after 5 passes, not decode_chunk.
        # Inactive slots start done (budget 0) and never hold a chunk open.
        budget_vec = np.zeros((self.num_slots,), np.int32)
        for i, s in enumerate(self.slots):
            if s.active:
                budget_vec[i] = max(0, s.remaining)
        exit_kwargs = dict(
            eos_id=self.tokenizer.eos_id, budget=jnp.asarray(budget_vec)
        )
        # Spanned for the bench's host/device split: the dispatch + its
        # blocking token sync is chip time; the per-slot post-processing
        # below (full-sequence detokenize, queue puts) is host work and
        # gets its own span so contention shows on the right side.
        _t_decode = time.perf_counter()
        with span("scheduler.decode"):
            if self.paged:
                if constraint is not None:
                    (tokens, self._logits, self.pool.k, self.pool.v, _,
                     constraint) = self._decode_paged_con_jit(
                        self.params, self._logits, jnp.asarray(positions_vec),
                        self.pool.k, self.pool.v, self.pool.page_tables,
                        jnp.asarray(prev_lengths), constraint, num_steps=steps,
                        **sample_kwargs, **exit_kwargs,
                    )
                else:
                    # _check_modes rejects sampled paged requests w/o tables.
                    tokens, self._logits, self.pool.k, self.pool.v, _ = (
                        self._decode_paged_jit(
                            self.params, self._logits,
                            jnp.asarray(positions_vec),
                            self.pool.k, self.pool.v, self.pool.page_tables,
                            jnp.asarray(prev_lengths), num_steps=steps,
                            **exit_kwargs,
                        )
                    )
            else:
                if constraint is not None:
                    tokens, self._logits, self.cache, constraint = (
                        self._decode_loop_con_jit(
                            self.params, self._logits,
                            jnp.asarray(positions_vec),
                            self.cache, constraint, num_steps=steps,
                            **sample_kwargs, **exit_kwargs,
                        )
                    )
                elif any_sampled:
                    tokens, self._logits, self.cache, _ = (
                        self._decode_loop_sampled_jit(
                            self.params, self._logits,
                            jnp.asarray(positions_vec),
                            self.cache, sample_kwargs["key"],
                            sample_kwargs["temperature"], num_steps=steps,
                            **exit_kwargs,
                        )
                    )
                else:
                    tokens, self._logits, self.cache = self._decode_loop_jit(
                        self.params, self._logits, jnp.asarray(positions_vec),
                        self.cache, num_steps=steps, **exit_kwargs,
                    )
            if constraint is not None:
                # Finished slots keep garbage DFA rows until the next
                # admission resets them — their outputs are discarded, same
                # as KV rows.
                self._fsm_state = constraint.state
                self._fsm_remaining = constraint.remaining
            token_matrix = np.asarray(tokens)  # [slots, steps] (the sync)
        self.decode_device_s_total += time.perf_counter() - _t_decode

        with span("scheduler.host"):
            self._postprocess_chunk(steps, prev_lengths, token_matrix)

    def _postprocess_chunk(self, steps, prev_lengths, token_matrix) -> None:
        """Host side of a decode chunk: keep tokens up to EOS/budget,
        stream deltas, retire finished slots."""
        lengths = prev_lengths + steps  # what the device-side loop did
        for i, slot in enumerate(self.slots):
            if not slot.active:
                lengths[i] = prev_lengths[i]
                continue
            request = slot.request
            kept = 0
            finished = False
            for token_id in token_matrix[i].tolist():
                if kept >= slot.remaining:
                    finished = True
                    break
                if token_id == self.tokenizer.eos_id:
                    finished = True
                    break
                request.generated.append(token_id)
                kept += 1
            slot.position += kept
            slot.remaining -= kept
            if slot.remaining <= 0:
                finished = True
            text = self.tokenizer.decode(request.generated)
            if len(text) > len(request.emitted) and not text.endswith("�"):
                request.out.put(text[len(request.emitted):])
                request.emitted = text
            if finished:
                # Final flush WITHOUT the replacement-char guard: the
                # streaming guard holds back text ending in an incomplete
                # UTF-8 sequence, but at completion whatever decoded is
                # the output (the unbatched engine path flushes the same
                # way) — without this, a generation ending in U+FFFD
                # silently dropped its tail.
                if len(text) > len(request.emitted):
                    request.out.put(text[len(request.emitted):])
                    request.emitted = text
                slot.request = None
                lengths[i] = 0
                self._temps_host[i] = 0.0
                if self.paged:
                    # Release BEFORE signalling completion so a caller that
                    # observes the end of its stream also observes its pages
                    # back in the pool.
                    self.pool.release(i)
                request.out.put(None)
                logger.info(
                    f"Finished {request.request_id} "
                    f"({len(request.generated)} tokens)"
                )
            else:
                # Keep only the tokens actually consumed this chunk.
                lengths[i] = prev_lengths[i] + kept
        self._lengths_host = lengths
        if not self.paged:
            self.cache = KVCache(
                k=self.cache.k, v=self.cache.v, lengths=jnp.asarray(lengths)
            )

    def _run(self) -> None:
        logger.info(
            f"Scheduler started: {self.num_slots} slots, "
            f"max_len {self.max_len}"
        )
        while not self._shutdown.is_set():
            advanced = False
            if self._prefilling is not None:
                # One chunked-prefill segment per iteration: the in-flight
                # decode below keeps streaming between segments.
                self._advance_prefill()
                advanced = True
            else:
                # Drain the pending queue into free slots before decoding —
                # simultaneous arrivals then share the first chunk instead
                # of ramping in one admission per chunk (prefill is ~an
                # order of magnitude cheaper than a decode chunk).
                # Same never-die contract as _decode_once below: an
                # admission failure that escapes _admit_one's own handler
                # (an OOM inside the handler's cleanup did, once) must not
                # kill the thread — every queued and in-flight request
                # would block forever on out.get().
                try:
                    while self._admit_one():
                        advanced = True
                        if self._prefilling is not None:
                            break  # a chunked prefill started; stop admitting
                except Exception as exc:
                    logger.exception(f"request admission failed: {exc}")
            if self.active_count == 0:
                if not advanced:
                    if (
                        self.paged
                        and self.pool.k is not None
                        and not self.pool._owned
                        and self._pending.empty()
                    ):
                        # Fully idle: return the page pool's HBM to the
                        # chip (the dual-VLM phase's prefill/decode
                        # transients live in that headroom on single-chip
                        # target profiles).  Buffers come back as a
                        # device-side zeros fill at the next admission.
                        self.pool.release_buffers()
                    time.sleep(0.005)
                continue
            try:
                self._decode_once()
            except Exception as exc:
                # A decode-chunk device failure (OOM allocating the donated
                # cache, a lowering error on a new shape) must not kill the
                # scheduler thread: every in-flight request would block
                # forever on out.get() with no terminating None.  Fail the
                # active slots loudly and keep serving new work.
                logger.exception(f"batched decode chunk failed: {exc}")
                self._fail_active(exc)
        logger.info("Scheduler stopped")

    def _fail_active(self, exc: Exception) -> None:
        """Error out every active slot after a decode-chunk crash: callers
        get their terminating None (with request.error set), pages return
        to the pool, and the slots free up for later admissions."""
        for i, slot in enumerate(self.slots):
            if not slot.active:
                continue
            request = slot.request
            slot.request = None
            self._lengths_host[i] = 0
            self._temps_host[i] = 0.0
            if self.paged:
                try:
                    self.pool.release(i)
                except Exception:
                    logger.exception(f"page release failed for slot {i}")
            request.error = f"batched decode failed: {exc}"
            request.out.put(None)
            logger.error(f"{request.request_id}: {request.error}")
        if not self.paged:
            self.cache = KVCache(
                k=self.cache.k, v=self.cache.v,
                lengths=jnp.asarray(self._lengths_host),
            )


__all__ = ["ContinuousBatchingScheduler", "Request"]
