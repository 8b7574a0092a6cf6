"""Shared single-request loop-decode engine.

One implementation of the prefill + chunked-decode orchestration (greedy,
temperature-sampled, JSON-grammar-constrained, and DFA-forced lookahead
windows, all with device-side EOS early exit) parameterized over the model
family's forward.  MllamaEngine (cross-attention auditor) and Llama4Engine
(MoE auditor) subclass this; the Qwen Engine keeps its own richer machinery
(bucketed prefill, schedulers, speculative decode) in engine.py.

Extracted from engine_mllama.py (VERDICT r4 #9: the prefill/chunk/stream
orchestration existed in three near-copies; adding the Llama-4 engine as a
fourth would have made it worse).  Subclasses provide:

  _model_forward(params, embeds, positions, aux, cache, mask)
  _model_logits(params, hidden)
  _embed_tokens(params, token_ids)
  _merge_prefill_embeds(params, embeds, padded_ids, aux)  [default: identity]
  _prepare_aux(image_path)                    vision work; aux is any pytree
  _prompt_ids(prompt, aux)                    token ids incl. placeholders
  _cache_geometry()                           (n_layers, kv_heads, head_dim, dtype)
  _decode_param_tree()                        tree streamed per decode pass
"""

from __future__ import annotations

import threading
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vis_tpu.models.common.decoder import (
    DecodeConstraint,
    constrained_argmax,
    constrained_pick,
    gumbel_sample_token,
)
from vis_tpu.models.common.layers import (
    KVCache, causal_mask, length_mask,
)
from vis_tpu.serving.tokenizer import Tokenizer
from vis_tpu.utils.config import config as app_config
from vis_tpu.utils.logger import setup_logger, span

logger = setup_logger(__name__, level="INFO", component="LOOP_ENGINE")


class LoopDecodeEngine:
    """Single-request engine: jitted prefill + chunked decode loops."""

    # Telemetry twins of Engine's counters (bench.py diffs the totals).
    last_decode_tokens: Optional[int] = None
    decode_tokens_total: int = 0
    decode_device_s_total: float = 0.0

    # Subclasses set for log spans ("mllama", "llama4", ...).
    span_prefix: str = "loop"

    @property
    def decode_seconds_total(self) -> float:
        """Chip seconds in decode blocks (Engine-interface twin)."""
        return self.decode_device_s_total

    @property
    def weight_bytes_per_pass(self) -> int:
        """Decoder+head parameter bytes one decode forward streams from HBM
        (Engine-interface twin; see Engine.weight_bytes_per_pass).  The
        embedding gather is excluded; everything else in the decode tree —
        including ALL experts under dense-dispatch MoE — is really read."""
        total = 0
        flat = jax.tree_util.tree_flatten_with_path(
            self._decode_param_tree()
        )[0]
        for path, leaf in flat:
            if "embed" in jax.tree_util.keystr(path).lower():
                continue
            total += getattr(leaf, "nbytes", 0)
        return total

    def __init__(
        self,
        name: str,
        params: Any,
        tokenizer: Tokenizer,
        max_cache_tokens: Optional[int] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        """Subclasses prepare params (fuse/quantize/shard) BEFORE super()."""
        self.name = name
        self.mesh = mesh
        self.params = params
        self.tokenizer = tokenizer
        self.max_cache_tokens = max_cache_tokens or app_config.kv_cache_max_tokens
        self.decode_chunk = app_config.decode_chunk
        self._lock = threading.Lock()

        # The KV cache is DONATED to every jitted call (it is dead in the
        # caller the moment the call returns): without aliasing, XLA holds
        # input AND output cache buffers live across the dispatch — ~670 MB
        # of transient HBM at 11B dims — which, concurrent with the
        # inspector's decode on the same chip, tipped the 16 GB budget
        # (run-1 RESOURCE_EXHAUSTED after a green warmup).  Engine's
        # decode jits donate for the same reason (engine.py
        # donate_argnums=(3,)).
        # The prompt-embedding gather runs as its OWN tiny program (like
        # Engine._embed_jit), NOT inside the prefill jit: folding the
        # gather into the big prefill program regressed run-1 of the bench
        # to a deterministic RESOURCE_EXHAUSTED — the compiled prefill's
        # transient peak grew by roughly the dequantized vocab table (~1 GB
        # at 128k x 4k), which fits when warmup's compile serialization
        # staggers the two VLMs but not when their warm paths overlap.
        self._embed_jit = jax.jit(self._embed_tokens)
        self._prefill_jit = jax.jit(self._prefill_impl, donate_argnums=(5,))
        self._decode_chunk_jit = jax.jit(
            self._decode_chunk_impl, static_argnames=("steps",),
            donate_argnums=(3,),
        )
        self._decode_chunk_json_jit = jax.jit(
            self._decode_chunk_json_impl, static_argnames=("steps",),
            donate_argnums=(3,),
        )
        self._decode_window_json_jit = jax.jit(
            self._decode_window_json_impl,
            static_argnames=("n_windows", "window"),
            donate_argnums=(3,),
        )
        self._decode_chunk_sampled_jit = jax.jit(
            self._decode_chunk_sampled_impl, static_argnames=("steps",),
            donate_argnums=(3,),
        )
        self._json_constraint: Dict[Optional[str], Any] = {}

    # -- subclass contract ------------------------------------------------
    def _model_forward(self, params, embeds, positions, aux, cache, mask):
        raise NotImplementedError

    def _model_logits(self, params, hidden):
        raise NotImplementedError

    def _embed_tokens(self, params, token_ids):
        raise NotImplementedError

    def _merge_prefill_embeds(self, params, embeds, padded_ids, aux):
        """Adjust prompt embeddings inside the prefill jit (embeds arrive
        precomputed from the eager gather); override to merge vision
        features at placeholder positions."""
        return embeds

    def _prepare_aux(self, image_path: Optional[Path]):
        """Per-request vision work; the returned pytree threads through
        every jitted decode call (None for text-only families)."""
        return None

    def _prompt_ids(self, prompt: str, aux) -> List[int]:
        raise NotImplementedError

    def _cache_geometry(self):
        """(n_layers, kv_heads, head_dim, cache_dtype)."""
        raise NotImplementedError

    def _decode_param_tree(self):
        raise NotImplementedError

    @property
    def _vocab_size(self) -> int:
        raise NotImplementedError

    # -- jitted impls ----------------------------------------------------
    def _prefill_impl(self, params, embeds, padded_ids, positions, aux,
                      cache, prompt_lengths):
        s = padded_ids.shape[1]
        embeds = self._merge_prefill_embeds(params, embeds, padded_ids, aux)
        mask = causal_mask(s, cache.k.shape[2]) + length_mask(
            cache.k.shape[2], prompt_lengths
        )
        hidden, cache = self._model_forward(
            params, embeds, positions, aux, cache, mask
        )
        last = jnp.maximum(prompt_lengths - 1, 0)
        last_hidden = jnp.take_along_axis(
            hidden, last[:, None, None].astype(jnp.int32), axis=1
        )
        logits = self._model_logits(params, last_hidden)[:, 0]
        cache = KVCache(k=cache.k, v=cache.v,
                        lengths=prompt_lengths.astype(jnp.int32))
        return logits, cache

    def _decode_chunk_impl(self, params, logits, aux, cache, start, steps):
        b = logits.shape[0]
        eos = self.tokenizer.eos_id

        def cond(carry):
            step, done = carry[0], carry[1]
            return (step < steps) & ~jnp.all(done)

        def body(carry):
            step, done, logits, cache, tokens = carry
            token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            token = jnp.where(done, eos, token)
            tokens = jax.lax.dynamic_update_slice(tokens, token[:, None], (0, step))
            done = done | (token == eos)
            positions = (start + step) + jnp.zeros((b, 1), jnp.int32)
            embeds = self._embed_tokens(params, token[:, None])
            hidden, new_cache = self._model_forward(
                params, embeds, positions, aux, cache, cache.decode_mask(),
            )
            logits = self._model_logits(params, hidden)[:, 0]
            return step + 1, done, logits, new_cache, tokens

        # Early device exit at EOS: a 192-token answer inside a 512-token
        # chunk stops paying target-scale weight passes at token 193.
        tokens0 = jnp.full((b, steps), eos, jnp.int32)
        _, _, logits, cache, tokens = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.zeros((b,), bool), logits, cache, tokens0),
        )
        return tokens, logits, cache

    def _decode_window_json_impl(
        self, params, logits, aux, cache, start, constraint,
        forced_token, forced_state, n_windows, window,
        key=None, temperature=None,
    ):
        """Forced-run fast-forward: each pass extends the cache by a
        `window`-token chunk — the grammar-masked model pick plus the DFA-
        forced continuation (singleton allowed sets: schema skeleton runs,
        EOS at accept) — reading the weight set ONCE per window
        (models/common/decoder.py decode_loop_lookahead is the stacked-
        layout analog)."""
        b = logits.shape[0]
        max_len = cache.k.shape[2]
        sampled = key is not None

        def step(carry, _):
            if sampled:
                logits, cache, pos, con, rng = carry
                rng, sub = jax.random.split(rng)
                t0, con = constrained_pick(
                    logits, con,
                    lambda m: gumbel_sample_token(m, sub, temperature),
                )
            else:
                logits, cache, pos, con = carry
                t0, con = constrained_argmax(logits, con)

            def chain(cc, _):
                state, alive = cc
                ft = forced_token[state]
                ok = alive & (ft >= 0)
                tok = jnp.where(ok, ft, 0)
                nxt = jnp.where(ok, forced_state[state], state)
                return (nxt, ok), (tok, ok)

            (cstate, _), (ctoks, cok) = jax.lax.scan(
                chain, (con.state, jnp.ones((b,), bool)), None,
                length=window - 1,
            )
            w_tokens = jnp.concatenate([t0[:, None], ctoks.T], axis=1)
            w_valid = jnp.concatenate(
                [jnp.ones((b, 1), bool), cok.T], axis=1
            )
            valid_len = w_valid.sum(axis=1).astype(jnp.int32)
            con = con._replace(
                state=cstate,
                remaining=con.remaining - (valid_len - 1),
            )

            lengths0 = cache.lengths
            embeds = self._embed_tokens(params, w_tokens)
            positions = pos[:, None] + jnp.arange(window, dtype=jnp.int32)
            mask = causal_mask(window, max_len, offset=lengths0[0]) + (
                length_mask(max_len, lengths0 + valid_len)
            )
            hidden, new_cache = self._model_forward(
                params, embeds, positions, aux, cache, mask,
            )
            # _model_forward advanced cursors by the padded window; rewind
            # to the true valid length (padding KV overwritten next pass).
            new_cache = KVCache(
                k=new_cache.k, v=new_cache.v, lengths=lengths0 + valid_len
            )
            # Vocab head over the whole window, then select the last valid
            # row.  Counterintuitively this BEATS a batch-1 head on the
            # gathered hidden (measured +1.5s/448tok the other way): the
            # extra rows ride the same int4 weight stream on the MXU,
            # while a [1,h]@[h,128k] matvec takes the slower vector path.
            logits_all = self._model_logits(params, hidden)
            last = jnp.maximum(valid_len - 1, 0)
            logits = jnp.take_along_axis(
                logits_all, last[:, None, None].astype(jnp.int32), axis=1
            )[:, 0]
            out = (logits, new_cache, pos + valid_len, con)
            if sampled:
                out = out + (rng,)
            return out, (w_tokens, w_valid)

        pos0 = jnp.broadcast_to(jnp.asarray(start, jnp.int32), (b,))
        init = (logits, cache, pos0, constraint)
        if sampled:
            init = init + (key,)

        # Device-side early exit: EOS is the forced move at ACCEPT, so a
        # closing document ends its windows (and the weight passes) there.
        eos = self.tokenizer.eos_id
        tokens0 = jnp.full((n_windows, b, window), eos, jnp.int32)
        valid0 = jnp.zeros((n_windows, b, window), bool)

        def cond(carry):
            return (carry[0] < n_windows) & ~jnp.all(carry[1])

        def while_body(carry):
            win_idx, done, tokens_buf, valid_buf = (
                carry[0], carry[1], carry[2], carry[3]
            )
            inner, (w_tokens, w_valid) = step(carry[4:], None)
            w_valid = w_valid & ~done[:, None]
            tokens_buf = jax.lax.dynamic_update_slice(
                tokens_buf, w_tokens[None], (win_idx, 0, 0)
            )
            valid_buf = jax.lax.dynamic_update_slice(
                valid_buf, w_valid[None], (win_idx, 0, 0)
            )
            done = done | (w_valid & (w_tokens == eos)).any(axis=1)
            return (win_idx + 1, done, tokens_buf, valid_buf) + inner

        out = jax.lax.while_loop(
            cond, while_body,
            (jnp.int32(0), jnp.zeros((b,), bool), tokens0, valid0) + init,
        )
        tokens, valid = out[2], out[3]
        logits, cache, constraint = out[4], out[5], out[7]
        return (
            tokens.transpose(1, 0, 2), valid.transpose(1, 0, 2),
            logits, cache, constraint,
        )

    def _decode_chunk_json_impl(
        self, params, logits, aux, cache, start, constraint, steps,
        key=None, temperature=None,
    ):
        """_decode_chunk_impl with the JSON-grammar logit mask
        (vis_tpu.serving.constrained) threaded as a DFA carry; with
        key/temperature picks are in-loop Gumbel-sampled."""
        b = logits.shape[0]
        sampled = key is not None
        eos = self.tokenizer.eos_id

        def cond(carry):
            return (carry[0] < steps) & ~jnp.all(carry[1])

        def body(carry):
            step, done = carry[0], carry[1]
            if sampled:
                _, _, logits, cache, tokens, con, rng = carry
                rng, sub = jax.random.split(rng)
                token, con = constrained_pick(
                    logits, con,
                    lambda m: gumbel_sample_token(m, sub, temperature),
                )
            else:
                _, _, logits, cache, tokens, con = carry
                token, con = constrained_argmax(logits, con)
            token = jnp.where(done, eos, token)
            tokens = jax.lax.dynamic_update_slice(tokens, token[:, None], (0, step))
            done = done | (token == eos)
            positions = (start + step) + jnp.zeros((b, 1), jnp.int32)
            embeds = self._embed_tokens(params, token[:, None])
            hidden, new_cache = self._model_forward(
                params, embeds, positions, aux, cache, cache.decode_mask(),
            )
            logits = self._model_logits(params, hidden)[:, 0]
            if sampled:
                return step + 1, done, logits, new_cache, tokens, con, rng
            return step + 1, done, logits, new_cache, tokens, con

        tokens0 = jnp.full((b, steps), eos, jnp.int32)
        done0 = jnp.zeros((b,), bool)
        if sampled:
            _, _, logits, cache, tokens, constraint, _ = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), done0, logits, cache, tokens0, constraint, key),
            )
        else:
            _, _, logits, cache, tokens, constraint = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), done0, logits, cache, tokens0, constraint),
            )
        return tokens, logits, cache, constraint

    def _decode_chunk_sampled_impl(
        self, params, logits, aux, cache, start, key, temperature, steps
    ):
        """_decode_chunk_impl with in-loop Gumbel-max temperature sampling
        (the per-token host alternative costs one device RTT per token)."""
        b = logits.shape[0]
        eos = self.tokenizer.eos_id

        def cond(carry):
            return (carry[0] < steps) & ~jnp.all(carry[1])

        def body(carry):
            step, done, logits, cache, tokens, rng = carry
            rng, sub = jax.random.split(rng)
            token = gumbel_sample_token(logits, sub, temperature)
            token = jnp.where(done, eos, token)
            tokens = jax.lax.dynamic_update_slice(tokens, token[:, None], (0, step))
            done = done | (token == eos)
            positions = (start + step) + jnp.zeros((b, 1), jnp.int32)
            embeds = self._embed_tokens(params, token[:, None])
            hidden, new_cache = self._model_forward(
                params, embeds, positions, aux, cache, cache.decode_mask(),
            )
            logits = self._model_logits(params, hidden)[:, 0]
            return step + 1, done, logits, new_cache, tokens, rng

        tokens0 = jnp.full((b, steps), eos, jnp.int32)
        _, _, logits, cache, tokens, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.zeros((b,), bool), logits, cache, tokens0, key),
        )
        return tokens, logits, cache

    def _json_tables(self, schema: Optional[str] = None):
        """Lazily compile + device-place constraint tables (generic JSON or
        a registered schema; None when the tokenizer/vocab is unsupported)."""
        from vis_tpu.serving.engine import load_constraint_tables

        if schema not in self._json_constraint:
            self._json_constraint[schema] = load_constraint_tables(
                self.tokenizer, self._vocab_size, schema,
                engine_name=self.name,
            )
        cached = self._json_constraint[schema]
        if cached is None and schema is not None:
            return self._json_tables(None)
        return cached

    # -- public API ------------------------------------------------------
    def generate_stream(
        self,
        prompt: str,
        image_path: Optional[Path] = None,
        *,
        max_tokens: int = 1024,
        temperature: float = 0.0,
        max_image_dim: int = 1024,
        json_mode: bool = False,
        json_schema: Optional[str] = None,
        schema_batched: bool = False,
        min_tokens: Optional[int] = None,
    ) -> Iterator[str]:
        # schema_batched is accepted for engine-interface parity (the
        # generic EngineBackend forwards it); this single-request engine
        # has no attached scheduler, so it is a no-op here.
        with self._lock:
            yield from self._generate(
                prompt, image_path, max_tokens, json_mode=json_mode,
                temperature=temperature, json_schema=json_schema,
                min_tokens=min_tokens,
            )

    def _generate(
        self, prompt, image_path, max_tokens, json_mode: bool = False,
        temperature: float = 0.0, json_schema: Optional[str] = None,
        min_tokens: Optional[int] = None,
    ) -> Iterator[str]:
        # Resolve the constraint tables FIRST: json/schema mode raises
        # max_tokens to the schema's minimum feasible budget, and the KV
        # cache below is right-sized from max_tokens.  Sizing before the
        # bump would let constrained decode run past cache_len (the clamped
        # dynamic_update_slice would silently overwrite the last KV rows).
        # Mirrors Engine._generate_locked ordering (engine.py).
        json_tables = self._json_tables(json_schema) if json_mode else None
        if json_tables is not None:
            max_tokens = max(max_tokens, json_tables[-1].min_budget)
        aux = self._prepare_aux(image_path)

        ids = self._prompt_ids(prompt, aux)
        budget = self.max_cache_tokens - max_tokens - 1
        if budget < 2:
            # Fail loudly: with budget <= 0 the truncation slices below
            # return the FULL (or near-double) prompt — ids[:0] + ids[-0:]
            # is ids — and the decode cursor then walks past cache_len into
            # clamped dynamic_update_slice garbage.  Engine._prefill_request
            # raises for the same condition.
            raise RuntimeError(
                f"max_tokens={max_tokens} leaves no prompt room in a "
                f"{self.max_cache_tokens}-token KV cache; lower max_tokens "
                "or raise KV_CACHE_MAX_TOKENS"
            )
        if len(ids) > budget:
            ids = ids[: budget // 2] + ids[-(budget - budget // 2):]
        seq_len = len(ids)
        bucket = 128
        while bucket < seq_len:
            bucket *= 2
        bucket = min(bucket, self.max_cache_tokens)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :seq_len] = ids

        positions = jnp.asarray(np.arange(bucket, dtype=np.int32)[None])
        n_layers, kv_heads, head_dim, cache_dtype = self._cache_geometry()
        # Right-size the per-request KV buffer to this request's budget
        # (128-aligned) — a dense max_cache_tokens buffer at 11B dims is
        # ~1 GB of HBM per generate call.
        # +17: lookahead windows write up to window-1 (<=15) padding KV
        # positions past the final cursor before they are overwritten.
        need = bucket + max_tokens + 17
        cache_len = min(self.max_cache_tokens, ((need + 127) // 128) * 128)
        cache = KVCache.create(
            n_layers, 1, cache_len, kv_heads, head_dim, dtype=cache_dtype,
        )
        padded_dev = jnp.asarray(padded)
        embeds = self._embed_jit(self.params, padded_dev)
        with span(f"{self.span_prefix}.prefill", logger):
            logits, cache = self._prefill_jit(
                self.params, embeds, padded_dev, positions, aux, cache,
                jnp.asarray([seq_len]),
            )

        constraint = None
        if json_tables is not None:
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

        generated: List[int] = []
        emitted = ""
        remaining = max_tokens
        pos = seq_len
        done = False
        sampled = temperature > 0.0
        base_key = jax.random.PRNGKey(0)
        temp_arr = jnp.float32(temperature)
        chunk_idx = 0
        window = max(0, int(app_config.constrained_lookahead))
        use_lookahead = (
            constraint is not None and 2 <= window <= 16
            and json_tables[-1].forced_token is not None
        )
        if use_lookahead:
            forced_tok_dev = jnp.asarray(json_tables[-1].forced_token)
            forced_state_dev = jnp.asarray(json_tables[-1].forced_state)
        _t_decode = time.perf_counter()
        with span(f"{self.span_prefix}.decode", logger):
            while remaining > 0 and not done:
                steps = min(self.decode_chunk, remaining)
                if use_lookahead:
                    kwargs = {}
                    if sampled:
                        kwargs = dict(
                            key=jax.random.fold_in(base_key, chunk_idx),
                            temperature=temp_arr,
                        )
                    # Constant window count (n_windows is a STATIC jit
                    # arg): `remaining` becomes data-dependent after the
                    # first chunk, so sizing to it would recompile the
                    # target-scale decode loop per distinct tail value.
                    # The device-side EOS exit stops unused windows; the
                    # host budget guard below drops any overrun.
                    tokens, valid, logits, cache, constraint = (
                        self._decode_window_json_jit(
                            self.params, logits, aux, cache,
                            jnp.int32(pos), constraint, forced_tok_dev,
                            forced_state_dev, n_windows=self.decode_chunk,
                            window=window, **kwargs,
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
                                # appending (without the break the rest of
                                # the window's tokens overrun max_tokens —
                                # the engine.py twin documents the same
                                # failure).
                                done = True
                                break
                        if done:
                            break
                    chunk_idx += 1
                    text = self.tokenizer.decode(generated)
                    if len(text) > len(emitted) and not text.endswith("�"):
                        yield text[len(emitted):]
                        emitted = text
                    remaining -= emitted_n
                    pos += emitted_n
                    continue
                if constraint is not None:
                    kwargs = {}
                    if sampled:
                        kwargs = dict(
                            key=jax.random.fold_in(base_key, chunk_idx),
                            temperature=temp_arr,
                        )
                    tokens, logits, cache, constraint = (
                        self._decode_chunk_json_jit(
                            self.params, logits, aux, cache,
                            jnp.int32(pos), constraint, steps=steps, **kwargs,
                        )
                    )
                elif sampled:
                    tokens, logits, cache = self._decode_chunk_sampled_jit(
                        self.params, logits, aux, cache, jnp.int32(pos),
                        jax.random.fold_in(base_key, chunk_idx), temp_arr,
                        steps=steps,
                    )
                else:
                    tokens, logits, cache = self._decode_chunk_jit(
                        self.params, logits, aux, cache, jnp.int32(pos),
                        steps=steps,
                    )
                chunk_idx += 1
                for token_id in np.asarray(tokens)[0].tolist():
                    if token_id == self.tokenizer.eos_id:
                        done = True
                        break
                    generated.append(token_id)
                text = self.tokenizer.decode(generated)
                if len(text) > len(emitted) and not text.endswith("�"):
                    yield text[len(emitted):]
                    emitted = text
                remaining -= steps
                pos += steps
        self.decode_device_s_total += time.perf_counter() - _t_decode
        self.last_decode_tokens = len(generated)
        self.decode_tokens_total += len(generated)
        final = self.tokenizer.decode(generated)
        if len(final) > len(emitted):
            yield final[len(emitted):]

    def generate(self, prompt, image_path=None, **kwargs) -> str:
        return "".join(self.generate_stream(prompt, image_path, **kwargs))

    def health_check(self) -> bool:
        try:
            self.generate("OK?", None, max_tokens=2)
            return True
        except Exception as exc:
            logger.error(f"{self.name} health check failed: {exc}")
            return False


class LoopEngineBackend:
    """InferenceBackend adapter over any LoopDecodeEngine."""

    def __init__(self, engine: LoopDecodeEngine):
        self.engine = engine
        self.name = f"tpu:{engine.name}"

    def generate(self, prompt, image_path=None, *, max_tokens=1024,
                 temperature=0.0, max_image_dim=1024,
                 json_mode: bool = False,
                 json_schema: Optional[str] = None,
                 schema_batched: bool = False,
                 min_tokens: Optional[int] = None) -> str:
        # schema_batched: accepted for backend-interface parity; loop
        # engines have no attached scheduler (auditor requests are single).
        return self.engine.generate(
            prompt, image_path, max_tokens=max_tokens,
            temperature=temperature, max_image_dim=max_image_dim,
            json_mode=json_mode, json_schema=json_schema,
            min_tokens=min_tokens,
        )

    def generate_stream(self, prompt, image_path=None, *, max_tokens=1024,
                        temperature=0.0, max_image_dim=1024,
                        json_mode: bool = False,
                        json_schema: Optional[str] = None,
                        schema_batched: bool = False,
                        min_tokens: Optional[int] = None):
        yield from self.engine.generate_stream(
            prompt, image_path, max_tokens=max_tokens,
            temperature=temperature, max_image_dim=max_image_dim,
            json_mode=json_mode, json_schema=json_schema,
            min_tokens=min_tokens,
        )

    def health_check(self) -> bool:
        return self.engine.health_check()


__all__ = ["LoopDecodeEngine", "LoopEngineBackend"]
