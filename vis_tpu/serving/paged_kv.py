"""Paged KV cache: a shared page pool + per-slot page tables.

Implements the capability behind config.kv_page_size (SURVEY.md §7 step 6;
the round-1 build declared the flag "reserved" — the exact anti-pattern the
rebuild was meant to avoid).  The dense scheduler layout reserves
decode_batch_size x kv_cache_max_tokens KV up front (~8.6 GB at 11B scale);
here HBM holds one pool of fixed-size pages sized to the WORKLOAD
(config.kv_pool_tokens), and each decode slot maps pages through a table:

  pool k/v      [layers, n_pages, page, kv_heads, head_dim]
  page_tables   [slots, max_pages] int32   (entry -> pool page index)

Page 0 is a reserved trash page: unmapped table entries point at it, so
every device-side lookup stays in-bounds with one compiled shape (inactive
slots write their garbage there; reads are masked by the length cursor
before they could see it).

Allocation is host-side and reservation-based: a request's full token
budget (prompt + max_tokens + one decode-chunk of slack) is reserved at
admission, so decode can never run out of pages mid-flight; admission
simply waits when the pool is full.  TPU-first consequence: static shapes
everywhere — the attention window is still max_pages*page wide per slot,
the memory win is the pool itself.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vis_tpu.models.common.layers import kv_store_heads
from vis_tpu.utils.logger import setup_logger

logger = setup_logger(__name__, level="INFO", component="PAGED_KV")


class PagedKVPool:
    """Host-managed page allocator over device-resident page buffers."""

    def __init__(
        self,
        num_layers: int,
        slots: int,
        max_len: int,
        kv_heads: int,
        head_dim: int,
        page_size: int,
        pool_tokens: int,
        dtype=jnp.bfloat16,
    ):
        if max_len % page_size:
            raise ValueError(
                f"kv_cache_max_tokens ({max_len}) must be a multiple of "
                f"kv_page_size ({page_size})"
            )
        self.page_size = page_size
        self.max_pages = max_len // page_size
        self.n_pages = pool_tokens // page_size + 1  # +1: trash page 0
        if self.n_pages < 2:
            raise ValueError("kv_pool_tokens must cover at least one page")
        # kv_store_heads: int8 pools carry one extra head row of packed
        # per-(token, head) scales (models/common/layers.py encode_kv).
        self._shape = (
            num_layers, self.n_pages, page_size,
            kv_store_heads(kv_heads, dtype), head_dim,
        )
        self._dtype = dtype
        self.k = jnp.zeros(self._shape, dtype)
        self.v = jnp.zeros(self._shape, dtype)
        self.page_tables = jnp.zeros((slots, self.max_pages), jnp.int32)
        self._free: List[int] = list(range(1, self.n_pages))
        self._owned: Dict[int, List[int]] = {}
        self._lock = threading.Lock()
        self._set_row_jit = jax.jit(
            lambda tables, slot, row: tables.at[slot].set(row),
            donate_argnums=(0,),
        )

    # -- accounting --------------------------------------------------------
    @property
    def free_pages(self) -> int:
        with self._lock:
            return len(self._free)

    def pages_for(self, tokens: int) -> int:
        return -(-tokens // self.page_size)

    def memory_bytes(self) -> int:
        if self.k is None:
            return 0
        return int(self.k.nbytes + self.v.nbytes)

    # -- elastic buffers ---------------------------------------------------
    # On HBM-tight single-chip profiles the pool is only needed while its
    # scheduler has work (e.g. the explainer's report bundle); releasing the
    # device buffers when every slot is idle returns that HBM to the other
    # engines' transients (dual-VLM prefill/decode), so peak usage is
    # max(phases), not sum.  Re-allocation is a device-side zeros fill —
    # no host transfer, ~1 dispatch — and all jit caches keep their shapes.
    def release_buffers(self) -> None:
        """Drop the device page buffers (call only when no slot is active)."""
        if self.k is not None:
            self.k = None
            self.v = None

    def ensure_buffers(self) -> None:
        """Re-allocate the device page buffers if released."""
        if self.k is None:
            self.k = jnp.zeros(self._shape, self._dtype)
            self.v = jnp.zeros(self._shape, self._dtype)

    # -- allocation --------------------------------------------------------
    def try_reserve(self, slot: int, tokens: int) -> bool:
        """Reserve pages for `tokens` on `slot` and map them in the table.
        Returns False (no side effects) when the pool can't satisfy it —
        including a budget beyond the slot's addressable window
        (max_pages * page_size): clamping would let the terminal decode
        chunk's overhang writes wrap through the last mapped page and
        corrupt real KV.  A slot that already owns pages has them returned
        first (re-reserve is a replace, not a leak)."""
        need = self.pages_for(tokens)
        if need > self.max_pages:
            return False
        with self._lock:
            prev = self._owned.pop(slot, [])
            self._free.extend(prev)
            if need > len(self._free):
                if prev:  # keep the old mapping valid on failure
                    self._owned[slot] = prev
                    del self._free[-len(prev):]
                return False
            pages = [self._free.pop() for _ in range(need)]
            self._owned[slot] = pages
            row = np.zeros((self.max_pages,), np.int32)  # unmapped -> trash
            row[:need] = pages
            # Table update inside the lock: page_tables is a read-modify-
            # write of shared state; an interleaved reserve/release would
            # lose one row update.
            try:
                self.page_tables = self._set_row_jit(
                    self.page_tables, jnp.int32(slot), jnp.asarray(row)
                )
            except Exception:
                # Device failure (e.g. RESOURCE_EXHAUSTED on a full chip)
                # mid-reserve: roll the host bookkeeping back and report a
                # clean "no room" — an exception here killed the scheduler
                # thread once (r5 batch leg) because the caller's cleanup
                # path performs another device op that fails the same way.
                self._owned.pop(slot, None)
                self._free.extend(pages)
                if prev:
                    self._owned[slot] = prev
                    del self._free[-len(prev):]
                logger.exception(
                    f"page-table update failed reserving slot {slot}; "
                    "reservation rolled back"
                )
                return False
        return True

    def release(self, slot: int) -> None:
        """Return a slot's pages to the pool and point its table at trash."""
        with self._lock:
            pages = self._owned.pop(slot, [])
            self._free.extend(pages)
            if pages:
                try:
                    self.page_tables = self._set_row_jit(
                        self.page_tables, jnp.int32(slot),
                        jnp.zeros((self.max_pages,), jnp.int32),
                    )
                except Exception:
                    # Pages are back in the host free list either way; a
                    # stale device row is harmless (the slot is inactive,
                    # and try_reserve rewrites the FULL row before any new
                    # decode touches it).  Raising here instead cascaded an
                    # OOM out of the scheduler's admission error handler.
                    logger.exception(
                        f"page-table clear failed releasing slot {slot}; "
                        "host free-list updated, device row left stale"
                    )


__all__ = ["PagedKVPool"]
