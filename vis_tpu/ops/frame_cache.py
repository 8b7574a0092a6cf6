"""Shared decoded-frame cache: JPEG-decode each source image ONCE.

One inspection touches the same source file five times — the quality gate
(safety/image_quality.py), the inspector's patch preprocess (ops/preprocess*),
the auditor's tile preprocess (ops/preprocess_mllama*), and the report
overlays (utils/image_utils heatmap + bbox panels).  The reference paid a
fresh decode per touch because each touch lived in a different process or
API call (reference src/agents/vlm_inspector.py:46-88 and vlm_auditor.py:85
each re-open and re-encode the upload); here everything is in-process, so
the decode and the host->HBM transfer are per-IMAGE costs, not per-consumer
costs.

Two cache levels:

- ``get_frame(path)``        -> np.uint8 [H, W, 3] RGB, decoded once;
  keyed by (realpath, mtime_ns, size) so edited or re-uploaded files never
  alias.
- ``get_device_frame(path, device=None)`` -> the same frame committed to
  ``device`` (u8, 3 bytes/px); keyed by (file key, device) so data-parallel
  replicas pinned to different chips each pay exactly one transfer — a
  device-0-committed frame fed to a jit whose params live on another chip
  would not even dispatch.  The inspector's resize-as-matmul path and the
  auditor's device tiling path share this single transfer — on a tunneled
  chip (~23 MB/s host->HBM) a second 2-4 MB transfer is tens of
  milliseconds of pure waste.

Entries are immutable by contract: callers must not write into the returned
array (PIL consumers get a fresh copy via ``Image.fromarray``).  The cache
is a small LRU (8 frames).  Concurrent first-touches serialize on a
PER-KEY lock, so the batch path's distinct images decode in parallel while
duplicate touches of one image still coalesce into a single decode.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_MAX_FRAMES = 8
_MAX_KEY_LOCKS = 64

_lock = threading.Lock()  # guards the maps below (never held over work)
_host_frames: "OrderedDict[tuple, np.ndarray]" = OrderedDict()
_device_frames: "OrderedDict[tuple, object]" = OrderedDict()
_key_locks: dict = {}


def _key(image_path) -> tuple:
    p = os.path.realpath(str(image_path))
    st = os.stat(p)
    return (p, st.st_mtime_ns, st.st_size)


def _key_lock(key) -> threading.Lock:
    with _lock:
        lk = _key_locks.get(key)
        if lk is None:
            if len(_key_locks) >= _MAX_KEY_LOCKS:
                # Prune locks for keys no longer cached.  A racing holder
                # of a pruned lock at worst duplicates one decode.
                live = (set(_host_frames) | set(_device_frames)
                        | {k[0] for k in _device_frames})
                for stale in [k for k in _key_locks if k not in live]:
                    del _key_locks[stale]
            lk = _key_locks[key] = threading.Lock()
        return lk


def _decode(image_path) -> np.ndarray:
    from PIL import Image

    with Image.open(image_path) as im:
        rgb = np.asarray(im.convert("RGB"), dtype=np.uint8)
    rgb.setflags(write=False)
    return rgb


def get_frame(image_path) -> np.ndarray:
    """Decoded RGB u8 frame, cached by file identity. Read-only."""
    key = _key(image_path)
    with _lock:
        frame = _host_frames.get(key)
        if frame is not None:
            _host_frames.move_to_end(key)
            return frame
    # Decode under the PER-KEY lock: duplicate first-touches of one image
    # coalesce, while different images (batch fan-out, concurrent uploads)
    # decode concurrently instead of queueing on a global lock.
    with _key_lock(key):
        with _lock:
            frame = _host_frames.get(key)
            if frame is not None:
                _host_frames.move_to_end(key)
                return frame
        frame = _decode(image_path)
        with _lock:
            _host_frames[key] = frame
            while len(_host_frames) > _MAX_FRAMES:
                _host_frames.popitem(last=False)
        return frame


def get_device_frame(image_path, device=None):
    """The cached frame as a u8 jax array committed to ``device``.

    device=None means the process default chip (jax.devices()[0]).  The
    transfer is issued once per (file, device) — engines pinned to other
    chips (DP replicas) pass their own device and pay one transfer each.
    """
    import jax

    if device is None:
        device = jax.devices()[0]
    key = (_key(image_path), device)
    with _lock:
        dev = _device_frames.get(key)
        if dev is not None:
            _device_frames.move_to_end(key)
            return dev
    frame = get_frame(image_path)
    with _key_lock(key):
        with _lock:
            dev = _device_frames.get(key)
            if dev is not None:
                _device_frames.move_to_end(key)
                return dev
        dev = jax.device_put(np.asarray(frame), device)
        with _lock:
            _device_frames[key] = dev
            while len(_device_frames) > _MAX_FRAMES:
                _device_frames.popitem(last=False)
        return dev


def frame_size(image_path) -> Tuple[int, int]:
    """(height, width) of the decoded frame (decodes + caches if needed)."""
    frame = get_frame(image_path)
    return frame.shape[0], frame.shape[1]


def prefetch(image_path, device=True) -> None:
    """Warm the cache early (e.g. from the quality gate, the pipeline's
    first touch) so the dual-VLM node finds both levels hot; device_put is
    asynchronous, so the host->HBM copy overlaps the remaining host work.

    ``device``: True warms the default chip, False/None stays host-only,
    and a jax Device warms that chip (DP replicas pinned elsewhere must
    prefetch to their own chip or the overlap buys them nothing)."""
    try:
        get_frame(image_path)
        if device is not False and device is not None:
            get_device_frame(image_path, None if device is True else device)
    except Exception:
        pass  # consumers surface their own load errors with context


def clear() -> None:
    """Drop all cached frames (tests / bench runs that model a cold,
    fresh-image workload)."""
    with _lock:
        _host_frames.clear()
        _device_frames.clear()
        _key_locks.clear()


__all__ = [
    "get_frame",
    "get_device_frame",
    "frame_size",
    "prefetch",
    "clear",
]
