"""On-device batched preprocessing: resize -> normalize -> patchify in XLA.

The device path for bulk-throughput serving (SURVEY.md §7 step 4): decoded
frames transfer to HBM once as uint8 (3 bytes/pixel), and resizing,
CLIP normalization, and merge-window patchification run as one jit program —
overlapping with model compute and avoiding a second host pass.  The host
paths (ops.preprocess python/native) remain the per-request default and the
HF-parity reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from vis_tpu.ops.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    MERGE_SIZE,
    PATCH_SIZE,
    TEMPORAL_PATCH_SIZE,
)


def _bicubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    ax = np.abs(x)
    return np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        np.where(ax < 2.0, a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )


def _bilinear_kernel(x: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(x))


# PIL filter name -> (kernel fn, base support radius).
_FILTERS = {
    "bicubic": (_bicubic_kernel, 2.0),
    "bilinear": (_bilinear_kernel, 1.0),
}


@lru_cache(maxsize=64)
def resize_weights(src: int, dst: int, filter: str = "bicubic") -> np.ndarray:
    """Dense [dst, src] separable interpolation matrix with PIL's support
    scaling (downscale widens the kernel by the scale factor), so a resize
    becomes a matmul — gathers are the slow path on TPU, matmuls are the
    fast one.  Matches PIL.Image.BICUBIC / BILINEAR to resampling
    tolerance (bicubic feeds the Qwen patch path, bilinear the Mllama tile
    path — each model family's HF processor picks its own resample)."""
    kernel, base_support = _FILTERS[filter]
    scale = src / dst
    filterscale = max(scale, 1.0)
    support = base_support * filterscale
    weights = np.zeros((dst, src), np.float32)
    for i in range(dst):
        center = (i + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), src)
        xs = np.arange(lo, hi, dtype=np.float64)
        w = kernel((xs + 0.5 - center) / filterscale)
        total = w.sum()
        if total != 0:
            weights[i, lo:hi] = (w / total).astype(np.float32)
    return weights


def patchify_device(frames: jnp.ndarray, grid_h: int, grid_w: int) -> jnp.ndarray:
    """Merge-window patchify on device: the host law (ops.preprocess.patchify,
    reshape/transpose only) traces identically on jnp arrays — one statement
    of the layout, bit-for-bit by construction."""
    from vis_tpu.ops.preprocess import patchify

    return patchify(frames, grid_h, grid_w)


def _preprocess_frame_impl(
    rgb_u8: jnp.ndarray, wh: jnp.ndarray, ww: jnp.ndarray,
    dst_h: int, dst_w: int,
) -> jnp.ndarray:
    img = rgb_u8.astype(jnp.float32) / 255.0          # [H, W, 3]
    # Separable resize as two MXU matmuls: rows then columns.
    rows = jnp.einsum("dh,hwc->dwc", wh, img, preferred_element_type=jnp.float32)
    resized = jnp.einsum("ew,dwc->dec", ww, rows, preferred_element_type=jnp.float32)
    resized = jnp.clip(resized, 0.0, 1.0)
    norm = (resized - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    chw = norm.transpose(2, 0, 1)
    frames = jnp.stack([chw] * TEMPORAL_PATCH_SIZE, axis=0)
    return patchify_device(frames, dst_h // PATCH_SIZE, dst_w // PATCH_SIZE)


@partial(jax.jit, static_argnames=("dst_h", "dst_w"))
def _preprocess_frame_jit(rgb_u8, wh, ww, dst_h, dst_w):
    return _preprocess_frame_impl(rgb_u8, wh, ww, dst_h, dst_w)


@lru_cache(maxsize=8)
def _resize_weights_dev(src: int, dst: int, filter: str = "bicubic",
                        device=None):
    """Device-resident copy of the interpolation matrix — re-shipping the
    (up to ~10 MB) weight matrix per frame would dominate on slow links.
    Keyed by DEVICE too: a DP replica pinned to another chip must get a
    matrix committed there, or every dispatch re-copies it cross-device.
    maxsize bounds pinned HBM: bulk workloads over many native resolutions
    would otherwise accumulate up to 64 matrices (potentially GiBs) on a
    chip whose headroom belongs to the model set; 8 covers the steady
    state (a camera fleet has few distinct sensor resolutions) at a worst
    case of ~100-200 MB."""
    w = resize_weights(src, dst, filter)
    if device is not None:
        return jax.device_put(w, device)
    return jnp.asarray(w)


def preprocess_frame_device(
    rgb_u8: jnp.ndarray, dst_h: int, dst_w: int, device=None
) -> jnp.ndarray:
    """uint8 [H, W, 3] frame -> [grid_h*grid_w, C*T*P*P] f32 patches.

    Resize runs as two separable interpolation MATMULS (host-cached PIL-style
    bicubic weight matrices, staged on ``device`` once per shape) —
    jax.image's gather-based cubic resampling is ~100x slower on TPU.
    Normalization and patchify fuse into the same program.
    """
    src_h, src_w = rgb_u8.shape[:2]
    wh = _resize_weights_dev(src_h, dst_h, device=device)
    ww = _resize_weights_dev(src_w, dst_w, device=device)
    return _preprocess_frame_jit(rgb_u8, wh, ww, dst_h, dst_w)


@partial(jax.jit, static_argnames=("dst_h", "dst_w"))
def preprocess_batch_device(
    rgb_u8_batch: jnp.ndarray, dst_h: int, dst_w: int
) -> jnp.ndarray:
    """Batched variant: [B, H, W, 3] u8 -> [B, patches, C*T*P*P] f32.
    All frames in a batch share one source and target shape (bucketing
    happens upstream)."""
    return jax.vmap(lambda f: preprocess_frame_device(f, dst_h, dst_w))(
        rgb_u8_batch
    )


@dataclass
class DeviceImagePatches:
    """ImagePatches twin whose patch tensor lives in HBM.

    Produced by preprocess_image_device: the host only JPEG-decodes and
    ships the u8 frame (3 bytes/px); resize/normalize/patchify run on
    device, so the transfer is ~8x smaller than shipping f32 patches and
    the MXU does the resampling.  Interface-compatible with
    ops.preprocess.ImagePatches where the engine consumes it.
    """

    patches: jnp.ndarray         # [num_patches, C*T*P*P] f32, on device
    grid_t: int
    grid_h: int
    grid_w: int

    @property
    def num_patches(self) -> int:
        return self.grid_t * self.grid_h * self.grid_w

    @property
    def num_tokens(self) -> int:
        return self.num_patches // (MERGE_SIZE * MERGE_SIZE)

    def padded(self, bucket=None) -> Tuple[jnp.ndarray, int]:
        from vis_tpu.ops.preprocess import patch_bucket_for

        n = self.num_patches
        if bucket is None:
            bucket = patch_bucket_for(n)
        if n > bucket:
            raise ValueError(f"{n} patches exceed bucket {bucket}")
        return (
            jnp.pad(self.patches, ((0, bucket - n), (0, 0))),
            bucket,
        )


def preprocess_image_device(
    image_path,
    max_image_dim=None,
    min_pixels: int = None,
    max_pixels: int = None,
    device=None,
) -> DeviceImagePatches:
    """Device-path drop-in for ops.preprocess.preprocess_image (serving uses
    it when DEVICE_PREPROCESS=true): host JPEG-decode + smart_resize sizing,
    then resize-as-matmul -> CLIP-normalize -> patchify in one jit program.
    Numerics match the PIL path to resampling tolerance (tests pin it); the
    host paths remain the HF-bit-exact reference."""
    from vis_tpu.ops.preprocess import (
        DEFAULT_MAX_PIXELS,
        DEFAULT_MIN_PIXELS,
        FACTOR,
        clamp_longest_side,
        smart_resize,
    )

    min_pixels = DEFAULT_MIN_PIXELS if min_pixels is None else min_pixels
    max_pixels = DEFAULT_MAX_PIXELS if max_pixels is None else max_pixels
    from vis_tpu.ops.frame_cache import frame_size, get_device_frame

    src_h, src_w = frame_size(image_path)  # one shared decode per file
    if max_image_dim is not None:
        max_pixels = min(max_pixels, max_image_dim * max_image_dim)
    h_bar, w_bar = smart_resize(src_h, src_w, FACTOR, min_pixels, max_pixels)
    h_bar, w_bar = clamp_longest_side(h_bar, w_bar, max_image_dim)
    # The u8 frame transfer is shared with every other device preprocess
    # path touching this file (auditor tiling, batched quality stats).
    patches = preprocess_frame_device(
        get_device_frame(image_path, device), h_bar, w_bar, device=device
    )
    return DeviceImagePatches(
        patches=patches, grid_t=1,
        grid_h=h_bar // PATCH_SIZE, grid_w=w_bar // PATCH_SIZE,
    )


__all__ = [
    "preprocess_frame_device",
    "preprocess_batch_device",
    "patchify_device",
    "preprocess_image_device",
    "DeviceImagePatches",
]
