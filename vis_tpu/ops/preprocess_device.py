"""On-device batched preprocessing: resize -> normalize -> patchify in XLA.

The device path for bulk-throughput serving (SURVEY.md §7 step 4): decoded
frames transfer to HBM once as uint8 (3 bytes/pixel), and resizing,
CLIP normalization, and merge-window patchification run as one jit program —
overlapping with model compute and avoiding a second host pass.  The host
paths (ops.preprocess python/native) remain the per-request default and the
HF-parity reference.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from vis_tpu.ops.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    MERGE_SIZE,
    PATCH_SIZE,
    TEMPORAL_PATCH_SIZE,
)


def patchify_device(frames: jnp.ndarray, grid_h: int, grid_w: int) -> jnp.ndarray:
    """Merge-window patchify on device.

    frames: [T, C, H, W] normalized; returns [grid_h*grid_w, C*T*P*P]
    matching ops.preprocess.patchify bit-for-bit.
    """
    t, c, h, w = frames.shape
    m, p = MERGE_SIZE, PATCH_SIZE
    grid_t = t // TEMPORAL_PATCH_SIZE
    x = frames.reshape(
        grid_t, TEMPORAL_PATCH_SIZE, c, grid_h // m, m, p, grid_w // m, m, p
    )
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return x.reshape(grid_t * grid_h * grid_w, c * TEMPORAL_PATCH_SIZE * p * p)


@partial(jax.jit, static_argnames=("dst_h", "dst_w"))
def preprocess_frame_device(
    rgb_u8: jnp.ndarray, dst_h: int, dst_w: int
) -> jnp.ndarray:
    """uint8 [H, W, 3] frame -> [grid_h*grid_w, C*T*P*P] f32 patches.

    Resize uses jax.image cubic resampling (XLA gather/matmul lowering),
    then CLIP normalization and patchify fuse into the same program.
    """
    img = rgb_u8.astype(jnp.float32) / 255.0
    resized = jax.image.resize(img, (dst_h, dst_w, 3), method="cubic")
    resized = jnp.clip(resized, 0.0, 1.0)
    norm = (resized - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    chw = norm.transpose(2, 0, 1)
    frames = jnp.stack([chw] * TEMPORAL_PATCH_SIZE, axis=0)
    return patchify_device(frames, dst_h // PATCH_SIZE, dst_w // PATCH_SIZE)


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


__all__ = ["preprocess_frame_device", "preprocess_batch_device", "patchify_device"]
