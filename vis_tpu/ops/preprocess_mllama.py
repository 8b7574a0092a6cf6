"""Mllama image preprocessing: aspect-ratio tiling into 448x448 tiles.

Host-path counterpart of ops.preprocess (Qwen2-VL) for the auditor model:
pick the best supported tile arrangement for the image's aspect ratio,
resize to fit the tiled canvas (preserving aspect), zero-pad, split into
tiles, and normalize with CLIP statistics.  Mirrors the HF Mllama image
processor's canvas selection semantics.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np
from PIL import Image

from vis_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD

TILE_SIZE = 448
SUPPORTED_ASPECT_RATIOS: List[Tuple[int, int]] = [
    (1, 1), (1, 2), (1, 3), (1, 4), (2, 1), (2, 2), (3, 1), (4, 1),
]


@dataclasses.dataclass
class MllamaTiles:
    tiles: np.ndarray          # [num_tiles, 3, 448, 448] float32 normalized
    aspect_ratio_id: int       # 1-based index into SUPPORTED_ASPECT_RATIOS
    num_tiles: int

    @property
    def tile_mask(self) -> np.ndarray:
        return np.ones((self.num_tiles,), np.float32)


def select_aspect_ratio(width: int, height: int, max_tiles: int = 4) -> Tuple[int, int]:
    """Pick the (h_tiles, w_tiles) arrangement that best preserves the image:
    prefer canvases that can hold the image at the largest scale without
    upscaling beyond necessity (HF get_optimal_tiled_canvas spirit)."""
    best = (1, 1)
    best_scale = -1.0
    for h_t, w_t in SUPPORTED_ASPECT_RATIOS:
        if h_t * w_t > max_tiles:
            continue
        canvas_w = w_t * TILE_SIZE
        canvas_h = h_t * TILE_SIZE
        scale = min(canvas_w / width, canvas_h / height)
        # Prefer the smallest canvas that fits (scale >= 1), else the one
        # that downscales least.
        if scale >= 1.0:
            score = 1.0 / scale  # smaller upscaling headroom preferred
            candidate_scale = 1.0 + score
        else:
            candidate_scale = scale
        if candidate_scale > best_scale:
            best_scale = candidate_scale
            best = (h_t, w_t)
    return best


def preprocess_image_mllama(
    image_path, max_tiles: int = 4
) -> MllamaTiles:
    with Image.open(image_path) as im:
        image = im.convert("RGB")
    h_t, w_t = select_aspect_ratio(image.width, image.height, max_tiles)
    canvas_w, canvas_h = w_t * TILE_SIZE, h_t * TILE_SIZE

    scale = min(canvas_w / image.width, canvas_h / image.height)
    new_w = max(1, int(round(image.width * scale)))
    new_h = max(1, int(round(image.height * scale)))
    resized = image.resize((new_w, new_h), Image.BICUBIC)

    canvas = np.zeros((canvas_h, canvas_w, 3), np.float32)
    canvas[:new_h, :new_w] = np.asarray(resized, np.float32) / 255.0
    canvas = (canvas - CLIP_MEAN) / CLIP_STD
    canvas = canvas.transpose(2, 0, 1)  # [3, H, W]

    tiles = canvas.reshape(3, h_t, TILE_SIZE, w_t, TILE_SIZE)
    tiles = tiles.transpose(1, 3, 0, 2, 4).reshape(
        h_t * w_t, 3, TILE_SIZE, TILE_SIZE
    )
    ratio_id = SUPPORTED_ASPECT_RATIOS.index((h_t, w_t)) + 1
    return MllamaTiles(tiles=tiles, aspect_ratio_id=ratio_id,
                       num_tiles=h_t * w_t)


__all__ = ["preprocess_image_mllama", "MllamaTiles", "select_aspect_ratio",
           "SUPPORTED_ASPECT_RATIOS", "TILE_SIZE"]
