"""Llama-4 image preprocessing: global-tile resize + [-1, 1] normalize.

HF's Llama4 processor (image_processing_llama4_fast.py) splits large images
into up to 16 aspect-preserving 336px chunks plus a global tile; the auditor
workload here inspects a single frame whose saliency survives one global
tile, so this implements the single-tile path (the model merges any number
of tiles — extending to chunked tiling only changes this file and the
placeholder count).  Normalization is (x/255 - 0.5) / 0.5, bilinear resize,
matching the HF defaults (image_mean = image_std = 0.5).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np


@dataclasses.dataclass(frozen=True)
class Llama4ImageInputs:
    pixel_values: np.ndarray  # [tiles, 3, S, S] f32, normalized
    num_tiles: int


def preprocess_image_llama4(
    image_path: Path | str, image_size: int = 336
) -> Llama4ImageInputs:
    from PIL import Image

    img = Image.open(image_path).convert("RGB").resize(
        (image_size, image_size), Image.BILINEAR
    )
    arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - 0.5) / 0.5
    chw = np.transpose(arr, (2, 0, 1))[None]  # [1, 3, S, S]
    return Llama4ImageInputs(pixel_values=chw, num_tiles=1)


__all__ = ["Llama4ImageInputs", "preprocess_image_llama4"]
