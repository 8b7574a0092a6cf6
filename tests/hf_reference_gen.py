"""Generate HF-torch golden references for the Qwen2-VL numerics tests.

Run as a subprocess (torch-only, no jax import): torch and jax XLA runtimes
deadlock nondeterministically when mixed in one process in this environment,
so references are produced here and consumed by tests/test_models_qwen2vl.py
via an .npz handoff.

Usage: python tests/hf_reference_gen.py <out.npz>
"""

import os
import sys

os.environ["USE_TF"] = "0"
os.environ["TRANSFORMERS_VERBOSITY"] = "error"

import numpy as np
import torch
from transformers import Qwen2VLConfig as HFConfig
from transformers import Qwen2VLForConditionalGeneration

MROPE_SECTION = [2, 3, 3]
GRID_H = GRID_W = 4
IMAGE_TOKEN_ID = 7
VISION_START_ID = 5
VISION_END_ID = 6


def build_model() -> Qwen2VLForConditionalGeneration:
    torch.manual_seed(0)
    cfg = HFConfig(
        text_config=dict(
            vocab_size=512, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
            rope_theta=1_000_000.0, max_position_embeddings=512,
            rms_norm_eps=1e-6,
            rope_scaling={"type": "mrope", "mrope_section": MROPE_SECTION},
        ),
        vision_config=dict(
            depth=2, embed_dim=64, num_heads=4, mlp_ratio=4, patch_size=14,
            spatial_merge_size=2, temporal_patch_size=2, hidden_size=64,
            in_channels=3,
        ),
        image_token_id=IMAGE_TOKEN_ID,
        vision_start_token_id=VISION_START_ID,
        vision_end_token_id=VISION_END_ID,
    )
    return Qwen2VLForConditionalGeneration(cfg).eval()


def main(out_path: str) -> None:
    model = build_model()
    out = {}

    # State dict (numpy) for the jax side to convert.
    for name, tensor in model.state_dict().items():
        out[f"sd::{name}"] = tensor.detach().float().numpy()

    # 1. Text-only logits.
    rng = np.random.default_rng(0)
    text_ids = rng.integers(10, 500, size=(2, 12))
    with torch.no_grad():
        out["text_logits"] = model(input_ids=torch.tensor(text_ids)).logits.numpy()
    out["text_ids"] = text_ids

    # 2. Decode-parity sequence.
    ids9 = np.random.default_rng(1).integers(10, 500, size=(1, 9))
    with torch.no_grad():
        out["decode_logits"] = model(input_ids=torch.tensor(ids9)).logits.numpy()
    out["decode_ids"] = ids9

    # 3. Vision tower.
    patch_dim = 3 * 2 * 14 * 14
    patches = np.random.default_rng(2).standard_normal(
        (GRID_H * GRID_W, patch_dim)
    ).astype(np.float32)
    grid = torch.tensor([[1, GRID_H, GRID_W]])
    with torch.no_grad():
        out["vision_out"] = model.model.visual(
            torch.tensor(patches), grid_thw=grid
        ).numpy()
    out["vision_patches"] = patches

    # 4. Full multimodal forward + rope index.
    n_vision = (GRID_H * GRID_W) // 4
    prefix = [11, 12, 13, VISION_START_ID]
    image = [IMAGE_TOKEN_ID] * n_vision
    suffix = [VISION_END_ID, 21, 22]
    mm_ids = np.array([prefix + image + suffix])
    mm_patches = np.random.default_rng(4).standard_normal(
        (GRID_H * GRID_W, patch_dim)
    ).astype(np.float32)
    with torch.no_grad():
        out["mm_logits"] = model(
            input_ids=torch.tensor(mm_ids),
            pixel_values=torch.tensor(mm_patches),
            image_grid_thw=grid,
        ).logits.numpy()
    out["mm_ids"] = mm_ids
    out["mm_patches"] = mm_patches
    pos, _ = model.model.get_rope_index(torch.tensor(mm_ids), image_grid_thw=grid)
    out["mm_positions"] = pos.numpy()[:, 0]
    out["mm_prefix_len"] = np.array(len(prefix))
    out["mm_suffix_len"] = np.array(len(suffix))

    np.savez(out_path, **out)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1])
