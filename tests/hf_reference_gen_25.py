"""Generate HF-torch golden references for the Qwen2.5-VL numerics tests.

Run as a subprocess (torch-only; torch+jax deadlock when mixed in-process
here).  Consumed by tests/test_models_qwen25vl.py via an .npz handoff.

Usage: python tests/hf_reference_gen_25.py <out.npz>
"""

import os
import sys

os.environ["USE_TF"] = "0"
os.environ["TRANSFORMERS_VERBOSITY"] = "error"

import numpy as np
import torch
from transformers import Qwen2_5_VLConfig as HFConfig
from transformers import Qwen2_5_VLForConditionalGeneration

MROPE_SECTION = [2, 3, 3]
GRID_H = GRID_W = 6       # llm grid 3x3 -> pads to 4x4: partial windows
IMAGE_TOKEN_ID = 7
VISION_START_ID = 5
VISION_END_ID = 6


def build_model() -> Qwen2_5_VLForConditionalGeneration:
    torch.manual_seed(0)
    cfg = HFConfig(
        text_config=dict(
            vocab_size=512, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=128, rope_theta=1_000_000.0,
            max_position_embeddings=512, rms_norm_eps=1e-6,
            rope_scaling={"type": "mrope", "mrope_section": MROPE_SECTION},
        ),
        vision_config=dict(
            depth=4, hidden_size=64, intermediate_size=128, num_heads=4,
            patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
            out_hidden_size=64, in_channels=3,
            window_size=56,             # -> 2x2 merged cells per window
            fullatt_block_indexes=[1, 3],
        ),
        image_token_id=IMAGE_TOKEN_ID,
        vision_start_token_id=VISION_START_ID,
        vision_end_token_id=VISION_END_ID,
    )
    return Qwen2_5_VLForConditionalGeneration(cfg).eval()


def main(out_path: str) -> None:
    model = build_model()
    out = {}
    for name, tensor in model.state_dict().items():
        out[f"sd::{name}"] = tensor.detach().float().numpy()

    rng = np.random.default_rng(0)
    n_patches = GRID_H * GRID_W
    patch_dim = 3 * 2 * 14 * 14
    patches = rng.standard_normal((n_patches, patch_dim)).astype(np.float32)
    grid_thw = torch.tensor([[1, GRID_H, GRID_W]])
    visual = getattr(model, "visual", None) or model.model.visual
    with torch.no_grad():
        vision_out = visual(torch.from_numpy(patches), grid_thw=grid_thw)
    out["patches"] = patches
    out["vision_out"] = vision_out.float().numpy()

    # Full multimodal logits.
    n_vision = n_patches // 4
    prefix = [65, 66, VISION_START_ID]
    suffix = [VISION_END_ID, 67, 68, 69]
    ids = np.array([prefix + [IMAGE_TOKEN_ID] * n_vision + suffix], np.int64)
    with torch.no_grad():
        mm = model(
            input_ids=torch.from_numpy(ids),
            pixel_values=torch.from_numpy(patches),
            image_grid_thw=grid_thw,
        )
    out["mm_ids"] = ids
    out["mm_logits"] = mm.logits.float().numpy()
    # inputs embeds with vision scattered (bisect helper)
    core2 = getattr(model, "model", model)
    emb_layer = core2.language_model.embed_tokens if hasattr(core2, "language_model") else core2.get_input_embeddings()
    with torch.no_grad():
        ie = emb_layer(torch.from_numpy(ids))
        mask = torch.from_numpy(ids) == IMAGE_TOKEN_ID
        ie[mask] = vision_out.to(ie.dtype)
    out["mm_inputs_embeds"] = ie.float().numpy()
    with torch.no_grad():
        tonly = model(input_ids=torch.from_numpy(ids))
    out["mm_ids_textonly_logits"] = tonly.logits.float().numpy()
    core = getattr(model, "model", model)
    pos_ids, deltas = core.get_rope_index(
        torch.from_numpy(ids), grid_thw, None, None,
    )
    out["mm_position_ids"] = pos_ids.numpy()  # [3, b, s]

    # Text-only logits.
    text_ids = rng.integers(1, 500, size=(1, 9))
    with torch.no_grad():
        t = model(input_ids=torch.from_numpy(text_ids))
    out["text_ids"] = text_ids
    out["text_logits"] = t.logits.float().numpy()

    np.savez(out_path, **out)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1])
