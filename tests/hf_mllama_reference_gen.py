"""Generate HF-torch golden references for the Mllama (Llama-3.2 Vision)
model (subprocess-isolated; see tests/hf_reference_gen.py for why).

Usage: python tests/hf_mllama_reference_gen.py <out.npz>
"""

import os
import sys

os.environ["USE_TF"] = "0"
os.environ["TRANSFORMERS_VERBOSITY"] = "error"

import numpy as np
import torch
from transformers import MllamaConfig as HFMllamaConfig
from transformers import MllamaForConditionalGeneration

IMAGE_TOKEN_ID = 257  # inside the vocab+8 special region of the tiny config


def build_model() -> MllamaForConditionalGeneration:
    torch.manual_seed(3)
    cfg = HFMllamaConfig(
        vision_config=dict(
            hidden_size=64, num_hidden_layers=2, num_global_layers=1,
            attention_heads=4, image_size=56, patch_size=14, max_num_tiles=2,
            intermediate_size=128, intermediate_layers_indices=[0],
            supported_aspect_ratios=[[1, 1], [1, 2], [2, 1]],
            vision_output_dim=128,  # 64 * (1 final + 1 intermediate)
            num_channels=3,
        ),
        text_config=dict(
            vocab_size=256, hidden_size=64, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=128, rope_theta=500000.0, rms_norm_eps=1e-5,
            cross_attention_layers=[1, 3], max_position_embeddings=512, pad_token_id=0,
            rope_scaling={"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
                          "high_freq_factor": 4.0,
                          "original_max_position_embeddings": 8192},
            tie_word_embeddings=False,
        ),
        image_token_index=IMAGE_TOKEN_ID,
    )
    return MllamaForConditionalGeneration(cfg).eval()


def main(out_path: str) -> None:
    model = build_model()
    out = {}
    for name, tensor in model.state_dict().items():
        out[f"sd::{name}"] = tensor.detach().float().numpy()

    rng = np.random.default_rng(6)
    # Two tiles, 56x56 each; second tile masked off in the 1-valid case.
    pixels = rng.standard_normal((1, 1, 2, 3, 56, 56)).astype(np.float32)
    aspect_ratio_ids = np.array([[1]])  # [1,1] -> id 1
    aspect_ratio_mask = np.array([[[1, 0]]])  # only tile 0 valid

    with torch.no_grad():
        vis = model.model.vision_model(
            pixel_values=torch.tensor(pixels),
            aspect_ratio_ids=torch.tensor(aspect_ratio_ids),
            aspect_ratio_mask=torch.tensor(aspect_ratio_mask),
        ).last_hidden_state
    out["vision_out"] = vis.numpy()  # [1, 1, 2, 17, 128]
    out["pixels"] = pixels
    out["aspect_ratio_ids"] = aspect_ratio_ids
    out["aspect_ratio_mask"] = aspect_ratio_mask

    # Full multimodal forward.
    ids = np.array([[IMAGE_TOKEN_ID, 11, 12, 13, 14, 15, 16, 17]])
    with torch.no_grad():
        mm = model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pixels),
            aspect_ratio_ids=torch.tensor(aspect_ratio_ids),
            aspect_ratio_mask=torch.tensor(aspect_ratio_mask),
        ).logits
    out["mm_ids"] = ids
    out["mm_logits"] = mm.numpy()

    # Text-only forward (cross layers skipped).
    tids = np.array([[5, 6, 7, 8, 9]])
    with torch.no_grad():
        tl = model(input_ids=torch.tensor(tids)).logits
    out["text_ids"] = tids
    out["text_logits"] = tl.numpy()

    np.savez(out_path, **out)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1])
