"""Generate HF-torch golden references for Llama-4 (MoE VLM) at the tiny
config (subprocess-isolated; see tests/hf_reference_gen.py for why).

Mirrors vis_tpu.models.llama4.config.Llama4Config.tiny(): 4 text layers
covering one full pattern period (dense/MoE interleave at step 2, one NoPE
layer at index 3 with temperature tuning), chunked attention of 8 so a
12-token prompt spans two chunks, sigmoid top-2 router over 4 experts.

Usage: python tests/hf_llama4_reference_gen.py <out.npz>
"""

import os
import sys

os.environ["USE_TF"] = "0"
os.environ["TRANSFORMERS_VERBOSITY"] = "error"

import numpy as np
import torch
from transformers import Llama4Config as HFLlama4Config
from transformers import Llama4ForConditionalGeneration

IMAGE_TOKEN_ID = 250
BOI_TOKEN_ID = 248
EOI_TOKEN_ID = 249


def build_model() -> Llama4ForConditionalGeneration:
    torch.manual_seed(11)
    cfg = HFLlama4Config(
        text_config=dict(
            vocab_size=256, hidden_size=64, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            intermediate_size=112, intermediate_size_mlp=160,
            num_local_experts=4, num_experts_per_tok=2,
            interleave_moe_layer_step=2, attention_chunk_size=8,
            rope_theta=500000.0, rope_scaling=None, rms_norm_eps=1e-5,
            use_qk_norm=True, attn_temperature_tuning=True,
            floor_scale=4.0, attn_scale=0.1,
            tie_word_embeddings=False, pad_token_id=0,
            max_position_embeddings=512,
        ),
        vision_config=dict(
            image_size=56, patch_size=14, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=128, pixel_shuffle_ratio=0.5,
            projector_input_dim=48, projector_output_dim=48,
            vision_output_dim=48, rope_theta=10000,
        ),
        image_token_id=IMAGE_TOKEN_ID,
        boi_token_id=BOI_TOKEN_ID,
        eoi_token_id=EOI_TOKEN_ID,
    )
    cfg._attn_implementation = "eager"
    return Llama4ForConditionalGeneration(cfg).eval()


def main(out_path: str) -> None:
    model = build_model()
    out = {}
    for name, tensor in model.state_dict().items():
        out[f"sd::{name}"] = tensor.detach().float().numpy()

    rng = np.random.default_rng(17)
    # One 56x56 tile -> 16 patches -> pixel shuffle 0.5 -> 4 image tokens.
    pixels = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        vis = model.vision_model(torch.tensor(pixels)).last_hidden_state
    out["pixels"] = pixels
    out["vision_out"] = vis.numpy()  # [1, 4, 48] pre-projector

    # Text-only forward, 12 tokens (> attention_chunk_size 8: the chunked
    # layers' block-diagonal mask binds, and positions 3.. exercise the
    # NoPE layer's temperature scaling with floor_scale=4).
    tids = np.array([[5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]])
    with torch.no_grad():
        tl = model.language_model(input_ids=torch.tensor(tids)).logits
    out["text_ids"] = tids
    out["text_logits"] = tl.numpy()

    # Multimodal forward: 4 placeholder tokens hold the tile's features.
    ids = np.array([[BOI_TOKEN_ID, IMAGE_TOKEN_ID, IMAGE_TOKEN_ID,
                     IMAGE_TOKEN_ID, IMAGE_TOKEN_ID, EOI_TOKEN_ID,
                     21, 22, 23, 24]])
    with torch.no_grad():
        mm = model(
            input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels)
        ).logits
    out["mm_ids"] = ids
    out["mm_logits"] = mm.numpy()

    # Greedy continuation of the text prompt (decode-parity target).
    with torch.no_grad():
        gen = model.language_model.generate(
            torch.tensor(tids), max_new_tokens=6, do_sample=False,
        )
    out["text_greedy"] = gen.numpy()

    np.savez(out_path, **out)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1])
