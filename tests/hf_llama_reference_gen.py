"""Generate HF-torch golden references for the Llama text decoder
(subprocess-isolated; see tests/hf_reference_gen.py for why).

Usage: python tests/hf_llama_reference_gen.py <out.npz>
"""

import os
import sys

os.environ["USE_TF"] = "0"
os.environ["TRANSFORMERS_VERBOSITY"] = "error"

import numpy as np
import torch
from transformers import LlamaConfig, LlamaForCausalLM


def main(out_path: str) -> None:
    torch.manual_seed(1)
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        rope_theta=500000.0, rms_norm_eps=1e-5, max_position_embeddings=4096,
        rope_scaling={
            "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0, "original_max_position_embeddings": 8192,
        },
        attention_bias=False, tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg).eval()
    out = {}
    for name, tensor in model.state_dict().items():
        out[f"sd::{name}"] = tensor.detach().float().numpy()
    ids = np.random.default_rng(5).integers(5, 250, size=(2, 10))
    with torch.no_grad():
        out["logits"] = model(input_ids=torch.tensor(ids)).logits.numpy()
    out["ids"] = ids
    np.savez(out_path, **out)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1])
