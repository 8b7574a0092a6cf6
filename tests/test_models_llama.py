"""Golden-numerics tests: JAX Llama decoder (llama3-scaled RoPE) vs HF."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from vis_tpu.models.common.decoder import decoder_forward, lm_logits
from vis_tpu.models.common.layers import causal_mask
from vis_tpu.models.llama.config import llama_tiny
from vis_tpu.models.llama.model import convert_hf_state_dict


@pytest.fixture(scope="session")
def llama_ref(tmp_path_factory):
    out = tmp_path_factory.mktemp("hf_ref") / "llama_ref.npz"
    script = Path(__file__).parent / "hf_llama_reference_gen.py"
    result = subprocess.run(
        [sys.executable, str(script), str(out)],
        capture_output=True, text=True, timeout=600,
    )
    if result.returncode != 0:
        pytest.fail(f"HF Llama reference generation failed:\n{result.stderr[-2000:]}")
    return np.load(out)


def test_llama_logits_match(llama_ref):
    config = llama_tiny()
    state_dict = {
        key[4:]: llama_ref[key]
        for key in llama_ref.files
        if key.startswith("sd::")
    }
    params = convert_hf_state_dict(state_dict, config)
    ids = llama_ref["ids"]
    b, s = ids.shape
    positions = np.broadcast_to(np.arange(s)[None], (b, s)).copy()
    embeds = jnp.take(params["embed_tokens"], jnp.asarray(ids), axis=0)
    hidden, _ = decoder_forward(
        config, params, embeds, jnp.asarray(positions), mask=causal_mask(s, s)
    )
    ours = np.asarray(lm_logits(config, params, hidden))
    np.testing.assert_allclose(ours, llama_ref["logits"], atol=2e-4, rtol=1e-3)
