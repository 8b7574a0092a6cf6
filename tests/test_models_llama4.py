"""Golden-numerics tests: JAX Llama-4 (MoE VLM) vs the HF torch reference
(tiny config, CPU, subprocess-isolated reference generation).

Covers the family's distinguishing semantics in one 4-layer period:
dense/MoE interleave (sigmoid top-2 router + shared expert), a NoPE layer
with attention temperature tuning, chunked attention that actually binds
(12-token prompt, chunk size 8), interleaved rotary, and QK L2-norm.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from vis_tpu.models.common.layers import KVCache, causal_mask, embed
from vis_tpu.models.llama4.config import Llama4Config
from vis_tpu.models.llama4.model import (
    convert_hf_state_dict,
    llama4_logits,
    project_vision,
    text_forward,
    vision_forward,
)

ATOL = 3e-4


@pytest.fixture(scope="session")
def l4ref(tmp_path_factory):
    out = tmp_path_factory.mktemp("hf_ref") / "llama4_ref.npz"
    script = Path(__file__).parent / "hf_llama4_reference_gen.py"
    result = subprocess.run(
        [sys.executable, str(script), str(out)],
        capture_output=True, text=True, timeout=600,
    )
    if result.returncode != 0:
        pytest.fail(
            f"HF Llama4 reference generation failed:\n{result.stderr[-2000:]}"
        )
    return np.load(out)


@pytest.fixture(scope="session")
def l4jx(l4ref):
    config = Llama4Config.tiny()
    state_dict = {k[4:]: l4ref[k] for k in l4ref.files if k.startswith("sd::")}
    params = convert_hf_state_dict(state_dict, config)
    return config, params


def test_layer_pattern_derivation():
    cfg = Llama4Config.tiny().text
    assert cfg.moe_layers == (1, 3)          # interleave step 2
    assert cfg.use_rope_layers == (1, 1, 1, 0)  # NoPE every 4th


def test_vision_tower_matches(l4ref, l4jx):
    config, params = l4jx
    ours = np.asarray(
        vision_forward(config, params["vision"],
                       jnp.asarray(l4ref["pixels"]))
    )
    ref = l4ref["vision_out"]  # [1, 4, 48]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-3)


def test_text_only_logits_match(l4ref, l4jx):
    config, params = l4jx
    ids = l4ref["text_ids"]
    b, s = ids.shape
    embeds = embed(jnp.asarray(ids), params["embed_tokens"])
    positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    hidden, _ = text_forward(
        config, params, embeds, positions, mask=causal_mask(s, s)
    )
    ours = np.asarray(llama4_logits(config, params, hidden))
    np.testing.assert_allclose(
        ours, l4ref["text_logits"], atol=ATOL, rtol=1e-3
    )


def test_multimodal_logits_match(l4ref, l4jx):
    config, params = l4jx
    ids = l4ref["mm_ids"]
    b, s = ids.shape
    feats = vision_forward(config, params["vision"],
                           jnp.asarray(l4ref["pixels"]))
    projected = project_vision(config, params["vision"], feats)
    embeds = embed(jnp.asarray(ids), params["embed_tokens"])
    flat = projected.reshape(-1, projected.shape[-1])
    is_img = jnp.asarray(ids == config.image_token_id)
    # Scatter feature row j at the j-th placeholder position.
    slot = jnp.cumsum(is_img.reshape(-1)) - 1
    merged = jnp.where(
        is_img.reshape(-1)[:, None], flat[slot], embeds.reshape(-1, embeds.shape[-1])
    ).reshape(embeds.shape)
    positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    hidden, _ = text_forward(
        config, params, merged, positions, mask=causal_mask(s, s)
    )
    ours = np.asarray(llama4_logits(config, params, hidden))
    np.testing.assert_allclose(ours, l4ref["mm_logits"], atol=ATOL, rtol=1e-3)


def test_cached_decode_matches_hf_greedy(l4ref, l4jx):
    """Prefill + one-token cached steps reproduce HF greedy continuation —
    exercises the KV-cache path across chunk boundaries (prompt 12, chunk 8,
    decode crosses into positions 12..17)."""
    config, params = l4jx
    tc = config.text
    ids = l4ref["text_ids"]
    target = l4ref["text_greedy"][0]  # prompt + 6 greedy tokens
    b, s = ids.shape
    max_len = s + 8
    cache = KVCache.create(
        tc.num_layers, b, max_len, tc.num_kv_heads, tc.head_dim,
        dtype=jnp.float32,
    )
    embeds = embed(jnp.asarray(ids), params["embed_tokens"])
    positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    # Prefill mask over the cache width: causal on written rows only.
    qi = jnp.arange(s)[:, None]
    kj = jnp.arange(max_len)[None, :]
    mask = jnp.where(kj <= qi, 0.0, -1e30)[None, None].astype(jnp.float32)
    hidden, cache = text_forward(
        config, params, embeds, positions, cache=cache, mask=mask
    )
    tok = int(np.argmax(np.asarray(
        llama4_logits(config, params, hidden)[:, -1])))
    got = list(ids[0]) + [tok]
    for step in range(5):
        pos = s + step
        embeds = embed(jnp.asarray([[tok]]), params["embed_tokens"])
        positions = jnp.asarray([[pos]])
        hidden, cache = text_forward(
            config, params, embeds, positions, cache=cache,
            mask=cache.decode_mask(),
        )
        tok = int(np.argmax(np.asarray(
            llama4_logits(config, params, hidden)[:, -1])))
        got.append(tok)
    np.testing.assert_array_equal(np.asarray(got), target)


def test_ep_sharded_forward_token_exact(l4ref, l4jx):
    """Expert-parallel execution on a virtual mesh reproduces the
    unsharded logits: expert weights sharded on the expert axis (EP),
    attention TP on the same 'model' axis (VERDICT r4 #8)."""
    import jax
    from jax.sharding import Mesh

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    from vis_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    from vis_tpu.parallel.sharding import shard_llama4_params

    config, params = l4jx
    devices = np.array(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devices, (DATA_AXIS, MODEL_AXIS))
    sharded = shard_llama4_params(params, mesh)
    gate_up = sharded["layers"][1]["moe"]["gate_up"]
    assert gate_up.sharding.spec[0] == MODEL_AXIS  # 4 experts over 4 devices

    ids = l4ref["text_ids"]
    b, s = ids.shape
    positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    mask = causal_mask(s, s)

    def fwd(p, token_ids):
        embeds = embed(token_ids, p["embed_tokens"])
        hidden, _ = text_forward(config, p, embeds, positions, mask=mask)
        return llama4_logits(config, p, hidden)

    base = np.asarray(fwd(params, jnp.asarray(ids)))
    with mesh:
        ep = np.asarray(jax.jit(fwd)(sharded, jnp.asarray(ids)))
    np.testing.assert_allclose(ep, base, atol=2e-4, rtol=1e-3)
    np.testing.assert_array_equal(
        np.argmax(ep, axis=-1), np.argmax(base, axis=-1)
    )
