"""Golden-numerics tests: JAX Mllama vs the HF torch reference (tiny config,
CPU, subprocess-isolated reference generation)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from vis_tpu.models.common.layers import KVCache, causal_mask
from vis_tpu.models.llama.mllama import (
    MllamaConfig,
    compute_cross_kv,
    convert_hf_state_dict,
    mllama_logits,
    text_forward,
    vision_forward,
)

ATOL = 3e-4


@pytest.fixture(scope="session")
def mref(tmp_path_factory):
    out = tmp_path_factory.mktemp("hf_ref") / "mllama_ref.npz"
    script = Path(__file__).parent / "hf_mllama_reference_gen.py"
    result = subprocess.run(
        [sys.executable, str(script), str(out)],
        capture_output=True, text=True, timeout=600,
    )
    if result.returncode != 0:
        pytest.fail(f"HF Mllama reference generation failed:\n{result.stderr[-2000:]}")
    return np.load(out)


@pytest.fixture(scope="session")
def mjx(mref):
    config = MllamaConfig.tiny()
    state_dict = {k[4:]: mref[k] for k in mref.files if k.startswith("sd::")}
    params = convert_hf_state_dict(state_dict, config)
    return config, params


def test_vision_tower_matches(mref, mjx):
    config, params = mjx
    pixels = mref["pixels"][0, 0]  # [2, 3, 56, 56]
    ar_id = int(mref["aspect_ratio_ids"][0, 0])
    tile_mask = mref["aspect_ratio_mask"][0, 0].astype(np.float32)  # [2]
    ours = np.asarray(
        vision_forward(
            config.vision, params, jnp.asarray(pixels),
            jnp.asarray(ar_id), jnp.asarray(tile_mask),
        )
    )
    ref = mref["vision_out"][0, 0]  # [2, 17, 128]
    assert ours.shape == ref.shape
    # Only the valid tile's features are meaningful downstream.
    np.testing.assert_allclose(ours[0], ref[0], atol=ATOL, rtol=1e-3)


def test_text_only_logits_match(mref, mjx):
    config, params = mjx
    ids = mref["text_ids"]
    b, s = ids.shape
    embeds = jnp.take(params["text"]["embed_tokens"], jnp.asarray(ids), axis=0)
    positions = jnp.asarray(np.broadcast_to(np.arange(s)[None], (b, s)).copy())
    hidden, _ = text_forward(
        config, params, embeds, positions, cross_kv=None,
        mask=causal_mask(s, s),
    )
    ours = np.asarray(mllama_logits(config, params, hidden))
    np.testing.assert_allclose(ours, mref["text_logits"], atol=ATOL, rtol=1e-3)


def test_multimodal_logits_match(mref, mjx):
    config, params = mjx
    pixels = mref["pixels"][0, 0]
    ar_id = int(mref["aspect_ratio_ids"][0, 0])
    tile_mask = mref["aspect_ratio_mask"][0, 0].astype(np.float32)
    vision = vision_forward(
        config.vision, params, jnp.asarray(pixels),
        jnp.asarray(ar_id), jnp.asarray(tile_mask),
    )
    cross_kv = compute_cross_kv(config, params, vision)

    ids = mref["mm_ids"]
    b, s = ids.shape
    embeds = jnp.take(params["text"]["embed_tokens"], jnp.asarray(ids), axis=0)
    positions = jnp.asarray(np.broadcast_to(np.arange(s)[None], (b, s)).copy())
    hidden, _ = text_forward(
        config, params, embeds, positions, cross_kv,
        mask=causal_mask(s, s),
    )
    ours = np.asarray(mllama_logits(config, params, hidden))
    np.testing.assert_allclose(ours, mref["mm_logits"], atol=ATOL, rtol=1e-3)


def test_cached_decode_matches_teacher_forcing(mref, mjx):
    """Self-layer KV cache + precomputed cross-KV decode parity."""
    config, params = mjx
    pixels = mref["pixels"][0, 0]
    ar_id = int(mref["aspect_ratio_ids"][0, 0])
    tile_mask = mref["aspect_ratio_mask"][0, 0].astype(np.float32)
    vision = vision_forward(
        config.vision, params, jnp.asarray(pixels),
        jnp.asarray(ar_id), jnp.asarray(tile_mask),
    )
    cross_kv = compute_cross_kv(config, params, vision)
    ids = mref["mm_ids"]
    ref_logits = mref["mm_logits"]
    tc = config.text
    n_self = len(config.self_layer_indices)
    cache = KVCache.create(n_self, 1, 32, tc.num_kv_heads, tc.head_dim_,
                           dtype=jnp.float32)
    # Prefill first 5 tokens.
    from vis_tpu.models.common.layers import length_mask

    prompt = ids[:, :5]
    embeds = jnp.take(params["text"]["embed_tokens"], jnp.asarray(prompt), axis=0)
    positions = jnp.asarray(np.arange(5)[None])
    mask = causal_mask(5, 32) + length_mask(32, jnp.asarray([5]))
    hidden, cache = text_forward(config, params, embeds, positions, cross_kv,
                                 cache=cache, mask=mask)
    logits = np.asarray(mllama_logits(config, params, hidden))[:, -1]
    cache = KVCache(k=cache.k, v=cache.v, lengths=jnp.asarray([5]))
    np.testing.assert_allclose(logits[0], ref_logits[0, 4], atol=ATOL, rtol=1e-3)
    # Teacher-forced decode for the remaining positions.
    for t in range(5, ids.shape[1]):
        tok = jnp.asarray(ids[:, t : t + 1])
        emb = jnp.take(params["text"]["embed_tokens"], tok, axis=0)
        hidden, cache = text_forward(
            config, params, emb, jnp.asarray([[t]]), cross_kv,
            cache=cache, mask=cache.decode_mask(),
        )
        logits = np.asarray(mllama_logits(config, params, hidden))[:, -1]
        np.testing.assert_allclose(
            logits[0], ref_logits[0, t], atol=ATOL, rtol=1e-3
        )


def test_fused_projections_match_unfused(mref, mjx):
    """fuse_mllama_projections is a pure relayout: the fused text stack must
    reproduce the unfused multimodal logits EXACTLY (same dots, same order —
    concat on the out axis doesn't change any row's arithmetic), for both
    raw bf16 leaves and per-row-quantized int8 leaves."""
    from vis_tpu.models.llama.mllama import (
        fuse_mllama_projections,
        quantize_mllama_params,
    )

    config, params = mjx
    pixels = mref["pixels"][0, 0]
    ar_id = int(mref["aspect_ratio_ids"][0, 0])
    tile_mask = mref["aspect_ratio_mask"][0, 0].astype(np.float32)
    vision = vision_forward(
        config.vision, params, jnp.asarray(pixels),
        jnp.asarray(ar_id), jnp.asarray(tile_mask),
    )
    ids = mref["mm_ids"]
    b, s = ids.shape
    positions = jnp.asarray(np.broadcast_to(np.arange(s)[None], (b, s)).copy())
    mask = causal_mask(s, s)

    for quantized in (False, True):
        base = (
            quantize_mllama_params(params, mode="int8") if quantized
            else params
        )
        fused = fuse_mllama_projections(config, base)
        # Cross layers keep their unfused k/v for compute_cross_kv.
        cross_kv = compute_cross_kv(config, fused, vision)
        cross_kv_base = compute_cross_kv(config, base, vision)
        for (fk, fv), (bk, bv) in zip(cross_kv, cross_kv_base):
            np.testing.assert_array_equal(np.asarray(fk), np.asarray(bk))
            np.testing.assert_array_equal(np.asarray(fv), np.asarray(bv))
        embeds = jnp.take(
            base["text"]["embed_tokens"]
            if not hasattr(base["text"]["embed_tokens"], "q")
            else params["text"]["embed_tokens"],
            jnp.asarray(ids), axis=0,
        )
        h_base, _ = text_forward(config, base, embeds, positions, cross_kv_base, mask=mask)
        h_fused, _ = text_forward(config, fused, embeds, positions, cross_kv, mask=mask)
        out_base = np.asarray(mllama_logits(config, base, h_base))
        out_fused = np.asarray(mllama_logits(config, fused, h_fused))
        np.testing.assert_allclose(out_fused, out_base, atol=1e-5, rtol=1e-5)
        # Self layers must actually be fused; cross layers must not be.
        for idx, layer in enumerate(fused["text"]["layers"]):
            if idx in config.cross_attention_layers:
                assert "qkv_proj" not in layer and "k_proj" in layer
            else:
                assert "qkv_proj" in layer and "q_proj" not in layer
            assert "gateup_proj" in layer["mlp"]
