"""Scan-execution equivalence: prefill_scan/decode_loop_scan must produce
exactly what the per-layer loop implementation produces."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vis_tpu.models.common.decoder import (
    DecoderConfig,
    decode_loop,
    init_decoder_params,
    prefill,
    prefill_scan,
    decode_loop_scan,
    stack_decoder_layers,
)
from vis_tpu.models.common.layers import KVCache


@pytest.fixture(scope="module", params=["llama", "qwen_mrope"])
def setup(request):
    mrope = (2, 3, 3) if request.param == "qwen_mrope" else None
    config = DecoderConfig(
        vocab_size=256, hidden_size=64, num_layers=3, num_heads=4,
        num_kv_heads=2, intermediate_size=128,
        qkv_bias=(request.param == "qwen_mrope"), mrope_section=mrope,
        tie_word_embeddings=True, dtype=jnp.float32,
    )
    params = init_decoder_params(config, jax.random.PRNGKey(3))
    stacked = stack_decoder_layers(params)
    return config, params, stacked


def _prefill_both(config, params, stacked, ids, lengths, max_len=64):
    b, s = ids.shape
    embeds = jnp.take(params["embed_tokens"], jnp.asarray(ids), axis=0)
    positions = jnp.asarray(np.broadcast_to(np.arange(s)[None], (b, s)).copy())
    cache_a = KVCache.create(config.num_layers, b, max_len, config.num_kv_heads,
                             config.head_dim_, dtype=jnp.float32)
    cache_b = KVCache.create(config.num_layers, b, max_len, config.num_kv_heads,
                             config.head_dim_, dtype=jnp.float32)
    logits_a, cache_a = prefill(config, params, embeds, positions, cache_a,
                                jnp.asarray(lengths))
    logits_b, cache_b = prefill_scan(config, stacked, embeds, positions, cache_b,
                                     jnp.asarray(lengths))
    return (logits_a, cache_a), (logits_b, cache_b)


def test_prefill_scan_matches_loop(setup):
    config, params, stacked = setup
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 250, size=(2, 16))
    (la, ca), (lb, cb) = _prefill_both(config, params, stacked, ids, [16, 16])
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5, rtol=1e-5)
    # Cache contents must match on the valid region.
    np.testing.assert_allclose(
        np.asarray(ca.k[:, :, :16]), np.asarray(cb.k[:, :, :16]),
        atol=1e-5, rtol=1e-5,
    )


def test_prefill_scan_mixed_lengths(setup):
    config, params, stacked = setup
    rng = np.random.default_rng(1)
    ids = rng.integers(5, 250, size=(2, 16))
    ids[1, 10:] = 0  # row 1 true length 10
    (la, ca), (lb, cb) = _prefill_both(config, params, stacked, ids, [16, 10])
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5, rtol=1e-5)


def test_decode_scan_matches_loop(setup):
    config, params, stacked = setup
    rng = np.random.default_rng(2)
    ids = rng.integers(5, 250, size=(2, 12))
    (la, ca), (lb, cb) = _prefill_both(config, params, stacked, ids, [12, 12])
    tokens_a, logits_a, ca = decode_loop(
        config, params, la, jnp.int32(12), ca, 8
    )
    tokens_b, logits_b, cb = decode_loop_scan(
        config, stacked, lb, jnp.int32(12), cb, 8
    )
    np.testing.assert_array_equal(np.asarray(tokens_a), np.asarray(tokens_b))
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(logits_b), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(ca.lengths), np.asarray(cb.lengths))


def test_decode_scan_mixed_length_rows(setup):
    config, params, stacked = setup
    rng = np.random.default_rng(4)
    ids = rng.integers(5, 250, size=(2, 16))
    ids[1, 9:] = 0
    (la, ca), (lb, cb) = _prefill_both(config, params, stacked, ids, [16, 9])
    # Loop path with per-row cursors vs scan path must agree per row.
    tokens_a, _, _ = decode_loop(
        config, params, la, jnp.asarray([16, 9]), ca, 6
    )
    tokens_b, _, _ = decode_loop_scan(
        config, stacked, lb, jnp.asarray([16, 9]), cb, 6
    )
    np.testing.assert_array_equal(np.asarray(tokens_a), np.asarray(tokens_b))


def test_fused_projections_match_unfused(setup):
    """fuse_stacked_projections (one QKV matmul, one gate+up matmul) must
    reproduce the unfused scan path: logits close, greedy tokens equal."""
    from vis_tpu.models.common.decoder import fuse_stacked_projections

    config, params, stacked = setup
    fused = fuse_stacked_projections(stacked)
    assert "qkv_proj" in fused["layers_stacked"]
    assert "gateup_proj" in fused["layers_stacked"]["mlp"]

    rng = np.random.default_rng(7)
    ids = rng.integers(5, 250, size=(2, 16))
    (la, ca), _ = _prefill_both(config, params, stacked, ids, [16, 12])

    embeds = jnp.take(params["embed_tokens"], jnp.asarray(ids), axis=0)
    positions = jnp.asarray(np.broadcast_to(np.arange(16)[None], (2, 16)).copy())
    cache_f = KVCache.create(config.num_layers, 2, 64, config.num_kv_heads,
                             config.head_dim_, dtype=jnp.float32)
    lf, cache_f = prefill_scan(config, fused, embeds, positions, cache_f,
                               jnp.asarray([16, 12]))
    np.testing.assert_allclose(np.asarray(la), np.asarray(lf),
                               atol=1e-4, rtol=1e-4)

    tokens_a, _, _ = decode_loop(
        config, params, la, jnp.asarray([16, 12]), ca, 8
    )
    tokens_f, _, _ = decode_loop_scan(
        config, fused, lf, jnp.asarray([16, 12]), cache_f, 8
    )
    np.testing.assert_array_equal(np.asarray(tokens_a), np.asarray(tokens_f))


def test_fused_projections_quantize(setup):
    """Quantization applies to the fused leaves and decode still runs."""
    from vis_tpu.models.common.decoder import (
        fuse_stacked_projections,
        quantize_stacked_params,
    )
    from vis_tpu.ops.quantized import QuantizedWeight

    config, params, stacked = setup
    q = quantize_stacked_params(fuse_stacked_projections(stacked))
    assert isinstance(q["layers_stacked"]["qkv_proj"], QuantizedWeight)
    assert isinstance(q["layers_stacked"]["mlp"]["gateup_proj"], QuantizedWeight)

    rng = np.random.default_rng(8)
    ids = rng.integers(5, 250, size=(1, 8))
    embeds = jnp.take(params["embed_tokens"], jnp.asarray(ids), axis=0)
    positions = jnp.asarray(np.arange(8)[None])
    cache = KVCache.create(config.num_layers, 1, 64, config.num_kv_heads,
                           config.head_dim_, dtype=jnp.float32)
    logits, cache = prefill_scan(config, q, embeds, positions, cache,
                                 jnp.asarray([8]))
    tokens, _, _ = decode_loop_scan(config, q, logits, jnp.int32(8), cache, 4)
    assert np.asarray(tokens).shape == (1, 4)
