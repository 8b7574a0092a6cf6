"""Flash-attention kernel validation vs the XLA reference (interpret mode on
CPU; the same kernel compiles for TPU via Mosaic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vis_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_reference,
)


def _random_qkv(b=2, sq=256, skv=256, h=2, d=128, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(keys[0], (b, sq, h, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, skv, h, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, skv, h, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_full_length_matches_reference(causal):
    q, k, v = _random_qkv()
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, causal=causal)
    ref = flash_attention_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_padded_lengths_match_reference():
    q, k, v = _random_qkv(b=2, sq=256, skv=256)
    lengths = jnp.asarray([200, 131], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, lengths)
    ref = flash_attention_reference(q, k, v, lengths)
    # Only query rows within the valid region are meaningful.
    for b in range(2):
        n = int(lengths[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, :n], np.asarray(ref)[b, :n], atol=2e-5, rtol=1e-4
        )


def test_causal_with_padding():
    q, k, v = _random_qkv(b=1, sq=256, skv=256, seed=3)
    lengths = jnp.asarray([150], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, lengths, causal=True)
    ref = flash_attention_reference(q, k, v, lengths, causal=True)
    np.testing.assert_allclose(
        np.asarray(out)[0, :150], np.asarray(ref)[0, :150], atol=2e-5, rtol=1e-4
    )


def test_rejects_unaligned_shapes():
    q, k, v = _random_qkv(sq=100, skv=100)
    with pytest.raises(ValueError):
        flash_attention(q, k, v)


def test_vision_encoder_flash_matches_einsum():
    """vision_forward with the flash backend must match the einsum backend
    on a padded bucket (valid rows only)."""
    import jax
    from vis_tpu.models.qwen2_vl.config import VisionConfig
    from vis_tpu.models.qwen2_vl.vision import (
        init_vision_params,
        vision_forward,
        vision_rotary_tables,
    )

    config = VisionConfig(
        depth=2, embed_dim=64, num_heads=4, hidden_size=64, dtype=jnp.float32
    )
    params = init_vision_params(config, jax.random.PRNGKey(0))
    grid_h, grid_w = 8, 16  # 128 patches = one flash block
    n = grid_h * grid_w
    rng = np.random.default_rng(5)
    pad_n = 256
    patches = np.zeros((pad_n, config.patch_input_dim), np.float32)
    patches[:n] = rng.standard_normal((n, config.patch_input_dim))
    cos, sin = vision_rotary_tables(config, grid_h, grid_w)
    cos_p = np.zeros((pad_n, cos.shape[1]), np.float32)
    sin_p = np.zeros((pad_n, sin.shape[1]), np.float32)
    cos_p[:n], sin_p[:n] = cos, sin

    ref = np.asarray(vision_forward(
        config, params, jnp.asarray(patches), jnp.asarray(cos_p),
        jnp.asarray(sin_p), num_patches=jnp.asarray(n), use_flash=False,
    ))
    with pltpu.force_tpu_interpret_mode():
        flash = np.asarray(vision_forward(
            config, params, jnp.asarray(patches), jnp.asarray(cos_p),
            jnp.asarray(sin_p), num_patches=jnp.asarray(n), use_flash=True,
        ))
    valid_tokens = n // 4
    np.testing.assert_allclose(
        flash[:valid_tokens], ref[:valid_tokens], atol=5e-4, rtol=1e-3
    )
