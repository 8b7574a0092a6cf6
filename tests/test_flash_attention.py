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
