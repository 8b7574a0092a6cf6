"""Tensor-parallel SPMD tests on the 8-device virtual CPU mesh:
sharded execution must produce the same tokens as single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vis_tpu.models.common.decoder import DecoderConfig, init_decoder_params
from vis_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from vis_tpu.serving.engine import Engine
from vis_tpu.serving.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:2]).reshape(1, 2)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def test_sharded_engine_matches_unsharded(mesh):
    config = DecoderConfig(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, qkv_bias=False,
        tie_word_embeddings=True, dtype=jnp.float32,
    )
    params = init_decoder_params(config, jax.random.PRNGKey(21))
    tok = ByteTokenizer(vocab_size=config.vocab_size)
    plain = Engine("plain", config, params, tok, max_cache_tokens=256)
    sharded = Engine("tp", config, params, tok, max_cache_tokens=256,
                     mesh=mesh)
    prompt = "inspect the weld seam for porosity"
    a = plain.generate(prompt, max_tokens=10)
    b = sharded.generate(prompt, max_tokens=10)
    assert a == b


def test_sharding_specs_applied(mesh):
    from vis_tpu.models.common.decoder import stack_decoder_layers
    from vis_tpu.parallel.sharding import shard_stacked_decoder_params

    config = DecoderConfig(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, qkv_bias=False,
        tie_word_embeddings=True, dtype=jnp.float32,
    )
    params = stack_decoder_layers(
        init_decoder_params(config, jax.random.PRNGKey(2))
    )
    sharded = shard_stacked_decoder_params(params, mesh)
    q = sharded["layers_stacked"]["q_proj"]
    # q_proj [L, heads*hd, hidden] partitioned over "model" on axis 1.
    assert len(q.sharding.device_set) == 2
    spec = q.sharding.spec
    assert spec[1] == MODEL_AXIS
