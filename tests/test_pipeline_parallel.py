"""Pipeline parallelism: staged forward over a virtual ring must equal the
single-device decoder forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vis_tpu.models.common.decoder import (
    DecoderConfig,
    decoder_forward,
    init_decoder_params,
    lm_logits,
    stack_decoder_layers,
)
from vis_tpu.models.common.layers import causal_mask
from vis_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from vis_tpu.parallel.pipeline import (
    pipeline_forward,
    shard_staged_params,
    split_stages,
)


@pytest.fixture(scope="module")
def setup():
    config = DecoderConfig(
        vocab_size=256, hidden_size=64, num_layers=8, num_heads=4,
        num_kv_heads=2, intermediate_size=128, qkv_bias=False,
        tie_word_embeddings=True, dtype=jnp.float32,
    )
    params = init_decoder_params(config, jax.random.PRNGKey(13))
    return config, params


def _mesh(num_stages):
    devices = np.array(jax.devices()[:num_stages]).reshape(1, num_stages)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


@pytest.mark.parametrize("num_stages,num_micro", [(4, 4), (2, 8), (8, 2)])
def test_pipeline_matches_single_device(setup, num_stages, num_micro):
    config, params = setup
    mesh = _mesh(num_stages)
    staged = shard_staged_params(
        split_stages(stack_decoder_layers(params), num_stages), mesh
    )

    rng = np.random.default_rng(0)
    b, s = 8, 16
    ids = rng.integers(5, 250, size=(b, s))
    embeds = jnp.take(params["embed_tokens"], jnp.asarray(ids), axis=0)
    positions = jnp.asarray(np.broadcast_to(np.arange(s)[None], (b, s)).copy())

    hidden, _ = decoder_forward(
        config, params, embeds, positions, mask=causal_mask(s, s)
    )
    ref = np.asarray(lm_logits(config, params, hidden))

    out = np.asarray(
        jax.jit(
            pipeline_forward,
            static_argnames=("config", "mesh", "num_microbatches"),
        )(config=config, staged=staged, input_embeds=embeds,
          positions=positions, mesh=mesh, num_microbatches=num_micro)
    )
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_split_stages_shapes(setup):
    config, params = setup
    staged = split_stages(stack_decoder_layers(params), 4)
    q = staged["layers_staged"]["q_proj"]
    assert q.shape[:2] == (4, 2)
