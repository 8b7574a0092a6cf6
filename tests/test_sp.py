"""Ulysses sequence parallelism for the vision encoder: SP output must equal
the single-device vision_forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vis_tpu.models.qwen2_vl.config import VisionConfig
from vis_tpu.models.qwen2_vl.vision import (
    init_vision_params,
    vision_forward,
    vision_rotary_tables,
)
from vis_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from vis_tpu.parallel.sp import vision_forward_sp


@pytest.fixture(scope="module")
def setup():
    config = VisionConfig(
        depth=2, embed_dim=64, num_heads=4, mlp_ratio=4, patch_size=14,
        spatial_merge_size=2, hidden_size=64, dtype=jnp.float32,
    )
    params = init_vision_params(config, jax.random.PRNGKey(7))
    return config, params


def _mesh(n):
    devices = np.array(jax.devices()[:n]).reshape(1, n)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sp_matches_single_device(setup, n_shards):
    config, params = setup
    grid_h, grid_w = 8, 8  # 64 patches, divisible by 4 shards * merge 4
    seq = grid_h * grid_w
    cos, sin = vision_rotary_tables(config, grid_h, grid_w)
    rng = np.random.default_rng(1)
    patches = rng.standard_normal((seq, config.patch_input_dim)).astype(np.float32)

    ref = np.asarray(
        vision_forward(config, params, jnp.asarray(patches),
                       jnp.asarray(cos), jnp.asarray(sin), use_flash=False)
    )
    out = np.asarray(
        vision_forward_sp(config, params, jnp.asarray(patches),
                          jnp.asarray(cos), jnp.asarray(sin), _mesh(n_shards))
    )
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_sp_respects_padding_mask(setup):
    config, params = setup
    grid_h, grid_w = 8, 8
    seq = grid_h * grid_w
    cos, sin = vision_rotary_tables(config, grid_h, grid_w)
    rng = np.random.default_rng(2)
    patches = rng.standard_normal((seq, config.patch_input_dim)).astype(np.float32)
    n_valid = 48

    ref = np.asarray(
        vision_forward(config, params, jnp.asarray(patches), jnp.asarray(cos),
                       jnp.asarray(sin), num_patches=jnp.int32(n_valid),
                       use_flash=False)
    )
    out = np.asarray(
        vision_forward_sp(config, params, jnp.asarray(patches),
                          jnp.asarray(cos), jnp.asarray(sin), _mesh(4),
                          num_patches=jnp.int32(n_valid))
    )
    valid_merged = n_valid // config.merge_unit
    np.testing.assert_allclose(
        out[:valid_merged], ref[:valid_merged], atol=2e-4, rtol=2e-4
    )
