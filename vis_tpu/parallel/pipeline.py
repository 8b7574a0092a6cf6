"""Pipeline parallelism: GPipe-style staged decoder forward over an ICI ring.

The decoder's stacked layers split into S contiguous stages, one per device
along the mesh's "model" axis (reused as the pipe axis).  Microbatches
stream through the stages inside ONE shard_map program: at every pipeline
tick each stage runs its layer block on its current microbatch, then the
activations rotate one hop along the ring with lax.ppermute — the XLA
collective rides ICI, no host involvement (SURVEY.md §5.8: jax.sharding +
collectives replace the reference's absent distributed backend).

Use this when a model's layers do not fit one chip and tensor parallelism
alone is not enough (pp composes with dp on the "data" axis).  The schedule
is the classic GPipe fill-drain: M microbatches take M + S - 1 ticks; bubble
fraction (S-1)/(M+S-1) shrinks as M grows.

Parity is pinned by tests/test_pipeline.py: pipelined logits equal the
single-device forward to float tolerance on a virtual mesh.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vis_tpu.models.common.decoder import DecoderConfig, _layer_body, lm_logits
from vis_tpu.models.common.layers import causal_mask, rms_norm
from vis_tpu.parallel.mesh import MODEL_AXIS

Params = Dict[str, Any]


def split_stages(stacked: Params, num_stages: int) -> Params:
    """[L, ...] stacked layer leaves -> [S, L/S, ...] for stage sharding."""
    layers = stacked["layers_stacked"]

    def reshape(x):
        l = x.shape[0]
        assert l % num_stages == 0, (
            f"num_layers {l} must divide into {num_stages} stages"
        )
        return x.reshape(num_stages, l // num_stages, *x.shape[1:])

    out = {k: v for k, v in stacked.items() if k != "layers_stacked"}
    out["layers_staged"] = jax.tree_util.tree_map(reshape, layers)
    return out


def shard_staged_params(staged: Params, mesh: Mesh) -> Params:
    """Stage axis over the pipe ("model") axis; everything else replicated."""
    def put_stage(x):
        spec = P(MODEL_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    out = {
        k: jax.device_put(v, NamedSharding(mesh, P()))
        for k, v in staged.items() if k != "layers_staged"
    }
    out["layers_staged"] = jax.tree_util.tree_map(
        put_stage, staged["layers_staged"]
    )
    return out


def pipeline_forward(
    config: DecoderConfig,
    staged: Params,
    input_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    mesh: Mesh,
    num_microbatches: int,
) -> jnp.ndarray:
    """Pipelined causal decoder forward -> logits [b, s, vocab].

    input_embeds: [b, s, hidden] with b % num_microbatches == 0; positions:
    [b, s] (or [3, b, s] M-RoPE).  Embedding and the LM head run replicated
    outside the pipeline; the layer stack streams through the stages.
    """
    b, s, h = input_embeds.shape
    num_stages = mesh.shape[MODEL_AXIS]
    assert b % num_microbatches == 0, (b, num_microbatches)
    mb = b // num_microbatches
    mask = causal_mask(s, s)

    # [M, mb, s, h] microbatch stream.
    micros = input_embeds.reshape(num_microbatches, mb, s, h)
    if positions.ndim == 3:  # M-RoPE [3, b, s]
        pos_micro = positions.reshape(3, num_microbatches, mb, s)
        pos_micro = jnp.moveaxis(pos_micro, 1, 0)  # [M, 3, mb, s]
    else:
        pos_micro = positions.reshape(num_microbatches, mb, s)

    def staged_fn(layers_local, micros, pos_micro):
        # layers_local: leaves [1, L/S, ...] (this device's stage); inputs
        # replicated.  Run the GPipe fill-drain schedule with a ring
        # ppermute between ticks.
        stage = lax.axis_index(MODEL_AXIS)
        layers_local = jax.tree_util.tree_map(
            lambda x: x[0], layers_local
        )  # [L/S, ...]

        def run_stage(x, pos):
            # RoPE tables are loop-invariant across the stage's layers:
            # compute them ONCE per tick, not inside the scan body (XLA
            # does not reliably hoist the table build out of the loop).
            cos, sin = _tables(config, pos)

            def body(x, layer):
                x, _, _ = _layer_body(
                    config, x, layer, cos, sin, mask, None, None, None,
                )
                return x, ()

            x, _ = lax.scan(body, x, layers_local)
            return x

        n_ticks = num_microbatches + num_stages - 1
        out_buf = jnp.zeros_like(micros)

        def tick(carry, t):
            buf, out_buf = carry
            # Every stage's microbatch index at tick t is t - stage (for
            # stage 0 that is t itself, so the same index selects the
            # microbatch to inject); other stages use the activations
            # handed over by the previous stage.
            m_idx = jnp.clip(t - stage, 0, num_microbatches - 1)
            x_in = jnp.where(stage == 0, micros[m_idx], buf)
            pos = pos_micro[m_idx]
            y = run_stage(x_in, pos)
            # Last stage stores its finished microbatch when valid.
            valid = (t - stage >= 0) & (t - stage < num_microbatches)
            is_last = stage == num_stages - 1
            out_buf = lax.cond(
                valid & is_last,
                lambda ob: lax.dynamic_update_slice(
                    ob, y[None], (m_idx, 0, 0, 0)
                ),
                lambda ob: ob,
                out_buf,
            )
            # Rotate activations one hop down the ring (stage i -> i+1).
            handed = lax.ppermute(
                y, MODEL_AXIS,
                [(i, (i + 1) % num_stages) for i in range(num_stages)],
            )
            return (handed, out_buf), ()

        buf0 = jnp.zeros((mb, s, h), micros.dtype)
        (_, out_buf), _ = lax.scan(
            tick, (buf0, out_buf), jnp.arange(n_ticks)
        )
        # Only the last stage holds real outputs; psum broadcasts them (all
        # other stages contribute zeros).
        out_buf = jnp.where(stage == num_stages - 1, out_buf, 0.0)
        return lax.psum(out_buf, MODEL_AXIS)

    pos_spec = P()  # replicated positions
    staged_spec = jax.tree_util.tree_map(
        lambda _: P(MODEL_AXIS), staged["layers_staged"]
    )
    hidden = shard_map(
        staged_fn, mesh=mesh,
        in_specs=(staged_spec, P(), pos_spec),
        out_specs=P(),
        check_vma=False,
    )(staged["layers_staged"], micros, pos_micro)

    x = hidden.reshape(b, s, h)
    x = rms_norm(x, staged["final_norm"], config.rms_norm_eps)
    return lm_logits(config, staged, x)


def _tables(config: DecoderConfig, positions: jnp.ndarray):
    from vis_tpu.models.common.decoder import _position_tables

    return _position_tables(config, positions)


__all__ = ["split_stages", "shard_staged_params", "pipeline_forward"]
