"""Fine-tuning support: sharded next-token training step for the decoder.

The reference system had no training capability (SURVEY.md §2: inference
only, remote APIs); this module adds domain fine-tuning of the on-pod
inspection models as a first-class framework feature — and doubles as the
multi-chip SPMD validation path (__graft_entry__.dryrun_multichip):

- parameters are laid out by vis_tpu.parallel.sharding (TP over "model"),
- the batch is sharded over "data",
- the step is one jit: forward (with jax.checkpoint on each layer to trade
  recompute for HBM), token-CE loss, grads, optax adamw update — XLA inserts
  the TP all-reduces and DP gradient psums from the shardings alone.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vis_tpu.models.common.decoder import DecoderConfig, lm_logits
from vis_tpu.models.common.layers import (
    causal_mask,
    rms_norm,
)
from vis_tpu.models.common import decoder as dec
from vis_tpu.parallel.mesh import DATA_AXIS

Params = Dict[str, Any]


def _forward_remat(
    config: DecoderConfig, params: Params, embeds: jnp.ndarray,
    positions: jnp.ndarray, mask: jnp.ndarray,
) -> jnp.ndarray:
    """Decoder forward with per-layer rematerialization: exactly the
    canonical decoder_layer_nocache wrapped in jax.checkpoint, so the
    trained function is the inference function by construction."""
    cos, sin = dec._position_tables(config, positions)
    layer_fn = jax.checkpoint(
        lambda x, layer: dec.decoder_layer_nocache(
            config, layer, x, cos, sin, mask
        )
    )
    x = embeds
    for layer in params["layers"]:
        x = layer_fn(x, layer)
    return rms_norm(x, params["final_norm"], config.rms_norm_eps)


def token_ce_loss(
    config: DecoderConfig, params: Params, batch: Dict[str, jnp.ndarray]
) -> jnp.ndarray:
    """Mean next-token cross-entropy over non-padding targets.

    batch: {"input_ids": [b, s], "targets": [b, s], "loss_mask": [b, s]}.
    """
    ids = batch["input_ids"]
    b, s = ids.shape
    embeds = jnp.take(params["embed_tokens"], ids, axis=0)
    positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    hidden = _forward_remat(config, params, embeds, positions, causal_mask(s, s))
    logits = lm_logits(config, params, hidden)  # f32 [b, s, v]
    # Gather-then-logsumexp: log_softmax would materialize a SECOND full
    # [b, s, vocab] f32 array (~10 GB at 152k vocab, b=8, s=2048) next to
    # the logits; this form keeps every extra intermediate at [b, s].
    target_logits = jnp.take_along_axis(
        logits, batch["targets"][..., None], axis=-1
    )[..., 0]
    target_logp = target_logits - jax.scipy.special.logsumexp(logits, axis=-1)
    mask = batch["loss_mask"].astype(jnp.float32)
    return -(target_logp * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def make_optimizer(
    learning_rate: float = 1e-5, weight_decay: float = 0.01,
    grad_clip: float = 1.0,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(learning_rate, b1=0.9, b2=0.95, weight_decay=weight_decay),
    )


class Trainer:
    """Holds sharded params + optimizer state and a compiled train step."""

    def __init__(
        self,
        config: DecoderConfig,
        params: Params,
        mesh: Optional[Mesh] = None,
        optimizer: Optional[optax.GradientTransformation] = None,
    ):
        self.config = config
        self.mesh = mesh
        self.optimizer = optimizer or make_optimizer()
        if mesh is not None:
            from vis_tpu.parallel.sharding import shard_decoder_params

            params = shard_decoder_params(params, mesh)
        self.params = params
        self.opt_state = self.optimizer.init(self.params)

        def step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(
                partial(token_ce_loss, config)
            )(params, batch)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = jax.jit(step, donate_argnums=(0, 1))

    def shard_batch(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self.mesh is None:
            return batch
        sharding = NamedSharding(self.mesh, P(DATA_AXIS, None))
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}

    def train_step(self, batch: Dict[str, jnp.ndarray]) -> float:
        batch = self.shard_batch(batch)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, batch
        )
        return float(loss)

    # -- checkpoint / resume (SURVEY §5.4: the reference has no weight
    # checkpointing — training on-pod makes it a first-class need) --------
    def save_checkpoint(self, path, step: int = 0) -> None:
        """Write params + optimizer state + step with Orbax (async-safe,
        atomic directory rename; restores onto any mesh since shardings
        are re-applied by the Trainer constructor)."""
        import orbax.checkpoint as ocp

        path = Path(path).resolve()
        # The optimizer state is saved as INDEX-KEYED leaves: optax states
        # are namedtuples, which Orbax restores as plain dicts with keys in
        # SORTED order — flattening that and unflattening onto the
        # declaration-ordered namedtuple treedef would silently permute
        # state leaves for any optimizer whose field names don't sort into
        # declaration order.  Index keys make the mapping order-exact.
        opt_leaves = jax.tree_util.tree_leaves(self.opt_state)
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(
                path,
                {
                    "params": self.params,
                    "opt_leaves": {
                        f"{i:05d}": leaf for i, leaf in enumerate(opt_leaves)
                    },
                    "step": jnp.int32(step),
                },
                force=True,
            )

    def restore_checkpoint(self, path) -> int:
        """Load params/opt_state saved by save_checkpoint; returns the
        saved step.  Host-restores then re-shards onto self.mesh."""
        import orbax.checkpoint as ocp

        path = Path(path).resolve()
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(path)
        # Orbax restores leaves as HOST numpy: keep them that way.  A
        # tree_map(jnp.asarray) here would materialize the full unsharded
        # model on the default device — exactly what a TP-sharded trainer
        # cannot afford; shard_decoder_params device_puts the numpy leaves
        # straight to their shardings.
        params = restored["params"]
        if self.mesh is not None:
            from vis_tpu.parallel.sharding import shard_decoder_params

            params = shard_decoder_params(params, self.mesh)
        self.params = params
        # Rebuild the optax NamedTuple structure from an ABSTRACT init
        # (eval_shape allocates nothing on device; a real init() would
        # transiently double the optimizer-state HBM) and fill it with the
        # index-keyed leaves in saved order.  Leaves stay HOST numpy
        # (uncommitted) so the jitted step places them to match the params'
        # shardings — an eager device_put would pin them to one device.
        import numpy as _np

        template = jax.eval_shape(self.optimizer.init, self.params)
        treedef = jax.tree_util.tree_structure(template)
        opt_leaves = restored["opt_leaves"]
        flat_restored = [
            _np.asarray(opt_leaves[k]) for k in sorted(opt_leaves)
        ]
        self.opt_state = jax.tree_util.tree_unflatten(
            treedef, flat_restored
        )
        return int(restored.get("step", 0))


__all__ = ["Trainer", "token_ce_loss", "make_optimizer"]
