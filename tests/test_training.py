"""Trainer: sharded fine-tuning step + checkpoint/resume (training/trainer.py).

SURVEY §5.4: the reference has no weight checkpointing (no training); the
on-pod trainer makes save/resume a first-class need.  CPU, tiny config.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vis_tpu.models.common.decoder import DecoderConfig, init_decoder_params
from vis_tpu.training.trainer import Trainer, make_optimizer


def _tiny():
    config = DecoderConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, qkv_bias=False,
        tie_word_embeddings=True, dtype=jnp.float32,
    )
    params = init_decoder_params(config, jax.random.PRNGKey(0))
    return config, params


def _batch(seed=0, batch=2, seq=12, vocab=128):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, vocab, size=(batch, seq)).astype(np.int32)
    return {
        "input_ids": ids,
        "targets": np.roll(ids, -1, axis=1).astype(np.int32),
        "loss_mask": np.ones((batch, seq), np.float32),
    }


class TestTrainer:
    def test_loss_decreases_on_overfit_batch(self):
        config, params = _tiny()
        trainer = Trainer(
            config, params, optimizer=make_optimizer(learning_rate=1e-3)
        )
        batch = _batch()
        losses = [trainer.train_step(batch) for _ in range(8)]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_checkpoint_roundtrip_resumes_identically(self, tmp_path):
        config, params = _tiny()
        t1 = Trainer(config, params, optimizer=make_optimizer(1e-3))
        batch = _batch()
        for _ in range(3):
            t1.train_step(batch)
        t1.save_checkpoint(tmp_path / "ckpt", step=3)
        # the reference trajectory continues in-memory
        next_losses = [t1.train_step(_batch(seed=i)) for i in range(1, 4)]

        # a FRESH trainer restores and must continue identically (params
        # AND optimizer moments)
        config2, params2 = _tiny()
        t2 = Trainer(config2, params2, optimizer=make_optimizer(1e-3))
        step = t2.restore_checkpoint(tmp_path / "ckpt")
        assert step == 3
        resumed_losses = [t2.train_step(_batch(seed=i)) for i in range(1, 4)]
        np.testing.assert_allclose(resumed_losses, next_losses, rtol=1e-5)

    def test_checkpoint_restores_onto_mesh(self, tmp_path):
        if jax.device_count() < 4:
            pytest.skip("needs the 8-device virtual CPU mesh")
        from jax.sharding import Mesh
        from vis_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        config, params = _tiny()
        single = Trainer(config, params, optimizer=make_optimizer(1e-3))
        single.train_step(_batch())
        single.save_checkpoint(tmp_path / "ckpt", step=1)

        devices = np.array(jax.devices()[:4]).reshape(2, 2)
        mesh = Mesh(devices, (DATA_AXIS, MODEL_AXIS))
        config2, params2 = _tiny()
        sharded = Trainer(config2, params2, mesh=mesh,
                          optimizer=make_optimizer(1e-3))
        assert sharded.restore_checkpoint(tmp_path / "ckpt") == 1
        loss_sharded = sharded.train_step(_batch(seed=9))
        loss_single = single.train_step(_batch(seed=9))
        assert abs(loss_sharded - loss_single) < 1e-3
