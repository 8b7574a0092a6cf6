"""Engine + scheduler integration: concurrent (even multimodal) requests
decode in shared batched slots with token-exact results."""

import threading

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from vis_tpu.models.common.decoder import DecoderConfig, init_decoder_params
from vis_tpu.models.qwen2_vl.config import Qwen2VLConfig, VisionConfig
from vis_tpu.models.qwen2_vl.model import init_params as init_qwen_params
from vis_tpu.serving.engine import Engine
from vis_tpu.serving.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def vlm_engines():
    config = Qwen2VLConfig(
        vision=VisionConfig(depth=2, embed_dim=64, num_heads=4, hidden_size=64,
                            dtype=jnp.float32),
        text=DecoderConfig(
            vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128, qkv_bias=True,
            mrope_section=(2, 3, 3), tie_word_embeddings=True,
            dtype=jnp.float32,
        ),
        image_token_id=261, vision_start_token_id=259,
        vision_end_token_id=260, eos_token_id=256,
    )
    params = init_qwen_params(config, jax.random.PRNGKey(1))
    tok = ByteTokenizer(vocab_size=config.text.vocab_size)
    plain = Engine("plain-vlm", config.text, None, tok,
                   vlm_config=config, vlm_params=params, max_cache_tokens=1024)
    scheduled = Engine("sched-vlm", config.text, None, tok,
                       vlm_config=config, vlm_params=params,
                       max_cache_tokens=1024)
    scheduled.attach_scheduler(num_slots=4)
    yield plain, scheduled
    scheduled.detach_scheduler()


@pytest.fixture
def images(tmp_path):
    rng = np.random.default_rng(8)
    paths = []
    for i in range(3):
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
        ).save(p)
        paths.append(p)
    return paths


def test_scheduled_vlm_matches_plain(vlm_engines, images):
    plain, scheduled = vlm_engines
    prompt = "Inspect this part."
    expected = plain.generate(prompt, images[0], max_tokens=8, max_image_dim=256)
    got = scheduled.generate(prompt, images[0], max_tokens=8, max_image_dim=256)
    assert got == expected


def test_concurrent_multimodal_requests(vlm_engines, images):
    plain, scheduled = vlm_engines
    prompt = "Audit carefully."
    expected = [
        plain.generate(prompt, p, max_tokens=6, max_image_dim=256)
        for p in images
    ]
    results = [None] * len(images)

    def worker(i):
        results[i] = scheduled.generate(
            prompt, images[i], max_tokens=6, max_image_dim=256
        )

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert results == expected


def test_sampling_path_bypasses_scheduler(vlm_engines, images):
    _, scheduled = vlm_engines
    out = scheduled.generate(
        "sample", images[0], max_tokens=4, temperature=0.7, max_image_dim=256
    )
    assert isinstance(out, str)
