"""Auxiliary subsystem tests: device preprocessing, Orbax checkpointing,
profiling spans, counterfactual generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vis_tpu.agents import MockVLMBackend, get_explainer
from vis_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD, patchify
from vis_tpu.ops.preprocess_device import (
    patchify_device,
    preprocess_batch_device,
    preprocess_frame_device,
)


class TestDevicePreprocess:
    def test_patchify_device_matches_numpy(self):
        rng = np.random.default_rng(0)
        frames = rng.standard_normal((2, 3, 56, 84)).astype(np.float32)
        ref = patchify(frames, 4, 6)
        dev = np.asarray(patchify_device(jnp.asarray(frames), 4, 6))
        np.testing.assert_allclose(dev, ref, atol=0, rtol=0)

    def test_frame_device_shapes_and_normalization(self):
        rng = np.random.default_rng(1)
        rgb = rng.integers(0, 255, (100, 150, 3), dtype=np.uint8)
        out = np.asarray(preprocess_frame_device(jnp.asarray(rgb), 56, 84))
        assert out.shape == ((56 // 14) * (84 // 14), 3 * 2 * 14 * 14)
        # Normalized data: roughly zero-centered under CLIP stats.
        assert abs(out.mean()) < 2.0
        assert np.isfinite(out).all()

    def test_batch_device(self):
        rng = np.random.default_rng(2)
        batch = rng.integers(0, 255, (3, 100, 150, 3), dtype=np.uint8)
        out = np.asarray(preprocess_batch_device(jnp.asarray(batch), 56, 84))
        assert out.shape[0] == 3
        single = np.asarray(
            preprocess_frame_device(jnp.asarray(batch[1]), 56, 84)
        )
        np.testing.assert_allclose(out[1], single, atol=1e-6)

    def test_frame_cache_single_decode_and_invalidation(self, tmp_path, monkeypatch):
        """One decode per file identity, shared across consumers; a
        modified file (new mtime/size) is decoded fresh."""
        import time

        from PIL import Image

        from vis_tpu.ops import frame_cache

        frame_cache.clear()
        rng = np.random.default_rng(5)
        arr = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
        path = tmp_path / "frame.png"
        Image.fromarray(arr).save(path)

        calls = []
        original = frame_cache._decode

        def spy(p):
            calls.append(str(p))
            return original(p)

        monkeypatch.setattr(frame_cache, "_decode", spy)
        f1 = frame_cache.get_frame(path)
        f2 = frame_cache.get_frame(path)
        d1 = frame_cache.get_device_frame(path)
        d2 = frame_cache.get_device_frame(path)
        assert len(calls) == 1
        assert f1 is f2 and d1 is d2
        np.testing.assert_array_equal(f1, arr)
        np.testing.assert_array_equal(np.asarray(d1), arr)
        assert not f1.flags.writeable  # immutability contract

        # Re-save different content -> new key -> fresh decode.
        arr2 = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
        time.sleep(0.01)
        Image.fromarray(arr2).save(path)
        f3 = frame_cache.get_frame(path)
        assert len(calls) == 2
        np.testing.assert_array_equal(f3, arr2)
        frame_cache.clear()

    def test_pipeline_consumers_share_one_decode(self, tmp_path, monkeypatch):
        """Quality gate + inspector patches + auditor tiles + report
        overlay all ride a single decode of the same file (VERDICT r3 #1:
        the hottest host cost was paid twice per inspection)."""
        from PIL import Image

        from vis_tpu.ops import frame_cache
        from vis_tpu.ops.preprocess import preprocess_image
        from vis_tpu.ops.preprocess_mllama import preprocess_image_mllama
        from vis_tpu.safety.image_quality import assess_image_quality
        from vis_tpu.utils.image_utils import load_image

        frame_cache.clear()
        rng = np.random.default_rng(6)
        arr = rng.integers(0, 255, (120, 200, 3), dtype=np.uint8)
        path = tmp_path / "shared.png"
        Image.fromarray(arr).save(path)

        calls = []
        original = frame_cache._decode

        def spy(p):
            calls.append(str(p))
            return original(p)

        monkeypatch.setattr(frame_cache, "_decode", spy)
        assess_image_quality(path)
        preprocess_image(path, max_image_dim=128, use_native=False)
        preprocess_image_mllama(path)
        img = load_image(path)
        img.putpixel((0, 0), (1, 2, 3))  # fresh copy: draw must not poison
        np.testing.assert_array_equal(frame_cache.get_frame(path), arr)
        assert len(calls) == 1
        frame_cache.clear()

    def test_preprocess_image_device_matches_host(self, tmp_path):
        """The serving drop-in (DEVICE_PREPROCESS=true): identical geometry
        to the host ImagePatches, patches within resampling tolerance."""
        from PIL import Image

        from vis_tpu.ops.preprocess import preprocess_image
        from vis_tpu.ops.preprocess_device import preprocess_image_device

        rng = np.random.default_rng(3)
        img = Image.fromarray(
            rng.integers(0, 255, (120, 200, 3), dtype=np.uint8)
        )
        path = tmp_path / "img.png"
        img.save(path)

        host = preprocess_image(path, max_image_dim=128, use_native=False)
        dev = preprocess_image_device(path, max_image_dim=128)
        assert (dev.grid_h, dev.grid_w) == (host.grid_h, host.grid_w)
        assert dev.num_tokens == host.num_tokens
        hp, hb = host.padded()
        dp, db = dev.padded()
        assert hb == db and hp.shape == dp.shape
        # bicubic-vs-matmul resampling tolerance (normalized units)
        assert np.abs(np.asarray(dp) - hp).mean() < 0.05

    def test_engine_prefill_uses_device_preprocess(self, monkeypatch, tmp_path):
        """DEVICE_PREPROCESS=true routes engine vision prefill through
        ops/preprocess_device (VERDICT #4: the path must be reachable)."""
        from PIL import Image

        from vis_tpu.models.common.decoder import DecoderConfig
        from vis_tpu.models.qwen2_vl.config import Qwen2VLConfig, VisionConfig
        from vis_tpu.models.qwen2_vl.model import init_params
        from vis_tpu.serving.engine import Engine
        from vis_tpu.serving.tokenizer import ByteTokenizer
        from vis_tpu.utils.config import config as app_config

        cfg = Qwen2VLConfig(
            vision=VisionConfig(depth=2, embed_dim=64, num_heads=4,
                                hidden_size=64, dtype=jnp.float32),
            text=DecoderConfig(
                vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                num_kv_heads=2, intermediate_size=128, qkv_bias=True,
                mrope_section=(2, 3, 3), tie_word_embeddings=True,
                dtype=jnp.float32,
            ),
            image_token_id=261, vision_start_token_id=259,
            vision_end_token_id=260, eos_token_id=256,
        )
        params = init_params(cfg, jax.random.PRNGKey(0))
        tok = ByteTokenizer(vocab_size=cfg.text.vocab_size)
        engine = Engine("dev-preproc", cfg.text, None, tok,
                        vlm_config=cfg, vlm_params=params,
                        max_cache_tokens=2048)
        img = Image.fromarray(
            np.random.default_rng(4).integers(
                0, 255, (120, 200, 3), dtype=np.uint8
            )
        )
        path = tmp_path / "probe.png"
        img.save(path)

        calls = {}
        import vis_tpu.ops.preprocess_device as pdev

        original = pdev.preprocess_image_device

        def spy(*args, **kwargs):
            calls["hit"] = True
            return original(*args, **kwargs)

        monkeypatch.setattr(pdev, "preprocess_image_device", spy)
        monkeypatch.setattr(app_config, "device_preprocess", True)
        out = engine.generate("inspect", path, max_tokens=4, max_image_dim=128)
        assert calls.get("hit"), "device preprocessing was not used"
        assert isinstance(out, str)


class TestOrbaxCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from vis_tpu.models.common.decoder import DecoderConfig, init_decoder_params
        from vis_tpu.models.loader import load_orbax, save_orbax

        config = DecoderConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=64, dtype=jnp.float32,
        )
        params = init_decoder_params(config, jax.random.PRNGKey(0))
        path = tmp_path / "ckpt"
        save_orbax(params, path)
        like = jax.tree.map(np.zeros_like, params)
        restored = load_orbax(path, like)
        np.testing.assert_allclose(
            np.asarray(params["layers"][0]["q_proj"]),
            np.asarray(restored["layers"][0]["q_proj"]),
        )


class TestProfiling:
    def test_device_trace_noop_when_disabled(self):
        # Disabled device_trace must be a PURE pass-through: the pipeline
        # runner wraps every node in it, and a phantom span per node would
        # pollute the bench's span-tree attribution.
        from vis_tpu.utils.logger import get_timings
        from vis_tpu.utils.profiling import device_trace, profiling_enabled

        assert profiling_enabled() is False  # PROFILE_DIR unset in tests
        get_timings(reset=True)
        with device_trace("unit-phase"):
            _ = jnp.ones(4).sum()
        assert "unit-phase" not in get_timings(reset=True)

    def test_device_trace_with_profile_dir(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PROFILE_DIR", str(tmp_path / "traces"))
        from vis_tpu.utils.config import get_config

        get_config(reload=True)
        from vis_tpu.utils.profiling import device_trace

        with device_trace("profiled-phase"):
            _ = jnp.ones(8).sum()
        trace_root = tmp_path / "traces"
        assert trace_root.exists()
        assert any(trace_root.rglob("*"))
        monkeypatch.delenv("PROFILE_DIR")
        get_config(reload=True)

    def test_pipeline_nodes_emit_traces(self, tmp_path, monkeypatch):
        """PROFILE_DIR must actually be wired into the pipeline runner:
        a full inspection emits per-node xplane traces (SURVEY §5.1)."""
        monkeypatch.setenv("PROFILE_DIR", str(tmp_path / "nt"))
        monkeypatch.setenv("USE_MOCK_RESPONSES", "true")
        from vis_tpu.utils.config import get_config

        get_config(reload=True)
        try:
            from vis_tpu.orchestration import run_inspection

            state = run_inspection("assets/sample.jpg", criticality="medium")
            assert state["current_step"] == "completed"
            traces = list((tmp_path / "nt").rglob("*.xplane.pb"))
            assert traces, "no per-node profiler traces written"
        finally:
            monkeypatch.delenv("PROFILE_DIR")
            monkeypatch.delenv("USE_MOCK_RESPONSES")
            get_config(reload=True)


class TestCounterfactual:
    def test_counterfactual_from_defects(self, result_factory, defect_factory):
        explainer = get_explainer(MockVLMBackend())
        result = result_factory(
            condition="damaged", defects=[defect_factory()]
        )
        text = explainer.generate_counterfactual(result, {"verdict": "UNSAFE"})
        assert isinstance(text, str)

    def test_counterfactual_clean(self, result_factory):
        explainer = get_explainer(MockVLMBackend())
        text = explainer.generate_counterfactual(
            result_factory(), {"verdict": "SAFE"}
        )
        assert isinstance(text, str)


class TestRequestCacheSizing:
    def test_right_sizing_buckets(self):
        from vis_tpu.serving.engine import Engine

        f = Engine._request_cache_len
        assert f(512, 448, 8192) == 1024   # 512+448+32 -> 1024
        assert f(128, 64, 8192) == 512     # rounds up to 512
        assert f(4096, 4096, 8192) == 8192 # capped at the budget
        assert f(8192, 448, 4096) == 4096  # never exceeds cap


class TestMllamaFitToCanvasEdges:
    def test_one_pixel_image(self):
        from vis_tpu.ops.preprocess_mllama import fit_to_canvas

        # HF floor-or-1 guard: degenerate inputs never produce size 0.
        h, w = fit_to_canvas(1, 1, 448, 448)
        assert h >= 1 and w >= 1

    def test_exact_canvas_not_resized(self):
        from vis_tpu.ops.preprocess_mllama import fit_to_canvas

        assert fit_to_canvas(448, 896, 448, 896) == (448, 896)

    def test_huge_image_fits(self):
        from vis_tpu.ops.preprocess_mllama import fit_to_canvas

        h, w = fit_to_canvas(9000, 3000, 896, 448)
        assert h <= 896 and w <= 448


class TestVerdictVisuals:
    """create_status_stamp / create_side_by_side_comparison — wired into
    the PDF title row and the /api/image comparison endpoint respectively
    (VERDICT r3 #6: previously implemented but orphaned)."""

    def test_status_stamp_renders_verdict_colors(self):
        from vis_tpu.utils.image_utils import VERDICT_COLORS, create_status_stamp

        for verdict in ("SAFE", "UNSAFE", "REQUIRES_HUMAN_REVIEW"):
            img = create_status_stamp(verdict)
            assert img.mode == "RGBA" and img.size == (360, 110)
            arr = np.asarray(img)
            # Border + text pixels carry the verdict color; the rest is
            # transparent (alpha 0).
            opaque = arr[..., 3] > 0
            assert opaque.any() and not opaque.all()
            r, g, b = VERDICT_COLORS[verdict]
            colored = (arr[..., 0] == r) & (arr[..., 1] == g) & (arr[..., 2] == b)
            assert (colored & opaque).sum() > 100

    def test_side_by_side_geometry_and_panels(self, tmp_path):
        from PIL import Image

        from vis_tpu.utils.image_utils import create_side_by_side_comparison

        rng = np.random.default_rng(9)
        arr = rng.integers(0, 255, (60, 90, 3), dtype=np.uint8)
        path = tmp_path / "cmp.png"
        Image.fromarray(arr).save(path)
        defects = [{
            "type": "crack", "location": "center",
            "bbox": {"x": 25.0, "y": 25.0, "width": 30.0, "height": 30.0},
            "safety_impact": "CRITICAL", "confidence": "high",
        }]
        out = tmp_path / "strip.jpg"
        img = create_side_by_side_comparison(path, defects, output_path=out)
        assert img.size == (90 * 3 + 16, 60)
        assert out.exists()
        panels = np.asarray(img)
        original = panels[:, :90]
        annotated = panels[:, 2 * (90 + 8):]
        np.testing.assert_array_equal(original, arr)
        assert np.abs(annotated.astype(int) - arr.astype(int)).max() > 50
