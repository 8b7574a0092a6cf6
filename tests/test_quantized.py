"""Int8 weight-only quantization tests: accuracy, linear dispatch, Pallas
kernel vs fallback, and quantized scan-decode sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vis_tpu.models.common.decoder import (
    DecoderConfig,
    decode_loop_scan,
    init_decoder_params,
    prefill_scan,
    quantize_stacked_params,
    stack_decoder_layers,
)
from vis_tpu.models.common.layers import KVCache, linear
from vis_tpu.ops.quantized import (
    QuantizedWeight,
    quantize_weight,
    quantized_matmul,
)


class TestQuantizeWeight:
    def test_roundtrip_error_small(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
        qw = quantize_weight(w)
        deq = qw.dequantize(jnp.float32)
        rel = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
        assert rel < 0.01  # <=1/254 per-channel quantization step

    def test_linear_dispatch(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((3, 128)).astype(np.float32))
        exact = linear(x, w)
        approx = linear(x, quantize_weight(w))
        rel = float(jnp.abs(exact - approx).max() / jnp.abs(exact).max())
        assert rel < 0.05

    def test_pallas_kernel_matches_fallback(self):
        rng = np.random.default_rng(2)
        w = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((2, 256)).astype(np.float32))
        qw = quantize_weight(w)
        fallback = quantized_matmul(x, qw)  # CPU path (default backend cpu)
        with pltpu.force_tpu_interpret_mode():
            # Force the kernel branch through interpret mode.
            import vis_tpu.ops.quantized as qmod

            orig = jax.default_backend
            try:
                jax.default_backend = lambda: "tpu"
                kernel_out = quantized_matmul(x, qw)
            finally:
                jax.default_backend = orig
        np.testing.assert_allclose(
            np.asarray(kernel_out), np.asarray(fallback), atol=0.5, rtol=2e-2
        )


class TestQuantizedDecode:
    def test_quantized_scan_decode_runs_and_tracks_bf16(self):
        config = DecoderConfig(
            vocab_size=256, hidden_size=128, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=256, qkv_bias=False,
            tie_word_embeddings=True, dtype=jnp.float32,
        )
        params = init_decoder_params(config, jax.random.PRNGKey(5))
        stacked = stack_decoder_layers(params)
        quantized = quantize_stacked_params(stacked)

        rng = np.random.default_rng(3)
        ids = rng.integers(5, 250, size=(1, 12))
        embeds = jnp.take(params["embed_tokens"], jnp.asarray(ids), axis=0)
        positions = jnp.asarray(np.arange(12)[None])

        outs = {}
        for name, p in (("bf16", stacked), ("int8", quantized)):
            cache = KVCache.create(
                config.num_layers, 1, 64, config.num_kv_heads,
                config.head_dim_, dtype=jnp.float32,
            )
            logits, cache = prefill_scan(
                config, p, embeds, positions, cache, jnp.asarray([12])
            )
            tokens, _, _ = decode_loop_scan(
                config, p, logits, jnp.int32(12), cache, 6
            )
            outs[name] = (np.asarray(logits), np.asarray(tokens))

        # Logits track closely; greedy tokens may occasionally differ on
        # near-ties, but for this seed they should match.
        l_bf, t_bf = outs["bf16"]
        l_q, t_q = outs["int8"]
        rel = np.abs(l_bf - l_q).max() / (np.abs(l_bf).max() + 1e-9)
        assert rel < 0.1
        assert np.isfinite(l_q).all()


class TestQuantizedEngine:
    def test_engine_with_int8_quantization(self, monkeypatch, tmp_path):
        monkeypatch.setenv("QUANTIZATION", "int8")
        from vis_tpu.utils.config import get_config

        get_config(reload=True)
        try:
            from vis_tpu.serving.engine import Engine
            from vis_tpu.serving.tokenizer import ByteTokenizer

            config = DecoderConfig(
                vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                num_kv_heads=2, intermediate_size=128, qkv_bias=False,
                tie_word_embeddings=True, dtype=jnp.float32,
            )
            params = init_decoder_params(config, jax.random.PRNGKey(9))
            tok = ByteTokenizer(vocab_size=config.vocab_size)
            engine = Engine("q8", config, params, tok, max_cache_tokens=256)
            from vis_tpu.ops.quantized import QuantizedWeight

            # Single-chip engines fuse QKV before quantizing.
            assert isinstance(
                engine.text_params["layers_stacked"]["qkv_proj"], QuantizedWeight
            )
            out_a = engine.generate("check the casting", max_tokens=6)
            out_b = engine.generate("check the casting", max_tokens=6)
            assert out_a == out_b
        finally:
            monkeypatch.delenv("QUANTIZATION")
            get_config(reload=True)


class TestQuantizedEmbeddings:
    """quantize_embeddings=True: vocab table int8, dequantized on the fly by
    embed() and lm_logits() (the lm head is ~470 MB/step of bf16 HBM reads
    at 2B scale)."""

    def _setup(self):
        config = DecoderConfig(
            vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128,
            tie_word_embeddings=True, dtype=jnp.float32,
        )
        params = init_decoder_params(config, jax.random.PRNGKey(9))
        stacked = stack_decoder_layers(params)
        return config, stacked

    def test_embed_dequantizes_gathered_rows(self):
        from vis_tpu.models.common.layers import embed

        rng = np.random.default_rng(2)
        table = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
        qt = quantize_weight(table)
        ids = jnp.asarray([[3, 17, 255], [0, 1, 2]])
        exact = embed(ids, table)
        approx = embed(ids, qt)
        assert approx.shape == exact.shape
        err = float(jnp.abs(approx.astype(jnp.float32) - exact).max())
        assert err < 0.05  # int8 + bf16 rounding

    def test_quantized_vocab_decode_tracks_full_precision(self):
        config, stacked = self._setup()
        q_all = quantize_stacked_params(stacked, quantize_embeddings=True)
        assert isinstance(q_all["embed_tokens"], QuantizedWeight)

        rng = np.random.default_rng(3)
        ids = rng.integers(5, 250, size=(2, 12))

        def run(p):
            embeds_table = p["embed_tokens"]
            from vis_tpu.models.common.layers import embed
            embeds = embed(jnp.asarray(ids), embeds_table).astype(jnp.float32)
            positions = jnp.asarray(
                np.broadcast_to(np.arange(12)[None], (2, 12)).copy()
            )
            cache = KVCache.create(
                config.num_layers, 2, 64, config.num_kv_heads,
                config.head_dim_, dtype=jnp.float32,
            )
            logits, cache = prefill_scan(
                config, p, embeds, positions, cache, jnp.asarray([12, 12])
            )
            tokens, _, _ = decode_loop_scan(
                config, p, logits, jnp.int32(12), cache, 8
            )
            return np.asarray(tokens)

        ta = run(stacked)
        tb = run(q_all)
        # Deterministic (greedy) and mostly agreeing with full precision on a
        # tiny random model; exact agreement is not required (int8 vocab).
        tb2 = run(q_all)
        np.testing.assert_array_equal(tb, tb2)
        assert (ta == tb).mean() >= 0.5


class TestFusedMLPKernel:
    def test_matches_unfused_interpret(self):
        """Fused int8 SwiGLU kernel (interpret mode on CPU) vs the unfused
        quantized path at a small shape."""
        from vis_tpu.ops.quantized import fused_swiglu_mlp, quantized_linear

        rng = np.random.default_rng(5)
        H, I = 128, 256
        gate = jnp.asarray(rng.standard_normal((I, H)).astype(np.float32) * 0.05)
        up = jnp.asarray(rng.standard_normal((I, H)).astype(np.float32) * 0.05)
        down = jnp.asarray(rng.standard_normal((H, I)).astype(np.float32) * 0.05)
        gu_q = quantize_weight(jnp.concatenate([gate, up], axis=0))
        dn_q = quantize_weight(down)
        x = jnp.asarray(rng.standard_normal((2, H)).astype(np.float32) * 0.1)

        gu = quantized_linear(x.astype(jnp.bfloat16), gu_q)
        g, u = jnp.split(gu.astype(jnp.float32), 2, axis=-1)
        ref = quantized_linear(
            (jax.nn.silu(g) * u).astype(jnp.bfloat16), dn_q
        ).astype(np.float32)

        out = fused_swiglu_mlp(x.astype(jnp.bfloat16), gu_q, dn_q,
                               interpret=True)
        assert out is not None
        err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
        scale = float(jnp.abs(ref).max())
        assert err / max(scale, 1e-6) < 0.02, (err, scale)


class TestInt4:
    """Packed int4 weight-only quantization (QuantizedWeight4)."""

    def test_roundtrip_error_small(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
        from vis_tpu.ops.quantized import quantize_weight4

        qw = quantize_weight4(w)
        assert qw.q.shape == (64, 64) and qw.q.dtype == jnp.uint8
        assert qw.scale.shape == (64, 2)
        deq = qw.dequantize(jnp.float32)
        rel = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
        assert rel < 0.08  # ~1/14 quantization step

    def test_linear_and_embed_dispatch(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((3, 128)).astype(np.float32))
        from vis_tpu.models.common.layers import embed
        from vis_tpu.ops.quantized import quantize_weight4

        qw = quantize_weight4(w)
        exact = linear(x, w)
        approx = linear(x, qw)
        rel = float(jnp.abs(exact - approx).max() / jnp.abs(exact).max())
        assert rel < 0.2
        rows = embed(jnp.asarray([[1, 5, 9]]), qw)
        ref = qw.dequantize(jnp.float32)[jnp.asarray([1, 5, 9])]
        np.testing.assert_allclose(
            np.asarray(rows, np.float32), np.asarray(ref)[None], atol=0.05
        )

    def test_pallas_kernel_matches_fallback(self):
        rng = np.random.default_rng(2)
        w = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((2, 256)).astype(np.float32))
        from vis_tpu.ops.quantized import quantize_weight4, quantized_matmul4

        qw = quantize_weight4(w)
        fallback = quantized_matmul4(x, qw)  # CPU dequant+einsum path
        kernel_out = quantized_matmul4(x, qw, interpret=True)
        np.testing.assert_allclose(
            np.asarray(kernel_out), np.asarray(fallback), atol=0.5, rtol=2e-2
        )

    def test_stacked_pick_kernel_matches_per_layer(self):
        """quantized_matmul4_stacked (in-kernel layer pick, folded-bias
        unpack) must match the per-layer quantized_matmul4 math for every
        layer index — both the interpret-mode kernel and the CPU fallback."""
        rng = np.random.default_rng(7)
        L, out_dim, in_dim = 3, 256, 256
        ws = [
            jnp.asarray(rng.standard_normal((out_dim, in_dim)).astype(np.float32))
            for _ in range(L)
        ]
        from vis_tpu.ops.quantized import (
            QuantizedWeight4Pick,
            quantize_weight4,
            quantized_matmul4,
            quantized_matmul4_stacked,
        )

        qws = [quantize_weight4(w) for w in ws]
        q_stacked = jnp.stack([q.q for q in qws])
        s_stacked = jnp.stack([q.scale for q in qws])
        x = jnp.asarray(rng.standard_normal((2, in_dim)).astype(np.float32))
        for idx in range(L):
            ref = quantized_matmul4(x, qws[idx])  # CPU dequant+einsum
            pick = QuantizedWeight4Pick(
                q_stacked, s_stacked, jnp.int32(idx)
            )
            fb = quantized_matmul4_stacked(x, pick)
            np.testing.assert_allclose(
                np.asarray(fb), np.asarray(ref), atol=1e-4, rtol=1e-5
            )
            kern = quantized_matmul4_stacked(x, pick, interpret=True)
            np.testing.assert_allclose(
                np.asarray(kern), np.asarray(ref), atol=0.5, rtol=2e-2
            )

    def test_stacked_pick_zero_padded_rows(self):
        """Folded-bias unpack: zero-padded rows (nibble 0, scale 0) must
        still produce exactly zero — the -8*sum(x) correction is scaled by
        the zero scale."""
        rng = np.random.default_rng(8)
        w = jnp.asarray(rng.standard_normal((200, 128)).astype(np.float32))
        from vis_tpu.ops.quantized import (
            QuantizedWeight4Pick,
            quantize_weight4,
            quantized_matmul4_stacked,
        )

        qw = quantize_weight4(w, pad_out_multiple=256)
        pick = QuantizedWeight4Pick(
            qw.q[None], qw.scale[None], jnp.int32(0)
        )
        x = jnp.asarray(rng.standard_normal((1, 128)).astype(np.float32))
        out = quantized_matmul4_stacked(x, pick, interpret=True)
        assert np.abs(np.asarray(out)[:, 200:]).max() == 0.0

    def test_pick_layer_matches_scan_slice(self):
        """decoder._pick_layer must reproduce exactly what lax.scan xs
        slicing produced: same decode logits at every step."""
        from vis_tpu.models.common.decoder import _pick_layer

        config = DecoderConfig(
            vocab_size=256, hidden_size=128, num_layers=3, num_heads=4,
            num_kv_heads=2, intermediate_size=256, qkv_bias=True,
            tie_word_embeddings=True, dtype=jnp.float32,
        )
        params = init_decoder_params(config, jax.random.PRNGKey(11))
        stacked = stack_decoder_layers(params)["layers_stacked"]
        for idx in range(config.num_layers):
            picked = _pick_layer(stacked, jnp.int32(idx))
            sliced = jax.tree.map(lambda w: w[idx], stacked)
            flat_p = jax.tree.leaves(picked)
            flat_s = jax.tree.leaves(sliced)
            assert len(flat_p) == len(flat_s)
            for a, b in zip(flat_p, flat_s):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_vocab_padding_and_logits_slice(self):
        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.standard_normal((300, 128)).astype(np.float32))
        from vis_tpu.ops.quantized import quantize_weight4, quantized_matmul4

        qw = quantize_weight4(w, pad_out_multiple=512)
        assert qw.q.shape[0] == 512
        x = jnp.asarray(rng.standard_normal((2, 128)).astype(np.float32))
        out = quantized_matmul4(x, qw)
        assert out.shape == (2, 512)
        # Padded rows have zero scales -> exactly zero logits.
        assert np.abs(np.asarray(out)[:, 300:]).max() == 0.0

    def test_int4_scan_decode_tracks_bf16(self):
        config = DecoderConfig(
            vocab_size=256, hidden_size=128, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=256, qkv_bias=False,
            tie_word_embeddings=True, dtype=jnp.float32,
        )
        params = init_decoder_params(config, jax.random.PRNGKey(5))
        stacked = stack_decoder_layers(params)
        quantized = quantize_stacked_params(stacked, mode="int4")

        rng = np.random.default_rng(3)
        ids = rng.integers(5, 250, size=(1, 12))
        embeds = jnp.take(params["embed_tokens"], jnp.asarray(ids), axis=0)
        positions = jnp.asarray(np.arange(12)[None])

        outs = {}
        for name, p in (("bf16", stacked), ("int4", quantized)):
            cache = KVCache.create(
                config.num_layers, 1, 64, config.num_kv_heads,
                config.head_dim_, dtype=jnp.float32,
            )
            logits, cache = prefill_scan(
                config, p, embeds, positions, cache, jnp.asarray([12])
            )
            tokens, _, _ = decode_loop_scan(
                config, p, logits, jnp.int32(12), cache, 6
            )
            outs[name] = (np.asarray(logits), np.asarray(tokens))
        l_bf, _ = outs["bf16"]
        l_q, _ = outs["int4"]
        rel = np.abs(l_bf - l_q).max() / (np.abs(l_bf).max() + 1e-9)
        assert rel < 0.4  # int4 is coarser than int8 but must stay sane
        assert np.isfinite(l_q).all()

    def test_engine_int4_deterministic(self, monkeypatch):
        monkeypatch.setenv("QUANTIZATION", "int4")
        from vis_tpu.utils.config import get_config

        get_config(reload=True)
        try:
            from vis_tpu.serving.engine import Engine
            from vis_tpu.serving.tokenizer import ByteTokenizer
            from vis_tpu.ops.quantized import QuantizedWeight4

            config = DecoderConfig(
                vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                num_kv_heads=2, intermediate_size=128, qkv_bias=False,
                tie_word_embeddings=True, dtype=jnp.float32,
            )
            params = init_decoder_params(config, jax.random.PRNGKey(9))
            tok = ByteTokenizer(vocab_size=config.vocab_size)
            engine = Engine("q4", config, params, tok, max_cache_tokens=256)
            assert isinstance(
                engine.text_params["layers_stacked"]["qkv_proj"],
                QuantizedWeight4,
            )
            out_a = engine.generate("check the casting", max_tokens=6)
            out_b = engine.generate("check the casting", max_tokens=6)
            assert out_a == out_b
        finally:
            monkeypatch.delenv("QUANTIZATION")
            get_config(reload=True)

    def test_mllama_int4_engine_runs(self, monkeypatch):
        monkeypatch.setenv("QUANTIZATION", "int4")
        from vis_tpu.utils.config import get_config

        get_config(reload=True)
        try:
            from vis_tpu.models.llama.mllama import MllamaConfig, init_params
            from vis_tpu.serving.engine_mllama import MllamaEngine
            from vis_tpu.serving.tokenizer import ByteTokenizer

            config = MllamaConfig.tiny()
            params = init_params(config, jax.random.PRNGKey(4))
            tok = ByteTokenizer(vocab_size=config.text.vocab_size)
            engine = MllamaEngine("q4-mllama", config, params, tok,
                                  max_cache_tokens=256)
            out = engine.generate("audit the part", max_tokens=6)
            assert isinstance(out, str)
        finally:
            monkeypatch.delenv("QUANTIZATION")
            get_config(reload=True)

    def test_int4_tp_sharding(self):
        if jax.device_count() < 2:
            pytest.skip("needs multiple devices")
        from jax.sharding import Mesh
        from vis_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
        from vis_tpu.parallel.sharding import shard_stacked_decoder_params
        from vis_tpu.ops.quantized import QuantizedWeight4

        devices = np.array(jax.devices()[:2]).reshape(1, 2)
        mesh = Mesh(devices, (DATA_AXIS, MODEL_AXIS))
        config = DecoderConfig(
            vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128, qkv_bias=False,
            tie_word_embeddings=True, dtype=jnp.float32,
        )
        stacked = quantize_stacked_params(
            stack_decoder_layers(init_decoder_params(config, jax.random.PRNGKey(2))),
            mode="int4",
        )
        sharded = shard_stacked_decoder_params(stacked, mesh)
        q = sharded["layers_stacked"]["q_proj"]
        assert isinstance(q, QuantizedWeight4)
        assert len(q.q.sharding.device_set) == 2

    def test_int4_row_sharded_scale_keeps_both_halves(self):
        """o_proj/down_proj shard the PACKED input axis; the [.., out, 2]
        lo/hi scale pair must replicate across the model axis — at tp=2 a
        reused q spec would give each device only one half's scale while
        its nibble shard needs both."""
        if jax.device_count() < 2:
            pytest.skip("needs multiple devices")
        from jax.sharding import Mesh
        from vis_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
        from vis_tpu.parallel.sharding import shard_stacked_decoder_params
        from vis_tpu.ops.quantized import QuantizedWeight4

        devices = np.array(jax.devices()[:2]).reshape(1, 2)
        mesh = Mesh(devices, (DATA_AXIS, MODEL_AXIS))
        config = DecoderConfig(
            vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128, qkv_bias=False,
            tie_word_embeddings=True, dtype=jnp.float32,
        )
        stacked = quantize_stacked_params(
            stack_decoder_layers(init_decoder_params(config, jax.random.PRNGKey(2))),
            mode="int4",
        )
        sharded = shard_stacked_decoder_params(stacked, mesh)
        for name in ("o_proj",):
            w = sharded["layers_stacked"][name]
            assert isinstance(w, QuantizedWeight4)
            # Packed q is sharded on its input axis across the 2 devices...
            assert len(w.q.sharding.device_set) == 2
            for shard in w.scale.addressable_shards:
                # ...but every device holds the FULL trailing scale pair.
                assert shard.data.shape[-1] == 2
        down = sharded["layers_stacked"]["mlp"]["down_proj"]
        assert isinstance(down, QuantizedWeight4)
        for shard in down.scale.addressable_shards:
            assert shard.data.shape[-1] == 2


class TestFusedInitPath:
    def test_prefinished_params_match_engine_quantization(self, monkeypatch):
        """Params init+fuse+quantized inside ONE jit (the target-profile
        memory-safe path) must behave exactly like Engine-side finishing."""
        monkeypatch.setenv("QUANTIZATION", "int4")
        from vis_tpu.utils.config import get_config

        get_config(reload=True)
        try:
            from vis_tpu.models.common.decoder import fuse_stacked_projections
            from vis_tpu.serving.engine import Engine
            from vis_tpu.serving.tokenizer import ByteTokenizer

            config = DecoderConfig(
                vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                num_kv_heads=2, intermediate_size=128, qkv_bias=False,
                tie_word_embeddings=True, dtype=jnp.float32,
            )
            tok = ByteTokenizer(vocab_size=config.vocab_size)

            def make(k):
                stacked = stack_decoder_layers(init_decoder_params(config, k))
                stacked = fuse_stacked_projections(stacked)
                return quantize_stacked_params(
                    stacked, quantize_embeddings=True, mode="int4"
                )

            prefinished = jax.jit(make)(jax.random.PRNGKey(9))
            raw = init_decoder_params(config, jax.random.PRNGKey(9))
            eng_pre = Engine("pre", config, prefinished, tok, max_cache_tokens=256)
            eng_raw = Engine("raw", config, raw, tok, max_cache_tokens=256)
            a = eng_pre.generate("verify the pre-finished path", max_tokens=8)
            b = eng_raw.generate("verify the pre-finished path", max_tokens=8)
            assert a == b
        finally:
            monkeypatch.delenv("QUANTIZATION")
            get_config(reload=True)


class TestMixedVocabPrecision:
    """vocab_mode: vocab-projection precision independent of the layers'.

    The flagship single-chip profile runs int4 layers with an int8 vocab
    head on exactly one role (bench.py): the int4 vocab matmul is
    VPU-bound on nibble unpack, and only one head's worth of int8 HBM
    fits next to 13 GB of int4 weights.  Reference has no quantization
    tier at all (SURVEY.md §2: remote APIs); this is TPU-build surface.
    """

    def _setup(self):
        config = DecoderConfig(
            vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128,
            tie_word_embeddings=False, dtype=jnp.float32,
        )
        params = init_decoder_params(config, jax.random.PRNGKey(11))
        return config, stack_decoder_layers(params)

    def test_int8_vocab_over_int4_layers(self):
        from vis_tpu.ops.quantized import QuantizedWeight4

        config, stacked = self._setup()
        q = quantize_stacked_params(
            stacked, quantize_embeddings=True, mode="int4", vocab_mode="int8"
        )
        # Layers follow mode (int4); both vocab tables follow vocab_mode.
        assert isinstance(q["layers_stacked"]["q_proj"], QuantizedWeight4)
        assert isinstance(q["layers_stacked"]["mlp"]["down_proj"], QuantizedWeight4)
        assert isinstance(q["embed_tokens"], QuantizedWeight)
        assert isinstance(q["lm_head"], QuantizedWeight)

    def test_vocab_mode_none_keeps_bf16_head(self):
        from vis_tpu.ops.quantized import QuantizedWeight4

        config, stacked = self._setup()
        q = quantize_stacked_params(
            stacked, quantize_embeddings=True, mode="int4", vocab_mode="none"
        )
        assert isinstance(q["layers_stacked"]["q_proj"], QuantizedWeight4)
        assert not isinstance(q["lm_head"], (QuantizedWeight, QuantizedWeight4))
        assert hasattr(q["lm_head"], "shape")

    def test_mixed_precision_decode_deterministic_and_tracks(self):
        config, stacked = self._setup()
        mixed = quantize_stacked_params(
            stacked, quantize_embeddings=True, mode="int4", vocab_mode="int8"
        )

        rng = np.random.default_rng(5)
        ids = rng.integers(5, 250, size=(2, 12))

        def run(p):
            from vis_tpu.models.common.layers import embed

            embeds = embed(jnp.asarray(ids), p["embed_tokens"]).astype(
                jnp.float32
            )
            positions = jnp.asarray(
                np.broadcast_to(np.arange(12)[None], (2, 12)).copy()
            )
            cache = KVCache.create(
                config.num_layers, 2, 64, config.num_kv_heads,
                config.head_dim_, dtype=jnp.float32,
            )
            logits, cache = prefill_scan(
                config, p, embeds, positions, cache, jnp.asarray([12, 12])
            )
            tokens, _, _ = decode_loop_scan(
                config, p, logits, jnp.int32(12), cache, 8
            )
            return np.asarray(tokens)

        ta = run(stacked)
        tb = run(mixed)
        np.testing.assert_array_equal(tb, run(mixed))  # deterministic
        assert (ta == tb).mean() >= 0.5  # tracks full precision loosely

    def test_engine_init_honors_role_override(self, monkeypatch):
        """The REAL-CHECKPOINT quantize path (Engine.__init__._finish) must
        honor {ROLE}_VOCAB_QUANTIZATION — r3 advisor: only the weightless
        dev-target builder threaded the role, so production engines
        silently ignored the HBM-shaping override."""
        from vis_tpu.ops.quantized import QuantizedWeight, QuantizedWeight4
        from vis_tpu.serving.engine import Engine
        from vis_tpu.serving.tokenizer import ByteTokenizer
        from vis_tpu.utils.config import get_config

        monkeypatch.setenv("QUANTIZATION", "int4")
        monkeypatch.setenv("VOCAB_QUANTIZATION", "same")
        monkeypatch.setenv("EXPLAINER_VOCAB_QUANTIZATION", "int8")
        get_config(reload=True)
        try:
            config = DecoderConfig(
                vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
                num_kv_heads=2, intermediate_size=128,
                tie_word_embeddings=False, dtype=jnp.float32,
            )
            params = init_decoder_params(config, jax.random.PRNGKey(12))
            tok = ByteTokenizer(vocab_size=config.vocab_size)
            eng = Engine("role-q", config, params, tok,
                         max_cache_tokens=128, role="explainer")
            assert isinstance(eng.text_params["lm_head"], QuantizedWeight)

            params2 = init_decoder_params(config, jax.random.PRNGKey(12))
            eng2 = Engine("no-role-q", config, params2, tok,
                          max_cache_tokens=128)
            assert isinstance(eng2.text_params["lm_head"], QuantizedWeight4)
        finally:
            for k in ("QUANTIZATION", "VOCAB_QUANTIZATION",
                      "EXPLAINER_VOCAB_QUANTIZATION"):
                monkeypatch.delenv(k, raising=False)
            get_config(reload=True)

    def test_per_role_override_resolution(self, monkeypatch):
        from vis_tpu.serving.engine import _vocab_quant_mode
        from vis_tpu.utils.config import get_config

        monkeypatch.setenv("QUANTIZATION", "int4")
        monkeypatch.setenv("VOCAB_QUANTIZATION", "same")
        monkeypatch.setenv("EXPLAINER_VOCAB_QUANTIZATION", "int8")
        get_config(reload=True)
        try:
            # Role with an override gets it; others follow the global
            # ("same" -> None -> vocab follows the layer mode).
            assert _vocab_quant_mode("explainer") == "int8"
            assert _vocab_quant_mode("inspector") is None
            assert _vocab_quant_mode() is None

            monkeypatch.setenv("VOCAB_QUANTIZATION", "int8")
            get_config(reload=True)
            assert _vocab_quant_mode("inspector") == "int8"
            assert _vocab_quant_mode("explainer") == "int8"
        finally:
            for k in (
                "QUANTIZATION", "VOCAB_QUANTIZATION",
                "EXPLAINER_VOCAB_QUANTIZATION",
            ):
                monkeypatch.delenv(k, raising=False)
            get_config(reload=True)

    def test_no_roleless_vocab_mode_calls_in_builders(self):
        """Every _vocab_quant_mode() call site in the engine module must
        thread the role: the bare form silently drops per-role
        {ROLE}_VOCAB_QUANTIZATION overrides, and that exact bug shipped
        twice (r3 advisor: real-checkpoint path; r4 self-review: the
        target-dev Mllama builder).  Source-level guard so a third call
        site can't regress it."""
        import re
        from pathlib import Path

        import vis_tpu.serving.engine as engine_mod

        src = Path(engine_mod.__file__).read_text()
        bare = [
            ln.strip()
            for ln in src.splitlines()
            if re.search(r"_vocab_quant_mode\(\s*\)", ln)
            and "def _vocab_quant_mode" not in ln
        ]
        assert bare == [], f"role-less _vocab_quant_mode() calls: {bare}"
