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


def test_mllama_engine_sharded_matches_unsharded(mesh):
    from vis_tpu.models.llama.mllama import MllamaConfig, init_params
    from vis_tpu.serving.engine_mllama import MllamaEngine

    config = MllamaConfig.tiny()
    params = init_params(config, jax.random.PRNGKey(5))
    tok = ByteTokenizer(vocab_size=config.text.vocab_size)
    plain = MllamaEngine("plain", config, params, tok, max_cache_tokens=256)
    sharded = MllamaEngine("tp", config, params, tok, max_cache_tokens=256,
                           mesh=mesh)
    prompt = "verify the casting for porosity"
    a = plain.generate(prompt, max_tokens=10)
    b = sharded.generate(prompt, max_tokens=10)
    assert a == b


def test_build_engine_consumes_mesh_shape(monkeypatch):
    """config.mesh_shape != 1x1 must reach production serving: build_engine
    constructs the mesh and TP-shards the engines (VERDICT r1 item 2)."""
    from vis_tpu.serving import engine as engine_mod
    from vis_tpu.utils.config import get_config

    monkeypatch.setenv("MESH_SHAPE", "1x2")
    get_config(reload=True)
    engine_mod.reset_engines()
    try:
        backend = engine_mod.get_engine_backend(
            "explainer", "meta-llama/Llama-3.1-8B-Instruct"
        )
        eng = backend.engine
        assert eng.mesh is not None and eng.mesh.size == 2
        # Sharded params actually live on both devices.
        q = eng.text_params["layers_stacked"]["q_proj"]
        leaf = q.q if hasattr(q, "q") else q
        assert len(leaf.sharding.device_set) == 2
        # And generation still works end-to-end under TP.
        out = eng.generate("status?", max_tokens=4)
        assert isinstance(out, str)
    finally:
        monkeypatch.delenv("MESH_SHAPE", raising=False)
        get_config(reload=True)
        engine_mod.reset_engines()


def test_serving_mesh_none_for_1x1(monkeypatch):
    from vis_tpu.serving.engine import serving_mesh
    from vis_tpu.utils.config import get_config

    monkeypatch.setenv("MESH_SHAPE", "1x1")
    get_config(reload=True)
    try:
        assert serving_mesh() is None
    finally:
        monkeypatch.delenv("MESH_SHAPE", raising=False)
        get_config(reload=True)


# ---------------------------------------------------------------------------
# Batched serving tier under a TP mesh (VERDICT r2 §5.8: scheduler + paged
# KV + constrained rows composing with TP sharding)
# ---------------------------------------------------------------------------

def _sched_config():
    return DecoderConfig(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, qkv_bias=False,
        tie_word_embeddings=True, dtype=jnp.float32,
    )


def _mixed_jobs():
    return [
        dict(prompt="narrate the inspection findings", max_tokens=12),
        dict(prompt="summarize as json", max_tokens=48, json_mode=True),
        dict(prompt="estimate repair costs", max_tokens=96, json_mode=True,
             json_schema="decision_support", schema_batched=True),
    ]


def _run_mixed(plain, scheduled):
    import threading

    jobs = _mixed_jobs()
    expected = []
    for job in jobs:
        kwargs = {k: v for k, v in job.items() if k != "schema_batched"}
        expected.append(plain.generate(**kwargs))
    results = [None] * len(jobs)
    errors = []

    def worker(i):
        try:
            results[i] = scheduled.generate(**jobs[i])
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert results == expected


def test_scheduler_under_tp_mesh_dense_token_exact(mesh, monkeypatch):
    """Continuous batching on a TP-sharded engine: free-form, generic-JSON,
    and schema-exact rows decoding together over the mesh must match the
    single-device unbatched engine token-for-token (dense slot KV, head-
    sharded via kv_cache_sharding)."""
    config = _sched_config()
    params = init_decoder_params(config, jax.random.PRNGKey(31))
    tok = ByteTokenizer(vocab_size=config.vocab_size)
    plain = Engine("mesh-plain", config, params, tok, max_cache_tokens=512)
    sharded = Engine("mesh-sched", config, params, tok, max_cache_tokens=512,
                     mesh=mesh)
    sharded.attach_scheduler(num_slots=4, paged=False)
    try:
        assert sharded.scheduler.mesh is mesh
        _run_mixed(plain, sharded)
    finally:
        sharded.detach_scheduler()


def test_scheduler_under_tp_mesh_paged_token_exact(mesh, monkeypatch):
    """Same property over the paged KV pool: page-table indirection must
    compose with TP sharding (constrained rows mixed in)."""
    from vis_tpu.utils.config import config as app_config

    monkeypatch.setattr(app_config, "kv_page_size", 64)
    monkeypatch.setattr(app_config, "kv_pool_tokens", 4096)
    config = _sched_config()
    params = init_decoder_params(config, jax.random.PRNGKey(33))
    tok = ByteTokenizer(vocab_size=config.vocab_size)
    plain = Engine("mesh-plain-p", config, params, tok, max_cache_tokens=512)
    sharded = Engine("mesh-sched-p", config, params, tok,
                     max_cache_tokens=512, mesh=mesh)
    sharded.attach_scheduler(num_slots=4, paged=True)
    try:
        _run_mixed(plain, sharded)
    finally:
        sharded.detach_scheduler()


def test_replicated_kv_head_geometry_tp8():
    """Real 7B-class head geometry at tiny hidden: 28 query heads / 4 KV
    heads on tp=8.  4 kv heads don't divide the model axis, so the KV cache
    takes the replicated-heads path (sharding.py kv_cache_sharding); decode
    must still be token-exact vs single-device."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import Mesh, PartitionSpec

    from vis_tpu.parallel.sharding import kv_cache_sharding

    devices = np.array(jax.devices()[:8]).reshape(1, 8)
    mesh8 = Mesh(devices, (DATA_AXIS, MODEL_AXIS))

    spec = kv_cache_sharding(mesh8, 4).spec
    assert spec == PartitionSpec(None, "data", None, None, None), (
        "4 kv heads on tp=8 must replicate the head axis"
    )

    config = DecoderConfig(
        vocab_size=512, hidden_size=112, num_layers=2, num_heads=28,
        num_kv_heads=4, intermediate_size=224, qkv_bias=True,
        tie_word_embeddings=True, dtype=jnp.float32,
    )
    params = init_decoder_params(config, jax.random.PRNGKey(41))
    tok = ByteTokenizer(vocab_size=config.vocab_size)
    plain = Engine("geom-plain", config, params, tok, max_cache_tokens=256)
    sharded = Engine("geom-tp8", config, params, tok, max_cache_tokens=256,
                     mesh=mesh8)
    prompt = "check the flange bolts for corrosion"
    a = plain.generate(prompt, max_tokens=10)
    b = sharded.generate(prompt, max_tokens=10)
    assert a == b


# ---------------------------------------------------------------------------
# Data-parallel serving (mesh_shape data axis > 1): engine replicas on
# disjoint TP submeshes, least-loaded routing (VERDICT r2 item 5)
# ---------------------------------------------------------------------------

def test_dp_submeshes_layout(monkeypatch):
    from vis_tpu.serving.engine import dp_submeshes
    from vis_tpu.utils.config import config as app_config

    # The config proxy shadows plain fields but mesh_shape_tuple is a
    # derived property on the real Config — patch both.
    monkeypatch.setattr(app_config, "mesh_shape", "2x2")
    monkeypatch.setattr(app_config, "mesh_shape_tuple", (2, 2))
    meshes = dp_submeshes()
    assert meshes is not None and len(meshes) == 2
    d0 = {d.id for d in meshes[0].devices.flat}
    d1 = {d.id for d in meshes[1].devices.flat}
    assert d0.isdisjoint(d1), "replicas must own disjoint devices"
    assert meshes[0].shape[MODEL_AXIS] == 2

    # Pure DP (tp=1): replicas are single-device fused engines (mesh None).
    monkeypatch.setattr(app_config, "mesh_shape", "4x1")
    monkeypatch.setattr(app_config, "mesh_shape_tuple", (4, 1))
    meshes = dp_submeshes()
    assert meshes == [None, None, None, None]

    monkeypatch.setattr(app_config, "mesh_shape", "1x8")
    monkeypatch.setattr(app_config, "mesh_shape_tuple", (1, 8))
    assert dp_submeshes() is None


def test_replicated_backend_routes_and_matches(monkeypatch):
    """A batch of concurrent requests through ReplicatedEngineBackend must
    (a) produce the same tokens as a single engine, and (b) actually spread
    across both replicas."""
    import threading

    from vis_tpu.parallel.mesh import DATA_AXIS as _DA, MODEL_AXIS as _MA
    from vis_tpu.serving.engine import EngineBackend, ReplicatedEngineBackend

    config = _sched_config()
    params = init_decoder_params(config, jax.random.PRNGKey(51))
    tok = ByteTokenizer(vocab_size=config.vocab_size)
    plain = Engine("dp-ref", config, params, tok, max_cache_tokens=256)

    from jax.sharding import Mesh

    devices = jax.devices()[:4]
    subs = [
        Mesh(np.array(devices[0:2]).reshape(1, 2), (_DA, _MA)),
        Mesh(np.array(devices[2:4]).reshape(1, 2), (_DA, _MA)),
    ]
    replicas = [
        Engine(f"dp-r{i}", config, params, tok, max_cache_tokens=256,
               mesh=subs[i])
        for i in range(2)
    ]
    used = []
    backends = []
    for i, eng in enumerate(replicas):
        b = EngineBackend(eng)
        orig = b.generate

        def counted(prompt, image_path=None, _i=i, _orig=orig, **kw):
            used.append(_i)
            return _orig(prompt, image_path, **kw)

        b.generate = counted
        backends.append(b)
    rb = ReplicatedEngineBackend(backends)

    prompts = [f"inspect unit {i} for cracks" for i in range(4)]
    expected = [plain.generate(p, max_tokens=8) for p in prompts]

    # Hold both replicas busy at once: barrier-style start.
    results = [None] * len(prompts)
    threads = [
        threading.Thread(
            target=lambda i=i: results.__setitem__(
                i, rb.generate(prompts[i], max_tokens=8)
            )
        )
        for i in range(len(prompts))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert results == expected
    assert set(used) == {0, 1}, f"both replicas must serve traffic: {used}"


def test_get_engine_backend_builds_dp_replicas(monkeypatch):
    """mesh_shape "2x1" reaches production serving: get_engine_backend
    returns a ReplicatedEngineBackend with two cached engine replicas."""
    import vis_tpu.serving.engine as eng_mod
    from vis_tpu.serving.engine import (
        ReplicatedEngineBackend, get_engine_backend, reset_engines,
    )
    from vis_tpu.utils.config import config as app_config

    monkeypatch.setattr(app_config, "mesh_shape", "2x1")
    monkeypatch.setattr(app_config, "mesh_shape_tuple", (2, 1))
    monkeypatch.setattr(app_config, "dev_profile", "small")
    reset_engines()
    try:
        backend = get_engine_backend("explainer", "no-such-model-dp")
        assert isinstance(backend, ReplicatedEngineBackend)
        assert len(backend.backends) == 2
        keys = [k for k in eng_mod._engines if "#dp" in k]
        assert len(keys) == 2
        # tp==1 replicas must land on DISTINCT chips (r3 advisor): params
        # committed per replica, not all stacked on the default device.
        replica_devs = []
        for b in backend.backends:
            leaves = jax.tree_util.tree_leaves(b.engine.text_params)
            devs = {d for leaf in leaves for d in leaf.devices()}
            assert len(devs) == 1, "replica params must live on one device"
            replica_devs.append(next(iter(devs)))
        assert replica_devs[0] != replica_devs[1], (
            "Dx1 replicas must pin to distinct devices"
        )
        # Same object on repeat lookup (shared in-flight counters).
        assert get_engine_backend("explainer", "no-such-model-dp") is backend
        out = backend.generate("quick check", max_tokens=4)
        assert isinstance(out, str)
        # Both replicas produce identical tokens (same seed per role).
        outs = [
            b.generate("quick check", max_tokens=4)
            for b in backend.backends
        ]
        assert outs[0] == outs[1] == out
    finally:
        reset_engines()


def test_dp_replica_scheduler_state_placement(monkeypatch):
    """With continuous batching on, each Dx1 replica's scheduler slot KV
    must allocate on THAT replica's chip (the engine's default_device
    scope covers attach_scheduler), not stack on device 0."""
    from vis_tpu.serving.engine import (
        ReplicatedEngineBackend, get_engine_backend, reset_engines,
    )
    from vis_tpu.utils.config import config as app_config

    monkeypatch.setattr(app_config, "mesh_shape", "2x1")
    monkeypatch.setattr(app_config, "mesh_shape_tuple", (2, 1))
    monkeypatch.setattr(app_config, "dev_profile", "small")
    monkeypatch.setattr(app_config, "continuous_batching", True)
    monkeypatch.setattr(app_config, "batching_roles", "explainer")
    monkeypatch.setattr(app_config, "paged_kv_cache", False)
    reset_engines()
    backend = None
    try:
        backend = get_engine_backend("explainer", "no-such-model-dp-sched")
        assert isinstance(backend, ReplicatedEngineBackend)
        seen = []
        for b in backend.backends:
            sched = b.engine.scheduler
            assert sched is not None
            param_dev = next(
                iter(jax.tree_util.tree_leaves(
                    b.engine.text_params)[0].devices())
            )
            cache_devs = set(sched.cache.k.devices())
            assert cache_devs == {param_dev}, (
                f"scheduler KV on {cache_devs}, params on {param_dev}"
            )
            seen.append(param_dev)
        assert seen[0] != seen[1]
        # The batched path works end-to-end on both pinned replicas.
        outs = [b.generate("dp sched", max_tokens=4)
                for b in backend.backends]
        assert outs[0] == outs[1]
    finally:
        if backend is not None:
            for b in backend.backends:
                b.engine.detach_scheduler()
        reset_engines()
