"""Multi-host (DCN) process-group tests: 2 real OS processes x 4 virtual
CPU devices each form one 8-device global mesh via
vis_tpu.parallel.mesh.init_distributed (SURVEY.md §5.8 "Across
hosts/slices: DCN process groups via jax.distributed.initialize").

Each worker subprocess initializes the process group, builds the global
("data","model") mesh through the SAME create_mesh() the serving tier
uses, and runs a psum-style collective over a globally sharded array —
proving cross-process mesh construction and collectives work without any
serving-code changes.  Runs on CPU (Gloo cross-process collectives);
skipped if the jaxlib build lacks multi-process CPU support.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

_WORKER = textwrap.dedent(
    """
    import json, os, sys
    sys.path.insert(0, os.environ["VIS_TPU_REPO"])
    import jax
    jax.config.update("jax_platforms", "cpu")

    from vis_tpu.parallel.mesh import (
        DATA_AXIS, MODEL_AXIS, create_mesh, init_distributed,
    )

    ok = init_distributed()
    assert ok, "env surface set but init_distributed returned False"

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    mesh = create_mesh((2, 4))  # data spans processes, model within

    # Global array sharded over both axes; each process only materializes
    # its addressable shards.
    sharding = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))
    global_shape = (4, 8)
    base = np.arange(4 * 8, dtype=np.float32).reshape(global_shape)

    def local_cb(index):
        return base[index]

    arr = jax.make_array_from_callback(global_shape, sharding, local_cb)

    @jax.jit
    def total(x):
        return jnp.sum(x)  # cross-process reduction over DCN axis

    out = float(total(arr))
    expect = float(base.sum())
    assert abs(out - expect) < 1e-5, (out, expect)

    # A sharded matmul with a model-axis contraction: exercises an
    # all-reduce across the "model" axis on every process.
    w = jax.device_put(
        np.ones((8, 16), np.float32), NamedSharding(mesh, P(MODEL_AXIS, None))
    )

    @jax.jit
    def mm(a, b):
        return a @ b

    y = mm(arr, w)
    y_host = np.asarray(
        jax.experimental.multihost_utils.process_allgather(y, tiled=True)
    )
    expect_y = base @ np.ones((8, 16), np.float32)
    assert np.allclose(y_host, expect_y), "sharded matmul mismatch"

    print(json.dumps({
        "process": jax.process_index(),
        "processes": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "sum": out,
        "ok": True,
    }))
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_mesh(tmp_path):
    port = _free_port()
    env_base = {
        **os.environ,
        "VIS_TPU_REPO": str(REPO),
        "VIS_TPU_COORDINATOR": f"127.0.0.1:{port}",
        "VIS_TPU_NUM_PROCESSES": "2",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        # The conftest sets 8 for in-process tests; the workers need 4 each.
    }
    procs = []
    for pid in range(2):
        env = dict(env_base, VIS_TPU_PROCESS_ID=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        if rc != 0 and (
            "multi-process" in err.lower()
            or "distributed" in err.lower() and "not supported" in err.lower()
            or "collectives" in err.lower() and "unimplemented" in err.lower()
        ):
            pytest.skip(f"jaxlib lacks multi-process CPU support: {err[-300:]}")
        assert rc == 0, f"worker failed rc={rc}\nstdout={out}\nstderr={err}"
    payloads = [json.loads(out.strip().splitlines()[-1]) for _, out, _ in outs]
    assert all(p["ok"] for p in payloads)
    assert {p["process"] for p in payloads} == {0, 1}
    assert all(p["global_devices"] == 8 for p in payloads)
    assert all(p["local_devices"] == 4 for p in payloads)
