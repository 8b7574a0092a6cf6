"""Device mesh construction and axis conventions.

Axis layout (SURVEY.md §5.8 TPU plan): a 2-D mesh ("data", "model") —
"data" carries batch/data parallelism (and request-level parallelism in
serving), "model" carries tensor parallelism over attention heads and MLP
hidden.  Sequence parallelism for high-resolution vision prefill reuses the
"model" axis (Ulysses-style head scatter; see parallel.sp).

Shapes come from config.mesh_shape ("2x4" = data=2, model=4); `auto` uses
(1, n_devices).  The same code runs on one real chip (1x1), a v5e-8 slice,
or 8 virtual CPU devices in tests (xla_force_host_platform_device_count).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vis_tpu.utils.logger import setup_logger

logger = setup_logger(__name__, level="INFO", component="MESH")

DATA_AXIS = "data"
MODEL_AXIS = "model"

_DISTRIBUTED_INITIALIZED = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host process-group init (SURVEY.md §5.8: "Across hosts/slices:
    DCN process groups via jax.distributed.initialize").

    Called before any jax.devices() use.  Arguments default to the standard
    env surface (also what TPU pod runtimes export):

      VIS_TPU_COORDINATOR   host:port of process 0 (required for multi-host)
      VIS_TPU_NUM_PROCESSES total process count
      VIS_TPU_PROCESS_ID    this process's rank

    Returns True when a process group was created; False for the
    single-process case (no env, num_processes<=1) — every existing
    single-host path is unchanged.  After init, jax.devices() returns the
    GLOBAL device list, so create_mesh() below builds DCN-spanning meshes
    with no further changes; XLA routes "model"-axis collectives over ICI
    within a slice and "data"-axis collectives over DCN across hosts when
    the mesh is laid out host-major (process index varies along "data").
    """
    global _DISTRIBUTED_INITIALIZED
    import os

    if _DISTRIBUTED_INITIALIZED:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "VIS_TPU_COORDINATOR"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("VIS_TPU_NUM_PROCESSES", "0") or 0)
    if process_id is None:
        pid_env = os.environ.get("VIS_TPU_PROCESS_ID")
        process_id = int(pid_env) if pid_env is not None else None
    if not coordinator_address or not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _DISTRIBUTED_INITIALIZED = True
    logger.info(
        f"jax.distributed initialized: process {jax.process_index()}/"
        f"{jax.process_count()}, {len(jax.local_devices())} local / "
        f"{len(jax.devices())} global devices via {coordinator_address}"
    )
    return True


def create_mesh(shape: Optional[Tuple[int, int]] = None) -> Mesh:
    """Build the ("data", "model") mesh over the available devices."""
    init_distributed()  # no-op unless the multi-host env surface is set
    devices = jax.devices()
    if shape is None:
        from vis_tpu.utils.config import get_config

        cfg_shape = get_config().mesh_shape_tuple
        if len(cfg_shape) == 1:
            cfg_shape = (1, cfg_shape[0])
        shape = cfg_shape
        if int(np.prod(shape)) > len(devices):
            # Not enough devices for the configured shape: use them all —
            # loudly, because DP disappearing / TP degree changing behind
            # the operator's back makes perf and parity diffs look like
            # model bugs.
            fallback = (1, len(devices))
            logger.warning(
                f"mesh_shape {shape} needs {int(np.prod(shape))} devices "
                f"but only {len(devices)} are visible; degrading to "
                f"{fallback} (no data parallelism, model axis = all chips)"
            )
            shape = fallback
    total = int(np.prod(shape))
    if total > len(devices):
        raise ValueError(
            f"mesh shape {shape} needs {total} devices, have {len(devices)}"
        )
    grid = np.array(devices[:total]).reshape(shape)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


__all__ = [
    "create_mesh", "init_distributed", "named", "replicated",
    "DATA_AXIS", "MODEL_AXIS", "P",
]
