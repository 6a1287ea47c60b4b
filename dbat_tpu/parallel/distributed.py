"""Multi-host initialization (jax.distributed) for the sharded bundle.

The sharded backend (parallel/sharded.py) is written against a 1-D
jax.sharding.Mesh and `jax.lax.psum`; on a multi-host topology the
same code runs unchanged once `jax.distributed.initialize()` has
registered every process — GSPMD routes the psums over ICI within a
slice and DCN across hosts. The reference has no distributed layer at
all (SURVEY.md §2.13); this is the TPU-native scaling tier the north
star asks for.

Usage (one call per process, before any other jax call):

    from dbat_tpu.parallel.distributed import init_distributed, global_mesh
    init_distributed()              # env-driven (TPU pods) or explicit
    mesh = global_mesh()            # 1-D 'obs' mesh over ALL devices
    result = bundle(project, mesh=mesh, ...)

On a TPU pod slice, `jax.distributed.initialize()` discovers the
coordinator from the TPU environment; elsewhere pass
coordinator_address/num_processes/process_id explicitly or via the
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
"""

from __future__ import annotations

import os

import jax

from .mesh import make_mesh

_initialized = False


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-process.

    Returns True when a multi-process runtime was initialized, False
    for the single-process case (no-op — the sharded backend then runs
    on the local devices only). Safe to call more than once.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    on_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES")
                  or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and not on_pod:
        return False  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def global_mesh(axis: str = "obs"):
    """1-D mesh over every device of every process (jax.devices() is
    globally consistent after init_distributed)."""
    return make_mesh(jax.devices(), axis=axis)
