"""Device-mesh sharding for the bundle pipeline.

The scalable axes of a bundle network are observations and object
points (SURVEY.md §2.13); cameras/IO are small and replicated.  We
shard every per-observation array (and the S-assembly pair chunks) on
a 1-D 'obs' mesh axis and let GSPMD insert the collectives: partial
scatter-adds into the replicated camera system U/S and the per-point
blocks V become all-reduces over ICI — exactly the reduce-scatter/
all-reduce shape described in BASELINE.json's north star.

Usage:
    mesh = make_mesh(jax.devices())
    ops = SchurOps(project, spec, mesh=mesh)   # arrays placed sharded
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "obs") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_leading(mesh: Mesh, arr, axis: str = "obs"):
    """Place an array sharded on its leading dimension (padding-free:
    caller guarantees divisibility or accepts uneven GSPMD sharding)."""
    sh = NamedSharding(mesh, P(axis, *([None] * (arr.ndim - 1))))
    return jax.device_put(arr, sh)


def replicated(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))
