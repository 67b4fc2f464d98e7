"""Device-mesh helpers for multi-chip calibration.

The reference is single-process/CPU (SURVEY.md section 2's parallelism
inventory: one solver pthread + Ceres's 4 threads); distribution here is a
new first-class subsystem: a 1-D ``shard`` mesh over which observations and
IMU factors are partitioned, with XLA collectives reducing the assembled
normal equations (see dist/sharded.py).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


SHARD_AXIS = "shard"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SHARD_AXIS,))


def sharded(mesh: Mesh):
    """Sharding for arrays partitioned on their leading axis."""
    return NamedSharding(mesh, P(SHARD_AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def pad_to_multiple(a: np.ndarray, k: int, axis=0, pad_value=0):
    """Pad axis length to a multiple of k (for even sharding)."""
    n = a.shape[axis]
    rem = (-n) % k
    if rem == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, rem)
    return np.pad(a, widths, constant_values=pad_value)
