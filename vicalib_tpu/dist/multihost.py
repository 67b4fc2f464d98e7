"""Multi-host runtime: the JAX distributed-communication backend.

The reference is a single-process program (SURVEY.md section 2's parallelism
inventory: one solver pthread, one mutex); scaling the calibration across
hosts is a new first-class subsystem (SURVEY.md section 5, distributed
communication backend).  This module owns the process-group lifecycle:

- ``initialize()`` wires ``jax.distributed.initialize`` — the NCCL/MPI
  equivalent.  On TPU pods the ICI/DCN fabric is discovered automatically;
  on CPU (tests, smoke runs) collectives ride gloo over TCP.
- ``global_mesh()`` builds a 1-D mesh spanning every device of every host;
  within a slice the collectives ride ICI, across hosts DCN.
- ``global_shard()`` lifts host-replicated numpy arrays into globally
  sharded ``jax.Array``s (leading-axis partitioning), the bridge between
  per-host data loading and SPMD execution.

Launch (one command per host / process):

  python -m vicalib_tpu.cli ... -coordinator_address host0:1234 \
      -num_processes 2 -process_id $RANK

A 2-process CPU smoke test (tests/test_multihost.py) proves assembly parity
across the process boundary.
"""
from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger("vicalib_tpu.dist")


def initialize(coordinator_address: str, num_processes: int, process_id: int,
               local_device_ids=None):
    """Join the distributed runtime (call before any jax computation).

    On CPU platforms the gloo TCP collectives implementation is selected
    (the pure-CPU transport; TPU pods use their native fabric and ignore
    this setting).
    """
    import jax

    try:
        plats = jax.config.jax_platforms or ""
        if "cpu" in plats or plats == "":
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # noqa: BLE001 - older jax without the option
        pass
    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    log.info("distributed runtime up: process %d/%d, %d local / %d global "
             "devices", jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())


def is_primary() -> bool:
    """True on the process that should write outputs/logs."""
    import jax

    return jax.process_index() == 0


def global_mesh():
    """1-D mesh over every device of every participating host."""
    from .mesh import make_mesh

    import jax

    return make_mesh(devices=jax.devices())


def global_shard(mesh, a: np.ndarray):
    """Lift a host-replicated (n_shards, ...) numpy array to a jax.Array
    partitioned on its leading axis over ``mesh``.

    Every process passes the SAME full array (each host loads/builds the
    same problem); each contributes the rows its local devices own.  In
    single-process runs this is a plain sharded device_put.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import SHARD_AXIS

    a = np.ascontiguousarray(a)
    sh = NamedSharding(mesh, P(SHARD_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(a, sh)
    devs = list(mesh.devices.ravel())
    if a.shape[0] % len(devs) != 0:
        raise ValueError(
            f"leading axis {a.shape[0]} must divide over {len(devs)} devices")
    rows_per = a.shape[0] // len(devs)
    pid = jax.process_index()
    local_rows = [i for i, d in enumerate(devs) if d.process_index == pid]
    idx = np.concatenate([np.arange(i * rows_per, (i + 1) * rows_per)
                          for i in local_rows])
    return jax.make_array_from_process_local_data(sh, a[idx], a.shape)


def global_replicated(mesh, a):
    """Replicate a host-consistent numpy value over the global mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(a, sh)
    a = np.asarray(a)
    return jax.make_array_from_process_local_data(sh, a, a.shape)
