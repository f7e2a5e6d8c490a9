"""Multi-process (multi-host) runtime initialization.

Parity: the reference reaches multi-node through Lightning's DDP + SLURM
plugin (`flowmap/pretrain.py:54-75`); the TPU-native equivalent is one JAX
process per host joined via `jax.distributed.initialize`, after which every
`pjit`-sharded step spans the global device set.

Two ways in:
- Explicit env (`FLOWMAP_COORDINATOR`, `FLOWMAP_NUM_PROCESSES`,
  `FLOWMAP_PROCESS_ID`) — used by launchers and the multi-process CPU tests.
- Auto-detection for recognized clusters (SLURM multi-task jobs, TPU pod
  slices), delegated to JAX's cluster detection.
"""

from __future__ import annotations

import os

import numpy as np


def maybe_initialize_distributed() -> bool:
    """Join the global JAX process group if this looks like a multi-process
    launch. Returns True iff `jax.distributed.initialize` was called."""
    import jax

    coordinator = os.environ.get("FLOWMAP_COORDINATOR")
    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ["FLOWMAP_NUM_PROCESSES"]),
            process_id=int(os.environ["FLOWMAP_PROCESS_ID"]),
        )
        return True

    # SLURM multi-task job or TPU pod slice: JAX's own cluster detection
    # knows the rendezvous details.
    slurm_tasks = int(os.environ.get("SLURM_NTASKS", "1"))
    if (os.environ.get("SLURM_JOB_ID") and slurm_tasks > 1) or os.environ.get(
        "TPU_WORKER_HOSTNAMES"
    ):
        jax.distributed.initialize()
        return True
    return False


def make_data_mesh(local_batch_size: int):
    """A pure data-parallel mesh usable from every process.

    Uses k local devices per process, where k divides the local batch size
    (a `make_array_from_process_local_data` requirement), so every process
    contributes equally-sized shards of the global batch.
    """
    import math

    import jax
    from jax.sharding import Mesh

    k = math.gcd(local_batch_size, jax.local_device_count())
    by_process: dict[int, list] = {}
    for d in jax.devices():
        by_process.setdefault(d.process_index, []).append(d)
    devices = []
    for pid in sorted(by_process):
        devices.extend(by_process[pid][:k])
    return Mesh(np.asarray(devices), ("data",))


def make_global_batch(batch, mesh):
    """Assemble a process-local `Batch` into a global batch sharded on the
    mesh "data" axis: each process contributes its local examples, so the
    global batch size is local_batch x process_count (the reference's DDP
    semantics, `flowmap/dataset/data_module_pretrain.py:56-61`)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..types import Batch

    sharding = NamedSharding(mesh, P("data"))

    def leaf(x):
        if x is None:
            return None
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return Batch(
        videos=leaf(batch.videos),
        indices=leaf(batch.indices),
        extrinsics=leaf(batch.extrinsics),
        intrinsics=leaf(batch.intrinsics),
        scenes=batch.scenes,
        datasets=batch.datasets,
    )
