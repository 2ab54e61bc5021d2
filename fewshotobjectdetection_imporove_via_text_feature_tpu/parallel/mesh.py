"""Device mesh + sharding helpers — the TPU replacement for the reference's
DDP/NCCL layer (ref defrcn/engine/defaults.py:252-258 DDP wrap, main.py:125
launch, comm.gather in evaluators).

Design per SURVEY.md §2.3/§5.8: the reference is data-parallel only, so the
mandatory capability is a 1-D ``data`` mesh with batch-sharded inputs and
replicated parameters; pjit inserts the gradient psum over ICI. The mesh
helpers accept any device count (1 on the single-chip bench, N virtual CPU
devices in tests, N chips in production).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = "data",
    local: bool = False,
) -> Mesh:
    """1-D data mesh. ``local=True`` restricts to this process's devices —
    required for paths that fetch results to the host (e.g. evaluation),
    since arrays spanning non-addressable devices cannot be fetched."""
    devices = jax.local_devices() if local else jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def _spans_processes(mesh: Mesh) -> bool:
    """True when the mesh contains devices of other processes — host
    arrays must then be promoted via host_local_array_to_global_array
    (device_put cannot address remote devices)."""
    if jax.process_count() == 1:
        return False
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def coordination_barrier(tag: str, timeout_ms: int = 1_200_000) -> None:
    """Rendezvous every process at the jax coordination service (plain
    gRPC — no device collectives involved).

    Why this exists: on CPU backends, cross-process collectives run over
    gloo, whose communicator is initialized lazily at the FIRST executed
    collective with a hard ~30 s connect window. Ranks reach that first
    collective skewed by their (large, variable) XLA compile times — on a
    loaded 1-core host the skew exceeded 30 s and killed 2-process runs
    with "Gloo context initialization failed: Connect timeout". Callers
    pre-compile the program, then rendezvous here (generous timeout), so
    the collective's communicator init sees all ranks within milliseconds.
    TPU/ICI collectives have rendezvous windows of minutes and don't need
    this."""
    import jax

    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = getattr(distributed.global_state, "client", None)
    if client is not None:
        client.wait_at_barrier(tag, timeout_ms)


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host numpy pytree with the leading axis sharded over the
    data mesh axis. Under multi-process, each process's array is its LOCAL
    slice of the global batch (reference semantics: the total batch is
    split across ranks, dataloader/build.py:250-257) and the global array
    is assembled across hosts."""
    if _spans_processes(mesh):
        from jax.experimental import multihost_utils

        return jax.tree_util.tree_map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, P(axis_name)
            ),
            batch,
        )
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    if _spans_processes(mesh):
        from jax.experimental import multihost_utils

        return jax.tree_util.tree_map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, P()
            ),
            tree,
        )
    sharding = NamedSharding(mesh, P())

    def put(x):
        # a replicated array living on a GLOBAL mesh can't device_put onto
        # a local mesh directly (cross-host transfer); its value is fully
        # present in the local shard, so hop through the host
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            x = np.asarray(x.addressable_shards[0].data)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)
