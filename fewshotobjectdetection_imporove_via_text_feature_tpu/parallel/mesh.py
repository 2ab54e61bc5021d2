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


# ZeRO sharding threshold: tensors under this many elements stay
# replicated (biases, norm scales — sharding them saves ~nothing and
# costs a collective each). Production conv kernels are millions of
# elements; the exact cutoff only matters for test-scale models.
ZERO_MIN_SIZE = 1 << 15


def get_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = "data",
    local: bool = False,
    model: int = 1,
) -> Mesh:
    """Data mesh; ``model > 1`` adds a second ``model`` axis, laid out
    topology-aware via mesh_utils (model innermost) so the per-step
    param all-gathers ride adjacent ICI links on real slices.
    ``local=True`` restricts to this process's devices — required for
    paths that fetch results to the host (e.g. evaluation), since arrays
    spanning non-addressable devices cannot be fetched."""
    devices = jax.local_devices() if local else jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if model > 1:
        if len(devices) % model:
            raise ValueError(
                f"{len(devices)} devices not divisible by model={model}"
            )
        from jax.experimental import mesh_utils

        # enumeration order != physical adjacency on multi-chip slices;
        # create_device_mesh walks the torus (plain reshape on CPU/1-chip)
        grid = mesh_utils.create_device_mesh(
            (len(devices) // model, model), devices=devices
        )
        return Mesh(grid, (axis_name, "model"))
    return Mesh(np.asarray(devices), (axis_name,))


def _model_axis_size(mesh: Mesh) -> int:
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)


def param_partition_spec(
    shape, model: int, min_size: int = ZERO_MIN_SIZE
) -> P:
    """ZeRO-style partition spec for one parameter tensor: shard the
    largest dimension divisible by ``model`` over the ``model`` axis
    (ties broken toward the LAST such dim — output channels for conv
    kernels, the natural Megatron column split). Small tensors (biases,
    norm scales, < min_size elements) stay replicated: sharding them
    saves nothing and costs a collective each."""
    if model <= 1 or int(np.prod(shape)) < min_size:
        return P()
    best = None
    for i, d in enumerate(shape):
        if d % model == 0 and d >= model and (
            best is None or d >= shape[best]
        ):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = "model"
    return P(*spec)


def shard_params(mesh: Mesh, tree, min_size: int = ZERO_MIN_SIZE):
    """Place a parameter pytree sharded over the mesh ``model`` axis
    (replicated over ``data``) — the TPU-native analog of ZeRO-3/FSDP:
    each device stores 1/model of the large tensors; GSPMD inserts the
    all-gathers at use and reduce-scatters on the gradients. On a 1-D
    mesh this degrades to plain replication."""
    model = _model_axis_size(mesh)

    def place(x):
        spec = param_partition_spec(np.shape(x), model, min_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def init_sharded(mesh: Mesh, fn, *args, min_size: int = ZERO_MIN_SIZE):
    """jit ``fn(*args)`` with every output leaf placed by the ZeRO rule
    (shard the largest divisible dim over ``model``). Used for optimizer
    init: momentum buffers are zeros_like constants with no data
    dependence on the params, so plain sharding propagation is free to
    place them on a single device (observed on the CPU backend) — the
    explicit out_shardings pin them to their params' layout."""
    model = _model_axis_size(mesh)
    shapes = jax.eval_shape(fn, *args)
    out_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(
            mesh, param_partition_spec(s.shape, model, min_size)
        ),
        shapes,
    )
    return jax.jit(fn, out_shardings=out_shardings)(*args)


def place_like(like_tree, new_tree):
    """Place ``new_tree`` (host values) with the exact shardings of the
    live ``like_tree`` — used on resume so restored params/opt state keep
    the trainer's (possibly model-sharded) layout."""

    def put(like, new):
        if isinstance(like, jax.Array):
            return jax.device_put(np.asarray(new), like.sharding)
        return new

    return jax.tree_util.tree_map(put, like_tree, new_tree)


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
