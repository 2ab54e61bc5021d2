"""Checkpoint save/load — pytree checkpoints with a last_checkpoint marker.

Parity with the reference's DetectionCheckpointer usage
(defrcn/checkpoint/detection_checkpoint.py:8-56 + fvcore Checkpointer):
checkpoints carry {params, opt_state, iteration}; ``last_checkpoint`` file
tracks the newest; ``resume_or_load`` semantics live in the Trainer.

Backends:
  * "orbax" (default): ocp.PyTreeCheckpointer directory checkpoints —
    durable, async-capable, multi-host-ready.
  * "pickle": single-file pure-numpy pytree (what tools/model_surgery.py
    edits; optax namedtuple states round-trip fine).

``load`` transparently reads either format.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def load_checkpoint_file(path: str) -> Dict[str, Any]:
    """Restore a checkpoint saved by either backend: an orbax directory
    checkpoint or a single-file pickle .ckpt. The ONE format dispatch —
    the weight importer and surgery tool route through here too."""
    if os.path.isdir(path):  # orbax directory checkpoint
        import orbax.checkpoint as ocp

        return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    with open(path, "rb") as f:
        return pickle.load(f)


class Checkpointer:
    def __init__(self, save_dir: str, backend: str = "pickle"):
        self.save_dir = save_dir
        self.backend = backend
        os.makedirs(save_dir, exist_ok=True)
        self._orbax = None
        self._writer = None  # lazy single-thread executor for save_async
        self._pending = None

    def _orbax_ckpt(self):
        if self._orbax is None:
            import orbax.checkpoint as ocp

            self._orbax = ocp.PyTreeCheckpointer()
        return self._orbax

    def save(self, state: Dict[str, Any], name: str):
        """Crash-safe save: a preemption mid-save must never corrupt the
        resume chain (SURVEY §5.3 crash-and-resume is the recovery
        model). Orbax is atomic by design (tmp dir + rename); the pickle
        path writes ``.tmp`` then ``os.replace`` so a truncated file is
        never visible under the final name — which matters doubly for
        ``model_final``, whose name a restarted run REUSES. The marker
        update is equally atomic and happens only after the checkpoint
        is durable."""
        state = _to_numpy(state)
        if self.backend == "orbax":
            path = os.path.abspath(os.path.join(self.save_dir, name + ".orbax"))
            self._orbax_ckpt().save(path, state, force=True)
            marker = name + ".orbax"
        else:
            path = os.path.join(self.save_dir, name + ".ckpt")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(state, f, protocol=4)
                # fsync before the rename: a journaled rename can land
                # while the data blocks are still in the page cache —
                # after an abrupt VM termination the final name would
                # hold a zero-length file (the preemptible-TPU failure
                # this path exists for)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
            marker = name + ".ckpt"
        marker_path = os.path.join(self.save_dir, "last_checkpoint")
        with open(marker_path + ".tmp", "w") as f:
            f.write(marker)
            f.flush()
            os.fsync(f.fileno())
        os.replace(marker_path + ".tmp", marker_path)
        # make the renames themselves durable
        dirfd = os.open(self.save_dir, os.O_RDONLY)
        try:
            os.fsync(dirfd)
        finally:
            os.close(dirfd)
        return path

    def save_async(self, state: Dict[str, Any], name: str):
        """Non-blocking ``save``: the host materialization happens here
        (so the caller's device buffers may be donated immediately after
        return), but pickling/serialization, fsync, and the marker rename
        run on a single background writer thread — the train loop overlaps
        disk IO with the next device steps instead of stalling.

        Writes stay strictly ordered (one writer thread); each call first
        drains the previous write so at most one checkpoint is in flight
        and any IO error surfaces on the NEXT save (or on ``wait()``).
        Crash safety is unchanged: every write is tmp+rename+fsync, so a
        kill mid-background-write never corrupts the resume chain. The
        reference has no analog (fvcore saves synchronously in-loop).

        Contract: jax.Array leaves are materialized to host HERE (device
        buffers are free to be donated after return); plain numpy leaves
        are NOT copied — the caller must not mutate them until the write
        drains (the Trainer passes fresh ``device_get`` output it drops)."""
        state = _to_numpy(state)
        self.wait()
        if self._writer is None:
            from concurrent.futures import ThreadPoolExecutor

            self._writer = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-writer"
            )
        self._pending = self._writer.submit(self.save, state, name)

    def wait(self):
        """Drain any in-flight ``save_async`` write; re-raise its error."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()

    def load(self, path: str) -> Dict[str, Any]:
        return load_checkpoint_file(path)

    def has_checkpoint(self) -> bool:
        self.wait()
        return os.path.exists(os.path.join(self.save_dir, "last_checkpoint"))

    def load_latest(self) -> Optional[Dict[str, Any]]:
        self.wait()
        marker = os.path.join(self.save_dir, "last_checkpoint")
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            name = f.read().strip()
        return self.load(os.path.join(self.save_dir, name))
