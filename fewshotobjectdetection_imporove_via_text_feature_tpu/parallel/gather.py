"""Cross-process gather of host python objects — the TPU-native analog of
the reference's ``comm.gather`` (detectron2 comm, used by the evaluators at
pascal_voc_evaluation.py:84 / coco_evaluation.py:80, which pickles python
objects over torch.distributed).

jax only moves arrays between processes, so objects ride as pickled uint8
payloads through ``multihost_utils.process_allgather`` (size exchange first,
then the padded payload). Every process receives every object — comm.gather
+ broadcast semantics, which lets all ranks compute full metrics.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np

_rendezvoused = False


def _first_gather_rendezvous():
    """Once per process, before the first real all-gather on a CPU
    backend: ranks reach their first eval-time collective skewed by the
    eval program's compile time; the gloo communicator init only tolerates
    ~30 s of that (see parallel.mesh.coordination_barrier). Every rank
    calls allgather_pyobj in the same order (lockstep contract), so a
    once-per-process barrier is consistent."""
    global _rendezvoused
    if _rendezvoused:
        return
    _rendezvoused = True
    import jax

    if jax.default_backend() == "cpu":
        from .mesh import coordination_barrier

        coordination_barrier("fsodtf/first_allgather")


def allgather_pyobj(obj: Any) -> List[Any]:
    """All-gather an arbitrary picklable object across jax processes."""
    import jax

    if jax.process_count() == 1:
        return [obj]
    _first_gather_rendezvous()
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    size = np.asarray([payload.size], np.int32)
    sizes = np.asarray(multihost_utils.process_allgather(size)).reshape(-1)
    m = int(sizes.max())
    padded = np.zeros((m,), np.uint8)
    padded[: payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(jax.process_count(), m)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes())
        for i in range(gathered.shape[0])
    ]
