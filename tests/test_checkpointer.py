"""Checkpointer backends round-trip (pickle + orbax), including the
optimizer state (momentum buffers) and the last_checkpoint marker."""

import os
import numpy as np
import optax
import pytest

from fewshotobjectdetection_imporove_via_text_feature_tpu.checkpoint import (
    Checkpointer,
)


def _state(iteration=42, fill=None):
    params = {"layer": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4)}}
    if fill is not None:
        params["layer"]["kernel"] = np.full((3, 4), fill, np.float32)
    tx = optax.sgd(0.1, momentum=0.9)
    opt_state = tx.init(params)
    # give the momentum buffer a nonzero, recognizable value so a backend
    # that drops/zeroes opt_state cannot pass the roundtrip
    import jax

    opt_state = jax.tree_util.tree_map(
        lambda x: np.full_like(np.asarray(x), 0.25) if np.asarray(x).ndim else x,
        opt_state,
    )
    return {"params": params, "opt_state": opt_state, "iteration": iteration}


@pytest.mark.parametrize("backend", ["pickle", "orbax"])
def test_roundtrip(tmp_path, backend):
    ck = Checkpointer(str(tmp_path), backend=backend)
    state = _state()
    ck.save(state, "model_0000042")
    assert ck.has_checkpoint()
    back = ck.load_latest()
    assert int(back["iteration"]) == 42
    np.testing.assert_allclose(
        back["params"]["layer"]["kernel"],
        state["params"]["layer"]["kernel"],
    )
    # optimizer state (momentum) survives too — a resume with zeroed
    # momentum is a silent accuracy regression
    import jax

    flat_a = jax.tree_util.tree_leaves(back["opt_state"])
    flat_b = jax.tree_util.tree_leaves(state["opt_state"])
    assert len(flat_a) == len(flat_b) and len(flat_a) > 0
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_pickle_readable_after_orbax_switch(tmp_path):
    # DISTINCT states: the marker must resolve to the newest (orbax) one
    ck = Checkpointer(str(tmp_path), backend="pickle")
    ck.save(_state(iteration=42, fill=1.0), "a")
    ck2 = Checkpointer(str(tmp_path), backend="orbax")
    ck2.save(_state(iteration=43, fill=2.0), "b")
    latest = ck2.load_latest()
    assert int(latest["iteration"]) == 43
    np.testing.assert_allclose(
        np.asarray(latest["params"]["layer"]["kernel"]),
        np.full((3, 4), 2.0),
    )
    # explicit pickle load still works
    old = ck2.load(str(tmp_path / "a.ckpt"))
    assert int(old["iteration"]) == 42
    np.testing.assert_allclose(
        np.asarray(old["params"]["layer"]["kernel"]), np.full((3, 4), 1.0)
    )


def test_save_is_crash_safe(tmp_path):
    """A preemption mid-save must not corrupt the resume chain: the
    previously saved file under the SAME name (model_final reuse on
    restart) stays intact and load_latest keeps working."""
    ck = Checkpointer(str(tmp_path), backend="pickle")
    ck.save(_state(iteration=7, fill=1.0), "model_final")

    class _Bomb:
        """Dies when pickle reaches it — simulating a preemption after
        part of the stream has already been written."""

        def __reduce__(self):
            raise KeyboardInterrupt("preempted mid-save")

    bad = _state(iteration=8, fill=2.0)
    bad["params"]["layer"]["bomb"] = _Bomb()
    try:
        ck.save(bad, "model_final")
    except KeyboardInterrupt:
        pass

    # no partial file visible under the final name; marker still loads
    latest = ck.load_latest()
    assert int(latest["iteration"]) == 7
    np.testing.assert_allclose(
        np.asarray(latest["params"]["layer"]["kernel"]), np.full((3, 4), 1.0)
    )
    # the aborted temp file is the only debris (never the .ckpt itself)
    assert not any(
        f.endswith(".ckpt") and "tmp" in f for f in os.listdir(tmp_path)
    )


def test_save_async_roundtrip_ordered(tmp_path):
    """save_async drains to the same on-disk artifacts as save: two
    back-to-back async saves land in order, the marker tracks the last,
    and load_latest (which drains the writer) sees the final state."""
    ck = Checkpointer(str(tmp_path), backend="pickle")
    ck.save_async(_state(iteration=1, fill=1.0), "model_0000001")
    ck.save_async(_state(iteration=2, fill=2.0), "model_0000002")
    latest = ck.load_latest()  # implicit wait()
    assert int(latest["iteration"]) == 2
    np.testing.assert_allclose(
        np.asarray(latest["params"]["layer"]["kernel"]), np.full((3, 4), 2.0)
    )
    # both checkpoints durable, no temp debris
    files = sorted(os.listdir(tmp_path))
    assert "model_0000001.ckpt" in files and "model_0000002.ckpt" in files
    assert not any(".tmp" in f for f in files)
    # the earlier write is the earlier state (ordering, not last-wins)
    first = ck.load(os.path.join(str(tmp_path), "model_0000001.ckpt"))
    assert int(first["iteration"]) == 1


def test_save_async_surfaces_write_errors(tmp_path):
    """An IO failure on the background writer must not be silent: it
    re-raises on the next save_async()/wait() so the run dies instead of
    training on while producing no checkpoints."""
    ck = Checkpointer(str(tmp_path), backend="pickle")

    class _Bomb:
        def __reduce__(self):
            raise OSError("disk full")

    bad = _state(iteration=1)
    bad["params"]["layer"]["bomb"] = _Bomb()
    ck.save_async(bad, "model_0000001")
    with pytest.raises(OSError, match="disk full"):
        ck.wait()
    # the writer recovers: a subsequent good save works
    ck.save_async(_state(iteration=2, fill=3.0), "model_0000002")
    ck.wait()
    assert int(ck.load_latest()["iteration"]) == 2
