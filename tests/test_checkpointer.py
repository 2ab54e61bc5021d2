"""Checkpointer backends round-trip (pickle + orbax)."""

import numpy as np
import optax
import pytest

from fewshotobjectdetection_imporove_via_text_feature_tpu.checkpoint import (
    Checkpointer,
)


def _state():
    params = {"layer": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4)}}
    tx = optax.sgd(0.1, momentum=0.9)
    opt_state = tx.init(params)
    return {"params": params, "opt_state": opt_state, "iteration": 42}


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


def test_pickle_readable_after_orbax_switch(tmp_path):
    ck = Checkpointer(str(tmp_path), backend="pickle")
    ck.save(_state(), "a")
    ck2 = Checkpointer(str(tmp_path), backend="orbax")
    ck2.save(_state(), "b")
    # latest is orbax; explicit pickle load still works
    assert int(ck2.load_latest()["iteration"]) == 42
    assert int(ck2.load(str(tmp_path / "a.ckpt"))["iteration"]) == 42