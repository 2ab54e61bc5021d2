"""StandardROIHeads (FPN-style ConvFC towers) smoke test."""

import functools

import numpy as np
import jax

from fewshotobjectdetection_imporove_via_text_feature_tpu.models import (
    GeneralizedRCNN,
)
from tests.test_model_smoke import tiny_batch
from tests.test_text_branch import TINY


def test_standard_roi_heads_train_and_infer():
    model = GeneralizedRCNN(roi_heads_name="StandardROIHeads", **TINY)
    images, gt = tiny_batch()
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sampling": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    params = jax.jit(functools.partial(model.init, train=True))(
        rngs, images, gt
    )
    losses = jax.jit(functools.partial(model.apply, train=True))(
        params, images, gt,
        rngs={"sampling": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    det = jax.jit(functools.partial(model.apply, train=False))(params, images)
    assert det.boxes.shape[0] == 2
