"""Host space-to-depth input path: (B, H/2, W/2, 12) uint8 from the loader
must produce identical model outputs to the plain (B, H, W, 3) layout
(normalize is elementwise, so it commutes with the pixel shuffle; the stem
consumes the pre-shuffled layout directly — backbone.py _SpaceToDepthStem).
"""

import numpy as np
import jax
import jax.numpy as jnp

from fewshotobjectdetection_imporove_via_text_feature_tpu.models.backbone import (
    ResNetC4,
    space_to_depth,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.structures import (
    ImageBatch,
)


def test_space_to_depth_roundtrip_order():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, (6, 8, 3), dtype=np.uint8)
    y = space_to_depth(x)
    assert y.shape == (3, 4, 12)
    # channel index (p*2+q)*3 + c
    for p in range(2):
        for q in range(2):
            for c in range(3):
                np.testing.assert_array_equal(
                    y[:, :, (p * 2 + q) * 3 + c], x[p::2, q::2, c]
                )


def test_backbone_pre_s2d_matches_plain():
    bb = ResNetC4(
        depth=14, stem_out_channels=8, res2_out_channels=16, width_per_group=4
    )
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 32, 48, 3), jnp.float32)
    params = bb.init(jax.random.PRNGKey(0), x)["params"]
    full = bb.apply({"params": params}, x)["res4"]
    xs2d = jnp.stack([jnp.asarray(space_to_depth(np.asarray(im))) for im in x])
    pre = bb.apply({"params": params}, xs2d, pre_s2d=True)["res4"]
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full), atol=1e-5)


def test_model_end_to_end_s2d_matches_plain():
    import __graft_entry__ as ge

    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.meta_arch import (
        GeneralizedRCNN,
    )

    model = GeneralizedRCNN(
        num_classes=5, depth=14, stem_out_channels=8, res2_out_channels=16,
        width_per_group=4, freeze_at=0,
        rpn_pre_nms_topk=(128, 128), rpn_post_nms_topk=(32, 32),
        roi_batch_per_image=8,
    )
    images, gt = ge._tiny_batch(batch=2, h=128, w=128, g=4)
    variables = jax.jit(lambda r, i, g: model.init(r, i, g, train=True))(
        {
            "params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
        },
        images,
        gt,
    )
    imgs_s2d = np.stack(
        [space_to_depth(np.asarray(im)) for im in images.image]
    )
    images_s2d = ImageBatch(
        image=imgs_s2d, hw=images.hw, orig_hw=images.orig_hw
    )

    def losses(imgs):
        return model.apply(
            variables, imgs, gt, train=True,
            rngs={
                "sampling": jax.random.PRNGKey(3),
                "dropout": jax.random.PRNGKey(4),
            },
        )

    a = jax.device_get(losses(images))
    b = jax.device_get(losses(images_s2d))
    for k in a:
        np.testing.assert_allclose(b[k], a[k], rtol=2e-5, atol=1e-6, err_msg=k)


def test_device_resize_s2d_matches_plain():
    # the four sub-grid scale_and_translate passes must reproduce the full
    # resize exactly at the even/odd phases (same sample positions)
    from fewshotobjectdetection_imporove_via_text_feature_tpu.data.xla_preprocess import (
        device_resize_batch,
    )

    rng = np.random.RandomState(3)
    raw = rng.randint(0, 255, (2, 96, 128, 3), dtype=np.uint8)
    orig_hw = np.asarray([[90, 120], [96, 128]], np.int32)
    flip = np.asarray([False, True])
    short = np.asarray([48.0, 64.0], np.float32)

    full, hw_full = device_resize_batch(
        jnp.asarray(raw), jnp.asarray(orig_hw), jnp.asarray(flip),
        jnp.asarray(short), 96, (64, 96),
    )
    s2d, hw_s2d = device_resize_batch(
        jnp.asarray(raw), jnp.asarray(orig_hw), jnp.asarray(flip),
        jnp.asarray(short), 96, (64, 96), out_s2d=True,
    )
    np.testing.assert_array_equal(np.asarray(hw_s2d), np.asarray(hw_full))
    full = np.asarray(full)
    s2d = np.asarray(s2d)
    assert s2d.shape == (2, 32, 48, 12)
    for p in range(2):
        for q in range(2):
            for c in range(3):
                # sample positions computed as (i+0.5-t)/(s/2) vs
                # (2i+p+0.5)/s: same math, different f32 reassociation —
                # observed <=0.003 on the 0..255 pixel scale
                np.testing.assert_allclose(
                    s2d[:, :, :, (p * 2 + q) * 3 + c],
                    full[:, p::2, q::2, c],
                    atol=1e-2,
                )
