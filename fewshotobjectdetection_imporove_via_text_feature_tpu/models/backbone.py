"""ResNet C4 backbone with FrozenBN — flax.linen, NHWC, bf16-friendly.

Spec source: the reference's vendored copy of the true architecture it uses
(defrcn/modeling/backbone/resnet.py:560-646 — stem + res2..res4 to the RPN,
FrozenBN everywhere, freeze-at-3, stride_in_1x1 Caffe convention) and the
res5 stage built inside the ROI head (defrcn/modeling/roi_heads/
roi_heads.py:313-337: 3 bottlenecks, first_stride=2, out 2048).

TPU notes: NHWC layout (channels on the 128-lane axis), convs run on the
MXU via XLA; FrozenBN is a scale/shift folded into the conv epilogue by XLA
fusion. Parameter dtype stays float32; compute dtype is configurable
(bfloat16 by default).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# ResNet stage specs: depth -> blocks per stage (res2, res3, res4, res5).
RESNET_STAGES = {
    14: (1, 1, 1, 1),  # tiny depth for tests only
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class FrozenBN(nn.Module):
    """BatchNorm with fixed statistics and affine params (never updated).

    Matches detectron2 FrozenBatchNorm2d: y = (x - mean) / sqrt(var + eps)
    * weight + bias with eps folded the Caffe2 way (1e-5).
    """

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param(
            "running_mean", nn.initializers.zeros, (self.features,)
        )
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = weight / jnp.sqrt(var + self.eps)
        shift = bias - mean * scale
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


def _conv(
    features, kernel, stride=1, dilation=1, name=None, dtype=jnp.float32,
    zero_init=False,
):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=(
            nn.initializers.zeros
            if zero_init
            else nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"
            )
        ),
        name=name,
    )


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with FrozenBN and optional projection
    shortcut. stride_in_1x1=True puts the stride on conv1 (Caffe/MSRA)."""

    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        in_channels = x.shape[-1]

        out = _conv(self.bottleneck_channels, 1, s1, name="conv1", dtype=self.dtype)(x)
        out = FrozenBN(self.bottleneck_channels, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)

        out = _conv(
            self.bottleneck_channels, 3, s3, self.dilation, name="conv2", dtype=self.dtype
        )(out)
        out = FrozenBN(self.bottleneck_channels, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)

        # conv3 zero-init: with identity FrozenBN a randomly-initialized
        # deep ResNet explodes (no live normalization); zero residuals keep
        # random-init activations bounded. Pretrained loads overwrite this.
        out = _conv(
            self.out_channels, 1, 1, name="conv3", dtype=self.dtype,
            zero_init=True,
        )(out)
        out = FrozenBN(self.out_channels, dtype=self.dtype, name="bn3")(out)

        if in_channels != self.out_channels or self.stride != 1:
            sc = _conv(self.out_channels, 1, self.stride, name="shortcut", dtype=self.dtype)(x)
            sc = FrozenBN(self.out_channels, dtype=self.dtype, name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResStage(nn.Module):
    """A sequence of bottleneck blocks; the first carries the stride."""

    num_blocks: int
    bottleneck_channels: int
    out_channels: int
    first_stride: int
    stride_in_1x1: bool = True
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = BottleneckBlock(
                bottleneck_channels=self.bottleneck_channels,
                out_channels=self.out_channels,
                stride=self.first_stride if i == 0 else 1,
                stride_in_1x1=self.stride_in_1x1,
                dilation=self.dilation,
                dtype=self.dtype,
                name=f"block{i}",
            )(x)
        return x


class ResNetC4(nn.Module):
    """Stem + res2..res4 (stride 16 output), the RPN/ROI trunk.

    Output: res4 feature map (B, H/16, W/16, 1024) for R-101 defaults.
    """

    depth: int = 101
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    freeze_at: int = 0  # 1 = stem, 2 = +res2, 3 = +res3, 4 = +res4
    remat: bool = False  # rematerialize stages on backward (saves HBM)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        # Stem: 7x7/2 + FrozenBN + relu + maxpool 3x3/2.
        x = _conv(self.stem_out_channels, 7, 2, name="stem_conv1", dtype=self.dtype)(x)
        x = FrozenBN(self.stem_out_channels, dtype=self.dtype, name="stem_bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(
            x, window_shape=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        blocks = RESNET_STAGES[self.depth]
        bottleneck = self.num_groups * self.width_per_group  # 64
        out_ch = self.res2_out_channels  # 256
        stage_cls = nn.remat(ResStage) if self.remat else ResStage
        feats = {}
        for stage_idx, (name, n) in enumerate(
            zip(("res2", "res3", "res4"), blocks[:3])
        ):
            x = stage_cls(
                num_blocks=n,
                bottleneck_channels=bottleneck * (2**stage_idx),
                out_channels=out_ch * (2**stage_idx),
                first_stride=1 if stage_idx == 0 else 2,
                stride_in_1x1=self.stride_in_1x1,
                dtype=self.dtype,
                name=name,
            )(x)
            # detectron2 freeze semantics: stage idx starts at 2 for res2.
            if self.freeze_at >= stage_idx + 2:
                x = jax.lax.stop_gradient(x)
            feats[name] = x
        return feats


class Res5Stage(nn.Module):
    """res5 block used inside the C4 ROI head (ref roi_heads.py:313-337):
    3 bottlenecks, bottleneck 512, out 2048, first_stride 2."""

    num_groups: int = 1
    width_per_group: int = 64
    res2_out_channels: int = 256
    num_blocks: int = 3
    stride_in_1x1: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        factor = 2**3
        bottleneck = self.num_groups * self.width_per_group * factor  # 512
        out_channels = self.res2_out_channels * factor  # 2048
        return ResStage(
            num_blocks=self.num_blocks,
            bottleneck_channels=bottleneck,
            out_channels=out_channels,
            first_stride=2,
            stride_in_1x1=self.stride_in_1x1,
            dtype=self.dtype,
            name="res5",
        )(x)
