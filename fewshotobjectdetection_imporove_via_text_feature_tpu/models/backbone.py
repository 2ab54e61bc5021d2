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
    26: (2, 2, 2, 2),  # tiny multi-block depth for tests only: exercises
    #                    identity-shortcut blocks (block1+) per stage
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class _SpaceToDepthStem(nn.Module):
    """The ResNet stem's 7x7 stride-2 conv as a 4x4 stride-1 conv over a
    2x2 space-to-depth input — arithmetically identical, MXU-friendly.

    With X2[i,j,(p,q,c)] = x[2i+p, 2j+q, c] and the 7x7 kernel zero-padded
    to 8x8 at the top-left (k_hat[u,v] = k[u-1,v-1]), the original output
    o[i,j] = sum_{u,v,c} k[u,v,c] x[2i+u-3, 2j+v-3, c] becomes a 4x4 conv
    over X2 with padding (2,1): o[i,j] = sum_{s,t,p,q,c} k_hat[2s+p, 2t+q, c]
    X2[i+s-2, j+t-2, (p,q,c)]. Parameter stays (7,7,3,C) = the reference
    layout (detectron2 stem, vendored resnet.py:560-590), so weight import
    is untouched.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    # input already in 2x2 space-to-depth layout (B, H/2, W/2, 4c), e.g.
    # shuffled on the host by the data loader (space_to_depth below) — the
    # on-device C=3 relayout costs ~1.6 ms/step at batch 8 otherwise
    pre_s2d: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        cin = c // 4 if self.pre_s2d else c
        k = self.param(
            "kernel",
            nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"
            ),
            (7, 7, cin, self.features),
        )
        # (7,7,c,o) -> zero-pad top-left -> (8,8,c,o) -> (4,2,4,2,c,o)
        # -> (s,t,p,q,c,o) -> (4,4,4c,o)
        k2 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k2 = k2.reshape(4, 2, 4, 2, cin, self.features)
        k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(
            4, 4, 4 * cin, self.features
        )
        if self.pre_s2d:
            x2 = x
        else:
            x2 = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h // 2, w // 2, 4 * c
            )
        return jax.lax.conv_general_dilated(
            x2.astype(self.dtype),
            k2.astype(self.dtype),
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def space_to_depth(arr):
    """Host-side 2x2 space-to-depth matching _SpaceToDepthStem's channel
    order: (H, W, C) -> (H/2, W/2, 4C) with channel index (p*2+q)*C + c.
    numpy in, numpy out; used by the data loader."""
    h, w, c = arr.shape
    a = arr.reshape(h // 2, 2, w // 2, 2, c)
    a = a.transpose(0, 2, 1, 3, 4)
    return a.reshape(h // 2, w // 2, 4 * c)


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
    def __call__(self, x, pre_s2d: bool = False):
        x = x.astype(self.dtype)
        # Stem: 7x7/2 + FrozenBN + relu + maxpool 3x3/2. The 7x7/2 conv over
        # 3 input channels runs the MXU at <10% (contraction depth 3); the
        # standard TPU space-to-depth transform (MLPerf ResNet) rewrites it
        # as an arithmetically identical 4x4/1 conv over a 2x2-depth-stacked
        # input (12 channels, contraction depth 192). The parameter keeps
        # the reference (7,7,3,C) layout so Caffe2/torch weight import is
        # unchanged; the kernel is rearranged at trace time. With
        # pre_s2d=True the input arrives already shuffled (host loader).
        if pre_s2d:
            x = _SpaceToDepthStem(
                self.stem_out_channels, name="stem_conv1", dtype=self.dtype,
                pre_s2d=True,
            )(x)
        elif x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = _SpaceToDepthStem(
                self.stem_out_channels, name="stem_conv1", dtype=self.dtype
            )(x)
        else:
            x = _conv(
                self.stem_out_channels, 7, 2, name="stem_conv1",
                dtype=self.dtype,
            )(x)
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
    3 bottlenecks, bottleneck 512, out 2048, first_stride 2.

    first_stride=1 is used with strided-bin-elided pooling (the ROI pooler
    already emitted only every 2nd bin, which is exactly what the stride-2
    conv1/shortcut of block0 would have read — see Res5ROIHeads); the
    parameter tree is identical either way.
    """

    num_groups: int = 1
    width_per_group: int = 64
    res2_out_channels: int = 256
    num_blocks: int = 3
    stride_in_1x1: bool = True
    first_stride: int = 2
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
            first_stride=self.first_stride,
            stride_in_1x1=self.stride_in_1x1,
            dtype=self.dtype,
            name="res5",
        )(x)
