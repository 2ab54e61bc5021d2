"""Plain-torch re-assembly of the reference's COMPLETE GeneralizedRCNN
(DeFRCN C4 flagship) — the full-network numeric oracle.

Built WITHOUT detectron2, directly from the reference's vendored spec files
(each routine cites its spec below):

  * FrozenBN ResNet C4 backbone    /root/reference/defrcn/modeling/backbone/resnet.py:560-646
  * GDL + AffineLayer              /root/reference/defrcn/modeling/meta_arch/gdl.py:6-38
  * meta-arch wiring               /root/reference/defrcn/modeling/meta_arch/rcnn.py:83-107
  * StandardRPNHead + RPN          /root/reference/defrcn/modeling/proposal_generator/rpn.py:32-504
  * proposal selection             /root/reference/defrcn/modeling/proposal_generator/proposal_utils.py:13-120
  * ROI match/sample + Res5 head   /root/reference/defrcn/modeling/roi_heads/roi_heads.py:118-386
  * FastRCNN losses + inference    /root/reference/defrcn/modeling/roi_heads/fast_rcnn.py:90-360
  * ROIAlignV2 (aligned, adaptive) torchvision ROIAlign forward formula, as
    consumed via ROIPooler at roi_heads.py:300-305 (sampling_ratio=0)
  * greedy NMS                     torchvision batched_nms semantics
    (fast_rcnn.py:125; strict-> suppression, score-desc order)

Module names and parameter layouts follow detectron2 state-dict naming, so
`checkpoint.torch_import.export_d2_state` output loads directly via
``load_state_dict`` — the SAME translated weights drive both frameworks.

Deviation mirrored from our build (documented, PARITY.md #13): images are
padded with ZERO PIXELS before normalization (the reference normalizes
first and pads zeros after, ImageList.from_tensors — rcnn.py:105-107), so
padded cells differ by (0-mean)/std vs 0. The oracle test also runs
padding-free images where the two conventions coincide.

This module is TEST-ONLY: torch-side oracle code, never imported by the
framework.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

SCALE_CLAMP = math.log(1000.0 / 16.0)  # d2 Box2BoxTransform._DEFAULT_SCALE_CLAMP


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------
class FrozenBN(nn.Module):
    """d2 FrozenBatchNorm2d (vendored resnet.py uses norm="FrozenBN"):
    y = (x - mean) / sqrt(var + 1e-5) * weight + bias, all constants."""

    def __init__(self, c):
        super().__init__()
        self.register_buffer("weight", torch.ones(c))
        self.register_buffer("bias", torch.zeros(c))
        self.register_buffer("running_mean", torch.zeros(c))
        self.register_buffer("running_var", torch.ones(c))

    def forward(self, x):
        scale = self.weight / torch.sqrt(self.running_var + 1e-5)
        shift = self.bias - self.running_mean * scale
        return x * scale.view(1, -1, 1, 1) + shift.view(1, -1, 1, 1)


def _conv(cin, cout, k, stride=1):
    return nn.Conv2d(cin, cout, k, stride=stride, padding=(k - 1) // 2, bias=False)


class _ConvNorm(nn.Module):
    """Conv2d with a .norm child — matches d2's Conv2d(norm=...) naming
    (state-dict keys <name>.weight and <name>.norm.*)."""

    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        inner = _conv(cin, cout, k, stride)
        self.weight = inner.weight  # expose as <name>.weight like d2 Conv2d
        self._inner = [inner]  # hide from submodule registration
        self.norm = FrozenBN(cout)

    def forward(self, x):
        inner = self._inner[0]
        return self.norm(
            F.conv2d(x, self.weight, None, inner.stride, inner.padding)
        )


class BottleneckBlock(nn.Module):
    """Vendored resnet.py:75-167: 1x1 -> 3x3 -> 1x1, FrozenBN after each,
    relu after the residual add; stride_in_1x1 puts the stride on conv1 and
    the 1x1 shortcut."""

    def __init__(self, cin, bottleneck, cout, stride=1, stride_in_1x1=True):
        super().__init__()
        s1, s3 = (stride, 1) if stride_in_1x1 else (1, stride)
        self.conv1 = _ConvNorm(cin, bottleneck, 1, s1)
        self.conv2 = _ConvNorm(bottleneck, bottleneck, 3, s3)
        self.conv3 = _ConvNorm(bottleneck, cout, 1, 1)
        if cin != cout or stride != 1:
            self.shortcut = _ConvNorm(cin, cout, 1, stride)
        else:
            self.shortcut = None

    def forward(self, x):
        out = F.relu(self.conv1(x))
        out = F.relu(self.conv2(out))
        out = self.conv3(out)
        sc = self.shortcut(x) if self.shortcut is not None else x
        return F.relu(out + sc)


class Stem(nn.Module):
    """Vendored resnet.py:560-590 (BasicStem): 7x7/2 conv + FrozenBN +
    relu + 3x3/2 maxpool."""

    def __init__(self, cout):
        super().__init__()
        self.conv1 = _ConvNorm(3, cout, 7, 2)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        return F.max_pool2d(x, kernel_size=3, stride=2, padding=1)


class Backbone(nn.Module):
    """Stem + res2..res4 (vendored resnet.py:596-646, C4 output)."""

    def __init__(self, stem_out, res2_out, width_per_group, blocks,
                 stride_in_1x1=True):
        super().__init__()
        self.stem = Stem(stem_out)
        cin = stem_out
        for i, (name, n) in enumerate(zip(("res2", "res3", "res4"), blocks)):
            stage = nn.Sequential(
                *[
                    BottleneckBlock(
                        cin if j == 0 else res2_out * 2**i,
                        width_per_group * 2**i,
                        res2_out * 2**i,
                        stride=(1 if i == 0 else 2) if j == 0 else 1,
                        stride_in_1x1=stride_in_1x1,
                    )
                    for j in range(n)
                ]
            )
            setattr(self, name, stage)
            cin = res2_out * 2**i

    def forward(self, x):
        x = self.stem(x)
        x = self.res2(x)
        x = self.res3(x)
        return self.res4(x)


class _GradScale(torch.autograd.Function):
    """GDL: identity forward, grad x lambda backward (gdl.py:6-17)."""

    @staticmethod
    def forward(ctx, x, lam):
        ctx.lam = lam
        return x.clone()

    @staticmethod
    def backward(ctx, g):
        return g * ctx.lam, None


def decouple_layer(x, lam):
    return _GradScale.apply(x, lam)


class AffineLayer(nn.Module):
    """gdl.py:19-34: per-channel scale + bias, params shaped (1, C, 1, 1)."""

    def __init__(self, c, bias=True):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(1, c, 1, 1))
        self.bias = nn.Parameter(torch.zeros(1, c, 1, 1)) if bias else None

    def forward(self, x):
        out = x * self.weight
        if self.bias is not None:
            out = out + self.bias
        return out


class RPNHead(nn.Module):
    """StandardRPNHead (vendored rpn.py:32-100): shared 3x3 conv + relu,
    1x1 objectness, 1x1 deltas."""

    def __init__(self, c, num_anchors):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)
        self.objectness_logits = nn.Conv2d(c, num_anchors, 1)
        self.anchor_deltas = nn.Conv2d(c, num_anchors * 4, 1)

    def forward(self, x):
        t = F.relu(self.conv(x))
        return self.objectness_logits(t), self.anchor_deltas(t)


# ---------------------------------------------------------------------------
# box / anchor / nms helpers
# ---------------------------------------------------------------------------
def cell_anchors(sizes, aspect_ratios):
    """d2 DefaultAnchorGenerator.generate_cell_anchors: sizes outer x
    ratios inner, zero-centered."""
    out = []
    for size in sizes:
        area = float(size) ** 2
        for ratio in aspect_ratios:
            w = math.sqrt(area / ratio)
            h = w * ratio
            out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return torch.tensor(out, dtype=torch.float32)


def grid_anchors(feat_hw, stride, sizes, aspect_ratios):
    """d2 _create_grid_offsets + broadcast (offset 0): index
    (y * W + x) * A + a, matching the head's (H, W, A) flattening."""
    cell = cell_anchors(sizes, aspect_ratios)
    h, w = feat_hw
    sx = torch.arange(w, dtype=torch.float32) * stride
    sy = torch.arange(h, dtype=torch.float32) * stride
    gy, gx = torch.meshgrid(sy, sx, indexing="ij")
    shifts = torch.stack([gx, gy, gx, gy], dim=-1).reshape(-1, 1, 4)
    return (shifts + cell.view(1, -1, 4)).reshape(-1, 4)


def pairwise_iou(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = torch.maximum(a[:, None, :2], b[None, :, :2])
    rb = torch.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return torch.where(union > 0, inter / union.clamp(min=1e-30), torch.zeros(()))


def get_deltas(src, target, weights):
    """Box2BoxTransform.get_deltas."""
    wx, wy, ww, wh = weights
    sw = src[:, 2] - src[:, 0]
    sh = src[:, 3] - src[:, 1]
    scx = src[:, 0] + 0.5 * sw
    scy = src[:, 1] + 0.5 * sh
    tw = target[:, 2] - target[:, 0]
    th = target[:, 3] - target[:, 1]
    tcx = target[:, 0] + 0.5 * tw
    tcy = target[:, 1] + 0.5 * th
    return torch.stack(
        [
            wx * (tcx - scx) / sw,
            wy * (tcy - scy) / sh,
            ww * torch.log(tw / sw),
            wh * torch.log(th / sh),
        ],
        dim=1,
    )


def apply_deltas(deltas, boxes, weights):
    """Box2BoxTransform.apply_deltas — deltas (N, K*4), boxes (N, 4)."""
    wx, wy, ww, wh = weights
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    dx = deltas[:, 0::4] / wx
    dy = deltas[:, 1::4] / wy
    dw = (deltas[:, 2::4] / ww).clamp(max=SCALE_CLAMP)
    dh = (deltas[:, 3::4] / wh).clamp(max=SCALE_CLAMP)
    pcx = dx * w[:, None] + cx[:, None]
    pcy = dy * h[:, None] + cy[:, None]
    pw = torch.exp(dw) * w[:, None]
    ph = torch.exp(dh) * h[:, None]
    out = torch.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph],
        dim=2,
    )  # (N, K, 4)
    return out.reshape(deltas.shape[0], -1)


def clip_boxes(boxes, hw):
    h, w = hw
    return torch.stack(
        [
            boxes[:, 0].clamp(0, w),
            boxes[:, 1].clamp(0, h),
            boxes[:, 2].clamp(0, w),
            boxes[:, 3].clamp(0, h),
        ],
        dim=1,
    )


def nms(boxes, scores, thresh):
    """torchvision greedy NMS: score-descending, suppress IoU > thresh
    (strict). Returns kept indices in score order."""
    order = torch.argsort(scores, descending=True, stable=True)
    suppressed = torch.zeros(boxes.shape[0], dtype=torch.bool)
    keep = []
    iou = pairwise_iou(boxes, boxes)
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
        suppressed[i] = True
    return torch.tensor(keep, dtype=torch.long)


def batched_nms(boxes, scores, idxs, thresh):
    """torchvision batched_nms via the coordinate-offset trick."""
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.long)
    max_coord = boxes.max()
    offsets = idxs.to(boxes.dtype) * (max_coord + 1)
    return nms(boxes + offsets[:, None], scores, thresh)


def roi_align(feat, boxes, out_size, scale, sampling_ratio=0):
    """ROIAlignV2 (aligned=True) with d2's adaptive sampling_ratio=0:
    per-ROI-per-axis grid count ceil(roi_size / out_size); sample
    positions (i + 0.5) * bin / g; bilinear with the CUDA boundary rule
    (out-of-[-1, size] -> 0; clamp to [0, size-1] otherwise).

    feat (C, H, W); boxes (R, 4) image coords. Returns (R, C, P, P).
    Differentiable wrt feat (plain tensor ops)."""
    c, h, w = feat.shape
    outs = []
    p = out_size
    for r in range(boxes.shape[0]):
        x1, y1, x2, y2 = (boxes[r] * scale - 0.5).tolist()
        roi_w = x2 - x1
        roi_h = y2 - y1
        bin_w = roi_w / p
        bin_h = roi_h / p
        gx = sampling_ratio if sampling_ratio > 0 else int(math.ceil(bin_w))
        gy = sampling_ratio if sampling_ratio > 0 else int(math.ceil(bin_h))
        gx = max(gx, 1)
        gy = max(gy, 1)
        ys = y1 + (torch.arange(p * gy, dtype=feat.dtype) + 0.5) * (bin_h / gy)
        xs = x1 + (torch.arange(p * gx, dtype=feat.dtype) + 0.5) * (bin_w / gx)
        yy = ys[:, None].expand(p * gy, p * gx)
        xx = xs[None, :].expand(p * gy, p * gx)
        oob = (yy < -1.0) | (yy > h) | (xx < -1.0) | (xx > w)
        y = yy.clamp(0.0, h - 1.0)
        x = xx.clamp(0.0, w - 1.0)
        y0 = torch.floor(y)
        x0 = torch.floor(x)
        y1c = (y0 + 1).clamp(max=h - 1)
        x1c = (x0 + 1).clamp(max=w - 1)
        ly = y - y0
        lx = x - x0
        flat = feat.reshape(c, h * w)

        def take(yi, xi):
            return flat[:, (yi.long() * w + xi.long()).reshape(-1)].reshape(
                c, p * gy, p * gx
            )

        val = (
            take(y0, x0) * ((1 - ly) * (1 - lx))
            + take(y0, x1c) * ((1 - ly) * lx)
            + take(y1c, x0) * (ly * (1 - lx))
            + take(y1c, x1c) * (ly * lx)
        )
        val = torch.where(oob, torch.zeros((), dtype=feat.dtype), val)
        pooled = val.reshape(c, p, gy, p, gx).mean(dim=(2, 4))
        outs.append(pooled)
    return torch.stack(outs)


# ---------------------------------------------------------------------------
# matcher / sampler (exhaustive mode)
# ---------------------------------------------------------------------------
def match(iou, thresholds, labels, allow_low_quality):
    """d2 Matcher.__call__ + set_low_quality_matches_."""
    if iou.shape[0] == 0:
        return (
            torch.zeros(iou.shape[1], dtype=torch.long),
            torch.full((iou.shape[1],), labels[0], dtype=torch.long),
        )
    vals, idx = iou.max(dim=0)
    out = torch.full(vals.shape, labels[0], dtype=torch.long)
    lows = list(thresholds)
    highs = list(thresholds[1:]) + [float("inf")]
    for lab, lo, hi in zip(labels[1:], lows, highs):
        out[(vals >= lo) & (vals < hi)] = lab
    if allow_low_quality:
        highest = iou.max(dim=1).values
        # PARITY deviation #5: require IoU > 0 for low-quality promotion
        best = (iou >= highest[:, None]) & (highest[:, None] > 0)
        out[best.any(dim=0)] = 1
    return idx, out


# ---------------------------------------------------------------------------
# the full network
# ---------------------------------------------------------------------------
class TorchGeneralizedRCNN(nn.Module):
    """The reference's GeneralizedRCNN assembled in plain torch.

    Exhaustive-sampling mode: RPN/ROI batch sizes are taken to cover every
    candidate, removing sampling randomness so train-mode losses are
    deterministic functions of (weights, inputs) on both frameworks."""

    def __init__(
        self,
        num_classes,
        stem_out=8,
        res2_out=16,
        width_per_group=4,
        blocks=(1, 1, 1),
        res5_blocks=1,
        anchor_sizes=(32, 64, 128, 256, 512),
        aspect_ratios=(0.5, 1.0, 2.0),
        stride=16,
        rpn_pre_nms=1200,
        rpn_post_nms=300,
        rpn_nms_thresh=0.7,
        rpn_batch=100000,  # exhaustive
        roi_batch=100000,  # exhaustive
        roi_iou_threshold=0.5,
        rpn_iou_thresholds=(0.3, 0.7),
        box_reg_weights=(10.0, 10.0, 5.0, 5.0),
        lambda_rpn=0.0,
        lambda_rcnn=0.75,
        test_score_thresh=0.05,
        test_nms_thresh=0.5,
        test_topk=100,
        pixel_mean=(103.530, 116.280, 123.675),
        pixel_std=(1.0, 1.0, 1.0),
        stride_in_1x1=True,  # MODEL.RESNETS.STRIDE_IN_1X1 (resnet.py:390-404)
    ):
        super().__init__()
        self.num_classes = num_classes
        self.backbone = Backbone(
            stem_out, res2_out, width_per_group, blocks,
            stride_in_1x1=stride_in_1x1,
        )
        c4 = res2_out * 4
        a = len(anchor_sizes) * len(aspect_ratios)

        class _PG(nn.Module):
            def __init__(self):
                super().__init__()
                self.rpn_head = RPNHead(c4, a)

        class _RH(nn.Module):
            def __init__(self):
                super().__init__()
                # res5 (roi_heads.py:313-337): bottleneck x8, out x8, stride 2
                cin = c4
                blocks5 = []
                for j in range(res5_blocks):
                    blocks5.append(
                        BottleneckBlock(
                            cin if j == 0 else res2_out * 8,
                            width_per_group * 8,
                            res2_out * 8,
                            stride=2 if j == 0 else 1,
                            stride_in_1x1=stride_in_1x1,
                        )
                    )
                    cin = res2_out * 8
                self.res5 = nn.Sequential(*blocks5)
                self.box_predictor = nn.Module()
                self.box_predictor.cls_score = nn.Linear(
                    res2_out * 8, num_classes + 1
                )
                self.box_predictor.bbox_pred = nn.Linear(
                    res2_out * 8, num_classes * 4
                )

        self.proposal_generator = _PG()
        self.roi_heads = _RH()
        self.affine_rpn = AffineLayer(c4, bias=True)
        self.affine_rcnn = AffineLayer(c4, bias=True)

        self.anchor_sizes = anchor_sizes
        self.aspect_ratios = aspect_ratios
        self.stride = stride
        self.rpn_pre_nms = rpn_pre_nms
        self.rpn_post_nms = rpn_post_nms
        self.rpn_nms_thresh = rpn_nms_thresh
        self.rpn_batch = rpn_batch
        self.roi_batch = roi_batch
        self.roi_iou_threshold = roi_iou_threshold
        self.rpn_iou_thresholds = rpn_iou_thresholds
        self.box_reg_weights = box_reg_weights
        self.lambda_rpn = lambda_rpn
        self.lambda_rcnn = lambda_rcnn
        self.test_score_thresh = test_score_thresh
        self.test_nms_thresh = test_nms_thresh
        self.test_topk = test_topk
        self.register_buffer(
            "pixel_mean", torch.tensor(pixel_mean).view(1, 3, 1, 1)
        )
        self.register_buffer(
            "pixel_std", torch.tensor(pixel_std).view(1, 3, 1, 1)
        )

    # -- shared trunk ------------------------------------------------------
    def _features(self, images):
        """images: (B, 3, H, W) float pixels, already padded (zero PIXELS —
        our build's convention, PARITY #13; the reference pads zeros after
        normalize)."""
        x = (images - self.pixel_mean) / self.pixel_std
        feat = self.backbone(x)
        feat_rpn = self.affine_rpn(decouple_layer(feat, self.lambda_rpn))
        feat_rcnn = self.affine_rcnn(decouple_layer(feat, self.lambda_rcnn))
        return feat, feat_rpn, feat_rcnn

    def _rpn_out(self, feat_rpn):
        logits, deltas = self.proposal_generator.rpn_head(feat_rpn)
        b, a, h, w = logits.shape
        # d2 RPN.forward reshape: (N, A, H, W) -> (N, H*W*A)
        logits = logits.permute(0, 2, 3, 1).reshape(b, -1)
        # (N, A*4, H, W) -> (N, A, 4, H, W) -> (N, H, W, A, 4) -> (N, HWA, 4)
        deltas = (
            deltas.view(b, a, 4, h, w)
            .permute(0, 3, 4, 1, 2)
            .reshape(b, -1, 4)
        )
        anchors = grid_anchors((h, w), self.stride, self.anchor_sizes,
                               self.aspect_ratios)
        return logits, deltas, anchors

    def _select_proposals(self, logits, deltas, anchors, image_hw):
        """find_top_rpn_proposals (proposal_utils.py:13-120), single level."""
        props = []
        for i in range(logits.shape[0]):
            with torch.no_grad():
                decoded = apply_deltas(deltas[i], anchors, (1.0,) * 4)
                k = min(self.rpn_pre_nms, logits.shape[1])
                scores, idx = torch.sort(logits[i], descending=True)
                scores = scores[:k]
                boxes = decoded.view(-1, 4)[idx[:k]]
                boxes = clip_boxes(boxes, image_hw[i])
                keep = (boxes[:, 2] - boxes[:, 0] > 0) & (
                    boxes[:, 3] - boxes[:, 1] > 0
                )
                boxes, scores = boxes[keep], scores[keep]
                keep = nms(boxes, scores, self.rpn_nms_thresh)
                keep = keep[: self.rpn_post_nms]
                props.append((boxes[keep], scores[keep]))
        return props

    # -- training ----------------------------------------------------------
    def losses(self, images, image_hw, gt_boxes, gt_classes):
        """Full train-mode loss dict {loss_rpn_cls, loss_rpn_loc, loss_cls,
        loss_box_reg} with exhaustive sampling.

        gt_boxes: list of (Gi, 4); gt_classes: list of (Gi,)."""
        feat, feat_rpn, feat_rcnn = self._features(images)
        logits, deltas, anchors = self._rpn_out(feat_rpn)
        b = images.shape[0]

        # --- RPN labels (rpn.py:269-325), exhaustive subsample ---
        gt_labels_all, matched_boxes_all = [], []
        for i in range(b):
            iou = pairwise_iou(gt_boxes[i], anchors)
            midx, labels = match(
                iou, list(self.rpn_iou_thresholds), [0, -1, 1], True
            )
            # exhaustive _subsample_labels: batch >= all candidates keeps
            # every pos and neg, -1 stays -1
            gt_labels_all.append(labels)
            matched_boxes_all.append(
                gt_boxes[i][midx]
                if gt_boxes[i].shape[0]
                else torch.zeros_like(anchors)
            )
        gt_labels = torch.stack(gt_labels_all)
        pos_mask = gt_labels == 1
        valid_mask = gt_labels >= 0

        # --- RPN losses (rpn.py:327-395) ---
        gt_anchor_deltas = torch.stack(
            [get_deltas(anchors, mb, (1.0,) * 4) for mb in matched_boxes_all]
        )
        loss_rpn_loc = (
            F.l1_loss(
                deltas[pos_mask], gt_anchor_deltas[pos_mask], reduction="sum"
            )
            / (self.rpn_batch * b)
        )
        loss_rpn_cls = (
            F.binary_cross_entropy_with_logits(
                logits[valid_mask],
                gt_labels[valid_mask].float(),
                reduction="sum",
            )
            / (self.rpn_batch * b)
        )

        # --- proposals + ROI sampling (roi_heads.py:118-250), exhaustive ---
        proposals = self._select_proposals(
            logits.detach(), deltas.detach(), anchors, image_hw
        )
        all_boxes, all_gt_cls, all_gt_boxes = [], [], []
        for i in range(b):
            pboxes = torch.cat([proposals[i][0], gt_boxes[i]])  # append GT
            iou = pairwise_iou(gt_boxes[i], pboxes)
            midx, mlab = match(iou, [self.roi_iou_threshold], [0, 1], False)
            if gt_boxes[i].shape[0]:
                cls = gt_classes[i][midx].clone()
                cls[mlab == 0] = self.num_classes
            else:
                cls = torch.full(
                    (pboxes.shape[0],), self.num_classes, dtype=torch.long
                )
            # exhaustive subsample_labels: all fg (cap 25% of the huge
            # batch never binds) then all bg; order fg-first like d2's
            # cat([fg_idx, bg_idx]) — losses are order-invariant anyway
            fg = (cls >= 0) & (cls != self.num_classes)
            order = torch.cat([torch.nonzero(fg)[:, 0],
                               torch.nonzero(~fg)[:, 0]])
            all_boxes.append(pboxes[order])
            all_gt_cls.append(cls[order])
            all_gt_boxes.append(
                gt_boxes[i][midx[order]]
                if gt_boxes[i].shape[0]
                else torch.zeros(order.shape[0], 4)
            )

        # --- ROI head on the pooled map (roi_heads.py:339-386) ---
        pooled = torch.cat(
            [
                roi_align(feat_rcnn[i], all_boxes[i], 7, 1.0 / self.stride)
                for i in range(b)
            ]
        )
        gt_cls = torch.cat(all_gt_cls)
        scores, pdeltas, extra_losses = self._predict_pooled(pooled, gt_cls)

        # --- FastRCNNOutputs.losses (fast_rcnn.py:222-304) ---
        gt_bx = torch.cat(all_gt_boxes)
        prop_bx = torch.cat(all_boxes)
        loss_cls = F.cross_entropy(scores, gt_cls, reduction="mean")
        fg_inds = torch.nonzero(
            (gt_cls >= 0) & (gt_cls < self.num_classes)
        )[:, 0]
        gt_prop_deltas = get_deltas(prop_bx, gt_bx, self.box_reg_weights)
        cols = 4 * gt_cls[fg_inds][:, None] + torch.arange(4)
        loss_box_reg = (
            F.l1_loss(
                pdeltas[fg_inds[:, None], cols],
                gt_prop_deltas[fg_inds],
                reduction="sum",
            )
            / gt_cls.numel()
        )
        return {
            "loss_rpn_cls": loss_rpn_cls,
            "loss_rpn_loc": loss_rpn_loc,
            "loss_cls": loss_cls,
            "loss_box_reg": loss_box_reg,
            **extra_losses,
        }

    def _predict_pooled(self, pooled, gt_cls):
        """Pooled-map hook: (scores, deltas, extra_losses) from the raw
        (R, C, 7, 7) ROIAlign output. The C4 path runs res5 + mean-pool
        then _predict; the Standard-heads oracle overrides this to run
        the two ConvFC towers on the raw map instead."""
        feature_pooled = self.roi_heads.res5(pooled).mean(dim=[2, 3])
        return self._predict(feature_pooled, gt_cls)

    def _predict(self, feature_pooled, gt_cls):
        """Head hook: (scores, deltas, extra_losses). The plain Res5 head;
        overridden by the semantic-head oracle (train-time gt_cls for its
        attention CE; None at inference)."""
        return (
            self.roi_heads.box_predictor.cls_score(feature_pooled),
            self.roi_heads.box_predictor.bbox_pred(feature_pooled),
            {},
        )

    # -- inference ---------------------------------------------------------
    @torch.no_grad()
    def inference(self, images, image_hw):
        """Per-image detections (fast_rcnn.py:90-134): softmax -> drop bg ->
        clip -> score filter -> per-class NMS -> topk. Returns a list of
        (boxes, scores, classes)."""
        feat, feat_rpn, feat_rcnn = self._features(images)
        logits, deltas, anchors = self._rpn_out(feat_rpn)
        proposals = self._select_proposals(logits, deltas, anchors, image_hw)
        results = []
        for i in range(images.shape[0]):
            pboxes = proposals[i][0]
            pooled = roi_align(feat_rcnn[i], pboxes, 7, 1.0 / self.stride)
            raw_scores, pdeltas, _ = self._predict_pooled(pooled, None)
            scores = F.softmax(raw_scores, dim=-1)[:, :-1]
            boxes = apply_deltas(pdeltas, pboxes, self.box_reg_weights)
            boxes = clip_boxes(boxes.reshape(-1, 4), image_hw[i]).reshape(
                -1, self.num_classes, 4
            )
            mask = scores > self.test_score_thresh
            inds = torch.nonzero(mask)
            fboxes = boxes[mask]
            fscores = scores[mask]
            fclasses = inds[:, 1]
            keep = batched_nms(fboxes, fscores, fclasses, self.test_nms_thresh)
            keep = keep[: self.test_topk]
            results.append((fboxes[keep], fscores[keep], fclasses[keep]))
        return results


# ---------------------------------------------------------------------------
# Text-family full network: GeneralizedTextRCNN + TextRes5ROIHeads
# ---------------------------------------------------------------------------
class TorchGeneralizedTextRCNN(TorchGeneralizedRCNN):
    """The fork's flagship text pipeline in plain torch:

      * per-pixel class-embedding map painted inside GT boxes, bg = learned
        vector (rcnn.py:399-433: _expand_bbox floor/(floor+1) bounds at
        rate 1.0, sequential overwrite), concat with res4 and projected by
        to_rpn_input_proj — at TRAIN and (GT-painted) EVAL alike
        (rcnn.py:64-67; PARITY #12);
      * TextRes5ROIHeads (roi_heads.py:529-836): teacher =
        attention(feature_pooled, gt_classes) -> box_predictor(feat,
        sim2stext); student = stu_box_predictor(feat, mlp_adapter(feat))
        + MSE feature distill vs the teacher's sim2stext
        (forward_adapter, :595-627) + loss_fn_kd_only KL (:746-765);
        teacher detection losses carry the _t suffix (:818-826).

    ``attention`` is injected by the caller — the reference's OWN exec'd
    LV_attention module, so the attention core runs the reference's torch
    code verbatim. Deviations mirrored from our build (documented):
    distill targets are DETACHED (one-directional KD, PARITY #8; the
    reference backpropagates into the teacher), and inference runs the
    student path (the reference's inference branch references an
    undefined variable and crashes, PARITY #3)."""

    def __init__(self, *args, class_embed=None, attention=None,
                 kl_temp=5.0, **kw):
        super().__init__(*args, **kw)
        c4 = self.roi_heads.res5[0].conv1.weight.shape[1] // 2
        c5 = self.roi_heads.res5[-1].conv3.weight.shape[0]
        sem = class_embed.shape[1]
        self.register_buffer("class_embed", torch.as_tensor(class_embed))
        self.bg_feature = nn.Parameter(torch.randn(1, sem))
        self.to_rpn_input_proj = nn.Linear(2 * c4 + sem, 2 * c4)
        self.attention = attention
        self.kl_temp = kl_temp
        self.roi_heads.stu_box_predictor = nn.Module()
        self.roi_heads.stu_box_predictor.cls_score = nn.Linear(
            c5, self.num_classes + 1
        )
        self.roi_heads.stu_box_predictor.bbox_pred = nn.Linear(
            c5, self.num_classes * 4
        )
        self.roi_heads.mlp_adapter = nn.Sequential(
            nn.Linear(c5, c5 // 2), nn.ReLU(),
            nn.Linear(c5 // 2, c5), nn.ReLU(),
        )

    def _expand_bbox(self, gt_box, max_size, stride):
        # rcnn.py:399-407 at expand_rate 1.0
        x1, y1, x2, y2 = (gt_box / stride).tolist()
        w, h = x2 - x1, y2 - y1
        xc, yc = (x1 + x2) / 2, (y1 + y2) / 2
        x1 = int(max(0, math.floor(xc - w / 2)))
        y1 = int(max(0, math.floor(yc - h / 2)))
        x2 = int(min(max_size[1], math.floor(xc + w / 2) + 1))
        y2 = int(min(max_size[0], math.floor(yc + h / 2) + 1))
        return x1, y1, x2, y2

    def _add_semantic_features(self, feat, gt_boxes, gt_classes):
        """rcnn.py:409-433: paint -> concat -> linear proj (NHWC inside)."""
        vis = feat.permute(0, 2, 3, 1)  # (B, H, W, C)
        b, h, w, _ = vis.shape
        sem = self.bg_feature.expand(b, h, w, -1).clone()
        for i in range(b):
            for box, cls in zip(gt_boxes[i], gt_classes[i]):
                x1, y1, x2, y2 = self._expand_bbox(box, (h, w), self.stride)
                sem[i, y1:y2, x1:x2] = self.class_embed[cls]
        fused = self.to_rpn_input_proj(torch.cat([vis, sem], dim=-1))
        return fused.permute(0, 3, 1, 2)

    def _features(self, images, gt_boxes=None, gt_classes=None):
        x = (images - self.pixel_mean) / self.pixel_std
        feat = self.backbone(x)
        feat = self._add_semantic_features(feat, gt_boxes, gt_classes)
        feat_rpn = self.affine_rpn(decouple_layer(feat, self.lambda_rpn))
        feat_rcnn = self.affine_rcnn(decouple_layer(feat, self.lambda_rcnn))
        return feat, feat_rpn, feat_rcnn

    def losses(self, images, image_hw, gt_boxes, gt_classes):
        feat, feat_rpn, feat_rcnn = self._features(images, gt_boxes, gt_classes)
        logits, deltas, anchors = self._rpn_out(feat_rpn)
        b = images.shape[0]

        gt_labels_all, matched_boxes_all = [], []
        for i in range(b):
            iou = pairwise_iou(gt_boxes[i], anchors)
            midx, labels = match(
                iou, list(self.rpn_iou_thresholds), [0, -1, 1], True
            )
            gt_labels_all.append(labels)
            matched_boxes_all.append(gt_boxes[i][midx])
        gt_labels = torch.stack(gt_labels_all)
        pos_mask = gt_labels == 1
        valid_mask = gt_labels >= 0
        gt_anchor_deltas = torch.stack(
            [get_deltas(anchors, mb, (1.0,) * 4) for mb in matched_boxes_all]
        )
        loss_rpn_loc = (
            F.l1_loss(
                deltas[pos_mask], gt_anchor_deltas[pos_mask], reduction="sum"
            ) / (self.rpn_batch * b)
        )
        loss_rpn_cls = (
            F.binary_cross_entropy_with_logits(
                logits[valid_mask], gt_labels[valid_mask].float(),
                reduction="sum",
            ) / (self.rpn_batch * b)
        )

        proposals = self._select_proposals(
            logits.detach(), deltas.detach(), anchors, image_hw
        )
        all_boxes, all_gt_cls, all_gt_boxes = [], [], []
        for i in range(b):
            pboxes = torch.cat([proposals[i][0], gt_boxes[i]])
            iou = pairwise_iou(gt_boxes[i], pboxes)
            midx, mlab = match(iou, [self.roi_iou_threshold], [0, 1], False)
            cls = gt_classes[i][midx].clone()
            cls[mlab == 0] = self.num_classes
            fg = (cls >= 0) & (cls != self.num_classes)
            order = torch.cat([torch.nonzero(fg)[:, 0],
                               torch.nonzero(~fg)[:, 0]])
            all_boxes.append(pboxes[order])
            all_gt_cls.append(cls[order])
            all_gt_boxes.append(gt_boxes[i][midx[order]])

        pooled = torch.cat(
            [
                roi_align(feat_rcnn[i], all_boxes[i], 7, 1.0 / self.stride)
                for i in range(b)
            ]
        )
        feature_pooled = self.roi_heads.res5(pooled).mean(dim=[2, 3])
        gt_cls = torch.cat(all_gt_cls)
        gt_bx = torch.cat(all_gt_boxes)
        prop_bx = torch.cat(all_boxes)

        # --- teacher (roi_heads.py:715-732) ---
        _, t_out = self.attention(feature_pooled, gt_cls)
        t_sim = t_out["sim2stext"]
        if t_sim.dim() == 3:  # the exec'd LV_attention keeps the (1, N, d)
            t_sim = t_sim[0]  # attention batch axis
        t_scores = self.roi_heads.box_predictor.cls_score(t_sim)
        t_deltas = self.roi_heads.box_predictor.bbox_pred(feature_pooled)

        # --- student (roi_heads.py:734-771; targets DETACHED, PARITY #8) ---
        adapter_feat = self.roi_heads.mlp_adapter(feature_pooled)
        loss_student_feat = F.mse_loss(adapter_feat, t_sim.detach())
        s_scores = self.roi_heads.stu_box_predictor.cls_score(adapter_feat)
        s_deltas = self.roi_heads.stu_box_predictor.bbox_pred(feature_pooled)

        # loss_fn_kd_only (my_module.py:408-437): KL at T^2 with bg rows
        # weighted 1.5x, vs the DETACHED teacher logits
        T = self.kl_temp
        logp_s = F.log_softmax(s_scores / T, dim=1)
        p_t = F.softmax(t_scores.detach() / T, dim=1)
        per_row = F.kl_div(logp_s, p_t, reduction="none").sum(dim=1)
        weights = torch.where(
            gt_cls == self.num_classes,
            torch.tensor(1.5), torch.tensor(1.0),
        )
        loss_kl = (per_row * weights).mean() * T * T

        def det_losses(scores, pdeltas):
            loss_cls = F.cross_entropy(scores, gt_cls, reduction="mean")
            fg_inds = torch.nonzero(
                (gt_cls >= 0) & (gt_cls < self.num_classes)
            )[:, 0]
            gt_prop_deltas = get_deltas(prop_bx, gt_bx, self.box_reg_weights)
            cols = 4 * gt_cls[fg_inds][:, None] + torch.arange(4)
            loss_box = (
                F.l1_loss(
                    pdeltas[fg_inds[:, None], cols],
                    gt_prop_deltas[fg_inds], reduction="sum",
                ) / gt_cls.numel()
            )
            return loss_cls, loss_box

        loss_cls, loss_box_reg = det_losses(s_scores, s_deltas)
        loss_cls_t, loss_box_reg_t = det_losses(t_scores, t_deltas)
        return {
            "loss_rpn_cls": loss_rpn_cls,
            "loss_rpn_loc": loss_rpn_loc,
            "loss_cls": loss_cls,
            "loss_box_reg": loss_box_reg,
            "loss_cls_t": loss_cls_t,
            "loss_box_reg_t": loss_box_reg_t,
            "loss_kl": loss_kl,
            "loss_student_feat": loss_student_feat,
        }

    @torch.no_grad()
    def inference(self, images, image_hw, gt_boxes=None, gt_classes=None):
        """GT-painted eval (the reference's own protocol), student path."""
        feat, feat_rpn, feat_rcnn = self._features(images, gt_boxes, gt_classes)
        logits, deltas, anchors = self._rpn_out(feat_rpn)
        proposals = self._select_proposals(logits, deltas, anchors, image_hw)
        results = []
        for i in range(images.shape[0]):
            pboxes = proposals[i][0]
            pooled = roi_align(feat_rcnn[i], pboxes, 7, 1.0 / self.stride)
            x = self.roi_heads.res5(pooled).mean(dim=[2, 3])
            adapter_feat = self.roi_heads.mlp_adapter(x)
            scores = F.softmax(
                self.roi_heads.stu_box_predictor.cls_score(adapter_feat),
                dim=-1,
            )[:, :-1]
            pdeltas = self.roi_heads.stu_box_predictor.bbox_pred(x)
            boxes = apply_deltas(pdeltas, pboxes, self.box_reg_weights)
            boxes = clip_boxes(boxes.reshape(-1, 4), image_hw[i]).reshape(
                -1, self.num_classes, 4
            )
            mask = scores > self.test_score_thresh
            inds = torch.nonzero(mask)
            keep = batched_nms(
                boxes[mask], scores[mask], inds[:, 1], self.test_nms_thresh
            )
            keep = keep[: self.test_topk]
            results.append(
                (boxes[mask][keep], scores[mask][keep], inds[:, 1][keep])
            )
        return results


class TorchGeneralizedTextAttRCNN(TorchGeneralizedTextRCNN):
    """Pixel-token attention fusion variant (rcnn.py:454-520): the text
    map is projected to visual width (LtoVproj), q = vis tokens,
    k = projected-text tokens, v = attproj(cat(vis, text)) tokens,
    SingleHeadSiameseAttention over the H*W pixel tokens, and the
    attention OUTPUT replaces the res4 features handed to RPN/ROI.

    The reference's own ``add_semantic_features`` is dead code as
    written: it reads the undefined ``self.semantic_features``
    (rcnn.py:469), unpacks the attention's (output, attn) tuple into one
    name and calls .view on the tuple (:516-518,
    attentive_modules.py:178), paints with TRANSPOSED x/y indices and
    truncated int() bounds (:502-504), and uses the LAST CLASS embedding
    as background (:500). Our build repairs it minimally (documented,
    PARITY #14): keep the Text family's paint (bg_feature +
    _expand_bbox inclusive-end bounds) and apply the intended fusion
    wiring above. This oracle mirrors the repaired semantics; the
    attention core is the reference's OWN exec'd
    SingleHeadSiameseAttention (injected by the caller), so the fusion
    math still runs the reference's torch code verbatim."""

    def __init__(self, *args, pixel_attention=None, **kw):
        super().__init__(*args, **kw)
        sem = self.class_embed.shape[1]
        c = self.to_rpn_input_proj.weight.shape[0]  # res4 channels
        self.LtoVproj = nn.Linear(sem, c)
        self.attproj = nn.Linear(2 * c, c)
        self.pixel_attention = pixel_attention
        # to_rpn_input_proj (created by the parent) is UNUSED here, as in
        # the reference (rcnn.py:489-520 never calls it)

    def _add_semantic_features(self, feat, gt_boxes, gt_classes):
        vis = feat.permute(0, 2, 3, 1)  # (B, H, W, C)
        b, h, w, c = vis.shape
        sem = self.bg_feature.expand(b, h, w, -1).clone()
        for i in range(b):
            for box, cls in zip(gt_boxes[i], gt_classes[i]):
                x1, y1, x2, y2 = self._expand_bbox(box, (h, w), self.stride)
                sem[i, y1:y2, x1:x2] = self.class_embed[cls]
        text = self.LtoVproj(sem)
        value = self.attproj(torch.cat([vis, text], dim=-1))
        q = vis.reshape(b, h * w, c)
        k = text.reshape(b, h * w, c)
        v = value.reshape(b, h * w, c)
        out, _ = self.pixel_attention(q=q, k=k, v=v)
        return out.reshape(b, h, w, c).permute(0, 3, 1, 2)


class _ConvFCTower(nn.Module):
    """d2 FastRCNNConvFCHead (vendored box_head.py:17-99): [3x3 conv +
    relu] x num_conv, flatten, [fc + relu] x num_fc."""

    def __init__(self, cin, num_conv, conv_dim, num_fc, fc_dim, pooler=7):
        super().__init__()
        convs, c = [], cin
        for _ in range(num_conv):
            convs.append(nn.Conv2d(c, conv_dim, 3, padding=1))
            c = conv_dim
        self.convs = nn.ModuleList(convs)
        fcs, d = [], c * pooler * pooler
        for _ in range(num_fc):
            fcs.append(nn.Linear(d, fc_dim))
            d = fc_dim
        self.fcs = nn.ModuleList(fcs)

    def forward(self, x):
        for conv in self.convs:
            x = F.relu(conv(x))
        x = x.flatten(1)
        for fc in self.fcs:
            x = F.relu(fc(x))
        return x


class TorchStandardHeadsRCNN(TorchGeneralizedRCNN):
    """StandardROIHeads (the fork's roi_heads.py:389-526): no res5 in the
    ROI path — the raw pooled 7x7 map goes to TWO separate ConvFC towers,
    cls_head -> cls_predictor for the logits and box_head ->
    box_predictor for the deltas (:500-509). Unused by every committed
    config (all run Res5ROIHeads) but a live registry entry."""

    def __init__(self, *args, num_conv=1, conv_dim=32, num_fc=2,
                 fc_dim=64, **kw):
        super().__init__(*args, **kw)
        c4 = self.to_c4()
        num_classes = self.num_classes
        self.roi_heads.cls_head = _ConvFCTower(
            c4, num_conv, conv_dim, num_fc, fc_dim
        )
        self.roi_heads.box_head = _ConvFCTower(
            c4, num_conv, conv_dim, num_fc, fc_dim
        )
        # each predictor is a full output layer (the fork constructs two,
        # :450-462); only cls_score of cls_predictor and bbox_pred of
        # box_predictor are consumed
        for name in ("cls_predictor", "box_predictor"):
            mod = nn.Module()
            mod.cls_score = nn.Linear(fc_dim, num_classes + 1)
            mod.bbox_pred = nn.Linear(fc_dim, num_classes * 4)
            setattr(self.roi_heads, name, mod)
        del self.roi_heads.res5  # no res5 in this head

    def to_c4(self):
        return self.affine_rpn.weight.numel()

    def _predict_pooled(self, pooled, gt_cls):
        scores = self.roi_heads.cls_predictor.cls_score(
            self.roi_heads.cls_head(pooled)
        )
        deltas = self.roi_heads.box_predictor.bbox_pred(
            self.roi_heads.box_head(pooled)
        )
        return scores, deltas, {}


# ---------------------------------------------------------------------------
# Semantic family: SematicRes5ROIHeads(+CrossOutput) and the Distillated
# meta-arch's multi-scale KD losses
# ---------------------------------------------------------------------------
class TorchSemanticHeadRCNN(TorchGeneralizedRCNN):
    """Plain meta-arch + SematicRes5ROIHeads — the run_novel_pure_attention
    combo (roi_heads.py:921-1172): pooled ROI features attend over the
    class-embedding bank (``attention`` = the reference's OWN exec'd
    SematicProposalAttention, injected), CE loss on the attention scores
    (post-softmax, the reference's quirk — forward_att :1074-1081),
    attended features (or, for CrossOutput, the bank-scored projection,
    :1154-1171) routed to the cls head. cross_output +
    attention_output_layer mirrors run_voc_distillate_rpn.sh:14's
    FastRCNNAttentionOutputLayers (cls scores = att_x raw)."""

    def __init__(self, *args, attention=None, sem_dim=300,
                 cross_output=False, attention_output_layer=False, **kw):
        super().__init__(*args, **kw)
        c5 = self.roi_heads.res5[-1].conv3.weight.shape[0]
        self.attention = attention
        self.cross_output = cross_output
        self.attention_output_layer = attention_output_layer
        self.roi_heads.output_projection = nn.Linear(c5, sem_dim)
        if attention_output_layer:
            # FastRCNNAttentionOutputLayers has no cls_score parameter
            del self.roi_heads.box_predictor.cls_score

    def _predict(self, feature_pooled, gt_cls):
        attn, out = self.attention(feature_pooled)
        sim = out["sim2stext"]
        if sim.dim() == 3:
            sim = sim[0]
        text_feat = out["text_feat"]
        extra = {}
        if self.cross_output:
            att_feat = F.relu(self.roi_heads.output_projection(sim))
            cls_in = att_feat @ text_feat.t()  # (N, C+1) bank scores
        else:
            cls_in = sim
            if gt_cls is not None:  # train: CE on the attention scores
                a = attn[0] if attn.dim() == 3 else attn
                extra["loss_attentive"] = F.cross_entropy(
                    a, gt_cls, reduction="mean"
                )
        if self.attention_output_layer:
            scores = cls_in
        else:
            scores = self.roi_heads.box_predictor.cls_score(cls_in)
        deltas = self.roi_heads.box_predictor.bbox_pred(feature_pooled)
        return scores, deltas, extra


class TorchGeneralizedDistillatedRCNN(TorchSemanticHeadRCNN):
    """GeneralizedDistillatedRCNN (rcnn.py:209-321): multi-scale
    vis->sem 1x1-conv projections MSE-distilled toward painted semantic
    maps (loss_rpn_{res2,res3,res4}); the detection path stays raw res4
    (inference passes gt=None, rcnn.py:235-237). Painting uses the
    Semantic _expand_bbox (TRUNCATED end bound, rcnn.py:177-185) at
    expand_rate 1.0."""

    def __init__(self, *args, class_embed=None, sem_dim=300, **kw):
        super().__init__(*args, sem_dim=sem_dim, **kw)
        res2_out = self.roi_heads.res5[0].conv1.weight.shape[1] // 4
        self.register_buffer("class_embed", torch.as_tensor(class_embed))
        self.bg_feature = nn.Parameter(torch.randn(1, sem_dim))
        self.sem_dim = sem_dim
        self.vis2sem_proj = nn.ModuleDict(
            {
                scale: nn.Linear(res2_out * 2**i, sem_dim)
                for i, scale in enumerate(("res2", "res3", "res4"))
            }
        )

    def _expand_bbox_trunc(self, gt_box, max_size, stride):
        # Semantic variant (rcnn.py:177-185): int() truncation, NO +1
        x1, y1, x2, y2 = (gt_box / stride).tolist()
        w, h = x2 - x1, y2 - y1
        xc, yc = (x1 + x2) / 2, (y1 + y2) / 2
        x1 = int(max(0, xc - w / 2))
        y1 = int(max(0, yc - h / 2))
        x2 = int(min(max_size[1], xc + w / 2))
        y2 = int(min(max_size[0], yc + h / 2))
        return x1, y1, x2, y2

    def _paint(self, feat, gt_boxes, gt_classes, stride):
        b, _, h, w = feat.shape
        sem = self.bg_feature.expand(b, h, w, -1).clone()
        for i in range(b):
            for box, cls in zip(gt_boxes[i], gt_classes[i]):
                x1, y1, x2, y2 = self._expand_bbox_trunc(box, (h, w), stride)
                sem[i, y1:y2, x1:x2] = self.class_embed[cls]
        return sem  # (B, H, W, sem)

    def kd_losses(self, images, gt_boxes, gt_classes):
        """The multi-scale distillation losses on raw backbone features
        (_distillate_multi_scale_features, rcnn.py:304-321)."""
        x = (images - self.pixel_mean) / self.pixel_std
        x = self.backbone.stem(x)
        feats = {}
        feats["res2"] = self.backbone.res2(x)
        feats["res3"] = self.backbone.res3(feats["res2"])
        feats["res4"] = self.backbone.res4(feats["res3"])
        strides = {"res2": 4, "res3": 8, "res4": 16}
        losses = {}
        for scale, f in feats.items():
            sem = self._paint(f, gt_boxes, gt_classes, strides[scale])
            proj = self.vis2sem_proj[scale](f.permute(0, 2, 3, 1))
            losses[f"loss_rpn_{scale}"] = F.mse_loss(proj, sem)
        return losses

    def losses(self, images, image_hw, gt_boxes, gt_classes):
        det = super().losses(images, image_hw, gt_boxes, gt_classes)
        det.update(self.kd_losses(images, gt_boxes, gt_classes))
        return det
