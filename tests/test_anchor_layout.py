"""Anchor generator layout vs the detectron2 convention (sizes outer x
ratios inner, row-major (y, x) grid, index = (y*W + x)*A + a)."""

import numpy as np

from fewshotobjectdetection_imporove_via_text_feature_tpu.models.rpn import (
    cell_anchors,
    generate_anchors,
)


def test_cell_anchor_geometry():
    cell = cell_anchors(sizes=(32,), aspect_ratios=(0.5, 1.0, 2.0))
    # ratio 0.5: area 1024, w = sqrt(1024/0.5) = 45.25, h = 22.63
    w0 = cell[0, 2] - cell[0, 0]
    h0 = cell[0, 3] - cell[0, 1]
    np.testing.assert_allclose(w0, np.sqrt(1024 / 0.5), rtol=1e-6)
    np.testing.assert_allclose(h0, w0 * 0.5, rtol=1e-6)
    # ratio 1.0: square 32
    np.testing.assert_allclose(cell[1], [-16, -16, 16, 16], rtol=1e-6)
    # zero-centered
    np.testing.assert_allclose(cell[:, :2], -cell[:, 2:], rtol=1e-6)


def test_grid_ordering_and_stride():
    a = generate_anchors((2, 3), stride=16, sizes=(32,), aspect_ratios=(1.0,))
    assert a.shape == (6, 4)
    # index = (y*W + x)*A + a with A=1: anchor 0 at (0,0), 1 at (0,16), ...
    centers = (a[:, :2] + a[:, 2:]) / 2
    np.testing.assert_allclose(
        centers,
        [[0, 0], [16, 0], [32, 0], [0, 16], [16, 16], [32, 16]],
        atol=1e-5,
    )


def test_sizes_outer_ratios_inner():
    a = generate_anchors(
        (1, 1), stride=16, sizes=(32, 64), aspect_ratios=(0.5, 1.0)
    )
    areas = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    # order: (32, 0.5), (32, 1.0), (64, 0.5), (64, 1.0)
    np.testing.assert_allclose(areas, [1024, 1024, 4096, 4096], rtol=1e-5)
    ratios = (a[:, 3] - a[:, 1]) / (a[:, 2] - a[:, 0])
    np.testing.assert_allclose(ratios, [0.5, 1.0, 0.5, 1.0], rtol=1e-5)
