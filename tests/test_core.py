"""Golden-value + cross-framework tests for core box / anchor / DFL math."""

import numpy as np
import jax.numpy as jnp

from multitask_bonetumor_yolo_tpu.core.boxes import (
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    box_iou_matrix,
    box_iou_pairwise,
    dist2bbox,
    bbox2dist,
)
from multitask_bonetumor_yolo_tpu.core.anchors import (
    make_anchors,
    num_anchors,
    level_shapes,
)
from multitask_bonetumor_yolo_tpu.core.dfl import dfl_decode, dfl_targets
from multitask_bonetumor_yolo_tpu.core.letterbox import (
    letterbox_geometry,
    scale_boxes_to_letterbox,
)


def test_cxcywh_xyxy_roundtrip(rng):
    b = rng.rand(7, 4).astype(np.float32)
    b[:, 2:] += 0.1  # positive w/h
    xyxy = box_cxcywh_to_xyxy(jnp.asarray(b))
    back = box_xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), b, atol=1e-6)


def test_iou_golden():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(box_iou_matrix(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25.0 / 175.0, 0.0], atol=1e-5)


def test_iou_degenerate_zero_box():
    a = jnp.zeros((1, 4))
    b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    assert float(box_iou_matrix(a, b)[0, 0]) == 0.0


def test_iou_pairwise_matches_matrix_diag(rng):
    a = rng.rand(5, 4).astype(np.float32) * 10
    b = rng.rand(5, 4).astype(np.float32) * 10
    a[:, 2:] += a[:, :2]
    b[:, 2:] += b[:, :2]
    m = np.asarray(box_iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    p = np.asarray(box_iou_pairwise(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(np.diag(m), p, atol=1e-6)


def test_dist2bbox_inverse_of_bbox2dist(rng):
    anchors = jnp.asarray(rng.rand(6, 2).astype(np.float32) * 8 + 4)
    ltrb = jnp.asarray(rng.rand(6, 4).astype(np.float32) * 3)
    boxes = dist2bbox(ltrb, anchors)
    back = bbox2dist(anchors, boxes, reg_max=16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ltrb), atol=1e-5)


def test_dist2bbox_xywh():
    anchors = jnp.array([[10.0, 10.0]])
    ltrb = jnp.array([[2.0, 3.0, 4.0, 5.0]])
    xywh = np.asarray(dist2bbox(ltrb, anchors, box_format="xywh"))[0]
    np.testing.assert_allclose(xywh, [11.0, 11.0, 6.0, 8.0], atol=1e-6)


def test_anchor_count_and_layout():
    pts, strs = make_anchors(640)
    assert pts.shape == (8400, 2) and strs.shape == (8400, 1)
    assert num_anchors(640) == 8400
    assert level_shapes(640) == [(80, 80), (40, 40), (20, 20)]
    # first anchor of the stride-8 level
    np.testing.assert_allclose(np.asarray(pts[0]), [0.5, 0.5])
    # row-major: second anchor advances in x
    np.testing.assert_allclose(np.asarray(pts[1]), [1.5, 0.5])
    # first stride-16 anchor sits after 80*80 stride-8 anchors
    np.testing.assert_allclose(np.asarray(pts[6400]), [0.5, 0.5])
    assert float(strs[6400, 0]) == 16.0


def test_dfl_decode_matches_reference_math(rng):
    """softmax·arange expectation, checked against a literal numpy transcription."""
    logits = rng.randn(2, 5, 4, 16).astype(np.float32)
    got = np.asarray(dfl_decode(jnp.asarray(logits)))
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    want = (probs * np.arange(16, dtype=np.float32)).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.shape == (2, 5, 4)


def test_dfl_targets_interpolation():
    gt = jnp.array([[3.25, 0.0, 14.99, 7.5]])
    tl, tr, wl, wr = dfl_targets(gt, reg_max=16)
    np.testing.assert_array_equal(np.asarray(tl)[0], [3, 0, 14, 7])
    np.testing.assert_array_equal(np.asarray(tr)[0], [4, 1, 15, 8])
    np.testing.assert_allclose(np.asarray(wl)[0], [0.75, 1.0, 0.01, 0.5], atol=1e-5)
    np.testing.assert_allclose(np.asarray(wr)[0], [0.25, 0.0, 0.99, 0.5], atol=1e-5)
    # weights always sum to 1 (interior) — reference's linear interpolation
    np.testing.assert_allclose(np.asarray(wl + wr)[0], np.ones(4), atol=1e-5)


def test_letterbox_geometry():
    scale, nh, nw = letterbox_geometry(480, 640, 640)
    assert (scale, nh, nw) == (1.0, 480, 640)
    scale, nh, nw = letterbox_geometry(1280, 960, 640)
    assert scale == 0.5 and nh == 640 and nw == 480


def test_scale_boxes_drops_and_clips():
    # one good box, one sub-pixel box (dropped), one negative-w box (dropped)
    rows = np.array(
        [
            [0, 0.5, 0.5, 0.5, 0.5],
            [1, 0.5, 0.5, 0.0005, 0.0005],
            [1, 0.5, 0.5, -0.1, 0.2],
        ],
        dtype=np.float32,
    )
    out = scale_boxes_to_letterbox(rows, h0=1280, w0=1280, img_size=640)
    assert out.shape == (1, 5)
    np.testing.assert_allclose(out[0], [0, 0.5, 0.5, 0.5, 0.5], atol=1e-6)


def test_scale_boxes_clip_to_unit():
    rows = np.array([[0, 0.95, 0.5, 0.3, 0.3]], dtype=np.float32)  # spills right edge
    out = scale_boxes_to_letterbox(rows, h0=640, w0=640, img_size=640)
    assert out.shape[0] == 1
    cls, xc, yc, w, h = out[0]
    assert xc + w / 2 <= 1.0 + 1e-6
