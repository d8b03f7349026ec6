"""Metrics: COCO mAP golden cases, binary seg stats, classification stats."""

import numpy as np
import pytest

from multitask_bonetumor_yolo_tpu.metrics import (
    MeanAveragePrecision,
    BinarySegMetrics,
    ClassificationMetrics,
    confusion_matrix,
)
from multitask_bonetumor_yolo_tpu.metrics.segmentation import mask_map_inputs


def B(*rows):
    return np.asarray(rows, np.float32).reshape(-1, 4)


def pred(boxes, scores, labels):
    return dict(boxes=np.asarray(boxes, np.float32),
                scores=np.asarray(scores, np.float32),
                labels=np.asarray(labels, np.int64))


def tgt(boxes, labels):
    return dict(boxes=np.asarray(boxes, np.float32),
                labels=np.asarray(labels, np.int64))


# ---------------------------------------------------------------- bbox mAP
def test_map_perfect_predictions():
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    boxes = B([10, 10, 50, 50], [100, 100, 200, 200])
    m.update([pred(boxes, [0.9, 0.8], [0, 1])], [tgt(boxes, [0, 1])])
    out = m.compute()
    assert out["map"] == pytest.approx(1.0)
    assert out["map_50"] == pytest.approx(1.0)
    assert out["mar_100"] == pytest.approx(1.0)


def test_map_miss_is_zero():
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    m.update(
        [pred(B([300, 300, 350, 350]), [0.9], [0])],
        [tgt(B([10, 10, 50, 50]), [0])],
    )
    assert m.compute()["map"] == pytest.approx(0.0)


def test_map_half_recall_golden():
    """1 TP then 1 FP then nothing for the 2nd GT:
    precision at recall<=0.5 is 1.0, 0 beyond -> AP = 51/101."""
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    m.update(
        [
            pred(
                B([10, 10, 50, 50], [300, 300, 340, 340]),
                [0.9, 0.8],
                [0, 0],
            )
        ],
        [tgt(B([10, 10, 50, 50], [100, 100, 140, 140]), [0, 0])],
    )
    out = m.compute()
    assert out["map"] == pytest.approx(51 / 101)
    assert out["mar_100"] == pytest.approx(0.5)


def test_map_duplicate_detection_is_fp():
    """Two detections on one GT: the lower-scored one is FP.
    PR: rec=[1,1], prec=[1,0.5] -> interpolated AP = 1.0."""
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    g = B([10, 10, 50, 50])
    m.update([pred(B([10, 10, 50, 50], [11, 11, 51, 51]), [0.9, 0.8], [0, 0])],
             [tgt(g, [0])])
    assert m.compute()["map"] == pytest.approx(1.0)


def test_map_score_order_matters():
    """FP scored above the TP: rec 0->0.5... prec at recall .5+ is 1/2."""
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    m.update(
        [pred(B([300, 300, 350, 350], [10, 10, 50, 50]), [0.95, 0.5], [0, 0])],
        [tgt(B([10, 10, 50, 50]), [0])],
    )
    # rec after: [0, 1], prec: [0, 0.5] -> interp precision 0.5 across recall
    assert m.compute()["map"] == pytest.approx(0.5)


def test_map_iou_threshold_sweep():
    """Pred overlaps GT with IoU 0.625: TP at 0.5, FP at 0.75."""
    m = MeanAveragePrecision(iou_thresholds=[0.5, 0.75])
    m.update([pred(B([10, 10, 50, 74]), [0.9], [0])],
             [tgt(B([10, 10, 50, 50]), [0])])
    out = m.compute()
    assert out["map_50"] == pytest.approx(1.0)
    assert out["map_75"] == pytest.approx(0.0)
    assert out["map"] == pytest.approx(0.5)


def test_map_multiclass_averaging():
    m = MeanAveragePrecision(iou_thresholds=[0.5], class_metrics=True)
    g0, g1 = B([10, 10, 50, 50]), B([100, 100, 150, 150])
    m.update(
        [pred(np.concatenate([g0, B([300, 300, 310, 310])]), [0.9, 0.9], [0, 1])],
        [tgt(np.concatenate([g0, g1]), [0, 1])],
    )
    out = m.compute()
    np.testing.assert_allclose(out["map_per_class"], [1.0, 0.0])
    assert out["map"] == pytest.approx(0.5)
    np.testing.assert_array_equal(out["classes"], [0, 1])


def test_map_empty_predictions():
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    m.update([pred(np.zeros((0, 4)), [], [])], [tgt(B([10, 10, 50, 50]), [0])])
    assert m.compute()["map"] == pytest.approx(0.0)


def test_map_area_ranges():
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    small = B([0, 0, 10, 10])         # area 100 < 32²
    large = B([0, 0, 200, 200])       # area 40000 > 96²
    m.update(
        [pred(np.concatenate([small, large]), [0.9, 0.9], [0, 0])],
        [tgt(np.concatenate([small, large]), [0, 0])],
    )
    out = m.compute()
    assert out["map_small"] == pytest.approx(1.0)
    assert out["map_large"] == pytest.approx(1.0)
    assert out["map_medium"] == -1.0  # no medium GT


def test_map_mar_maxdets():
    """11 GT, 11 correct dets: mar_1 caps at 1/11, mar_10 at 10/11."""
    n = 11
    boxes = np.stack([
        np.arange(n) * 100, np.zeros(n), np.arange(n) * 100 + 50, np.full(n, 50)
    ], -1).astype(np.float32)
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    m.update([pred(boxes, np.linspace(0.9, 0.5, n), np.zeros(n, np.int64))],
             [tgt(boxes, np.zeros(n, np.int64))])
    out = m.compute()
    assert out["mar_1"] == pytest.approx(1 / 11)
    assert out["mar_10"] == pytest.approx(10 / 11)
    assert out["mar_100"] == pytest.approx(1.0)


# ---------------------------------------------------------------- segm mAP
def test_segm_map_perfect_and_half():
    H = W = 32
    gt = np.zeros((H, W), bool)
    gt[8:24, 8:24] = True
    probs_perfect = gt.astype(np.float32) * 0.9
    preds, targets = mask_map_inputs(probs_perfect[None], gt[None].astype(np.float32))
    m = MeanAveragePrecision(iou_type="segm", iou_thresholds=[0.5])
    m.update(preds, targets)
    assert m.compute()["map"] == pytest.approx(1.0)

    # half-overlap mask: IoU = 1/3 < 0.5 -> FP
    probs_half = np.zeros((H, W), np.float32)
    probs_half[8:24, 16:32] = 0.9
    preds, targets = mask_map_inputs(probs_half[None], gt[None].astype(np.float32))
    m2 = MeanAveragePrecision(iou_type="segm", iou_thresholds=[0.5])
    m2.update(preds, targets)
    assert m2.compute()["map"] == pytest.approx(0.0)


# ---------------------------------------------------------------- binary seg
def test_binary_seg_metrics_golden():
    m = BinarySegMetrics()
    probs = np.asarray([[0.9, 0.9], [0.1, 0.9]])  # preds: 1,1,0,1
    gt = np.asarray([[1.0, 0.0], [0.0, 1.0]])  # tp=2 fp=1 fn=0 tn=1
    m.update(probs, gt)
    out = m.compute()
    assert out["precision"] == pytest.approx(2 / 3)
    assert out["recall"] == pytest.approx(1.0)
    assert out["f1"] == pytest.approx(0.8)
    assert out["dice"] == pytest.approx(0.8)
    assert out["accuracy"] == pytest.approx(0.75)
    assert out["iou"] == pytest.approx(2 / 3)


def test_binary_seg_accumulates():
    m = BinarySegMetrics()
    m.update(np.asarray([0.9]), np.asarray([1.0]))
    m.update(np.asarray([0.9]), np.asarray([0.0]))
    assert m.compute()["precision"] == pytest.approx(0.5)


# ---------------------------------------------------------------- cls
def test_confusion_matrix_and_cls_metrics():
    cm = confusion_matrix([0, 1, 1, 0], [0, 1, 0, 0], num_classes=2)
    np.testing.assert_allclose(cm, [[2, 1], [0, 1]])
    cmn = confusion_matrix([0, 1, 1, 0], [0, 1, 0, 0], 2, normalize="true")
    np.testing.assert_allclose(cmn, [[2 / 3, 1 / 3], [0, 1]])

    m = ClassificationMetrics(2)
    logits = np.asarray([[2.0, 1.0], [0.0, 3.0], [1.0, 2.0], [4.0, 0.0]])
    m.update(logits, [0, 1, 0, 0])
    out = m.compute()
    assert out["accuracy"] == pytest.approx(0.75)
    # class0: tp=2 fp=0 fn=1 -> P=1, R=2/3, F1=0.8
    # class1: tp=1 fp=1 fn=0 -> P=.5, R=1, F1=2/3
    assert out["precision_macro"] == pytest.approx(0.75)
    assert out["recall_macro"] == pytest.approx((2 / 3 + 1) / 2)
    assert out["f1_macro"] == pytest.approx((0.8 + 2 / 3) / 2)


def test_mask_map_counts_path_equals_mask_path():
    """Device-scalar mask-mAP inputs (counts) must reproduce the full-mask
    path exactly for the one-pred/one-gt semantic case — including empty
    predictions and empty GT."""
    from multitask_bonetumor_yolo_tpu.metrics.segmentation import (
        mask_map_inputs,
        mask_map_inputs_from_counts,
    )

    rng = np.random.RandomState(3)
    B, H = 6, 48
    probs = rng.rand(B, H, H).astype(np.float32)
    probs[3] = 0.0  # empty prediction
    gt = (rng.rand(B, H, H) > 0.6).astype(np.float32)
    gt[4] = 0.0  # empty GT

    pm = probs > 0.5
    pos = gt > 0.5
    counts = np.stack(
        [
            (pm & pos).sum((1, 2)), (pm & ~pos).sum((1, 2)),
            (~pm & pos).sum((1, 2)), (~pm & ~pos).sum((1, 2)),
        ],
        -1,
    )
    scores = (probs * pm).sum((1, 2)) / (pm.sum((1, 2)) + 1e-6)

    m_mask = MeanAveragePrecision(iou_type="segm")
    m_mask.update(*mask_map_inputs(probs, gt))
    m_cnt = MeanAveragePrecision(iou_type="segm")
    m_cnt.update(*mask_map_inputs_from_counts(counts, scores))
    a, b = m_mask.compute(), m_cnt.compute()
    for k in a:
        if isinstance(a[k], float):
            np.testing.assert_allclose(b[k], a[k], atol=1e-9, err_msg=k)


def test_update_cm_matches_pairwise_update():
    """Device-side CM counts (train/steps.py eval_step) must accumulate the
    same matrix as the host pairwise path."""
    import jax.numpy as jnp

    from multitask_bonetumor_yolo_tpu.metrics import ClassificationMetrics

    rng = np.random.default_rng(3)
    nc, B, A = 3, 4, 50
    pred = rng.integers(0, nc, (B, A)).astype(np.int32)
    gt = rng.integers(0, nc, (B, A)).astype(np.int32)
    mask = rng.integers(0, 2, (B, A)).astype(bool)
    sv = np.array([True, True, False, True])

    host = ClassificationMetrics(nc)
    m = mask & sv[:, None]
    host.update(pred[m], gt[m])

    # the eval_step device formula
    cm_mask = jnp.asarray(mask) & jnp.asarray(sv)[:, None]
    idx = jnp.asarray(gt) * nc + jnp.asarray(pred)
    counts = (
        jnp.zeros((nc * nc,), jnp.int32)
        .at[idx.ravel()]
        .add(cm_mask.ravel().astype(jnp.int32))
        .reshape(nc, nc)
    )
    dev = ClassificationMetrics(nc)
    dev.update_cm(np.asarray(counts))
    np.testing.assert_array_equal(dev.cm, host.cm)
