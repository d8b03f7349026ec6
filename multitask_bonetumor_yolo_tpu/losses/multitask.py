"""Vectorized 5-term multitask loss.

Parity target: ``MultiTaskLitModel._multitask_loss``
(/root/reference/src/running_main_v3.py:232-387), with the per-image Python
loop replaced by fully batched masked ops over fixed-shape padded GT:

  term                reference                           here
  ----                ---------                           ----
  img-cls CE          :237 (mean over batch)              softmax-CE mean
  seg BCE             :251-257 (projected protos,         BCE mean over pixels
                      bilinear-resized to img_size)       (model provides
                                                          ``seg_logits``)
  box IoU             :325-331  Σ(1 − IoU(pred, gt)) over masked sum / avg_factor
                      positives
  det-cls BCE(sum)    :334-347  one-hot (or smoothed)     masked sum / avg_factor
                      targets on positive anchors
  DFL                 :352-368  two-bin interpolated CE   masked sum / avg_factor
                      per ltrb side

Assignment (:317-323): positive anchor = max IoU of its *decoded* prediction
against any GT > ``iou_match_thresh`` (per-anchor, prediction-dependent — the
reference's quirky assigner, kept for parity, SURVEY.md §2.4).
Normalisation (:370-375): avg_factor = total positives across the WHOLE batch,
falling back to batch_size when zero — the reference accumulates per-image
sums then divides once, so a global masked sum is numerically identical.
Label smoothing applied only when ``train`` (:337-345).

GT comes padded: boxes [B, M, 5] = (cls, xc, yc, w, h) normalised to [0,1],
with validity mask [B, M]. Invalid GT columns get IoU −1 so they can never be
selected (the reference's zero-GT ``continue`` at :300 is the M=0 special case
of the same math).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..core.anchors import make_anchors
from ..core.boxes import box_cxcywh_to_xyxy, box_iou_matrix, dist2bbox
from ..core.dfl import dfl_decode, dfl_targets


@dataclasses.dataclass(frozen=True)
class LossConfig:
    img_size: int = 640
    nc_det: int = 2
    reg_max: int = 16
    iou_match_thresh: float = 0.5
    weight_seg: float = 1.0
    weight_box_iou: float = 7.5
    weight_dfl: float = 1.5
    weight_cls_det: float = 0.5
    weight_img_cls: float = 1.0
    det_label_smoothing: float = 0.1
    strides: Sequence[int] = (8, 16, 32)


class LossOutput(NamedTuple):
    total: jnp.ndarray
    components: Dict[str, jnp.ndarray]  # seg, box_iou, dfl, cls_det, img_cls
    num_pos: jnp.ndarray  # scalar float — positive matches in batch
    avg_iou: jnp.ndarray  # scalar float — mean IoU of matched pairs
    # per-anchor diagnostics for the det confusion matrix
    # (reference temp_matched_preds_for_cm, running_main_v3.py:349-350)
    matched_mask: jnp.ndarray  # [B, A] bool
    matched_pred_cls: jnp.ndarray  # [B, A] int32 argmax of pred logits
    matched_gt_cls: jnp.ndarray  # [B, A] int32 assigned gt class


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy on logits (stable)."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def _softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-example CE with integer labels: logsumexp(x) − x[label]."""
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return lse - picked


def flatten_det_levels(det_feats: Sequence[jnp.ndarray], reg_max: int):
    """Per-level NHWC raw maps -> ([B,A,4,reg_max] dist logits, [B,A,nc] cls).

    Row-major per-level flattening, levels concatenated stride-ascending —
    matches the anchor order of core.anchors.make_anchors and the reference's
    permute(0,2,3,1).reshape (running_main_v3.py:271)."""
    b = det_feats[0].shape[0]
    flat = jnp.concatenate(
        [f.reshape(b, -1, f.shape[-1]) for f in det_feats], axis=1
    ).astype(jnp.float32)
    dist = flat[..., : 4 * reg_max].reshape(b, flat.shape[1], 4, reg_max)
    cls = flat[..., 4 * reg_max :]
    return dist, cls


def multitask_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    cfg: LossConfig,
    train: bool = True,
) -> LossOutput:
    """outputs: model train-mode dict; batch: padded GT dict with keys
    'boxes' [B,M,5], 'box_valid' [B,M], 'mask' [B,S,S,1], 'img_cls' [B]."""
    f32 = jnp.float32

    # ---- image classification (CE mean) ----
    cls_logits = outputs["cls_logits"].astype(f32)
    loss_img_cls = _softmax_ce(cls_logits, batch["img_cls"]).mean()

    # ---- segmentation (BCE mean over pixels) ----
    seg_logits = outputs["seg_logits"].astype(f32)
    loss_seg = _bce_with_logits(seg_logits, batch["mask"].astype(f32)).mean()

    # ---- detection decode (all levels, batched) ----
    dist_logits, det_cls_logits = flatten_det_levels(
        outputs["det_feats"], cfg.reg_max
    )
    anchors, strides = make_anchors(cfg.img_size, cfg.strides)  # [A,2], [A,1]
    ltrb = dfl_decode(dist_logits)  # [B, A, 4] grid units
    pred_xyxy = dist2bbox(ltrb * strides[None], (anchors * strides)[None])

    # ---- GT in absolute xyxy, padded+masked ----
    gt_valid = batch["box_valid"].astype(jnp.bool_)  # [B, M]
    gt_cls = batch["boxes"][..., 0].astype(jnp.int32)  # [B, M]
    gt_xyxy = box_cxcywh_to_xyxy(batch["boxes"][..., 1:5].astype(f32)) * cfg.img_size

    # ---- assignment: per-anchor best GT by IoU of current predictions ----
    iou = box_iou_matrix(pred_xyxy, gt_xyxy)  # [B, A, M]
    iou = jnp.where(gt_valid[:, None, :], iou, -1.0)
    pred_max_iou = iou.max(axis=-1)  # [B, A]
    best_gt = iou.argmax(axis=-1)  # [B, A]
    positive = pred_max_iou > cfg.iou_match_thresh  # [B, A]
    pos_f = positive.astype(f32)

    num_pos = pos_f.sum()
    batch_size = pred_xyxy.shape[0]
    avg_factor = jnp.where(num_pos > 0, num_pos, float(batch_size))

    # ---- box IoU loss: Σ (1 − IoU) over positives ----
    loss_box_iou = ((1.0 - pred_max_iou) * pos_f).sum() / avg_factor
    avg_iou = jnp.where(num_pos > 0, (pred_max_iou * pos_f).sum() / jnp.maximum(num_pos, 1.0), 0.0)

    # ---- det-cls BCE(sum) on positives ----
    matched_gt_cls = jnp.take_along_axis(gt_cls, best_gt, axis=1)  # [B, A]
    one_hot = jax.nn.one_hot(matched_gt_cls, cfg.nc_det, dtype=f32)
    if train and cfg.det_label_smoothing > 0.0 and cfg.nc_det > 1:
        s = cfg.det_label_smoothing
        targets = jnp.full_like(one_hot, s / (cfg.nc_det - 1))
        targets = jnp.where(one_hot > 0, 1.0 - s, targets)
    else:
        targets = one_hot
    bce = _bce_with_logits(det_cls_logits, targets).sum(-1)  # [B, A]
    loss_cls_det = (bce * pos_f).sum() / avg_factor

    # ---- DFL: two-bin interpolated CE per ltrb side on positives ----
    matched_gt_xyxy = jnp.take_along_axis(
        gt_xyxy, best_gt[..., None], axis=1
    )  # [B, A, 4]
    anchor_abs = (anchors * strides)[None]  # [1, A, 2]
    gt_ltrb = (
        jnp.concatenate(
            [anchor_abs - matched_gt_xyxy[..., :2], matched_gt_xyxy[..., 2:] - anchor_abs],
            axis=-1,
        )
        / strides[None]
    )
    gt_ltrb = jnp.clip(gt_ltrb, 0.0, cfg.reg_max - 1.01)
    tl, tr, wl, wr = dfl_targets(gt_ltrb, cfg.reg_max)  # each [B, A, 4]
    lse = jax.nn.logsumexp(dist_logits, axis=-1)  # [B, A, 4]
    logit_tl = jnp.take_along_axis(dist_logits, tl[..., None], axis=-1)[..., 0]
    logit_tr = jnp.take_along_axis(dist_logits, tr[..., None], axis=-1)[..., 0]
    dfl = (lse - logit_tl) * wl + (lse - logit_tr) * wr  # [B, A, 4]
    loss_dfl = (dfl.sum(-1) * pos_f).sum() / avg_factor

    total = (
        cfg.weight_seg * loss_seg
        + cfg.weight_box_iou * loss_box_iou
        + cfg.weight_dfl * loss_dfl
        + cfg.weight_cls_det * loss_cls_det
        + cfg.weight_img_cls * loss_img_cls
    )
    return LossOutput(
        total=total,
        components={
            "seg": loss_seg,
            "box_iou": loss_box_iou,
            "dfl": loss_dfl,
            "cls_det": loss_cls_det,
            "img_cls": loss_img_cls,
        },
        num_pos=num_pos,
        avg_iou=avg_iou,
        matched_mask=positive,
        matched_pred_cls=det_cls_logits.argmax(-1).astype(jnp.int32),
        matched_gt_cls=matched_gt_cls,
    )
