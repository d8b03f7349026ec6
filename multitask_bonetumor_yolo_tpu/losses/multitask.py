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
    # Detection assigner. "reference" = the parity default: every anchor
    # whose decoded prediction overlaps a GT > iou_match_thresh is positive
    # with a HARD cls target (running_main_v3.py:317-347) — SURVEY §2.4
    # documents this as the swap-in point, and BASELINE.md shows it caps
    # synthetic mAP50 at ~0.43 via score-saturated duplicate boxes.
    # "tal" = task-aligned assignment (TOOD / YOLOv8): per GT, the top-k
    # center-inside anchors by score^alpha * IoU^beta become positives with
    # SOFT cls targets normalised to the GT's best IoU, negatives get
    # explicit zero targets, and box/DFL terms are alignment-weighted.
    assigner: str = "reference"
    tal_topk: int = 10
    tal_alpha: float = 0.5
    tal_beta: float = 6.0


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


def _assign_tal(
    iou: jnp.ndarray,  # [B, A, M], invalid GT columns already at -1
    det_cls_logits: jnp.ndarray,  # [B, A, nc]
    gt_cls: jnp.ndarray,  # [B, M] int32
    gt_valid: jnp.ndarray,  # [B, M] bool
    gt_xyxy: jnp.ndarray,  # [B, M, 4] absolute
    anchor_abs: jnp.ndarray,  # [A, 2] absolute anchor centers
    cfg: "LossConfig",
):
    """Task-aligned assignment (TOOD, Feng et al. 2021; the YOLOv8 assigner
    the reference's hard-IoU scheme is documented to be swappable with,
    SURVEY §2.4). Fully batched / fixed-shape:

      align[b,a,m] = score^alpha * IoU^beta over center-inside candidates,
      per GT top-k candidates -> positives, multi-GT anchors resolved by
      max IoU, soft target t_norm = align * max_iou_per_gt / max_align_per_gt.

    Returns (positive [B,A] bool, best_gt [B,A] int, box_w [B,A] f32,
    norm_t [B,A] f32, avg_iou scalar).
    """
    f32 = jnp.float32
    b, a, m = iou.shape
    iou_pos = jnp.maximum(iou, 0.0)

    # per-anchor score at each GT's class
    scores = jax.nn.sigmoid(det_cls_logits.astype(f32))  # [B, A, nc]
    gt_cls_b = jnp.broadcast_to(gt_cls[:, None, :], (b, a, m))
    s_at_gt = jnp.take_along_axis(scores, gt_cls_b, axis=-1)  # [B, A, M]

    # candidates: anchor center strictly inside the GT box
    ax, ay = anchor_abs[None, :, None, 0], anchor_abs[None, :, None, 1]
    inside = (
        (ax > gt_xyxy[:, None, :, 0]) & (ax < gt_xyxy[:, None, :, 2])
        & (ay > gt_xyxy[:, None, :, 1]) & (ay < gt_xyxy[:, None, :, 3])
    )  # [B, A, M]
    cand = inside & gt_valid[:, None, :]

    align = jnp.where(
        cand, (s_at_gt ** cfg.tal_alpha) * (iou_pos ** cfg.tal_beta), 0.0
    )  # [B, A, M]

    # per-GT top-k over anchors (threshold form; zero-metric ties excluded)
    align_t = jnp.swapaxes(align, 1, 2)  # [B, M, A]
    k = min(cfg.tal_topk, a)
    kth = jax.lax.top_k(align_t, k)[0][..., -1]  # [B, M]
    selected = (align >= kth[:, None, :]) & (align > 0)  # [B, A, M]

    # resolve anchors claimed by several GT: keep the highest-IoU GT
    sel_iou = jnp.where(selected, iou_pos, -1.0)
    best_gt = sel_iou.argmax(axis=-1)  # [B, A]
    positive = selected.any(axis=-1)  # [B, A]

    # per-GT normalisation: scale alignment so its max matches the GT's
    # best candidate IoU (TOOD eq. 4 as used by ultralytics)
    max_align = jnp.max(jnp.where(selected, align, 0.0), axis=1)  # [B, M]
    max_iou = jnp.max(jnp.where(selected, iou_pos, 0.0), axis=1)  # [B, M]
    gt_scale = max_iou / jnp.maximum(max_align, 1e-9)  # [B, M]
    t_at_assigned = jnp.take_along_axis(align, best_gt[..., None], axis=-1)[..., 0]
    scale_at_assigned = jnp.take_along_axis(gt_scale, best_gt, axis=1)
    norm_t = jnp.where(positive, t_at_assigned * scale_at_assigned, 0.0)

    box_w = norm_t  # alignment-weighted box/DFL terms
    iou_at = jnp.take_along_axis(iou_pos, best_gt[..., None], axis=-1)[..., 0]
    pos_f = positive.astype(f32)
    avg_iou = jnp.where(
        pos_f.sum() > 0, (iou_at * pos_f).sum() / jnp.maximum(pos_f.sum(), 1.0),
        0.0,
    )
    return positive, best_gt, box_w, norm_t, avg_iou


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

    # ---- assignment ----
    iou = box_iou_matrix(pred_xyxy, gt_xyxy)  # [B, A, M]
    iou = jnp.where(gt_valid[:, None, :], iou, -1.0)
    batch_size = pred_xyxy.shape[0]

    if cfg.assigner == "reference":
        # per-anchor best GT by IoU of current predictions (parity default)
        pred_max_iou = iou.max(axis=-1)  # [B, A]
        best_gt = iou.argmax(axis=-1)  # [B, A]
        positive = pred_max_iou > cfg.iou_match_thresh  # [B, A]
        pos_f = positive.astype(f32)

        num_pos = pos_f.sum()
        avg_factor = jnp.where(num_pos > 0, num_pos, float(batch_size))

        # box IoU loss: Σ (1 − IoU) over positives
        loss_box_iou = ((1.0 - pred_max_iou) * pos_f).sum() / avg_factor
        avg_iou = jnp.where(
            num_pos > 0,
            (pred_max_iou * pos_f).sum() / jnp.maximum(num_pos, 1.0), 0.0,
        )

        # det-cls BCE(sum) on positives, hard (optionally smoothed) targets
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
        box_w = pos_f
        dfl_norm = avg_factor
    elif cfg.assigner == "tal":
        # The assignment is a *target builder*, not part of the loss surface:
        # TOOD/ultralytics run it on DETACHED predictions. Detaching also
        # kills the pow-VJP NaN path — d(s^alpha)/ds = alpha*s^(alpha-1) is
        # inf when sigmoid underflows to exactly 0 on hard negatives, and
        # 0*inf through the where-mask poisons the whole gradient (observed
        # as late-training divergence at ~step 1000 on the synthetic recipe).
        (positive, best_gt, box_w, norm_t, avg_iou) = _assign_tal(
            jax.lax.stop_gradient(iou),
            jax.lax.stop_gradient(det_cls_logits),
            gt_cls, gt_valid, gt_xyxy,
            (anchors * strides), cfg,
        )
        pos_f = positive.astype(f32)
        num_pos = pos_f.sum()
        matched_gt_cls = jnp.take_along_axis(gt_cls, best_gt, axis=1)
        one_hot = jax.nn.one_hot(matched_gt_cls, cfg.nc_det, dtype=f32)
        # soft targets: normalised alignment on positives, explicit 0 on
        # negatives (the down-pressure the reference assigner lacks)
        targets = one_hot * (norm_t * pos_f)[..., None]
        target_sum = jnp.maximum(targets.sum(), 1.0)
        loss_cls_det = _bce_with_logits(det_cls_logits, targets).sum() / target_sum
        # alignment-weighted box term over the ASSIGNED gt's IoU
        iou_at_assigned = jnp.take_along_axis(iou, best_gt[..., None], axis=-1)[..., 0]
        loss_box_iou = ((1.0 - iou_at_assigned) * box_w).sum() / target_sum
        dfl_norm = target_sum
    else:
        raise ValueError(f"unknown assigner {cfg.assigner!r}")

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
    loss_dfl = (dfl.sum(-1) * box_w).sum() / dfl_norm

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
