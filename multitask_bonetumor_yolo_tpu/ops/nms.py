"""Batched, fixed-shape, class-agnostic greedy NMS (TPU-native).

Replaces the reference's per-image Python loop over ``torchvision.ops.nms``
(/root/reference/src/running_main_v3.py:535-549: conf > 0.05 filter ->
class-agnostic NMS at IoU 0.6 -> top-100). Everything here is static-shape,
jit-friendly and vmapped over the batch:

  1. invalidate scores <= conf_thresh,
  2. take the ``pre_nms_top_k`` highest-scoring candidates (lax.top_k is
     descending with ties broken by lower index — the same ordering a stable
     descending sort gives torchvision),
  3. sequential greedy suppression over the candidate IoU matrix
     (lax.fori_loop — identical keep-set to the CUDA kernel),
  4. re-rank survivors and emit exactly ``top_k`` slots + a validity mask.

Padded slots carry score 0, label -1, box (0,0,0,0).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.boxes import box_iou_matrix, box_cxcywh_to_xyxy


class NMSResult(NamedTuple):
    boxes: jnp.ndarray  # [B, top_k, 4] xyxy
    scores: jnp.ndarray  # [B, top_k]
    labels: jnp.ndarray  # [B, top_k] int32, -1 for padding
    valid: jnp.ndarray  # [B, top_k] bool


def _nms_single(
    boxes: jnp.ndarray,  # [A, 4] xyxy
    scores: jnp.ndarray,  # [A]
    labels: jnp.ndarray,  # [A] int32
    iou_thresh: float,
    conf_thresh: float,
    top_k: int,
    pre_nms_top_k: int,
):
    a = boxes.shape[0]
    k = min(pre_nms_top_k, a)

    valid = scores > conf_thresh
    masked_scores = jnp.where(valid, scores, -1.0)
    cand_scores, cand_idx = lax.top_k(masked_scores, k)  # descending
    cand_boxes = boxes[cand_idx]
    cand_labels = labels[cand_idx]
    cand_valid = cand_scores > conf_thresh

    iou = box_iou_matrix(cand_boxes, cand_boxes)  # [k, k]
    order = jnp.arange(k)

    def body(i, keep):
        # if candidate i survives, suppress every lower-ranked overlap
        suppress = (iou[i] > iou_thresh) & (order > i) & keep[i]
        return keep & ~suppress

    keep = lax.fori_loop(0, k, body, cand_valid)

    # re-rank survivors (already score-ordered) into exactly top_k slots
    final_scores = jnp.where(keep, cand_scores, -1.0)
    out_scores, out_idx = lax.top_k(final_scores, top_k)
    out_valid = out_scores > conf_thresh
    out_boxes = jnp.where(out_valid[:, None], cand_boxes[out_idx], 0.0)
    out_labels = jnp.where(out_valid, cand_labels[out_idx], -1)
    out_scores = jnp.where(out_valid, out_scores, 0.0)
    return out_boxes, out_scores, out_labels, out_valid


@partial(
    jax.jit, static_argnames=("iou_thresh", "conf_thresh", "top_k", "pre_nms_top_k")
)
def batched_nms(
    boxes: jnp.ndarray,  # [B, A, 4] xyxy
    scores: jnp.ndarray,  # [B, A]
    labels: jnp.ndarray,  # [B, A] int32
    iou_thresh: float = 0.6,
    conf_thresh: float = 0.05,
    top_k: int = 100,
    pre_nms_top_k: int = 1024,
) -> NMSResult:
    """Class-agnostic greedy NMS vmapped over the batch."""
    fn = partial(
        _nms_single,
        iou_thresh=iou_thresh,
        conf_thresh=conf_thresh,
        top_k=top_k,
        pre_nms_top_k=pre_nms_top_k,
    )
    out = jax.vmap(fn)(boxes.astype(jnp.float32), scores.astype(jnp.float32), labels)
    return NMSResult(*out)


def postprocess_detections(
    det_preds: jnp.ndarray,  # [B, A, 4+nc] decoded xywh-abs + sigmoid scores
    img_size: int,
    iou_thresh: float = 0.6,
    conf_thresh: float = 0.05,
    top_k: int = 100,
    pre_nms_top_k: int = 1024,
) -> NMSResult:
    """Reference validation decode path, batched (running_main_v3.py:535-553):
    per-anchor best class (max score + argmax label), clamp boxes to
    [0, img_size], conf filter, class-agnostic NMS, top-K."""
    boxes_xyxy = jnp.clip(
        box_cxcywh_to_xyxy(det_preds[..., :4]), 0.0, float(img_size)
    )
    cls_scores = det_preds[..., 4:]
    scores = cls_scores.max(axis=-1)
    labels = cls_scores.argmax(axis=-1).astype(jnp.int32)
    return batched_nms(
        boxes_xyxy,
        scores,
        labels,
        iou_thresh=iou_thresh,
        conf_thresh=conf_thresh,
        top_k=top_k,
        pre_nms_top_k=pre_nms_top_k,
    )
