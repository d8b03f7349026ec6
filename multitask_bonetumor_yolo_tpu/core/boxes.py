"""Box coordinate transforms and IoU.

Semantics match the reference implementation (cited for parity, not copied):
  * IoU matrix      — /root/reference/src/running_main_v3.py:71-97 (``batch_bbox_iou``)
  * dist2bbox       — /root/reference/src/running_main_v3.py:100-110
  * cxcywh<->xyxy   — inline conversions at running_main_v3.py:303-308, :566

All functions are pure jnp, broadcast over leading batch dims where noted, and
are safe to use inside ``jit`` / ``vmap`` / Pallas-free hot paths.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) center-x, center-y, w, h  ->  x1, y1, x2, y2."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1
    )


def box_xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) x1, y1, x2, y2  ->  cx, cy, w, h."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )


def box_iou_matrix(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-7
) -> jnp.ndarray:
    """Pairwise IoU between two xyxy box sets.

    boxes1: (..., N, 4), boxes2: (..., M, 4) -> (..., N, M).
    Degenerate (zero-area) boxes yield IoU 0 thanks to the clamped
    intersection and the ``eps`` in the denominator — identical behaviour to
    the reference for padded/invalid boxes of all-zeros.
    """
    a = jnp.expand_dims(boxes1, -2)  # (..., N, 1, 4)
    b = jnp.expand_dims(boxes2, -3)  # (..., 1, M, 4)

    inter_x1 = jnp.maximum(a[..., 0], b[..., 0])
    inter_y1 = jnp.maximum(a[..., 1], b[..., 1])
    inter_x2 = jnp.minimum(a[..., 2], b[..., 2])
    inter_y2 = jnp.minimum(a[..., 3], b[..., 3])

    inter = jnp.clip(inter_x2 - inter_x1, 0) * jnp.clip(inter_y2 - inter_y1, 0)
    area1 = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area2 = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area1 + area2 - inter
    return inter / (union + eps)


def box_iou_pairwise(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-7
) -> jnp.ndarray:
    """Elementwise IoU of aligned box arrays: (..., 4) x (..., 4) -> (...)."""
    inter_x1 = jnp.maximum(boxes1[..., 0], boxes2[..., 0])
    inter_y1 = jnp.maximum(boxes1[..., 1], boxes2[..., 1])
    inter_x2 = jnp.minimum(boxes1[..., 2], boxes2[..., 2])
    inter_y2 = jnp.minimum(boxes1[..., 3], boxes2[..., 3])

    inter = jnp.clip(inter_x2 - inter_x1, 0) * jnp.clip(inter_y2 - inter_y1, 0)
    area1 = (boxes1[..., 2] - boxes1[..., 0]) * (boxes1[..., 3] - boxes1[..., 1])
    area2 = (boxes2[..., 2] - boxes2[..., 0]) * (boxes2[..., 3] - boxes2[..., 1])
    return inter / (area1 + area2 - inter + eps)


def dist2bbox(
    distance: jnp.ndarray, anchor_points: jnp.ndarray, box_format: str = "xyxy"
) -> jnp.ndarray:
    """Decode (l, t, r, b) distances from anchor points into boxes.

    distance: (..., 4) ltrb; anchor_points: (..., 2) xy — broadcastable.
    """
    lt, rb = distance[..., :2], distance[..., 2:]
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if box_format == "xyxy":
        return jnp.concatenate([x1y1, x2y2], axis=-1)
    if box_format == "xywh":
        return jnp.concatenate([(x1y1 + x2y2) * 0.5, x2y2 - x1y1], axis=-1)
    raise NotImplementedError(f"box_format {box_format!r}")


def bbox2dist(
    anchor_points: jnp.ndarray,
    boxes_xyxy: jnp.ndarray,
    reg_max: int,
    clamp_hi_delta: float = 1.01,
) -> jnp.ndarray:
    """Inverse of :func:`dist2bbox` with the reference's DFL-target clamping.

    Returns ltrb distances clipped to [0, reg_max - clamp_hi_delta]
    (reference: running_main_v3.py:352-355 divides by stride first; callers
    here pass stride-normalised anchors/boxes).
    """
    lt = anchor_points - boxes_xyxy[..., :2]
    rb = boxes_xyxy[..., 2:] - anchor_points
    return jnp.clip(
        jnp.concatenate([lt, rb], axis=-1), 0.0, reg_max - clamp_hi_delta
    )
