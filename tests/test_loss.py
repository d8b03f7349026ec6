"""Parity test: vectorized multitask loss vs a literal numpy transcription of
the reference's per-image loop semantics (running_main_v3.py:232-387)."""

import numpy as np
import jax.numpy as jnp

from multitask_bonetumor_yolo_tpu.losses import LossConfig, multitask_loss
from multitask_bonetumor_yolo_tpu.core.anchors import num_anchors


# ---------------------------------------------------------------- numpy oracle
def np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def np_bce_logits(x, z):
    return np.maximum(x, 0) - x * z + np.log1p(np.exp(-np.abs(x)))


def np_iou_matrix(a, b, eps=1e-7):
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None, :] - inter + eps)


def reference_loss_numpy(det_levels, seg_logits, cls_logits, gt_rows, masks,
                         img_cls, cfg, train):
    """Per-image loop, following running_main_v3.py line by line.

    det_levels: list of [B, H, W, 4*rm+nc] numpy arrays (NHWC).
    gt_rows: [N, 6] rows (batch_idx, cls, xc, yc, w, h) — the reference's
    ragged concat format.
    """
    B = det_levels[0].shape[0]
    rm, nc, S = cfg.reg_max, cfg.nc_det, cfg.img_size
    project = np.arange(rm, dtype=np.float32)

    # img-cls CE (mean)
    lse = np.log(np.exp(cls_logits - cls_logits.max(-1, keepdims=True)).sum(-1)) \
        + cls_logits.max(-1, keepdims=True)[:, 0]
    loss_img_cls = float(np.mean(lse - cls_logits[np.arange(B), img_cls]))

    # seg BCE (mean)
    loss_seg = float(np.mean(np_bce_logits(seg_logits, masks)))

    # decode all levels
    boxes_all, cls_all, dist_all, anchors_all, strides_all = [], [], [], [], []
    for lv in det_levels:
        b, h, w, ch = lv.shape
        stride = S / w
        flat = lv.reshape(b, h * w, ch)
        dist_raw = flat[..., : rm * 4].reshape(b, h * w, 4, rm)
        cls_lg = flat[..., rm * 4:]
        probs = np_softmax(dist_raw)
        ltrb = (probs * project).sum(-1)
        gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        ap = np.stack([gx + 0.5, gy + 0.5], -1).reshape(1, h * w, 2)
        ap = np.repeat(ap, b, 0)
        lt, rb_ = ltrb[..., :2], ltrb[..., 2:]
        x1y1 = ap * stride - lt * stride
        x2y2 = ap * stride + rb_ * stride
        boxes_all.append(np.concatenate([x1y1, x2y2], -1))
        cls_all.append(cls_lg)
        dist_all.append(dist_raw)
        anchors_all.append(ap)
        strides_all.append(np.full((b, h * w, 1), stride, np.float32))
    pred_boxes = np.concatenate(boxes_all, 1)
    pred_cls = np.concatenate(cls_all, 1)
    pred_dist = np.concatenate(dist_all, 1)
    anchors = np.concatenate(anchors_all, 1)
    strides = np.concatenate(strides_all, 1)

    loss_box = loss_cls = loss_dfl = 0.0
    num_pos = 0
    accum_iou = 0.0
    for bi in range(B):
        g = gt_rows[gt_rows[:, 0] == bi]
        if g.size == 0:
            continue
        g_cls = g[:, 1].astype(int)
        cx, cy, w_, h_ = g[:, 2], g[:, 3], g[:, 4], g[:, 5]
        g_xyxy = np.stack([(cx - w_ / 2) * S, (cy - h_ / 2) * S,
                           (cx + w_ / 2) * S, (cy + h_ / 2) * S], -1)
        ious = np_iou_matrix(pred_boxes[bi], g_xyxy)
        best_iou = ious.max(1)
        best_idx = ious.argmax(1)
        pos = best_iou > cfg.iou_match_thresh
        n = int(pos.sum())
        if n == 0:
            continue
        num_pos += n
        loss_box += float((1.0 - best_iou[pos]).sum())
        accum_iou += float(best_iou[pos].sum())

        mlogits = pred_cls[bi][pos]
        mcls = g_cls[best_idx[pos]]
        if train and cfg.det_label_smoothing > 0:
            s = cfg.det_label_smoothing
            tgt = np.full_like(mlogits, s / (nc - 1))
            tgt[np.arange(n), mcls] = 1.0 - s
        else:
            tgt = np.zeros_like(mlogits)
            tgt[np.arange(n), mcls] = 1.0
        loss_cls += float(np_bce_logits(mlogits, tgt).sum())

        ap_pos = anchors[bi][pos] * strides[bi][pos]
        mgt = g_xyxy[best_idx[pos]]
        gt_ltrb = np.concatenate([ap_pos - mgt[:, :2], mgt[:, 2:] - ap_pos], -1) \
            / strides[bi][pos]
        gt_ltrb = np.clip(gt_ltrb, 0, rm - 1.01)
        tl = np.clip(np.floor(gt_ltrb), 0, rm - 1).astype(int)
        tr = np.clip(tl + 1, 0, rm - 1)
        wl = tr.astype(np.float32) - gt_ltrb
        wr = gt_ltrb - tl.astype(np.float32)
        d = pred_dist[bi][pos]  # [n, 4, rm]
        for k in range(4):
            logits_k = d[:, k, :]
            lse_k = np.log(np.exp(logits_k - logits_k.max(-1, keepdims=True))
                           .sum(-1)) + logits_k.max(-1)
            ce_tl = lse_k - logits_k[np.arange(n), tl[:, k]]
            ce_tr = lse_k - logits_k[np.arange(n), tr[:, k]]
            loss_dfl += float((ce_tl * wl[:, k] + ce_tr * wr[:, k]).sum())

    avg_f = float(num_pos) if num_pos > 0 else float(B)
    comp = dict(
        seg=loss_seg,
        box_iou=loss_box / avg_f,
        dfl=loss_dfl / avg_f,
        cls_det=loss_cls / avg_f,
        img_cls=loss_img_cls,
    )
    total = (cfg.weight_seg * comp["seg"] + cfg.weight_box_iou * comp["box_iou"]
             + cfg.weight_dfl * comp["dfl"] + cfg.weight_cls_det * comp["cls_det"]
             + cfg.weight_img_cls * comp["img_cls"])
    return total, comp, num_pos


# ---------------------------------------------------------------- fixtures
def make_inputs(rng, B=2, img_size=64, nc=2, rm=16, max_boxes=8, with_boxes=True):
    S = img_size
    sizes = [S // 8, S // 16, S // 32]
    det_levels = [
        (rng.randn(B, n, n, 4 * rm + nc) * 2).astype(np.float32) for n in sizes
    ]
    seg_logits = rng.randn(B, S, S, 1).astype(np.float32)
    cls_logits = rng.randn(B, nc).astype(np.float32)
    masks = (rng.rand(B, S, S, 1) > 0.5).astype(np.float32)
    img_cls = rng.randint(0, nc, B).astype(np.int32)

    boxes = np.zeros((B, max_boxes, 5), np.float32)
    valid = np.zeros((B, max_boxes), bool)
    rows = []
    if with_boxes:
        for bi in range(B):
            n = rng.randint(1, max_boxes)
            for j in range(n):
                cx, cy = rng.rand(2) * 0.6 + 0.2
                w, h = rng.rand(2) * 0.3 + 0.1
                c = rng.randint(0, nc)
                boxes[bi, j] = [c, cx, cy, w, h]
                valid[bi, j] = True
                rows.append([bi, c, cx, cy, w, h])
    gt_rows = np.asarray(rows, np.float32) if rows else np.zeros((0, 6), np.float32)
    return det_levels, seg_logits, cls_logits, masks, img_cls, boxes, valid, gt_rows


def run_both(rng, train, with_boxes=True, thresh=0.5):
    cfg = LossConfig(img_size=64, nc_det=2, iou_match_thresh=thresh,
                     det_label_smoothing=0.1)
    (det_levels, seg_logits, cls_logits, masks, img_cls,
     boxes, valid, gt_rows) = make_inputs(rng, with_boxes=with_boxes)

    out = multitask_loss(
        {
            "det_feats": [jnp.asarray(l) for l in det_levels],
            "seg_logits": jnp.asarray(seg_logits),
            "cls_logits": jnp.asarray(cls_logits),
        },
        {
            "boxes": jnp.asarray(boxes),
            "box_valid": jnp.asarray(valid),
            "mask": jnp.asarray(masks),
            "img_cls": jnp.asarray(img_cls),
        },
        cfg,
        train=train,
    )
    want_total, want_comp, want_npos = reference_loss_numpy(
        det_levels, seg_logits, cls_logits, gt_rows, masks, img_cls, cfg, train
    )
    return out, want_total, want_comp, want_npos


def test_loss_parity_train(rng):
    # random logits rarely exceed IoU 0.5 vs GT; lower thresh to get positives
    out, want_total, want_comp, want_npos = run_both(rng, train=True, thresh=0.05)
    assert int(out.num_pos) == want_npos and want_npos > 0
    for k, v in want_comp.items():
        np.testing.assert_allclose(float(out.components[k]), v, rtol=2e-4, err_msg=k)
    np.testing.assert_allclose(float(out.total), want_total, rtol=2e-4)


def test_loss_parity_eval_no_smoothing(rng):
    out, want_total, want_comp, _ = run_both(rng, train=False, thresh=0.05)
    for k, v in want_comp.items():
        np.testing.assert_allclose(float(out.components[k]), v, rtol=2e-4, err_msg=k)
    np.testing.assert_allclose(float(out.total), want_total, rtol=2e-4)


def test_loss_no_positives_falls_back_to_batch_size(rng):
    # IoU threshold 0.99 → no positives; det terms are 0/batch_size = 0
    out, want_total, want_comp, want_npos = run_both(rng, train=True, thresh=0.999)
    assert int(out.num_pos) == 0 == want_npos
    assert float(out.components["box_iou"]) == 0.0
    assert float(out.components["dfl"]) == 0.0
    np.testing.assert_allclose(float(out.total), want_total, rtol=2e-4)


def test_loss_no_gt_at_all(rng):
    out, want_total, want_comp, _ = run_both(rng, train=True, with_boxes=False)
    assert int(out.num_pos) == 0
    assert float(out.components["box_iou"]) == 0.0
    np.testing.assert_allclose(float(out.total), want_total, rtol=2e-4)
    assert np.isfinite(float(out.total))


def test_loss_gradients_finite(rng):
    import jax

    cfg = LossConfig(img_size=64, nc_det=2, iou_match_thresh=0.05)
    (det_levels, seg_logits, cls_logits, masks, img_cls,
     boxes, valid, _) = make_inputs(rng)

    def f(dl, sl, cl):
        out = multitask_loss(
            {"det_feats": dl, "seg_logits": sl, "cls_logits": cl},
            {"boxes": jnp.asarray(boxes), "box_valid": jnp.asarray(valid),
             "mask": jnp.asarray(masks), "img_cls": jnp.asarray(img_cls)},
            cfg, train=True,
        )
        return out.total

    grads = jax.grad(f, argnums=(0, 1, 2))(
        [jnp.asarray(l) for l in det_levels],
        jnp.asarray(seg_logits), jnp.asarray(cls_logits),
    )
    for g in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(g)).all()


# ---------------------------------------------------------------- TAL assigner
def tal_loss(rng, with_boxes=True, **kw):
    cfg = LossConfig(img_size=64, nc_det=2, assigner="tal", **kw)
    (det_levels, seg_logits, cls_logits, masks, img_cls,
     boxes, valid, _) = make_inputs(rng, with_boxes=with_boxes)
    out = multitask_loss(
        {"det_feats": [jnp.asarray(l) for l in det_levels],
         "seg_logits": jnp.asarray(seg_logits),
         "cls_logits": jnp.asarray(cls_logits)},
        {"boxes": jnp.asarray(boxes), "box_valid": jnp.asarray(valid),
         "mask": jnp.asarray(masks), "img_cls": jnp.asarray(img_cls)},
        cfg, train=True,
    )
    return out, boxes, valid


def test_tal_positive_budget_and_location(rng):
    """Each GT contributes at most tal_topk positives, and every positive
    anchor's center lies inside its assigned (valid) GT box."""
    from multitask_bonetumor_yolo_tpu.core.anchors import make_anchors

    out, boxes, valid = tal_loss(rng)
    pos = np.asarray(out.matched_mask)
    n_gt = valid.sum()
    assert 0 < pos.sum() <= n_gt * 10
    anchors, strides = make_anchors(64, (8, 16, 32))
    centers = np.asarray(anchors * strides)  # [A, 2]
    # assigned GT (cls already checked via matched_gt_cls); recover boxes
    for b in range(pos.shape[0]):
        gt_xyxy = np.stack([
            (boxes[b, :, 1] - boxes[b, :, 3] / 2) * 64,
            (boxes[b, :, 2] - boxes[b, :, 4] / 2) * 64,
            (boxes[b, :, 1] + boxes[b, :, 3] / 2) * 64,
            (boxes[b, :, 2] + boxes[b, :, 4] / 2) * 64,
        ], -1)
        for a in np.where(pos[b])[0]:
            c = centers[a]
            inside_any = (
                (c[0] > gt_xyxy[valid[b], 0]) & (c[0] < gt_xyxy[valid[b], 2])
                & (c[1] > gt_xyxy[valid[b], 1]) & (c[1] < gt_xyxy[valid[b], 3])
            ).any()
            assert inside_any, (b, a, c)


def test_tal_negative_pressure(rng):
    """Raising a far-away anchor's class score must increase the TAL cls
    loss (explicit zero targets on negatives) — the exact failure mode of
    the reference assigner, whose loss ignores negative anchors entirely."""
    cfg_tal = LossConfig(img_size=64, nc_det=2, assigner="tal")
    cfg_ref = LossConfig(img_size=64, nc_det=2, iou_match_thresh=0.999)
    (det_levels, seg_logits, cls_logits, masks, img_cls,
     boxes, valid, _) = make_inputs(rng, B=1, with_boxes=True)
    # one GT in the center; corner anchor of level 0 is far outside it
    boxes[:] = 0; valid[:] = False
    boxes[0, 0] = [0, 0.5, 0.5, 0.3, 0.3]; valid[0, 0] = True
    batch = {"boxes": jnp.asarray(boxes), "box_valid": jnp.asarray(valid),
             "mask": jnp.asarray(masks), "img_cls": jnp.asarray(img_cls)}

    def cls_loss(cfg, bump):
        lv = [l.copy() for l in det_levels]
        lv[0][0, 0, 0, 64:] += bump  # corner anchor's class logits
        out = multitask_loss(
            {"det_feats": [jnp.asarray(l) for l in lv],
             "seg_logits": jnp.asarray(seg_logits),
             "cls_logits": jnp.asarray(cls_logits)},
            batch, cfg, train=True)
        return float(out.components["cls_det"])

    assert cls_loss(cfg_tal, 8.0) > cls_loss(cfg_tal, 0.0) + 1e-4
    # reference assigner with no positives: bump is invisible
    assert abs(cls_loss(cfg_ref, 8.0) - cls_loss(cfg_ref, 0.0)) < 1e-7


def test_tal_no_gt_finite(rng):
    out, _, _ = tal_loss(rng, with_boxes=False)
    assert int(np.asarray(out.matched_mask).sum()) == 0
    assert float(out.components["box_iou"]) == 0.0
    assert float(out.components["dfl"]) == 0.0
    assert np.isfinite(float(out.total))


def test_tal_gradients_finite(rng):
    import jax

    cfg = LossConfig(img_size=64, nc_det=2, assigner="tal")
    (det_levels, seg_logits, cls_logits, masks, img_cls,
     boxes, valid, _) = make_inputs(rng)
    batch = {"boxes": jnp.asarray(boxes), "box_valid": jnp.asarray(valid),
             "mask": jnp.asarray(masks), "img_cls": jnp.asarray(img_cls)}

    def f(dl, sl, cl):
        return multitask_loss(
            {"det_feats": dl, "seg_logits": sl, "cls_logits": cl},
            batch, cfg, train=True).total

    grads = jax.grad(f, argnums=(0, 1, 2))(
        [jnp.asarray(l) for l in det_levels], jnp.asarray(seg_logits),
        jnp.asarray(cls_logits))
    for g in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(g)).all()


def test_tal_soft_targets_bounded_by_iou(rng):
    """The soft target ceiling equals each GT's best candidate IoU: with
    random (low-IoU) predictions every target must sit well below 1 — the
    saturation the hard assigner suffers cannot happen by construction."""
    from multitask_bonetumor_yolo_tpu.losses.multitask import (
        _assign_tal, flatten_det_levels,
    )
    from multitask_bonetumor_yolo_tpu.core.anchors import make_anchors
    from multitask_bonetumor_yolo_tpu.core.boxes import (
        box_cxcywh_to_xyxy, box_iou_matrix, dist2bbox,
    )
    from multitask_bonetumor_yolo_tpu.core.dfl import dfl_decode

    cfg = LossConfig(img_size=64, nc_det=2, assigner="tal")
    (det_levels, _, _, _, _, boxes, valid, _) = make_inputs(rng)
    dist_logits, det_cls_logits = flatten_det_levels(
        [jnp.asarray(l) for l in det_levels], cfg.reg_max)
    anchors, strides = make_anchors(64, (8, 16, 32))
    pred = dist2bbox(dfl_decode(dist_logits) * strides[None],
                     (anchors * strides)[None])
    gt_xyxy = box_cxcywh_to_xyxy(jnp.asarray(boxes[..., 1:5])) * 64
    iou = box_iou_matrix(pred, gt_xyxy)
    iou = jnp.where(jnp.asarray(valid)[:, None, :], iou, -1.0)
    positive, best_gt, box_w, norm_t, avg_iou = _assign_tal(
        iou, det_cls_logits, jnp.asarray(boxes[..., 0], jnp.int32),
        jnp.asarray(valid), gt_xyxy, anchors * strides, cfg)
    nt = np.asarray(norm_t)
    pos = np.asarray(positive)
    iou_np = np.asarray(jnp.maximum(iou, 0.0)).max(-1)
    assert nt[pos].max() <= iou_np.max() + 1e-6
    assert (nt[~pos] == 0).all()
    assert 0 < float(avg_iou) < 1


def test_tal_gradients_finite_under_sigmoid_underflow(rng):
    """Regression: late-training divergence trigger. When negative class
    logits are pushed so low that sigmoid underflows to EXACTLY 0.0 in f32,
    the pow VJP of s**alpha (alpha=0.5) is inf; if the assigner were not
    detached, 0*inf through the candidate where-mask poisons every gradient
    (observed at ~step 1000 of the round-4 synthetic TAL run). The assigner
    is a target builder and must be stop_gradient'd (TOOD/ultralytics
    contract)."""
    import jax

    cfg = LossConfig(img_size=64, nc_det=2, assigner="tal")
    (det_levels, seg_logits, cls_logits, masks, img_cls,
     boxes, valid, _) = make_inputs(rng)
    # force sigmoid(x) == 0.0 exactly on all non-GT class logits
    for l in det_levels:
        l[..., 64:] = -200.0
    assert float(jax.nn.sigmoid(jnp.float32(-200.0))) == 0.0
    batch = {"boxes": jnp.asarray(boxes), "box_valid": jnp.asarray(valid),
             "mask": jnp.asarray(masks), "img_cls": jnp.asarray(img_cls)}

    def f(dl, sl, cl):
        return multitask_loss(
            {"det_feats": dl, "seg_logits": sl, "cls_logits": cl},
            batch, cfg, train=True).total

    grads = jax.grad(f, argnums=(0, 1, 2))(
        [jnp.asarray(l) for l in det_levels], jnp.asarray(seg_logits),
        jnp.asarray(cls_logits))
    for g in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
