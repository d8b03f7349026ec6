"""COCO-style mean-average-precision (bbox and segm), torchmetrics-compatible.

Replaces ``torchmetrics.detection.MeanAveragePrecision`` (pycocotools-backed;
used at /root/reference/src/running_main_v3.py:206-217) with a host-side numpy
implementation of the COCOeval algorithm:

  * greedy per-image matching, detections sorted by score, each detection
    takes the best still-unmatched GT with IoU >= threshold (ties to the
    earlier GT), matched GT can't be reused;
  * crowd/ignore handling is omitted (the BTXRD pipeline never produces
    iscrowd or ignore regions);
  * area-range evaluation marks out-of-range GT as ignored: detections matched
    to ignored GT are dropped from both TP and FP (COCOeval semantics);
  * AP = mean over 101-point interpolated precision at recalls 0:0.01:1,
    with precision made monotonically non-increasing from the right;
  * AR = mean best recall per IoU threshold with detections capped at maxDet;
  * scores averaged over classes present in GT; absent classes contribute -1
    and are excluded (COCO convention).

Output keys mirror torchmetrics: map, map_50, map_75, map_small, map_medium,
map_large, mar_{d} for each max_detection_threshold, mar_small/medium/large,
map_per_class, mar_{maxdet}_per_class, classes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

_AREA_RANGES = {
    "all": (0.0, float("inf")),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, float("inf")),
}
_REC_THRS = np.linspace(0.0, 1.0, 101)


def _box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float64)
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def _mask_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a: [N,H,W] bool, b: [M,H,W] bool -> [N,M]."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float64)
    af = a.reshape(len(a), -1).astype(np.float64)
    bf = b.reshape(len(b), -1).astype(np.float64)
    inter = af @ bf.T
    union = af.sum(1)[:, None] + bf.sum(1)[None, :] - inter
    return inter / np.maximum(union, 1e-9)


class MeanAveragePrecision:
    """Accumulating COCO mAP. ``iou_type`` 'bbox' (xyxy) or 'segm' (bool masks)."""

    def __init__(
        self,
        iou_type: str = "bbox",
        iou_thresholds: Optional[Sequence[float]] = None,
        max_detection_thresholds: Sequence[int] = (1, 10, 100),
        class_metrics: bool = False,
    ):
        if iou_type not in ("bbox", "segm"):
            raise ValueError(f"iou_type {iou_type!r}")
        self.iou_type = iou_type
        self.iou_thresholds = (
            np.asarray(iou_thresholds, np.float64)
            if iou_thresholds is not None
            else np.linspace(0.5, 0.95, 10)
        )
        self.max_dets = sorted(int(d) for d in max_detection_thresholds)
        self.class_metrics = class_metrics
        self.reset()

    def reset(self) -> None:
        self._preds: List[dict] = []
        self._targets: List[dict] = []

    def update(self, preds: Sequence[dict], targets: Sequence[dict]) -> None:
        """preds: per-image dicts with 'scores','labels' and 'boxes' (xyxy
        [N,4]) or 'masks' ([N,H,W] bool). targets: 'labels' + same geometry
        key. Numpy or JAX arrays both accepted."""
        if len(preds) != len(targets):
            raise ValueError("preds and targets must align per-image")
        for p, t in zip(preds, targets):
            self._preds.append({k: np.asarray(v) for k, v in p.items()})
            self._targets.append({k: np.asarray(v) for k, v in t.items()})

    # ------------------------------------------------------------------
    def _geometry(self, d: dict) -> np.ndarray:
        return d["masks"] if self.iou_type == "segm" else d["boxes"]

    def _areas(self, geom: np.ndarray) -> np.ndarray:
        if len(geom) == 0:
            return np.zeros((0,), np.float64)
        if self.iou_type == "segm":
            return geom.reshape(len(geom), -1).sum(1).astype(np.float64)
        return ((geom[:, 2] - geom[:, 0]) * (geom[:, 3] - geom[:, 1])).astype(
            np.float64
        )

    def _evaluate_class(self, cls: int, area_rng, max_det: int):
        """Returns (scores, tp_flags [T, D]) concatenated over images, plus
        total GT count in range."""
        T = len(self.iou_thresholds)
        all_scores, all_tp, all_ignore = [], [], []
        n_gt = 0
        for p, t in zip(self._preds, self._targets):
            p_sel = np.asarray(p["labels"]) == cls
            t_sel = np.asarray(t["labels"]) == cls
            geom_p = self._geometry(p)[p_sel]
            geom_t = self._geometry(t)[t_sel]
            scores = np.asarray(p["scores"], np.float64)[p_sel]

            order = np.argsort(-scores, kind="stable")[:max_det]
            geom_p, scores = geom_p[order], scores[order]

            gt_area = self._areas(geom_t)
            gt_ignore = (gt_area < area_rng[0]) | (gt_area > area_rng[1])
            n_gt += int((~gt_ignore).sum())

            iou = (
                _mask_iou(geom_p, geom_t)
                if self.iou_type == "segm"
                else _box_iou(geom_p, geom_t)
            )
            D, G = iou.shape
            tp = np.zeros((T, D), bool)
            ign = np.zeros((T, D), bool)
            for ti, thr in enumerate(self.iou_thresholds):
                taken = np.zeros(G, bool)
                for di in range(D):
                    best, best_g = thr, -1
                    for gi in range(G):
                        if taken[gi]:
                            continue
                        # prefer non-ignored matches; COCOeval allows switching
                        # to an ignored gt only if no valid match was found
                        if best_g >= 0 and not gt_ignore[best_g] and gt_ignore[gi]:
                            continue
                        if iou[di, gi] >= best or (
                            best_g >= 0
                            and gt_ignore[best_g]
                            and not gt_ignore[gi]
                            and iou[di, gi] >= thr
                        ):
                            best, best_g = iou[di, gi], gi
                    if best_g >= 0:
                        taken[best_g] = True
                        if gt_ignore[best_g]:
                            ign[ti, di] = True
                        else:
                            tp[ti, di] = True
                # COCOeval: unmatched detections whose own area is outside the
                # range are ignored rather than counted as FP
                if D:
                    det_area = self._areas(geom_p)
                    out_of_rng = (det_area < area_rng[0]) | (det_area > area_rng[1])
                    unmatched = ~(tp[ti] | ign[ti])
                    ign[ti] |= unmatched & out_of_rng
            all_scores.append(scores)
            all_tp.append(tp)
            all_ignore.append(ign)

        scores = np.concatenate(all_scores) if all_scores else np.zeros((0,))
        tp = (
            np.concatenate(all_tp, axis=1)
            if all_tp
            else np.zeros((T, 0), bool)
        )
        ign = (
            np.concatenate(all_ignore, axis=1)
            if all_ignore
            else np.zeros((T, 0), bool)
        )
        return scores, tp, ign, n_gt

    def _ap_ar_for(self, cls: int, area: str, max_det: int):
        """(AP[T], AR[T]) for one class/area/maxDet combo; -1 when no GT."""
        scores, tp, ign, n_gt = self._evaluate_class(
            cls, _AREA_RANGES[area], max_det
        )
        T = len(self.iou_thresholds)
        if n_gt == 0:
            return np.full(T, -1.0), np.full(T, -1.0)
        order = np.argsort(-scores, kind="stable")
        tp, ign = tp[:, order], ign[:, order]
        ap = np.zeros(T)
        ar = np.zeros(T)
        for ti in range(T):
            keep = ~ign[ti]
            tps = np.cumsum(tp[ti][keep])
            fps = np.cumsum(~tp[ti][keep])
            rec = tps / n_gt
            prec = tps / np.maximum(tps + fps, 1e-9)
            ar[ti] = rec[-1] if len(rec) else 0.0
            # monotone precision from the right, sample at 101 recall points
            if len(prec):
                prec = np.maximum.accumulate(prec[::-1])[::-1]
                idx = np.searchsorted(rec, _REC_THRS, side="left")
                q = np.where(idx < len(prec), prec[np.minimum(idx, len(prec) - 1)], 0.0)
                ap[ti] = q.mean()
        return ap, ar

    def compute(self) -> Dict[str, float]:
        classes = sorted(
            {int(c) for t in self._targets for c in np.asarray(t["labels"]).ravel()}
            | {int(c) for p in self._preds for c in np.asarray(p["labels"]).ravel()}
        )
        T = len(self.iou_thresholds)
        max_det = self.max_dets[-1]

        def mean_valid(vals):
            vals = np.asarray(vals, np.float64)
            valid = vals > -1
            return float(vals[valid].mean()) if valid.any() else -1.0

        ap_all, ar_all = {}, {}
        per_class_ap, per_class_ar = [], []
        for cls in classes:
            ap, ar = self._ap_ar_for(cls, "all", max_det)
            ap_all[cls], ar_all[cls] = ap, ar
            per_class_ap.append(mean_valid(ap))
            per_class_ar.append(mean_valid(ar))

        out: Dict[str, float] = {}
        out["map"] = mean_valid([ap_all[c].mean() if (ap_all[c] > -1).all() else -1 for c in classes]) if classes else -1.0
        # per-threshold convenience keys when present
        for thr, key in ((0.5, "map_50"), (0.75, "map_75")):
            idx = np.where(np.isclose(self.iou_thresholds, thr))[0]
            if len(idx):
                out[key] = mean_valid([ap_all[c][idx[0]] for c in classes]) if classes else -1.0
            else:
                out[key] = -1.0
        for area in ("small", "medium", "large"):
            vals_ap, vals_ar = [], []
            for cls in classes:
                ap, ar = self._ap_ar_for(cls, area, max_det)
                vals_ap.append(mean_valid(ap))
                vals_ar.append(mean_valid(ar))
            out[f"map_{area}"] = mean_valid(vals_ap) if classes else -1.0
            out[f"mar_{area}"] = mean_valid(vals_ar) if classes else -1.0
        for d in self.max_dets:
            vals = []
            for cls in classes:
                _, ar = self._ap_ar_for(cls, "all", d)
                vals.append(mean_valid(ar))
            out[f"mar_{d}"] = mean_valid(vals) if classes else -1.0
        if self.class_metrics:
            out["map_per_class"] = np.asarray(per_class_ap)
            out[f"mar_{max_det}_per_class"] = np.asarray(per_class_ar)
        out["classes"] = np.asarray(classes, np.int32)
        return out
