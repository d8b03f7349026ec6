"""Fuzz metrics.detection.MeanAveragePrecision against a literal numpy
transcription of pycocotools' COCOeval (the backend of the torchmetrics
``MeanAveragePrecision`` the reference uses at
/root/reference/src/running_main_v3.py:206-217).

The oracle below follows COCOeval.evaluateImg/accumulate step by step —
gt sorted ignored-last, the `break`-on-first-ignored matching loop, the
min(t, 1-1e-10) threshold clamp, unmatched-detection area ignoring,
mergesort score ordering, 101-point interpolated precision — so any
divergence in our vectorised implementation shows up here. VERDICT round-1
weak #3.
"""

import numpy as np
import pytest

from multitask_bonetumor_yolo_tpu.metrics.detection import MeanAveragePrecision

AREA_RNGS = {
    "all": (0.0, float("inf")),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, float("inf")),
}
IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)


def _iou_box(d, g):
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    x1 = np.maximum(d[:, None, 0], g[None, :, 0])
    y1 = np.maximum(d[:, None, 1], g[None, :, 1])
    x2 = np.minimum(d[:, None, 2], g[None, :, 2])
    y2 = np.minimum(d[:, None, 3], g[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    ad = (d[:, 2] - d[:, 0]) * (d[:, 3] - d[:, 1])
    ag = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
    return inter / np.maximum(ad[:, None] + ag[None, :] - inter, 1e-12)


def _iou_mask(d, g):
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    df = d.reshape(len(d), -1).astype(np.float64)
    gf = g.reshape(len(g), -1).astype(np.float64)
    inter = df @ gf.T
    union = df.sum(1)[:, None] + gf.sum(1)[None, :] - inter
    return inter / np.maximum(union, 1e-12)


class CocoOracle:
    """Literal COCOeval transcription (bbox or segm, no crowd)."""

    def __init__(self, iou_type="bbox", max_dets=(1, 10, 100)):
        self.iou_type = iou_type
        self.max_dets = sorted(max_dets)
        self.preds, self.targets = [], []

    def update(self, preds, targets):
        self.preds += [dict(p) for p in preds]
        self.targets += [dict(t) for t in targets]

    def _geom(self, d):
        return np.asarray(d["masks" if self.iou_type == "segm" else "boxes"])

    def _area(self, geom):
        if len(geom) == 0:
            return np.zeros(0)
        if self.iou_type == "segm":
            return geom.reshape(len(geom), -1).sum(1).astype(np.float64)
        return ((geom[:, 2] - geom[:, 0]) * (geom[:, 3] - geom[:, 1])).astype(
            np.float64
        )

    def _evaluate_img(self, p, t, cls, a_rng, max_det):
        """COCOeval.evaluateImg."""
        psel = np.asarray(p["labels"]) == cls
        tsel = np.asarray(t["labels"]) == cls
        dt_geom = self._geom(p)[psel]
        gt_geom = self._geom(t)[tsel]
        scores = np.asarray(p["scores"], np.float64)[psel]
        if len(dt_geom) == 0 and len(gt_geom) == 0:
            return None

        g_area = self._area(gt_geom)
        g_ig = ((g_area < a_rng[0]) | (g_area > a_rng[1])).astype(np.int64)
        # gt sorted ignored-last (stable)
        gtind = np.argsort(g_ig, kind="mergesort")
        gt_geom, g_ig = gt_geom[gtind], g_ig[gtind]
        # dt sorted by -score (stable), truncated to maxDet
        dtind = np.argsort(-scores, kind="mergesort")[:max_det]
        dt_geom, scores = dt_geom[dtind], scores[dtind]

        ious = (
            _iou_mask(dt_geom, gt_geom)
            if self.iou_type == "segm"
            else _iou_box(dt_geom, gt_geom)
        )
        T, D, G = len(IOU_THRS), len(dt_geom), len(gt_geom)
        gtm = np.zeros((T, G), np.int64)
        dtm = np.zeros((T, D), np.int64)
        dt_ig = np.zeros((T, D), np.int64)
        for ti, thr in enumerate(IOU_THRS):
            for di in range(D):
                iou = min(thr, 1 - 1e-10)
                m = -1
                for gi in range(G):
                    if gtm[ti, gi] > 0:
                        continue
                    if m > -1 and g_ig[m] == 0 and g_ig[gi] == 1:
                        break
                    if ious[di, gi] < iou:
                        continue
                    iou = ious[di, gi]
                    m = gi
                if m == -1:
                    continue
                dt_ig[ti, di] = g_ig[m]
                dtm[ti, di] = 1 + m
                gtm[ti, m] = 1 + di
        d_area = self._area(dt_geom)
        a = (d_area < a_rng[0]) | (d_area > a_rng[1])
        dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0, a[None, :]))
        return {
            "dtScores": scores,
            "dtMatches": dtm,
            "dtIgnore": dt_ig,
            "gtIgnore": g_ig,
        }

    def _accumulate(self, cls, area, max_det):
        """COCOeval.accumulate for one (cls, area, maxDet): (AP[T], AR[T])."""
        evals = [
            self._evaluate_img(p, t, cls, AREA_RNGS[area], max_det)
            for p, t in zip(self.preds, self.targets)
        ]
        evals = [e for e in evals if e is not None]
        T = len(IOU_THRS)
        if not evals:
            return np.full(T, -1.0), np.full(T, -1.0)
        scores = np.concatenate([e["dtScores"] for e in evals])
        inds = np.argsort(-scores, kind="mergesort")
        dtm = np.concatenate([e["dtMatches"] for e in evals], axis=1)[:, inds]
        dt_ig = np.concatenate([e["dtIgnore"] for e in evals], axis=1)[:, inds]
        gt_ig = np.concatenate([e["gtIgnore"] for e in evals])
        npig = int((gt_ig == 0).sum())
        if npig == 0:
            return np.full(T, -1.0), np.full(T, -1.0)
        tps = np.logical_and(dtm > 0, np.logical_not(dt_ig))
        fps = np.logical_and(dtm == 0, np.logical_not(dt_ig))
        tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
        fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
        ap = np.zeros(T)
        ar = np.zeros(T)
        for ti in range(T):
            tp, fp = tp_sum[ti], fp_sum[ti]
            rc = tp / npig
            pr = tp / (fp + tp + np.spacing(1))
            ar[ti] = rc[-1] if len(rc) else 0.0
            q = np.zeros(len(REC_THRS))
            pr = pr.tolist()
            for i in range(len(pr) - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            inds_r = np.searchsorted(rc, REC_THRS, side="left")
            for ri, pi in enumerate(inds_r):
                if pi < len(pr):
                    q[ri] = pr[pi]
            ap[ti] = q.mean()
        return ap, ar

    def compute(self):
        classes = sorted(
            {int(c) for t in self.targets for c in np.asarray(t["labels"]).ravel()}
            | {int(c) for p in self.preds for c in np.asarray(p["labels"]).ravel()}
        )

        def mean_valid(vals):
            vals = np.asarray(vals, np.float64)
            ok = vals > -1
            return float(vals[ok].mean()) if ok.any() else -1.0

        out = {}
        md = self.max_dets[-1]
        per_cls = {c: self._accumulate(c, "all", md) for c in classes}
        out["map"] = mean_valid(
            [mean_valid(per_cls[c][0]) for c in classes]
        )
        for thr, key in ((0.5, "map_50"), (0.75, "map_75")):
            ti = int(np.where(np.isclose(IOU_THRS, thr))[0][0])
            out[key] = mean_valid([per_cls[c][0][ti] for c in classes])
        for area in ("small", "medium", "large"):
            vals_ap, vals_ar = [], []
            for c in classes:
                ap, ar = self._accumulate(c, area, md)
                vals_ap.append(mean_valid(ap))
                vals_ar.append(mean_valid(ar))
            out[f"map_{area}"] = mean_valid(vals_ap)
            out[f"mar_{area}"] = mean_valid(vals_ar)
        for d in self.max_dets:
            out[f"mar_{d}"] = mean_valid(
                [mean_valid(self._accumulate(c, "all", d)[1]) for c in classes]
            )
        return out


# ---------------------------------------------------------------- fuzzing
def _random_scene(rng, iou_type, n_classes=3, max_n=8, size=220.0):
    def boxes(n):
        cx = rng.rand(n) * size
        cy = rng.rand(n) * size
        w = rng.rand(n) * 150 + 2
        h = rng.rand(n) * 150 + 2
        b = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
        return np.clip(b, 0, size)

    def to_masks(b):
        m = np.zeros((len(b), 64, 64), bool)
        for i, (x1, y1, x2, y2) in enumerate(b / size * 64):
            m[i, int(y1):max(int(y2), int(y1) + 1),
              int(x1):max(int(x2), int(x1) + 1)] = True
        return m

    ng, nd = rng.randint(0, max_n + 1), rng.randint(0, max_n + 1)
    gt_b, dt_b = boxes(ng), boxes(nd)
    # make some detections overlap GT strongly (realistic TP population)
    for i in range(min(ng, nd)):
        if rng.rand() < 0.6:
            dt_b[i] = gt_b[i] + rng.randn(4) * 4
    t = {"labels": rng.randint(0, n_classes, ng)}
    p = {
        "labels": rng.randint(0, n_classes, nd),
        "scores": rng.rand(nd),
    }
    if iou_type == "segm":
        t["masks"] = to_masks(gt_b)
        p["masks"] = to_masks(dt_b)
    else:
        t["boxes"] = gt_b
        p["boxes"] = dt_b
    return p, t


KEYS = [
    "map", "map_50", "map_75", "map_small", "map_medium", "map_large",
    "mar_1", "mar_10", "mar_100", "mar_small", "mar_medium", "mar_large",
]


@pytest.mark.parametrize("iou_type", ["bbox", "segm"])
@pytest.mark.parametrize("seed", range(6))
def test_map_matches_cocoeval_oracle(iou_type, seed):
    rng = np.random.RandomState(seed)
    ours = MeanAveragePrecision(iou_type=iou_type)
    oracle = CocoOracle(iou_type=iou_type)
    n_images = 12
    preds, targets = zip(
        *(_random_scene(rng, iou_type) for _ in range(n_images))
    )
    ours.update(list(preds), list(targets))
    oracle.update(list(preds), list(targets))
    got, want = ours.compute(), oracle.compute()
    for k in KEYS:
        assert np.isclose(got[k], want[k], atol=1e-9), (
            k, got[k], want[k], seed, iou_type,
        )


def test_map_oracle_with_duplicate_scores_and_empty_images():
    """Tie-breaking + empty pred/GT images, exercised explicitly."""
    rng = np.random.RandomState(99)
    ours = MeanAveragePrecision()
    oracle = CocoOracle()
    scenes = []
    for i in range(8):
        p, t = _random_scene(rng, "bbox")
        p["scores"] = np.round(np.asarray(p["scores"]) * 4) / 4  # many ties
        scenes.append((p, t))
    scenes.append(({"boxes": np.zeros((0, 4)), "scores": np.zeros(0),
                    "labels": np.zeros(0, np.int64)},
                   {"boxes": np.asarray([[10.0, 10, 50, 50]]),
                    "labels": np.asarray([1])}))
    scenes.append(({"boxes": np.asarray([[10.0, 10, 50, 50]]),
                    "scores": np.asarray([0.9]),
                    "labels": np.asarray([0])},
                   {"boxes": np.zeros((0, 4)), "labels": np.zeros(0, np.int64)}))
    preds, targets = zip(*scenes)
    ours.update(list(preds), list(targets))
    oracle.update(list(preds), list(targets))
    got, want = ours.compute(), oracle.compute()
    for k in KEYS:
        assert np.isclose(got[k], want[k], atol=1e-9), (k, got[k], want[k])
