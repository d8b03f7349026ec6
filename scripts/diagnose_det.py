"""Diagnose detection-AP quality of a trained checkpoint.

Dumps, for a few validation images: GT boxes, the top-scored detections with
their IoU against the best-matching GT and label correctness, plus a
class-agnostic mAP50 — separating 'duplicate boxes', 'wrong class', and
'bad score ranking' failure modes.

Usage: python scripts/diagnose_det.py --run-dir /tmp/synth_run_v1 \
           --root /tmp/synth_rich640 [--batches 4]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--root", required=True)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--single-head", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from multitask_bonetumor_yolo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from multitask_bonetumor_yolo_tpu.core.boxes import box_iou_matrix
    from multitask_bonetumor_yolo_tpu.data import BTXRD, BTXRDLoader, DataConfig
    from multitask_bonetumor_yolo_tpu.losses import LossConfig
    from multitask_bonetumor_yolo_tpu.metrics.detection import (
        MeanAveragePrecision,
    )
    from multitask_bonetumor_yolo_tpu.models import ModelConfig
    from multitask_bonetumor_yolo_tpu.train import (
        CheckpointManager, TrainConfig, create_train_state, make_eval_step,
    )
    from multitask_bonetumor_yolo_tpu.train.loop import (
        gt_to_map_targets, nms_to_map_preds,
    )

    S = args.img_size
    model_cfg = ModelConfig(
        img_size=S, single_head=args.single_head, dtype="bfloat16"
    )
    train_cfg = TrainConfig()
    state = create_train_state(model_cfg, train_cfg)
    cm = CheckpointManager(f"{args.run_dir}/checkpoints")
    best = cm.best_path() or cm.last_path()
    state = cm.restore(state, str(best))
    print(f"[diag] restored {best} (step {int(state.step)})")

    eval_step = make_eval_step(model_cfg, LossConfig(img_size=S), train_cfg)
    ds = BTXRD(DataConfig(root=args.root, img_size=S,
                          batch_size=args.batch_size), "val")
    loader = BTXRDLoader(ds, args.batch_size, pad_last=True)

    agn50 = MeanAveragePrecision(iou_thresholds=[0.5])
    cls50 = MeanAveragePrecision(iou_thresholds=[0.5])
    shown = 0
    for bi, batch in enumerate(loader):
        if bi >= args.batches:
            break
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        _, aux = eval_step(state, jb)
        preds = nms_to_map_preds(aux)
        targets = gt_to_map_targets(
            np.asarray(batch["boxes"]), np.asarray(batch["box_valid"]), S
        )
        cls50.update(preds, targets)
        agn50.update(
            [dict(p, labels=np.zeros_like(p["labels"])) for p in preds],
            [dict(t, labels=np.zeros_like(t["labels"])) for t in targets],
        )
        for p, t in zip(preds, targets):
            if shown >= 6:
                continue
            shown += 1
            print(f"\nimage: {len(t['boxes'])} GT, {len(p['boxes'])} dets")
            if len(t["boxes"]) and len(p["boxes"]):
                iou = np.asarray(
                    box_iou_matrix(
                        jnp.asarray(p["boxes"]), jnp.asarray(t["boxes"])
                    )
                )
            else:
                iou = np.zeros((len(p["boxes"]), max(1, len(t["boxes"]))))
            order = np.argsort(-p["scores"])[:10]
            for r in order:
                j = int(iou[r].argmax()) if iou.shape[1] else -1
                print(
                    f"  score={p['scores'][r]:.3f} label={p['labels'][r]} "
                    f"best_iou={iou[r].max() if iou.size else 0:.2f} "
                    f"gt_label={t['labels'][j] if j >= 0 and len(t['labels']) else '-'}"
                )
    print("\nclass-aware  mAP50:", round(cls50.compute()["map_50"], 4))
    print("class-AGNOSTIC mAP50:", round(agn50.compute()["map_50"], 4))


if __name__ == "__main__":
    main()
