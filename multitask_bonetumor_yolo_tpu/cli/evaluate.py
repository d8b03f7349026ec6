"""CLI: evaluate a checkpoint over a split with the full metric suite.

Parity target: the INTENDED interface of
/root/reference/src/evaluate_model.py:370-424 (which is broken against the
live reference model API, SURVEY.md §2.4) — checkpoint path, data root,
img size, batch size, configurable mAP max-det thresholds, example logging —
but working: img-cls acc/P/R/F1 + CM, seg F1/P/R/Acc/Dice + mask-mAP,
det mAP50 & mAP50-95 + det CM.

  python -m multitask_bonetumor_yolo_tpu.cli.evaluate \
      --checkpoint-path runs/exp1/checkpoints/step_00001234 \
      --root btxrd_ready [--split val --img-size 640 ...]
"""

from __future__ import annotations

import argparse

import json

import jax.numpy as jnp
import numpy as np

from ..data import BTXRD, BTXRDLoader, DataConfig
from ..data.dataset import Prefetcher
from ..losses import LossConfig
from ..models import ModelConfig
from ..parallel import BatchPacker
from ..train import CheckpointManager, TrainConfig, create_train_state, make_eval_step
from ..train.loop import ExperimentConfig, ValidationMetrics
from ..utils.logging import RunLogger


def evaluate(args) -> dict:
    model_cfg = ModelConfig(
        nc_det=args.nc_det, nc_img=args.num_img_classes,
        img_size=args.img_size, single_head=args.single_head,
        dtype=args.dtype,
    )
    data_cfg = DataConfig(root=args.root, img_size=args.img_size,
                          batch_size=args.batch_size, max_boxes=args.max_boxes)
    loss_cfg = LossConfig(img_size=args.img_size, nc_det=args.nc_det)
    train_cfg = TrainConfig(eval_top_k=max(args.map_thresholds))

    state = create_train_state(model_cfg, train_cfg)
    ckpt = CheckpointManager(str(args.checkpoint_path).rsplit("/", 1)[0])
    state = ckpt.restore(state, args.checkpoint_path)
    print(f"[evaluate] restored step {int(state.step)} from {args.checkpoint_path}")

    eval_step = make_eval_step(model_cfg, loss_cfg, train_cfg)
    ds = BTXRD(data_cfg, args.split)
    print(f"[evaluate] {len(ds)} items in split '{args.split}'")
    loader = BTXRDLoader(ds, args.batch_size, pad_last=True)

    exp = ExperimentConfig(
        model=model_cfg, data=data_cfg, loss=loss_cfg, train=train_cfg,
        run_dir=args.run_dir,
    )
    vm = ValidationMetrics(
        exp, class_metrics=args.class_metrics,
        max_det_thresholds=sorted(args.map_thresholds),
    )
    logger = RunLogger(args.run_dir, args.wandb_project)
    first = True
    packer = BatchPacker()
    for batch, jbatch in Prefetcher(
        loader,
        map_fn=lambda b: (b, packer(b)),
    ):
        metrics, aux = eval_step(state, jbatch)
        vm.update(metrics, aux, batch)
        if first and args.log_examples:
            imgs = np.asarray(batch["image"]).astype(np.float32) / 255.0
            logger.log_seg_examples(imgs, np.asarray(aux["seg_prob"]),
                                    np.asarray(batch["mask"]), "test", 0)
            logger.log_det_examples(
                imgs, np.asarray(aux["nms_boxes"]), np.asarray(aux["nms_scores"]),
                np.asarray(aux["nms_labels"]), np.asarray(aux["nms_valid"]),
                np.asarray(batch["boxes"]), np.asarray(batch["box_valid"]),
                "test", 0,
            )
        first = False

    out = vm.compute(full_map=True)
    logger.log(out, int(state.step), prefix="test")
    print(json.dumps({k: round(v, 5) for k, v in sorted(out.items())}, indent=2))
    return out


def make_parser():
    ap = argparse.ArgumentParser(description="Evaluate a checkpoint")
    ap.add_argument("--checkpoint-path", required=True)
    ap.add_argument("--root", default="btxrd_ready")
    ap.add_argument("--split", default="val", choices=["train", "val", "test", "all"])
    ap.add_argument("--run-dir", default="runs/eval")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--max-boxes", type=int, default=32)
    ap.add_argument("--nc-det", type=int, default=2)
    ap.add_argument("--num-img-classes", type=int, default=2)
    ap.add_argument("--single-head", action="store_true")
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--map-thresholds", type=int, nargs="+", default=[1, 10, 100],
                    help="mAP max-detection thresholds")
    ap.add_argument("--log-examples", action="store_true", dest="log_examples")
    ap.add_argument("--class-metrics", action="store_true",
                    help="report per-class AP (reference evaluate_model.py behaviour)")
    ap.add_argument("--wandb-project", default=None)
    return ap


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    evaluate(make_parser().parse_args(argv))


if __name__ == "__main__":
    main()
