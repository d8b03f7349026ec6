"""CLI: single-image / directory inference with box + mask overlays.

Parity target: the reference's smoke path ``src/test.py`` (load a sample,
draw boxes) upgraded into a real inference CLI over the library's
``mode="infer"`` forward (main_model.py:367-386) + batched NMS.

  python -m multitask_bonetumor_yolo_tpu.cli.infer \
      --checkpoint-path ... --images img1.jpeg img2.jpeg --out-dir out/
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core.letterbox import letterbox_geometry, PAD_VALUE
from ..data.dataset import _imread_color_rgb, _resize
from ..models import ModelConfig, MultitaskModel
from ..ops.masks import compose_masks
from ..ops.nms import postprocess_detections
from ..train import CheckpointManager, TrainConfig, create_train_state
from ..utils.logging import RunLogger


def load_and_letterbox(path: str, img_size: int) -> np.ndarray:
    img = _imread_color_rgb(path)
    h0, w0 = img.shape[:2]
    _, nh, nw = letterbox_geometry(h0, w0, img_size)
    canvas = np.full((img_size, img_size, 3), PAD_VALUE, np.uint8)
    canvas[:nh, :nw] = _resize(img, nw, nh, nearest=False)
    return canvas


def main(argv=None):
    ap = argparse.ArgumentParser(description="Run multitask inference")
    ap.add_argument("--checkpoint-path", required=True)
    ap.add_argument("--images", nargs="+", required=True)
    ap.add_argument("--out-dir", default="runs/infer")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--nc-det", type=int, default=2)
    ap.add_argument("--num-img-classes", type=int, default=2)
    ap.add_argument("--single-head", action="store_true")
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--conf-thresh", type=float, default=0.25)
    ap.add_argument("--nms-iou", type=float, default=0.6)
    ap.add_argument("--top-k", type=int, default=100)
    ap.add_argument(
        "--instance-masks", action="store_true",
        help="compose per-instance masks (NMS coeffs x prototypes, "
        "reference test_model.py:81-85) and write <stem>_masks.npy",
    )
    ap.add_argument(
        "--no-mask-crop", action="store_true",
        help="with --instance-masks: skip the crop-to-box step",
    )
    args = ap.parse_args(argv)

    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    model_cfg = ModelConfig(
        nc_det=args.nc_det, nc_img=args.num_img_classes,
        img_size=args.img_size, single_head=args.single_head, dtype=args.dtype,
    )
    state = create_train_state(model_cfg, TrainConfig())
    ckpt = CheckpointManager(str(args.checkpoint_path).rsplit("/", 1)[0])
    state = ckpt.restore(state, args.checkpoint_path)
    model = MultitaskModel(model_cfg)

    @jax.jit
    def infer(params, batch_stats, img):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            img, train=False, mode="infer", mutable=["batch_stats"],
        )
        nms = postprocess_detections(
            out["det_preds"], model_cfg.img_size,
            iou_thresh=args.nms_iou, conf_thresh=args.conf_thresh,
            top_k=args.top_k,
        )
        inst = None
        if args.instance_masks:
            inst = compose_masks(
                out["seg_coeffs"], out["protos"], nms,
                crop=not args.no_mask_crop, img_size=model_cfg.img_size,
            )
        return nms, out["seg_prob"], out["cls_probs"], inst

    logger = RunLogger(args.out_dir)
    results = []
    for path in args.images:
        canvas = load_and_letterbox(path, args.img_size)
        img = jnp.asarray(canvas[None], jnp.float32) / 255.0
        nms, seg_prob, cls_probs, inst = infer(
            state.params, state.batch_stats, img
        )
        nvalid = int(np.asarray(nms.valid).sum())
        imgs = np.asarray(img)
        logger.log_det_examples(
            imgs, np.asarray(nms.boxes), np.asarray(nms.scores),
            np.asarray(nms.labels), np.asarray(nms.valid),
            None, None, stage=Path(path).stem, step=0,
            conf_th=args.conf_thresh,
        )
        logger.log_seg_examples(
            imgs, np.asarray(seg_prob), None, stage=Path(path).stem, step=0
        )
        rec = {
            "image": path,
            "num_detections": nvalid,
            "boxes_xyxy": np.asarray(nms.boxes[0])[:nvalid].tolist(),
            "scores": np.asarray(nms.scores[0])[:nvalid].tolist(),
            "labels": np.asarray(nms.labels[0])[:nvalid].tolist(),
            "img_cls_probs": np.asarray(cls_probs[0]).tolist(),
            "mask_area_frac": float((np.asarray(seg_prob[0]) > 0.5).mean()),
        }
        if inst is not None:
            mask_path = Path(args.out_dir) / f"{Path(path).stem}_masks.npy"
            mask_path.parent.mkdir(parents=True, exist_ok=True)
            np.save(mask_path, np.asarray(inst[0, :nvalid] > 0.5))
            rec["instance_masks"] = str(mask_path)
            rec["instance_mask_areas"] = [
                float(m) for m in np.asarray(inst[0, :nvalid] > 0.5).mean((1, 2))
            ]
        results.append(rec)
        print(json.dumps(rec))
    out_json = Path(args.out_dir) / "predictions.json"
    out_json.write_text(json.dumps(results, indent=2))
    print(f"[infer] wrote {out_json} and overlays under {args.out_dir}/media/")


if __name__ == "__main__":
    main()
