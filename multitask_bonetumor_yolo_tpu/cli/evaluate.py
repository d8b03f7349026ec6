"""CLI: evaluate a checkpoint over a split with the full metric suite.

Parity target: the INTENDED interface of
/root/reference/src/evaluate_model.py:370-424 (which is broken against the
live reference model API, SURVEY.md §2.4) — checkpoint path, data root,
img size, batch size, configurable mAP max-det thresholds, example logging —
but working: img-cls acc/P/R/F1 + CM, seg F1/P/R/Acc/Dice + mask-mAP,
det mAP50 & mAP50-95 + det CM.

TPU-native behaviours the reference script has no analogue of:

* the eval step is sharded over the full device mesh (``create_mesh`` +
  ``shard_batch``; DataConfig.batch_size is PER-DEVICE, matching the
  trainer's Lightning-DDP semantics);
* batches ride the HBM-resident ``DeviceEvalCache``, so ``--epochs N``
  replay passes (warm-perf measurement, BN-jitter studies) cost zero
  host IO after the first pass;
* model/loss flags (``--eval-bn``, ``--assigner``, ``--single-head``, ...)
  DEFAULT from the ``config.json`` the Trainer writes next to the
  checkpoints, and an explicit flag that contradicts the trained config
  raises unless ``--allow-config-mismatch`` — a frozen-BN- or TAL-trained
  checkpoint can no longer be silently evaluated under parity defaults.

  python -m multitask_bonetumor_yolo_tpu.cli.evaluate \
      --checkpoint-path runs/exp1/checkpoints/step_00001234 \
      --root btxrd_ready [--split val --img-size 640 ...]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np

from ..data import BTXRD, BTXRDLoader, DataConfig
from ..data.dataset import DeviceEvalCache
from ..losses import LossConfig
from ..models import ModelConfig
from ..parallel import create_mesh, shard_batch
from ..train import CheckpointManager, TrainConfig, create_train_state, make_eval_step
from ..train.loop import ExperimentConfig, ValidationMetrics
from ..utils.logging import RunLogger

# flags whose value comes from the TRAINED config when the user does not
# pass them explicitly: (arg name, config section, config key)
_CONFIG_DEFAULTED = (
    ("eval_bn", "model", "eval_bn"),
    ("assigner", "loss", "assigner"),
    ("single_head", "model", "single_head"),
    ("nc_det", "model", "nc_det"),
    ("num_img_classes", "model", "nc_img"),
    ("proto_ch", "model", "proto_ch"),
    ("iou_match_thresh", "loss", "iou_match_thresh"),
)


def _load_run_config(checkpoint_path: str):
    """Read the Trainer-written config.json sitting next to the checkpoint."""
    p = Path(str(checkpoint_path)).parent / "config.json"
    if not p.exists():
        return None
    return json.loads(p.read_text())


def resolve_config(args) -> None:
    """Default unset flags from the run's config.json; guard mismatches.

    Explicitly-passed flags that contradict the trained config raise a
    ValueError unless ``--allow-config-mismatch`` — evaluating under the
    wrong eval_bn/assigner silently changes the metric surface. The full
    trained model/loss sections are kept on ``args`` so evaluate() can
    reconstruct the EXACT architecture (backbone depths/dims, BiFPN size,
    reg_max, ...) the checkpoint was saved from.
    """
    run_cfg = _load_run_config(args.checkpoint_path)
    args._run_model_cfg = None if run_cfg is None else run_cfg["model"]
    args._run_loss_cfg = None if run_cfg is None else run_cfg["loss"]
    if run_cfg is not None and args.img_size is None:
        args.img_size = run_cfg["model"]["img_size"]
    elif args.img_size is None:
        args.img_size = 640
    for arg, section, key in _CONFIG_DEFAULTED:
        given = getattr(args, arg)
        trained = None if run_cfg is None else run_cfg[section].get(key)
        if given is None:
            fallback = _PARITY_DEFAULTS[arg]
            setattr(args, arg, fallback if trained is None else trained)
        elif trained is not None and given != trained:
            msg = (f"--{arg.replace('_', '-')}={given!r} contradicts the "
                   f"trained config ({trained!r} in "
                   f"{Path(str(args.checkpoint_path)).parent}/config.json)")
            if not args.allow_config_mismatch:
                raise ValueError(msg + "; pass --allow-config-mismatch to "
                                 "override deliberately")
            print(f"[evaluate] WARNING: {msg} (override forced)")


_PARITY_DEFAULTS = {
    "eval_bn": "reference",
    "assigner": "reference",
    "single_head": False,
    "nc_det": 2,
    "num_img_classes": 2,
    "proto_ch": 32,
    "iou_match_thresh": 0.5,
}


def evaluate(args) -> dict:
    resolve_config(args)
    overrides = dict(
        nc_det=args.nc_det, nc_img=args.num_img_classes,
        img_size=args.img_size, single_head=args.single_head,
        proto_ch=args.proto_ch, dtype=args.dtype, eval_bn=args.eval_bn,
    )
    if args._run_model_cfg is not None:
        base = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in args._run_model_cfg.items()
        }
        base.update(overrides)
        base["dtype"] = args.dtype  # runtime choice, not architecture
        model_cfg = ModelConfig(**base)
    else:
        model_cfg = ModelConfig(**overrides)
    data_cfg = DataConfig(root=args.root, img_size=args.img_size,
                          batch_size=args.batch_size, max_boxes=args.max_boxes)
    loss_overrides = dict(img_size=args.img_size, nc_det=args.nc_det,
                          assigner=args.assigner,
                          iou_match_thresh=args.iou_match_thresh)
    if args._run_loss_cfg is not None:
        lbase = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in args._run_loss_cfg.items()
        }
        lbase.update(loss_overrides)
        loss_cfg = LossConfig(**lbase)
    else:
        loss_cfg = LossConfig(**loss_overrides)
    train_cfg = TrainConfig(eval_top_k=max(args.map_thresholds))

    mesh = create_mesh()
    # batch_size is per-device (trainer semantics); the loader assembles
    # global batches so shard_batch can split them over the data axis.
    global_batch = args.batch_size * int(mesh.shape["data"])

    state = create_train_state(model_cfg, train_cfg)
    ckpt = CheckpointManager(str(args.checkpoint_path).rsplit("/", 1)[0])
    state = ckpt.restore(state, args.checkpoint_path)
    # restored arrays are committed to one device; re-replicate over the
    # mesh so they compose with data-sharded batches
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    state = state.replace(
        step=jax.device_put(state.step, rep),
        params=jax.device_put(state.params, rep),
        batch_stats=jax.device_put(state.batch_stats, rep),
    )
    print(f"[evaluate] restored step {int(state.step)} from "
          f"{args.checkpoint_path}; mesh {dict(mesh.shape)}")

    eval_step = make_eval_step(model_cfg, loss_cfg, train_cfg)
    ds = BTXRD(data_cfg, args.split)
    print(f"[evaluate] {len(ds)} items in split '{args.split}'")

    exp = ExperimentConfig(
        model=model_cfg, data=data_cfg, loss=loss_cfg, train=train_cfg,
        run_dir=args.run_dir,
    )
    logger = RunLogger(args.run_dir, args.wandb_project)
    cache = DeviceEvalCache(
        lambda: BTXRDLoader(ds, global_batch, pad_last=True),
        lambda b: shard_batch(b, mesh, streams=data_cfg.upload_streams),
    )
    out = {}
    for pass_i in range(args.epochs):
        vm = ValidationMetrics(
            exp, class_metrics=args.class_metrics,
            max_det_thresholds=sorted(args.map_thresholds),
        )
        first = True
        for batch, sharded in cache:
            metrics, aux = eval_step(state, sharded)
            vm.update(metrics, aux, batch)
            if first and args.log_examples and pass_i == 0:
                imgs = np.asarray(batch["image"]).astype(np.float32) / 255.0
                logger.log_seg_examples(imgs, np.asarray(aux["seg_prob"]),
                                        np.asarray(batch["mask"]), "test", 0)
                logger.log_det_examples(
                    imgs, np.asarray(aux["nms_boxes"]),
                    np.asarray(aux["nms_scores"]),
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
    ap.add_argument("--img-size", type=int, default=None,
                    help="defaults from the run's config.json, else 640")
    ap.add_argument("--batch-size", type=int, default=4,
                    help="PER-DEVICE batch size (global = this x data-axis)")
    ap.add_argument("--max-boxes", type=int, default=32)
    ap.add_argument("--nc-det", type=int, default=None)
    ap.add_argument("--num-img-classes", type=int, default=None)
    ap.add_argument("--proto-ch", type=int, default=None)
    ap.add_argument("--single-head", action="store_true", default=None)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--eval-bn", default=None, choices=["reference", "frozen"],
                    help="BN eval behaviour; defaults from the run's "
                    "config.json, else 'reference'")
    ap.add_argument("--assigner", default=None, choices=["reference", "tal"],
                    help="loss assigner (affects reported val loss only); "
                    "defaults from the run's config.json")
    ap.add_argument("--iou-match-thresh", type=float, default=None)
    ap.add_argument("--allow-config-mismatch", action="store_true",
                    help="permit explicit flags that contradict the "
                    "checkpoint's trained config.json")
    ap.add_argument("--epochs", type=int, default=1,
                    help="replay passes over the split; passes >1 run from "
                    "the HBM-resident DeviceEvalCache with zero host IO")
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
