"""Training orchestration: epochs, validation, checkpointing, early stopping.

Parity target: the Lightning stack of the reference —
``MultiTaskLitModel`` train/val steps + epoch hooks
(/root/reference/src/running_main_v3.py:393-730), ``BTXRDDataModule``
(:746-766) and the ``__main__`` trainer wiring (:769-841): seed 123,
bf16 compute, grad-clip 10, ModelCheckpoint(top-2 on val mAP50, save_last),
EarlyStopping(patience 50 on val mAP50), LR monitoring, per-epoch val with
mAP50 every epoch and mAP50-95 every ``map_full_freq`` epochs, seg/cls
metric suites, confusion matrices, example overlays.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import BTXRD, BTXRDLoader, DataConfig
from ..data.dataset import DeviceEvalCache, Prefetcher
from ..data.preprocess import AugmentConfig
from ..losses import LossConfig
from ..metrics import (
    BinarySegMetrics,
    ClassificationMetrics,
    MeanAveragePrecision,
)
from ..metrics.segmentation import (
    mask_map_inputs,
    mask_map_inputs_from_counts,
)
from ..models import ModelConfig
from ..parallel import create_mesh, shard_batch
from ..parallel.pack import OutputPacker
from ..utils.logging import RunLogger
from ..utils.profiling import PhaseTimer, annotate
from .checkpoint import CheckpointManager
from .state import TrainConfig, TrainState, create_train_state, lr_at
from .steps import make_eval_step, make_train_step


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = ModelConfig()
    data: DataConfig = DataConfig()
    loss: LossConfig = LossConfig()
    train: TrainConfig = TrainConfig()
    augment: AugmentConfig = AugmentConfig()
    run_dir: str = "runs/default"
    log_every: int = 10
    viz_every_epochs: int = 50  # mask/box overlay cadence (reference: 50)
    wandb_project: Optional[str] = None

    def __post_init__(self):
        # keep the three img_size knobs coherent
        assert self.model.img_size == self.data.img_size == self.loss.img_size, (
            "img_size must match across model/data/loss configs"
        )


def gt_to_map_targets(boxes: np.ndarray, valid: np.ndarray, img_size: int):
    """Padded GT -> per-image mAP target dicts (xyxy absolute, clamped —
    running_main_v3.py:560-570)."""
    out = []
    for i in range(boxes.shape[0]):
        v = valid[i].astype(bool)
        b = boxes[i][v]
        xyxy = np.stack(
            [
                (b[:, 1] - b[:, 3] / 2) * img_size,
                (b[:, 2] - b[:, 4] / 2) * img_size,
                (b[:, 1] + b[:, 3] / 2) * img_size,
                (b[:, 2] + b[:, 4] / 2) * img_size,
            ],
            axis=-1,
        ).clip(0, img_size) if len(b) else np.zeros((0, 4), np.float32)
        out.append(dict(boxes=xyxy, labels=b[:, 0].astype(np.int64)))
    return out


def nms_to_map_preds(aux: Dict[str, np.ndarray]):
    """Batched NMS output -> per-image mAP pred dicts."""
    out = []
    boxes = np.asarray(aux["nms_boxes"])
    scores = np.asarray(aux["nms_scores"])
    labels = np.asarray(aux["nms_labels"])
    valid = np.asarray(aux["nms_valid"]).astype(bool)
    for i in range(boxes.shape[0]):
        v = valid[i]
        out.append(
            dict(boxes=boxes[i][v], scores=scores[i][v],
                 labels=labels[i][v].astype(np.int64))
        )
    return out


class ValidationMetrics:
    """Bundles every accumulator the reference's validation epoch keeps."""

    def __init__(
        self,
        cfg: ExperimentConfig,
        class_metrics: bool = False,
        max_det_thresholds=None,
    ):
        """``max_det_thresholds`` mirrors the reference's --map_thresholds
        rebuild of its mAP metrics (evaluate_model.py:81-94); defaults to
        the train-loop [1, 10, eval_top_k]."""
        self.cfg = cfg
        tc = cfg.train
        mdt = list(max_det_thresholds or [1, 10, tc.eval_top_k])
        self.seg = BinarySegMetrics()
        self.cls = ClassificationMetrics(cfg.model.nc_img)
        self.det_cm = ClassificationMetrics(cfg.model.nc_det)
        self.map50 = MeanAveragePrecision(
            iou_thresholds=[0.5],
            max_detection_thresholds=mdt,
            class_metrics=class_metrics,
        )
        self.map50_95 = MeanAveragePrecision(
            max_detection_thresholds=mdt,
            class_metrics=class_metrics,
        )
        self.seg_map = MeanAveragePrecision(iou_type="segm")
        self.losses: Dict[str, list] = {}
        # deferred-fetch queue. The relay charges its ~29 ms fixed round trip
        # per ARRAY even inside one jax.device_get, and an epoch accumulates
        # ~170 small metric/aux arrays (measured 7.6-13.7 s of a 9-15 s
        # epoch) — so each step's scalars+small-aux are packed into ONE uint8
        # buffer on device (parallel.OutputPacker, a single cached-jit
        # dispatch), the epoch's buffers are concatenated on device, and
        # compute() fetches ONE array.
        self._pending: list = []
        self._packer = OutputPacker()

    # aux keys the metric accumulators consume — packed + fetched once per
    # epoch; the full-resolution seg_prob/seg_mask stay on device for the
    # viz path only.
    _SMALL_AUX = (
        "seg_counts", "seg_score", "cls_logits", "cm_counts", "cm_mask",
        "cm_pred", "cm_gt", "nms_boxes", "nms_scores", "nms_labels",
        "nms_valid",
    )

    def update(self, metrics, aux, batch) -> None:
        # trim padded samples from a pad_last final batch
        sv = np.asarray(
            batch.get("sample_valid", np.ones(len(batch["img_cls"]), bool))
        ).astype(bool)
        small = {k: aux[k] for k in self._SMALL_AUX if k in aux}
        small.update({f"m:{k}": v for k, v in metrics.items()})
        packed, spec = self._packer.pack(small)
        host = {
            "sv": sv,
            "img_cls": np.asarray(batch["img_cls"]),
            "boxes": np.asarray(batch["boxes"]),
            "box_valid": np.asarray(batch["box_valid"]),
        }
        if "seg_counts" not in aux:
            # legacy path (steps without device-side seg summaries) keeps the
            # full-resolution mask/prob out of the deferred queue
            host["gt_mask"] = np.asarray(batch["mask"])[sv]
            host["seg_prob"] = np.asarray(aux["seg_prob"])[sv]
        self._pending.append((packed, spec, host))

    def _drain(self) -> None:
        if not self._pending:
            return
        pending, self._pending = self._pending, []
        bufs = [p for p, _, _ in pending]
        joined = np.asarray(
            jnp.concatenate(bufs) if len(bufs) > 1 else bufs[0]
        )
        off = 0
        for _, spec, host in pending:
            n = OutputPacker.nbytes(spec)
            d = OutputPacker.unpack(joined[off : off + n], spec)
            off += n
            metrics = {k[2:]: v for k, v in d.items() if k.startswith("m:")}
            small = {k: v for k, v in d.items() if not k.startswith("m:")}
            self._apply(metrics, small, host)

    def _apply(self, metrics, aux, host) -> None:
        sv = host["sv"]
        for k, v in metrics.items():
            self.losses.setdefault(k, []).append(float(v))
        if "seg_counts" in aux:  # device-side summaries (eval step)
            counts = np.asarray(aux["seg_counts"])[sv]
            self.seg.update_counts(counts)
            p, t = mask_map_inputs_from_counts(
                counts, np.asarray(aux["seg_score"])[sv]
            )
        else:
            gt_mask = host["gt_mask"]
            seg_prob = host["seg_prob"]
            self.seg.update(seg_prob, gt_mask)
            p, t = mask_map_inputs(seg_prob, gt_mask)
        self.seg_map.update(p, t)
        self.cls.update(
            np.asarray(aux["cls_logits"])[sv], host["img_cls"][sv]
        )
        if "cm_counts" in aux:  # device-side CM accumulation (eval step)
            self.det_cm.update_cm(aux["cm_counts"])
        elif "cm_mask" in aux:
            mask = np.asarray(aux["cm_mask"]).astype(bool) & sv[:, None]
            if mask.any():
                self.det_cm.update(
                    np.asarray(aux["cm_pred"])[mask],
                    np.asarray(aux["cm_gt"])[mask],
                )
        preds = [p for p, ok in zip(nms_to_map_preds(aux), sv) if ok]
        targets = [
            t
            for t, ok in zip(
                gt_to_map_targets(
                    host["boxes"], host["box_valid"],
                    self.cfg.model.img_size,
                ),
                sv,
            )
            if ok
        ]
        self.map50.update(preds, targets)
        self.map50_95.update(preds, targets)

    def compute(self, full_map: bool) -> Dict[str, float]:
        self._drain()
        out = {f"{k}": float(np.mean(v)) for k, v in self.losses.items()}
        seg = self.seg.compute()
        out.update({f"seg_{k}": v for k, v in seg.items()})
        segm = self.seg_map.compute()
        out.update(
            {f"seg_map_{k}": v for k, v in segm.items()
             if isinstance(v, (int, float))}
        )
        cls = self.cls.compute()
        out.update({f"img_{k}": v for k, v in cls.items()})
        m50 = self.map50.compute()
        out.update(
            {f"map_iou50_{k}": v for k, v in m50.items()
             if isinstance(v, (int, float))}
        )
        if "map_per_class" in m50:
            for i, ap in enumerate(np.asarray(m50["map_per_class"]).ravel()):
                cls_id = int(np.asarray(m50["classes"]).ravel()[i])
                out[f"map_iou50_class_detC{cls_id}"] = float(ap)
        if full_map:
            m = self.map50_95.compute()
            out.update(
                {f"map_iou50_95_{k}": v for k, v in m.items()
                 if isinstance(v, (int, float))}
            )
        return out


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        resume: Optional[str] = None,
        convnext_ckpt: Optional[str] = None,
        detect_ckpt: Optional[str] = None,
        segment_ckpt: Optional[str] = None,
    ):
        """``resume``: checkpoint path, or "auto" for the run dir's last
        checkpoint (the reference resumes via Lightning
        load_from_checkpoint). ``convnext_ckpt``/``detect_ckpt``/
        ``segment_ckpt``: torch state-dict paths for the reference's
        pretrained warm start (timm convnext_tiny + YOLOv8 heads,
        main_model.py:399-603)."""
        self.cfg = cfg
        self.logger = RunLogger(cfg.run_dir, cfg.wandb_project)
        self.mesh = create_mesh()
        # DataConfig.batch_size is PER-DEVICE (the reference's Lightning-DDP
        # semantics: batch 4 per process, running_main_v3.py:746-766); the
        # loader assembles global batches of per_device x n_data_devices.
        self.global_batch = cfg.data.batch_size * int(self.mesh.shape["data"])
        self.train_ds = BTXRD(cfg.data, "train")
        self.val_ds = BTXRD(cfg.data, "val")
        if len(self.train_ds) == 0:
            raise RuntimeError(f"No training data under {cfg.data.root}")
        steps = max(1, len(self.train_ds) // self.global_batch)
        self.train_cfg = dataclasses.replace(cfg.train, steps_per_epoch=steps)
        self.state = create_train_state(cfg.model, self.train_cfg)
        self.train_step = make_train_step(cfg.model, cfg.loss, cfg.augment)
        self.eval_step = make_eval_step(cfg.model, cfg.loss, self.train_cfg)
        self.ckpt = CheckpointManager(
            f"{cfg.run_dir}/{self.train_cfg.ckpt_dir}",
            top_k=self.train_cfg.ckpt_top_k,
        )
        # Persist the model/loss config next to the checkpoints so
        # cli/evaluate.py can default its flags from the TRAINED config
        # (eval_bn / assigner / single_head / ...) instead of silently
        # evaluating a frozen-BN- or TAL-trained checkpoint under
        # mismatched defaults. The reference has no equivalent — its eval
        # script hardcodes the model hyperparameters
        # (/root/reference/src/evaluate_model.py:370-424).
        cfg_path = Path(f"{cfg.run_dir}/{self.train_cfg.ckpt_dir}/config.json")
        cfg_path.write_text(json.dumps({
            "model": dataclasses.asdict(cfg.model),
            "loss": dataclasses.asdict(cfg.loss),
            "data": {"img_size": cfg.data.img_size,
                     "max_boxes": cfg.data.max_boxes,
                     "upload_streams": cfg.data.upload_streams},
        }, indent=2, default=list))
        self.rng = jax.random.PRNGKey(self.train_cfg.seed)
        self._val_cache = None

        if convnext_ckpt or detect_ckpt or segment_ckpt:
            from ..utils.import_torch_weights import load_pretrained

            params, stats = load_pretrained(
                self.state.params, self.state.batch_stats,
                convnext_path=convnext_ckpt,
                detect_sd_path=detect_ckpt,
                segment_sd_path=segment_ckpt,
            )
            self.state = self.state.replace(
                params=params, batch_stats=stats
            )
        if resume:
            path = None if resume == "auto" else resume
            if resume == "auto" and self.ckpt.last_path() is None:
                print("[trainer] --resume auto: no checkpoint yet, "
                      "starting fresh")
            else:
                self.state = self.ckpt.restore(self.state, path)
                # restored arrays are committed to one device; re-replicate
                # over the mesh so they compose with data-sharded batches
                from jax.sharding import NamedSharding, PartitionSpec

                rep = NamedSharding(self.mesh, PartitionSpec())
                self.state = self.state.replace(
                    step=jax.device_put(self.state.step, rep),
                    params=jax.device_put(self.state.params, rep),
                    batch_stats=jax.device_put(self.state.batch_stats, rep),
                    opt_state=jax.device_put(self.state.opt_state, rep),
                )
                print(f"[trainer] resumed from step {int(self.state.step)}")

    # ------------------------------------------------------------------
    def fit(self, max_epochs: Optional[int] = None) -> TrainState:
        """Run the training loop; on any crash, checkpoint the live state
        before re-raising (upgrades the reference's print-and-finish trap at
        running_main_v3.py:831-839 per SURVEY.md §5 failure-detection row)."""
        try:
            return self._fit(max_epochs)
        except KeyboardInterrupt:
            raise
        except Exception:
            step = int(self.state.step)
            if step > 0:
                self.ckpt.save(self.state, step, metric=None)
                print(f"[trainer] crash — emergency checkpoint at step {step}")
            raise

    def _fit(self, max_epochs: Optional[int] = None) -> TrainState:
        cfg = self.cfg
        epochs = max_epochs or self.train_cfg.max_epochs
        best_metric, best_epoch = -float("inf"), -1
        global_step = int(self.state.step)
        start_epoch = global_step // self.train_cfg.steps_per_epoch

        # begin streaming the val split into the HBM cache NOW so the
        # upload overlaps the first epoch's train compute (VERDICT r4 #5)
        self._ensure_val_cache().prime()

        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            timer = PhaseTimer()
            loader = BTXRDLoader(
                self.train_ds, self.global_batch, shuffle=True,
                drop_last=True, seed=self.train_cfg.seed + epoch,
            )
            it = iter(Prefetcher(
                loader,
                map_fn=lambda b: shard_batch(
                    b, self.mesh, streams=cfg.data.upload_streams
                ),
            ))
            aux, last_batch = None, None
            while True:
                with timer.phase("data"):
                    batch = next(it, None)
                if batch is None:
                    break
                last_batch = batch
                self.rng, step_rng = jax.random.split(self.rng)
                with timer.phase("train_step"), annotate("train_step"):
                    self.state, metrics, aux = self.train_step(
                        self.state, batch, step_rng
                    )
                global_step += 1
                if global_step % cfg.log_every == 0:
                    # one batched fetch (the relay charges ~29 ms per fetch)
                    metrics, cls_logits, img_cls = jax.device_get(
                        (metrics, aux["cls_logits"], batch["img_cls"])
                    )
                    metrics = {k: float(v) for k, v in metrics.items()}
                    metrics["lr"] = lr_at(self.train_cfg, global_step)
                    # train-stage cls metrics (running_main_v3.py:430-437)
                    tc = ClassificationMetrics(cfg.model.nc_img)
                    tc.update(np.asarray(cls_logits), np.asarray(img_cls))
                    metrics.update(
                        {f"img_{k}": v for k, v in tc.compute().items()}
                    )
                    self.logger.log(
                        metrics, global_step, prefix="train_step",
                        to_console=True,
                    )

            if aux is not None and epoch % cfg.viz_every_epochs == 0:
                # train-stage overlays (running_main_v3.py:439-444)
                with timer.phase("viz"):
                    imgs = np.asarray(aux["image"]).astype(np.float32)
                    if imgs.max() > 1.5:
                        imgs = imgs / 255.0
                    self.logger.log_seg_examples(
                        imgs, np.asarray(aux["seg_prob"]),
                        np.asarray(last_batch["mask"]), stage="train",
                        step=global_step,
                    )
            with timer.phase("validate"), annotate("validate"):
                val = self.validate(epoch, global_step)
            map50 = val.get("map_iou50_map", -1.0)
            # save when the metric enters the top-K (reference
            # ModelCheckpoint semantics) or on the throttled 'last' cadence
            # -- a full save costs ~35 s over the relay (see checkpoint.py)
            want_save = (
                self.ckpt.qualifies(map50)
                or epoch % max(1, self.train_cfg.save_last_every) == 0
                or epoch == epochs - 1
            )
            with timer.phase("checkpoint"):
                if want_save:
                    self.ckpt.save(
                        self.state, global_step, metric=map50, epoch=epoch
                    )
            self.logger.log(
                {
                    "epoch": epoch,
                    "epoch_time_s": time.time() - t0,
                    **{f"phase_{k}_s": round(v, 4)
                       for k, v in timer.totals.items()},
                },
                global_step, prefix="train_epoch",
            )
            if map50 > best_metric:
                best_metric, best_epoch = map50, epoch
            elif epoch - best_epoch >= self.train_cfg.early_stop_patience:
                print(f"[early-stop] no val mAP50 improvement for "
                      f"{self.train_cfg.early_stop_patience} epochs")
                break
        return self.state

    # ------------------------------------------------------------------
    def _ensure_val_cache(self) -> DeviceEvalCache:
        # device-resident val set: decode + upload once, replay from HBM
        # every later epoch (see data.dataset.DeviceEvalCache)
        if self._val_cache is None:
            self._val_cache = DeviceEvalCache(
                lambda: BTXRDLoader(
                    self.val_ds, self.global_batch, pad_last=True
                ),
                lambda b: shard_batch(
                    b, self.mesh, streams=self.cfg.data.upload_streams
                ),
            )
        return self._val_cache

    def validate(self, epoch: int, global_step: int) -> Dict[str, float]:
        cfg = self.cfg
        vm = ValidationMetrics(cfg)
        first = True
        for batch, sharded in self._ensure_val_cache():
            metrics, aux = self.eval_step(self.state, sharded)
            vm.update(metrics, aux, batch)
            if first and epoch % cfg.viz_every_epochs == 0:
                self._log_examples(batch, aux, epoch, global_step)
            first = False
        full = epoch % self.train_cfg.map_full_freq == 0
        out = vm.compute(full_map=full)
        self.logger.log(out, global_step, prefix="val_epoch", to_console=True)
        cm = vm.cls.normalized_cm()
        self.logger.log_confusion_matrix(
            cm, {i: f"imgC{i}" for i in range(cfg.model.nc_img)},
            "img_confusion_matrix", global_step,
        )
        if vm.det_cm.cm.sum() > 0:
            self.logger.log_confusion_matrix(
                vm.det_cm.normalized_cm(),
                {i: f"detC{i}" for i in range(cfg.model.nc_det)},
                "det_confusion_matrix", global_step,
            )
        return out

    def _log_examples(self, batch, aux, epoch, step) -> None:
        imgs = np.asarray(batch["image"]).astype(np.float32) / 255.0
        self.logger.log_seg_examples(
            imgs, np.asarray(aux["seg_prob"]), np.asarray(batch["mask"]),
            stage="val", step=step,
        )
        self.logger.log_det_examples(
            imgs,
            np.asarray(aux["nms_boxes"]), np.asarray(aux["nms_scores"]),
            np.asarray(aux["nms_labels"]), np.asarray(aux["nms_valid"]),
            np.asarray(batch["boxes"]), np.asarray(batch["box_valid"]),
            stage="val", step=step,
        )
