"""Jitted train / eval steps (mesh-sharded).

Parity targets:
  * training_step — /root/reference/src/running_main_v3.py:393-445
    (forward mode='train' -> 5-term loss -> backward + AdamW + clip);
  * validation_step — :447-599 (forward mode='train' for losses AND decode —
    the reference's deliberate BN quirk — then conf-filter/NMS/top-K).

TPU-native: steps are pure functions jitted once; the batch arrives sharded
over the mesh 'data' axis (parallel/mesh.py) so XLA emits the gradient
all-reduce over ICI automatically. Augmentation (data/preprocess.py) runs
inside the jitted step — host only ships uint8 canvases.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..data.preprocess import AugmentConfig, augment_batch, normalize
from ..losses import LossConfig, multitask_loss
from ..models import MultitaskModel, ModelConfig
from ..models.heads import decode_detections
from ..ops.nms import NMSResult, postprocess_detections
from .state import TrainState, TrainConfig


def make_train_step(
    model_cfg: ModelConfig,
    loss_cfg: LossConfig,
    aug_cfg: AugmentConfig = AugmentConfig(),
    donate: bool = True,
) -> Callable:
    model = MultitaskModel(model_cfg)

    def train_step(
        state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        batch = augment_batch(batch, rng, aug_cfg)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"],
                train=True,
                mode="train",
                mutable=["batch_stats"],
            )
            lo = multitask_loss(out, batch, loss_cfg, train=True)
            return lo.total, (lo, updates["batch_stats"], out)

        (total, (lo, new_stats, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state, grad_ok = state.apply_gradients(
            grads=grads, batch_stats=new_stats
        )
        metrics = {
            "loss_total": total,
            **{f"loss_{k}": v for k, v in lo.components.items()},
            "num_pos": lo.num_pos,
            "avg_iou": lo.avg_iou,
            "grad_norm": optax_global_norm(grads),
            # 1.0 when the optimizer step was SKIPPED on a non-finite
            # gradient (state.py::apply_gradients) — surfaces silent-freeze
            # regimes in metrics.jsonl (ADVICE r4)
            "step_skipped": 1.0 - grad_ok.astype(jnp.float32),
        }
        # train-stage observability (reference log_cls_metrics /
        # log_seg_examples cadence, running_main_v3.py:430-444): tiny logits
        # always; the seg map is fetched only on the viz cadence
        aux = {
            "cls_logits": out["cls_logits"],
            "seg_prob": jax.nn.sigmoid(out["seg_logits"]),
            "image": batch["image"],
        }
        return state, metrics, aux

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def make_eval_step(
    model_cfg: ModelConfig,
    loss_cfg: LossConfig,
    train_cfg: TrainConfig,
) -> Callable:
    """Validation step: losses from train-mode forward (reference quirk),
    detections decoded from the raw maps -> batched NMS; seg probabilities.

    Returns (metrics, aux) with aux carrying everything host-side metric
    accumulators need: NMS result, seg probs, cls logits, CM match pairs.
    """
    model = MultitaskModel(model_cfg)

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        batch = dict(batch)
        batch["image"] = normalize(batch["image"])
        out, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"],
            train=False,
            mode="train",  # deliberate: reference validates via train-mode fwd
            mutable=["batch_stats"],
        )
        lo = multitask_loss(out, batch, loss_cfg, train=False)

        det_preds = decode_detections(
            out["det_feats"], model_cfg.nc_det, model_cfg.img_size, model_cfg.reg_max
        )
        nms: NMSResult = postprocess_detections(
            det_preds,
            model_cfg.img_size,
            iou_thresh=train_cfg.eval_nms_iou,
            conf_thresh=train_cfg.eval_conf_thresh,
            top_k=train_cfg.eval_top_k,
        )
        metrics = {
            "loss_total": lo.total,
            **{f"loss_{k}": v for k, v in lo.components.items()},
        }
        # segmentation summaries computed ON DEVICE so validation fetches
        # bools/scalars, not the [B,S,S] fp32 probability map — the relay's
        # ~9 MB/s device->host path made seg_prob the validate bottleneck.
        # seg_prob stays in aux for viz; jax arrays only transfer when read.
        prob = jax.nn.sigmoid(out["seg_logits"])[..., 0]
        pm = prob > 0.5
        pos = batch["mask"][..., 0] > 0.5
        counts = jnp.stack(
            [
                jnp.sum(pm & pos, axis=(1, 2)),
                jnp.sum(pm & ~pos, axis=(1, 2)),
                jnp.sum(~pm & pos, axis=(1, 2)),
                jnp.sum(~pm & ~pos, axis=(1, 2)),
            ],
            axis=-1,
        )  # [B, 4] tp/fp/fn/tn
        score = jnp.sum(prob * pm, axis=(1, 2)) / (
            jnp.sum(pm, axis=(1, 2)) + 1e-6
        )
        # detection confusion-matrix COUNTS on device ([nc, nc], rows = true
        # class) — shipping the per-anchor match arrays ([B, 8400] x3) cost
        # ~600 KB/step over the relay; the counts are nc^2 ints
        cm_mask = lo.matched_mask
        if "sample_valid" in batch:
            cm_mask = cm_mask & batch["sample_valid"][:, None]
        nc = model_cfg.nc_det
        cm_idx = lo.matched_gt_cls * nc + lo.matched_pred_cls
        cm_counts = (
            jnp.zeros((nc * nc,), jnp.int32)
            .at[cm_idx.ravel()]
            .add(cm_mask.ravel().astype(jnp.int32))
            .reshape(nc, nc)
        )
        aux = {
            "nms_boxes": nms.boxes,
            "nms_scores": nms.scores,
            "nms_labels": nms.labels,
            "nms_valid": nms.valid,
            "seg_prob": prob[..., None],
            "seg_mask": pm,
            "seg_score": score,
            "seg_counts": counts,
            "cls_logits": out["cls_logits"],
            "cm_counts": cm_counts,
        }
        return metrics, aux

    return jax.jit(eval_step)
