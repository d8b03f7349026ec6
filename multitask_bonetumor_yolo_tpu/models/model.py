"""Full multitask model: ConvNeXt-Tiny + BiFPN -> Detect / Segment / image-cls.

Parity target: ``ConvNeXtBiFPNYOLO`` (/root/reference/src/main_model.py:300-393)
for the v1 (separate Detect + Segment heads) variant, and ``main_modelv2.py``
(single Segment head; detection predictions sliced out of the segment output,
main_modelv2.py:324-326, :368) for the v2 variant — selected by
``ModelConfig.single_head``.

Forward contract (NHWC; dict keys superset of the reference's):
  mode="train":
    det_feats   list of 3 raw maps [B, H, W, 4*reg_max + nc_det]
                (from the Detect head in v1, from the Segment towers in v2)
    seg_coeffs  [B, A, nm]     mask coefficients (unsupervised in reference)
    protos      [B, Hp, Wp, nm] prototype masks (Hp = img/4)
    seg_logits  [B, S, S, 1]   1x1-projected protos bilinearly resized to S=img
                (reference keeps the projector in the trainer,
                running_main_v3.py:251-255; we attach it to the model so the
                parameter lives in one tree)
    cls_logits  [B, nc_img]
  mode="infer" additionally:
    det_preds   [B, A, 4+nc]   decoded xywh-abs boxes + sigmoid scores
    seg_preds   [B, A, 4+nc+nm]
    cls_probs   [B, nc_img]
    seg_prob    [B, S, S, 1]   sigmoid of seg_logits

BatchNorm mode quirk replicated deliberately (SURVEY.md §2.4): the reference's
validation runs forward(mode="train") with Lightning having set eval() — its
head BNs use current-batch stats while body BNs use running averages (which,
at torch momentum .9997, are ≈ the last train batch anyway). We reproduce it:
body BN follows ``train``; head BN follows ``mode == "train"``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp
import flax.linen as nn

from .backbone import ConvNeXtTiny
from .bifpn import BiFPN
from .heads import DetectHead, SegmentHead, decode_detections
from ..ops.resize import resize_bilinear

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    nc_det: int = 2
    nc_img: int = 2
    proto_ch: int = 32
    bifpn_feature_size: int = 256
    bifpn_num_layers: int = 2
    img_size: int = 640
    reg_max: int = 16
    single_head: bool = False  # False = v1 (Detect+Segment), True = v2
    dtype: str = "float32"  # compute dtype: "float32" | "bfloat16"
    pallas: str = "auto"  # ConvNeXt fused-block kernel: "auto"|"on"|"off"
    # Backbone scale (timm convnext family knob; Tiny = reference parity,
    # main_model.py:21-26). Smaller settings give a fast verification tier
    # whose trainer-loop logic compiles in seconds (tests/test_train_fast.py).
    backbone_depths: tuple = (3, 3, 9, 3)
    backbone_dims: tuple = (96, 192, 384, 768)
    # BN eval behaviour: "reference" replicates the quirk where momentum
    # .9997 makes eval-mode body-BN stats track the LAST train batch
    # (running_main_v3.py:449 + torch BN momentum conversion, SURVEY §2.4) —
    # kept as the parity default. "frozen" uses torch-style effective
    # momentum 0.1 so running stats actually converge and val metrics are
    # deterministic for fixed params (kills the documented checkpoint-
    # selection jitter, BASELINE.md "reading the numbers honestly").
    eval_bn: str = "reference"
    # Performance knobs (numerics-preserving; serialized to the config.json
    # sidecar so a run's executed graph is reconstructable — SURVEY §5
    # config row. Env vars MTBY_FUSE_TOWERS / CNB_NO_Z / CNB_BWD remain as
    # experiment-only overrides that warn, utils/knobs.py):
    #   fuse_towers — heads' per-level first convs run as ONE fused conv
    #     (exact; models/heads.py::fused_first_conv)
    #   ln_zfree   — ConvNeXt Pallas block uses the z-free LN formulation
    #     (ops/pallas/convnext_block.py::resolve_no_z)
    #   block_bwd  — ConvNeXt block backward: "auto" (per-stage measured
    #     policy) | "fused" | "ref" (models/backbone.py::_bwd_for_dim)
    fuse_towers: bool = True
    ln_zfree: bool = True
    block_bwd: str = "auto"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


class MultitaskModel(nn.Module):
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True, mode: str = "train"
    ) -> Dict[str, Any]:
        if mode not in ("train", "infer"):
            raise ValueError(f"Unknown mode {mode!r}. Expected 'train' or 'infer'.")
        cfg = self.cfg
        dt = cfg.compute_dtype
        x = x.astype(dt)

        from .common import BN_MOMENTUM_BODY, BN_MOMENTUM_FROZEN

        if cfg.eval_bn not in ("reference", "frozen"):
            raise ValueError(f"unknown eval_bn {cfg.eval_bn!r}")
        bm = BN_MOMENTUM_FROZEN if cfg.eval_bn == "frozen" else BN_MOMENTUM_BODY
        c3, c4, c5 = ConvNeXtTiny(
            dtype=dt, pallas=cfg.pallas, depths=tuple(cfg.backbone_depths),
            dims=tuple(cfg.backbone_dims), bn_momentum=bm,
            ln_zfree=cfg.ln_zfree, block_bwd=cfg.block_bwd, name="backbone",
        )(x, train)
        p3, p4, p5 = BiFPN(
            cfg.bifpn_feature_size, cfg.bifpn_num_layers, dtype=dt,
            bn_momentum=bm, name="neck"
        )([c3, c4, c5], train)
        feats = [p3, p4, p5]

        head_train = mode == "train"  # reference force-toggles head .train()

        seg_det_raw, seg_coeffs, protos = SegmentHead(
            nc=cfg.nc_det,
            nm=cfg.proto_ch,
            npr=cfg.bifpn_feature_size,
            ch0=cfg.bifpn_feature_size,
            reg_max=cfg.reg_max,
            dtype=dt,
            fuse=cfg.fuse_towers,
            name="segment",
        )(feats, head_train)

        if cfg.single_head:
            det_feats = seg_det_raw
        else:
            det_feats = DetectHead(
                nc=cfg.nc_det,
                ch0=cfg.bifpn_feature_size,
                reg_max=cfg.reg_max,
                dtype=dt,
                fuse=cfg.fuse_towers,
                name="detect",
            )(feats, head_train)

        # image-level classification off pooled P5 (main_model.py:333-334, :364)
        pooled = jnp.mean(p5.astype(jnp.float32), axis=(1, 2))
        cls_logits = nn.Dense(
            cfg.nc_img, dtype=jnp.float32, param_dtype=jnp.float32, name="cls_fc"
        )(pooled)

        # binary-mask projector (reference seg_proto_projector,
        # running_main_v3.py:186, applied + resized at :251-255)
        seg_logits = nn.Conv(
            1, (1, 1), use_bias=True, dtype=jnp.float32,
            param_dtype=jnp.float32, name="seg_proto_projector",
        )(protos.astype(jnp.float32))
        seg_logits = resize_bilinear(seg_logits, cfg.img_size, cfg.img_size)

        out: Dict[str, Any] = {
            "det_feats": det_feats,
            "seg_coeffs": seg_coeffs,
            "protos": protos,
            "seg_logits": seg_logits,
            "cls_logits": cls_logits,
        }

        if mode == "infer":
            seg_preds_det = decode_detections(
                seg_det_raw, cfg.nc_det, cfg.img_size, cfg.reg_max
            )
            seg_preds = jnp.concatenate(
                [seg_preds_det, seg_coeffs.astype(jnp.float32)], axis=-1
            )
            if cfg.single_head:
                det_preds = seg_preds[..., : 4 + cfg.nc_det]
            else:
                det_preds = decode_detections(
                    det_feats, cfg.nc_det, cfg.img_size, cfg.reg_max
                )
            out.update(
                det_preds=det_preds,
                seg_preds=seg_preds,
                cls_probs=nn.softmax(cls_logits, axis=-1),
                seg_prob=nn.sigmoid(seg_logits),
            )
        return out
