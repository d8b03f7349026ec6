"""Anchor-free Detect / Segment / image-classification heads (Flax, NHWC).

Parity targets (architecture + output contracts; ultralytics YOLOv8-style):
  * Detect — instantiated at /root/reference/src/main_model.py:324 with
    nc=nc_det, ch=(256,)*3, reg_max=16. Per level two towers:
      box: Conv(c2,3) -> Conv(c2,3) -> 1x1 conv to 4*reg_max
      cls: Conv(c3,3) -> Conv(c3,3) -> 1x1 conv to nc
    with c2 = max(16, ch0//4, 4*reg_max), c3 = max(ch0, min(nc, 100)).
    Train: 3 raw maps [B, H, W, 4*reg_max+nc] (reference layout is NCHW;
    ours is NHWC — flattening order per level is identical row-major HW).
    Eval: decoded preds [B, A, 4+nc] — xywh absolute boxes + sigmoid scores
    (reference's ``detect_preds_cat`` is [B, 4+nc, A]; transposed layout).
  * Segment — main_model.py:326-328: Detect towers + per-level cv4 coeff
    towers (c4 = max(ch0//4, nm)) + Proto on P3 (npr=256, nm=32).
    Proto = Conv(npr,3) -> ConvTranspose x2 -> Conv(npr,3) -> Conv(nm,1),
    output at 2x P3 resolution (160x160 for 640 input).
    Train: (det_raw_list, coeffs [B, A, nm], protos [B, 160, 160, nm]).
    Eval: (preds [B, A, 4+nc+nm], coeffs, protos).
  * Image-cls head — main_model.py:333-334: global-avg-pool P5 + Linear.

Head convs use ultralytics BN constants (eps 1e-3, torch momentum 0.03) and
bias-free convs, unlike the reference body blocks — see common.py.
Bias init follows ultralytics ``bias_init`` so from-scratch training starts
with calibrated objectness priors: box tower bias = 1.0, cls tower bias =
log(5 / nc / (640 / stride)^2) per level.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import ConvBN, BN_MOMENTUM_HEAD, BN_EPS_HEAD
from ..core.anchors import make_anchors
from ..core.boxes import dist2bbox
from ..core.dfl import dfl_decode

Dtype = Any


class HeadConv(nn.Module):
    """ultralytics-style Conv: conv(bias=False) + BN(1e-3, m=.03) + SiLU."""

    features: int
    kernel_size: int = 1
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = True,
        *,
        conv_input: bool = True,
        in_features: Optional[int] = None,
    ):
        return ConvBN(
            self.features,
            self.kernel_size,
            self.strides,
            use_bias=False,
            act="silu",
            bn_momentum=BN_MOMENTUM_HEAD,
            bn_eps=BN_EPS_HEAD,
            dtype=self.dtype,
        )(x, train, conv_input=conv_input, in_features=in_features)


def _final_conv(features: int, bias_value, dtype, name: str):
    """1x1 conv with constant bias init (ultralytics Detect.bias_init)."""
    return nn.Conv(
        features,
        (1, 1),
        use_bias=True,
        bias_init=lambda key, shape, dt=jnp.float32: jnp.full(
            shape, bias_value, dt
        ),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def tower_widths(nc: int, ch0: int, reg_max: int) -> Tuple[int, int]:
    """(c2, c3) tower widths per the ultralytics Detect rules."""
    return max(16, ch0 // 4, 4 * reg_max), max(ch0, min(nc, 100))


def fused_first_conv(x: jnp.ndarray, kernels, dtype) -> jnp.ndarray:
    """One 3x3 SAME conv whose output channels are the concatenation of
    ``kernels``'s outputs — exact: all tower first convs read the SAME
    feature map and are bias-free, and their BN/SiLU epilogues are
    per-channel, so splitting the fused output reproduces each branch
    bit-for-bit. Why fuse: the 256->64 box/coeff first convs fill only half
    of the MXU's 128 output lanes; concatenated with the 256-wide cls conv
    (-> 320/384 channels) every lane group is full."""
    k = jnp.concatenate(
        [kk.astype(dtype) for kk in kernels], axis=-1
    )
    return jax.lax.conv_general_dilated(
        x.astype(dtype), k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def resolve_fuse(cfg_value: bool = True) -> bool:
    """Head first-conv fusion flag — owned by ``ModelConfig.fuse_towers``
    (sidecar-serialized); MTBY_FUSE_TOWERS is an experiment-only env
    override that warns (utils/knobs.py). Read at trace time; participates
    in jit cache keys through the frozen ModelConfig."""
    from ..utils.knobs import env_override

    return env_override("MTBY_FUSE_TOWERS", cfg_value)


class DetectTowers(nn.Module):
    """Shared box/cls towers used by both Detect and Segment heads.

    ``first_outs`` (optional, per level ``(yb, yc)``) lets the parent head
    supply the cv2_*_0 / cv3_*_0 conv outputs it computed via
    ``fused_first_conv`` — the HeadConv modules then run only their BN+SiLU
    epilogues (``conv_input=False``), keeping the parameter tree and the
    train-mode batch-stats updates identical to the unfused path."""

    nc: int
    ch0: int
    strides: Sequence[int] = (8, 16, 32)
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: Sequence[jnp.ndarray],
        train: bool = True,
        first_outs=None,
    ):
        c2, c3 = tower_widths(self.nc, self.ch0, self.reg_max)
        outs = []
        for i, x in enumerate(feats):
            stride = self.strides[i]
            cin = x.shape[-1]
            if first_outs is None:
                b = HeadConv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
                c = HeadConv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
            else:
                yb, yc = first_outs[i]
                b = HeadConv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(
                    yb, train, conv_input=False, in_features=cin
                )
                c = HeadConv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(
                    yc, train, conv_input=False, in_features=cin
                )
            b = HeadConv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b, train)
            b = _final_conv(4 * self.reg_max, 1.0, self.dtype, f"cv2_{i}_2")(b)
            c = HeadConv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(c, train)
            cls_bias = math.log(5.0 / self.nc / (640.0 / stride) ** 2)
            c = _final_conv(self.nc, cls_bias, self.dtype, f"cv3_{i}_2")(c)
            outs.append(jnp.concatenate([b, c], axis=-1))
        return outs  # per level [B, H, W, 4*reg_max + nc]


def decode_detections(
    raw_levels: Sequence[jnp.ndarray],
    nc: int,
    img_size: int,
    reg_max: int = 16,
    strides: Sequence[int] = (8, 16, 32),
) -> jnp.ndarray:
    """Raw per-level maps -> concatenated eval predictions [B, A, 4+nc].

    Boxes are absolute-pixel xywh (ultralytics eval contract); scores are
    sigmoid class probabilities. Level order matches anchor order in
    core.anchors.make_anchors.
    """
    b = raw_levels[0].shape[0]
    flat = [lv.reshape(b, -1, lv.shape[-1]) for lv in raw_levels]
    x = jnp.concatenate(flat, axis=1).astype(jnp.float32)  # [B, A, 4*rm+nc]
    box_logits = x[..., : 4 * reg_max].reshape(b, -1, 4, reg_max)
    cls_logits = x[..., 4 * reg_max :]
    ltrb = dfl_decode(box_logits)  # [B, A, 4] in grid units
    pts, strd = make_anchors(img_size, strides)
    xywh = dist2bbox(ltrb, pts[None], box_format="xywh") * strd[None]
    return jnp.concatenate([xywh, nn.sigmoid(cls_logits)], axis=-1)


class DetectHead(nn.Module):
    """Standalone Detect head (v1 model, reference main_model.py:324)."""

    nc: int
    ch0: int = 256
    strides: Sequence[int] = (8, 16, 32)
    reg_max: int = 16
    dtype: Dtype = jnp.float32
    fuse: bool = True

    @nn.compact
    def __call__(self, feats, train: bool = True):
        towers = DetectTowers(
            self.nc, self.ch0, self.strides, self.reg_max,
            dtype=self.dtype, name="towers",
        )
        if self.is_initializing() or not resolve_fuse(self.fuse):
            return towers(feats, train)
        # fused first layer: cv2_i_0 (c2 ch) + cv3_i_0 (c3 ch) as ONE conv
        p = self.variables["params"]["towers"]
        c2, _ = tower_widths(self.nc, self.ch0, self.reg_max)
        first_outs = []
        for i, x in enumerate(feats):
            y = fused_first_conv(
                x,
                [
                    p[f"cv2_{i}_0"]["ConvBN_0"]["Conv_0"]["kernel"],
                    p[f"cv3_{i}_0"]["ConvBN_0"]["Conv_0"]["kernel"],
                ],
                self.dtype,
            )
            first_outs.append((y[..., :c2], y[..., c2:]))
        return towers(feats, train, first_outs=first_outs)


class Proto(nn.Module):
    """Prototype-mask generator on P3 (ultralytics Proto block).

    Inference fast path: ``upsample`` (ConvTranspose 2x2/s2) and ``cv2``'s
    3x3 conv are both linear with the nonlinearity only after cv2's conv,
    so at eval they run as one composed op (four 2x2 phase convs + pixel
    shuffle, ops/fused_upsample.py) — removing the model's single most
    expensive conv (3x3 @ 2xP3 resolution, 483 GF/batch-16 at 640²). The
    parameter tree is identical in both modes; training keeps the unfused
    modules so BatchNorm batch-statistics updates stay intact."""

    npr: int = 256
    nm: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        from ..ops.fused_upsample import (
            fused_upsample_conv3x3_phases, shuffle_phases,
        )

        x = HeadConv(self.npr, 3, dtype=self.dtype, name="cv1")(x, train)
        if self.is_initializing():
            x = nn.ConvTranspose(
                self.npr, (2, 2), strides=(2, 2), use_bias=True,
                dtype=self.dtype, param_dtype=jnp.float32, name="upsample",
            )(x)
            x = HeadConv(self.npr, 3, dtype=self.dtype, name="cv2")(x, train)
            return HeadConv(self.nm, 1, dtype=self.dtype, name="cv3")(x, train)

        if train:
            # train fast path: same phase composition as eval (the 483 GF
            # 3x3-at-2x conv becomes 215 GF of 2x2 phase convs; gradients
            # flow through the composite kernels), with cv2/cv3 run as
            # MODULES on the phase-stacked tensor so BatchNorm's train-mode
            # batch statistics and running-stat updates are exact: the mean
            # and (biased) variance over the 4 stacked phases at H x W equal
            # those over the full 2H x 2W map, element-for-element.
            p = self.variables["params"]
            phases = fused_upsample_conv3x3_phases(
                x,
                p["upsample"]["kernel"],
                p["upsample"]["bias"],
                p["cv2"]["ConvBN_0"]["Conv_0"]["kernel"],
            )
            keys = [(0, 0), (0, 1), (1, 0), (1, 1)]
            stacked = jnp.concatenate([phases[k] for k in keys], axis=0)
            z = HeadConv(self.npr, 3, dtype=self.dtype, name="cv2")(
                stacked, train, conv_input=False
            )
            z = HeadConv(self.nm, 1, dtype=self.dtype, name="cv3")(z, train)
            b = x.shape[0]
            out_phases = {k: z[i * b : (i + 1) * b] for i, k in enumerate(keys)}
            return shuffle_phases(out_phases)

        # eval fast path: upsample+cv2.conv composed at LOW resolution; BN,
        # SiLU and the 1x1 cv3 are per-pixel, so they also run per-phase and
        # the 2x pixel shuffle happens at nm (32) channels instead of 256
        p = self.variables["params"]
        st = self.variables["batch_stats"]

        def bn_silu(y, scope):
            bn_p = p[scope]["ConvBN_0"]["BatchNorm_0"]
            bn_s = st[scope]["ConvBN_0"]["BatchNorm_0"]
            yf = (y.astype(jnp.float32) - bn_s["mean"]) * bn_p["scale"] * (
                jax.lax.rsqrt(bn_s["var"] + BN_EPS_HEAD)
            ) + bn_p["bias"]
            return nn.silu(yf).astype(self.dtype)

        phases = fused_upsample_conv3x3_phases(
            x,
            p["upsample"]["kernel"],
            p["upsample"]["bias"],
            p["cv2"]["ConvBN_0"]["Conv_0"]["kernel"],
        )
        k3 = p["cv3"]["ConvBN_0"]["Conv_0"]["kernel"].astype(self.dtype)
        out_phases = {}
        for key, y in phases.items():
            z = bn_silu(y, "cv2")
            z = jax.lax.conv_general_dilated(
                z, k3, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out_phases[key] = bn_silu(z, "cv3")
        return shuffle_phases(out_phases)


class SegmentHead(nn.Module):
    """Segment head = Detect towers + coeff towers + Proto
    (reference main_model.py:326-328)."""

    nc: int
    nm: int = 32
    npr: int = 256
    ch0: int = 256
    strides: Sequence[int] = (8, 16, 32)
    reg_max: int = 16
    dtype: Dtype = jnp.float32
    fuse: bool = True

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], train: bool = True
    ) -> Tuple[List[jnp.ndarray], jnp.ndarray, jnp.ndarray]:
        protos = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(
            feats[0], train
        )
        c4 = max(self.ch0 // 4, self.nm)
        towers = DetectTowers(
            self.nc, self.ch0, self.strides, self.reg_max,
            dtype=self.dtype, name="towers",
        )

        # fused first layer (exactness: see fused_first_conv): the coeff
        # (cv4_i_0, c4 ch), box (cv2_i_0, c2 ch) and cls (cv3_i_0, c3 ch)
        # towers all read feats[i]; one 3x3 conv feeds all three.
        fuse = not self.is_initializing() and resolve_fuse(self.fuse)
        first_outs = coeff_first = None
        if fuse:
            p = self.variables["params"]
            c2, c3 = tower_widths(self.nc, self.ch0, self.reg_max)
            first_outs, coeff_first = [], []
            for i, x in enumerate(feats):
                y = fused_first_conv(
                    x,
                    [
                        p["towers"][f"cv2_{i}_0"]["ConvBN_0"]["Conv_0"]["kernel"],
                        p["towers"][f"cv3_{i}_0"]["ConvBN_0"]["Conv_0"]["kernel"],
                        p[f"cv4_{i}_0"]["ConvBN_0"]["Conv_0"]["kernel"],
                    ],
                    self.dtype,
                )
                first_outs.append((y[..., :c2], y[..., c2 : c2 + c3]))
                coeff_first.append(y[..., c2 + c3 :])

        coeff_levels = []
        b = feats[0].shape[0]
        for i, x in enumerate(feats):
            if fuse:
                m = HeadConv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(
                    coeff_first[i], train,
                    conv_input=False, in_features=x.shape[-1],
                )
            else:
                m = HeadConv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            m = HeadConv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(m, train)
            m = nn.Conv(
                self.nm, (1, 1), use_bias=True,
                dtype=self.dtype, param_dtype=jnp.float32, name=f"cv4_{i}_2",
            )(m)
            coeff_levels.append(m.reshape(b, -1, self.nm))
        coeffs = jnp.concatenate(coeff_levels, axis=1)  # [B, A, nm]
        det_raw = towers(feats, train, first_outs=first_outs)
        return det_raw, coeffs, protos
