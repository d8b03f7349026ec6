"""BiFPN neck (Flax, NHWC).

Parity target: /root/reference/src/main_model.py:176-296.
  * 1x1 ConvBlock projections of backbone channels (256, 384, 512) to
    ``feature_size`` (default 256);
  * ``num_layers`` BiFPNUnits (default 2 in the full model, main_model.py:307);
  * per-unit learned fusion weights w1 (2x2) and w2 (3x2), ELU-then-normalise
    with eps 1e-4 (main_model.py:194-196);
  * top-down via bilinear x2 upsample, bottom-up via bilinear x0.5 downsample
    (PyTorch align_corners=False semantics — see ops/resize.py);
  * each fused map goes through DepthwiseConvBlock then C2f.

Deliberate fix (SURVEY.md §2.4): the reference allocates w1/w2 with
``torch.Tensor(...)`` and never initialises them (garbage memory). We
initialise to 1.0 as in the BiFPN paper.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .common import BN_MOMENTUM_BODY, ConvBlock, DepthwiseConvBlock, C2f
from ..ops.resize import resize_bilinear

Dtype = Any


class BiFPNUnit(nn.Module):
    feature_size: int = 256
    eps: float = 1e-4
    dtype: Dtype = jnp.float32
    bn_momentum: float = BN_MOMENTUM_BODY

    def _norm(self, w: jnp.ndarray) -> jnp.ndarray:
        w = nn.elu(w)
        return w / (w.sum(axis=0, keepdims=True) + self.eps)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = True):
        if len(feats) != 3:
            raise ValueError(f"BiFPNUnit expects 3 levels, got {len(feats)}")
        p3_x, p4_x, p5_x = feats
        fs = self.feature_size

        w1 = self.param("w1", lambda k, s: jnp.ones(s, jnp.float32), (2, 2))
        w2 = self.param("w2", lambda k, s: jnp.ones(s, jnp.float32), (3, 2))
        w1n = self._norm(w1).astype(self.dtype)
        w2n = self._norm(w2).astype(self.dtype)

        def up2(x):
            return resize_bilinear(x, x.shape[-3] * 2, x.shape[-2] * 2)

        def down2(x):
            return resize_bilinear(x, x.shape[-3] // 2, x.shape[-2] // 2)

        # top-down
        p5_td = p5_x
        p4_td_sum = w1n[0, 0] * p4_x + w1n[1, 0] * up2(p5_td)
        p4_td = C2f(fs, dtype=self.dtype, bn_momentum=self.bn_momentum,
                 name="p4_td_cf")(
            DepthwiseConvBlock(fs, dtype=self.dtype,
                               bn_momentum=self.bn_momentum,
                               name="p4_td_conv")(
                p4_td_sum, train
            ),
            train,
        )
        p3_td_sum = w1n[0, 1] * p3_x + w1n[1, 1] * up2(p4_td)
        p3_td = C2f(fs, dtype=self.dtype, bn_momentum=self.bn_momentum,
                 name="p3_td_cf")(
            DepthwiseConvBlock(fs, dtype=self.dtype,
                               bn_momentum=self.bn_momentum,
                               name="p3_td_conv")(
                p3_td_sum, train
            ),
            train,
        )

        # bottom-up
        p3_out = p3_td
        p4_out_sum = (
            w2n[0, 0] * p4_x + w2n[1, 0] * p4_td + w2n[2, 0] * down2(p3_out)
        )
        p4_out = C2f(fs, dtype=self.dtype, bn_momentum=self.bn_momentum,
                 name="p4_out_cf")(
            DepthwiseConvBlock(fs, dtype=self.dtype,
                               bn_momentum=self.bn_momentum,
                               name="p4_out_conv")(
                p4_out_sum, train
            ),
            train,
        )
        p5_out_sum = (
            w2n[0, 1] * p5_x + w2n[1, 1] * p5_td + w2n[2, 1] * down2(p4_out)
        )
        p5_out = C2f(fs, dtype=self.dtype, bn_momentum=self.bn_momentum,
                 name="p5_out_cf")(
            DepthwiseConvBlock(fs, dtype=self.dtype,
                               bn_momentum=self.bn_momentum,
                               name="p5_out_conv")(
                p5_out_sum, train
            ),
            train,
        )
        return [p3_out, p4_out, p5_out]


class BiFPN(nn.Module):
    feature_size: int = 256
    num_layers: int = 2
    eps: float = 1e-4
    dtype: Dtype = jnp.float32
    bn_momentum: float = BN_MOMENTUM_BODY

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = True) -> List[jnp.ndarray]:
        if len(inputs) != 3:
            raise ValueError(f"BiFPN expects 3 feature maps, got {len(inputs)}")
        c3, c4, c5 = inputs
        bm = self.bn_momentum
        feats = [
            ConvBlock(self.feature_size, 1, dtype=self.dtype, bn_momentum=bm,
                      name="p3_proj")(c3, train),
            ConvBlock(self.feature_size, 1, dtype=self.dtype, bn_momentum=bm,
                      name="p4_proj")(c4, train),
            ConvBlock(self.feature_size, 1, dtype=self.dtype, bn_momentum=bm,
                      name="p5_proj")(c5, train),
        ]
        for i in range(self.num_layers):
            feats = BiFPNUnit(
                self.feature_size, self.eps, dtype=self.dtype, bn_momentum=bm,
                name=f"unit{i}"
            )(feats, train)
        return feats
