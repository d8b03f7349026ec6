"""ConvNeXt-Tiny backbone (Flax, NHWC) + the reference's C2f stage adapters.

Parity target: timm ``convnext_tiny.in12k_ft_in1k`` with ``features_only=True,
out_indices=(1, 2, 3)`` — strides 8/16/32, channels (192, 384, 768) — wrapped
by per-stage C2f blocks mapping to (256, 384, 512)
(/root/reference/src/main_model.py:12-38).

Architecture (ConvNeXt, Liu et al. 2022): stem 4x4/4 conv + LN; four stages of
depths (3, 3, 9, 3) and dims (96, 192, 384, 768); between stages a LN + 2x2/2
conv downsample.  Block: 7x7 depthwise conv -> LN -> 4x pointwise MLP with
exact GELU -> layer-scale (gamma init 1e-6) -> residual.

Pretrained weights: :mod:`..utils.import_torch_weights` converts a local timm
checkpoint offline (no network at train time).  Random init otherwise.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .common import BN_MOMENTUM_BODY, C2f

Dtype = Any

TINY_DEPTHS = (3, 3, 9, 3)
TINY_DIMS = (96, 192, 384, 768)


class LayerNorm(nn.Module):
    """Channels-last LayerNorm in fp32 (ConvNeXt uses eps 1e-6)."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32, param_dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return y.astype(self.dtype)


def _use_pallas(pallas: str, dim: int) -> bool:
    """Pallas gating: the fused kernel beats XLA on every stage (measured
    per-stage in BASELINE.md, incl. 768ch); the reference path serves CPU."""
    import jax

    del dim
    return pallas == "on" or (
        pallas == "auto" and jax.default_backend() not in ("cpu",)
    )


class ConvNeXtBlock(nn.Module):
    """One ConvNeXt block: dwconv7x7 -> fp32 LN -> 4x MLP (exact GELU) ->
    layer-scale -> residual.

    Owns raw params so the same tree feeds either execution path:
      * ``padded_hw=(w, c)`` — the fused, software-pipelined Pallas kernel
        on the chained padded layout (ops/pallas/convnext_block.py); the
        caller pads once per stage via ``pad_for_blocks``;
      * ``padded_hw=None`` — the pure-XLA reference on [B, H, W, C]
        (identical numerics, used for CPU tests and as the kernel's
        backward).
    """

    dim: int
    layer_scale_init: float = 1e-6
    dtype: Dtype = jnp.float32
    pallas: str = "auto"

    @nn.compact
    def __call__(self, x, padded_hw=None):
        from ..ops.pallas.convnext_block import (
            convnext_block_padded, convnext_block_ref,
        )

        c = self.dim
        he = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")
        zeros, ones = nn.initializers.zeros, nn.initializers.ones
        dw_kernel = self.param("dw_kernel", he, (7, 7, 1, c), jnp.float32)
        dw_bias = self.param("dw_bias", zeros, (c,), jnp.float32)
        ln_scale = self.param("ln_scale", ones, (c,), jnp.float32)
        ln_bias = self.param("ln_bias", zeros, (c,), jnp.float32)
        w1 = self.param("w1", he, (c, 4 * c), jnp.float32)
        b1 = self.param("b1", zeros, (4 * c,), jnp.float32)
        w2 = self.param("w2", he, (4 * c, c), jnp.float32)
        b2 = self.param("b2", zeros, (c,), jnp.float32)
        gamma = self.param(
            "gamma",
            lambda key, shape: jnp.full(shape, self.layer_scale_init, jnp.float32),
            (c,),
        )
        args = (x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma)
        if padded_hw is not None:
            w_real, c_real = padded_hw
            assert c_real == c
            return convnext_block_padded(*args, w_real, c_real)
        return convnext_block_ref(*args)


class ConvNeXtFeatures(nn.Module):
    """ConvNeXt trunk returning stage outputs selected by ``out_indices``."""

    depths: Sequence[int] = TINY_DEPTHS
    dims: Sequence[int] = TINY_DIMS
    out_indices: Sequence[int] = (1, 2, 3)
    dtype: Dtype = jnp.float32
    pallas: str = "auto"

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        from ..ops.pallas.convnext_block import pad_for_blocks, unpad_from_blocks

        outs = []
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i == 0:
                x = nn.Conv(
                    dim, (4, 4), strides=(4, 4),
                    dtype=self.dtype, param_dtype=jnp.float32, name="stem_conv",
                )(x)
                x = LayerNorm(dtype=self.dtype, name="stem_norm")(x)
            else:
                x = LayerNorm(dtype=self.dtype, name=f"downsample_norm{i}")(x)
                x = nn.Conv(
                    dim, (2, 2), strides=(2, 2),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"downsample_conv{i}",
                )(x)
            blocks = [
                ConvNeXtBlock(
                    dim, dtype=self.dtype, pallas=self.pallas,
                    name=f"stage{i}_block{j}",
                )
                for j in range(depth)
            ]
            if _use_pallas(self.pallas, dim):
                # chain the stage's blocks in the kernel's padded layout:
                # one XLA pad + one slice per stage instead of per block
                w_real, c_real = x.shape[2], x.shape[3]
                xp = pad_for_blocks(x)
                for blk in blocks:
                    xp = blk(xp, padded_hw=(w_real, c_real))
                x = unpad_from_blocks(xp, w_real, c_real)
            else:
                for blk in blocks:
                    x = blk(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


class ConvNeXtTiny(nn.Module):
    """Backbone = ConvNeXt features (strides 8/16/32) + C2f adapters to
    channels (256, 384, 512) (reference main_model.py:28-38). depths/dims
    default to the Tiny scale the reference uses; smaller settings give the
    fast verification tier."""

    dtype: Dtype = jnp.float32
    pallas: str = "auto"
    depths: Sequence[int] = TINY_DEPTHS
    dims: Sequence[int] = TINY_DIMS
    bn_momentum: float = BN_MOMENTUM_BODY

    @nn.compact
    def __call__(self, x, train: bool = True):
        p3, p4, p5 = ConvNeXtFeatures(
            depths=self.depths, dims=self.dims,
            dtype=self.dtype, pallas=self.pallas, name="trunk"
        )(x)
        bm = self.bn_momentum
        cp3 = C2f(256, dtype=self.dtype, bn_momentum=bm, name="c2f_p3")(p3, train)
        cp4 = C2f(384, dtype=self.dtype, bn_momentum=bm, name="c2f_p4")(p4, train)
        cp5 = C2f(512, dtype=self.dtype, bn_momentum=bm, name="c2f_p5")(p5, train)
        return cp3, cp4, cp5
