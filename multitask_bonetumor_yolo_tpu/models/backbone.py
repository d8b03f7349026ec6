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

from .common import C2f

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


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        x = nn.Conv(
            self.dim,
            (7, 7),
            padding=((3, 3), (3, 3)),
            feature_group_count=self.dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = LayerNorm(dtype=self.dtype)(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(x)
        gamma = self.param(
            "gamma",
            lambda key, shape: jnp.full(shape, self.layer_scale_init, jnp.float32),
            (self.dim,),
        )
        return residual + x * gamma.astype(self.dtype)


class ConvNeXtFeatures(nn.Module):
    """ConvNeXt trunk returning stage outputs selected by ``out_indices``."""

    depths: Sequence[int] = TINY_DEPTHS
    dims: Sequence[int] = TINY_DIMS
    out_indices: Sequence[int] = (1, 2, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
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
            for j in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype, name=f"stage{i}_block{j}")(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


class ConvNeXtTiny(nn.Module):
    """Backbone = ConvNeXt-Tiny features (strides 8/16/32) + C2f adapters to
    channels (256, 384, 512) (reference main_model.py:28-38)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        p3, p4, p5 = ConvNeXtFeatures(dtype=self.dtype, name="trunk")(x)
        cp3 = C2f(256, dtype=self.dtype, name="c2f_p3")(p3, train)
        cp4 = C2f(384, dtype=self.dtype, name="c2f_p4")(p4, train)
        cp5 = C2f(512, dtype=self.dtype, name="c2f_p5")(p5, train)
        return cp3, cp4, cp5
