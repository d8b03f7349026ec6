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


class PatchifyConv(nn.Module):
    """Non-overlapping strided conv (kernel == stride) as space-to-depth +
    matmul.

    The ConvNeXt stem (4x4/4) and stage downsamples (2x2/2) are patch
    embeds; XLA:TPU lowers them as general convolutions, which is
    pathological for the stem's 3-channel input (lanes pad 3 -> 128, and the
    filter gradient is scalarised): measured 0.58 ms fwd / 1.06 ms fwd+bwd
    at batch 8 vs 0.12 / ~0.2 ms for this form.  Reshaping x to
    [B, H/k, W/k, k*k*C] makes both the forward and the filter gradient a
    single dense MXU matmul.  The parameter is IDENTICAL to nn.Conv's
    ([k, k, C, F] + bias, same init), so checkpoints and the timm import
    manifest are unaffected.
    """

    features: int
    patch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, f = self.patch, self.features
        b, h, w, c = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, c, f),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        if h % k or w % k:  # odd sizes: valid-conv semantics == crop
            x = x[:, : h - h % k, : w - w % k]
            b, h, w, c = x.shape
        p = x.reshape(b, h // k, k, w // k, k, c)
        p = p.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // k, w // k, k * k * c)
        km = kernel.reshape(k * k * c, f).astype(self.dtype)
        y = jnp.dot(p.astype(self.dtype), km,
                    preferred_element_type=jnp.float32)
        return (y + bias).astype(self.dtype)


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


def _bwd_for_dim(dim: int, policy: str = "auto") -> str:
    """Backward-path policy per stage width (measured, BASELINE.md round-3
    table): the one-kernel fused Pallas backward wins at the wide spatial
    stages, while the vjp-of-XLA-reference wins at 40^2/20^2 where the
    kernel's per-row expressions are overhead-bound. ``policy`` comes from
    ``ModelConfig.block_bwd`` ("auto"|"fused"|"ref", serialized to the
    config.json sidecar); CNB_BWD is an experiment-only env override that
    warns (applies to all stages)."""
    from ..utils.knobs import env_override

    ov = env_override("CNB_BWD", policy)
    if ov in ("fused", "ref"):
        return ov
    # v2 fused backward (saved-y residual) 3-block-chain fwd+bwd at batch
    # 8 (BASELINE.md round-3): s0 16.2 ms (ref 29.1), s1 9.9 (12.0),
    # s2 5.3 (~5.8), s3 6.3 (~4.4) — fused wins through 384 channels; the
    # 20x20x768 stage's small-W row expressions stay overhead-bound, so it
    # trains as pure-XLA blocks.
    return "fused" if dim <= 384 else "ref"


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
    ln_zfree: bool = True
    block_bwd: str = "auto"

    @nn.compact
    def __call__(self, x, padded_hw=None):
        from ..ops.pallas.convnext_block import (
            convnext_block_padded, convnext_block_ref, resolve_no_z,
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
            return convnext_block_padded(
                *args, w_real, c_real, 1e-6, False, 0,
                _bwd_for_dim(c, self.block_bwd), resolve_no_z(self.ln_zfree),
            )
        return convnext_block_ref(*args)


class ConvNeXtFeatures(nn.Module):
    """ConvNeXt trunk returning stage outputs selected by ``out_indices``.

    Execution policy (measured in BASELINE.md round-3):
      * eval / inference: the fused Pallas forward on every stage (fastest
        forward everywhere);
      * training: Pallas forward + one-kernel Pallas backward where the
        backward kernel wins (stage 0), pure-XLA blocks elsewhere — the
        custom_vjp(reference) backward re-runs the whole forward in XLA
        during the backward pass, which measured ~1.9 ms/block slower than
        letting XLA keep its own intermediates (72.6 vs 64.3 ms trunk
        fwd+bwd).  Numerics: the Pallas forward's tanh-GELU deviates from
        the XLA erf-GELU by ~3e-4, below bf16 noise (tests pin both)."""

    depths: Sequence[int] = TINY_DEPTHS
    dims: Sequence[int] = TINY_DIMS
    out_indices: Sequence[int] = (1, 2, 3)
    dtype: Dtype = jnp.float32
    pallas: str = "auto"
    ln_zfree: bool = True
    block_bwd: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        from ..ops.pallas.convnext_block import pad_for_blocks, unpad_from_blocks

        outs = []
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i == 0:
                x = PatchifyConv(dim, 4, dtype=self.dtype, name="stem_conv")(x)
                x = LayerNorm(dtype=self.dtype, name="stem_norm")(x)
            else:
                x = LayerNorm(dtype=self.dtype, name=f"downsample_norm{i}")(x)
                x = PatchifyConv(
                    dim, 2, dtype=self.dtype, name=f"downsample_conv{i}"
                )(x)
            blocks = [
                ConvNeXtBlock(
                    dim, dtype=self.dtype, pallas=self.pallas,
                    ln_zfree=self.ln_zfree, block_bwd=self.block_bwd,
                    name=f"stage{i}_block{j}",
                )
                for j in range(depth)
            ]
            if _use_pallas(self.pallas, dim) and not (
                train and _bwd_for_dim(dim, self.block_bwd) == "ref"
            ):
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
    ln_zfree: bool = True
    block_bwd: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = True):
        p3, p4, p5 = ConvNeXtFeatures(
            depths=self.depths, dims=self.dims,
            dtype=self.dtype, pallas=self.pallas,
            ln_zfree=self.ln_zfree, block_bwd=self.block_bwd, name="trunk"
        )(x, train)
        bm = self.bn_momentum
        cp3 = C2f(256, dtype=self.dtype, bn_momentum=bm, name="c2f_p3")(p3, train)
        cp4 = C2f(384, dtype=self.dtype, bn_momentum=bm, name="c2f_p4")(p4, train)
        cp5 = C2f(512, dtype=self.dtype, bn_momentum=bm, name="c2f_p5")(p5, train)
        return cp3, cp4, cp5
