"""Shared conv building blocks (Flax, NHWC).

Parity targets (architecture + numerics, not code):
  * ConvBlock           — /root/reference/src/main_model.py:113-141
                          (Conv2d + BatchNorm(momentum .9997 torch-convention,
                          eps 4e-5) + SiLU, autopad)
  * DepthwiseConvBlock  — main_model.py:62-102 (depthwise + pointwise convs,
                          both bias-free, BN, ELU)
  * Bottleneck          — main_model.py:42-59
  * C2f                 — main_model.py:144-173 (CSP split-transform-concat)

TPU-first notes:
  * NHWC layout — native for XLA:TPU convolutions.
  * compute dtype bf16 (configurable), params fp32, BatchNorm stats in fp32.
  * torch BN "momentum" m_t updates running = (1-m_t)*running + m_t*batch;
    flax momentum m_f updates ra = m_f*ra + (1-m_f)*batch, so m_f = 1 - m_t.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

# flax-convention momenta (= 1 - torch momentum)
BN_MOMENTUM_BODY = 1.0 - 0.9997  # reference body blocks (main_model.py:95,135)
BN_EPS_BODY = 4e-5
BN_MOMENTUM_HEAD = 1.0 - 0.03  # ultralytics Conv default (heads)
BN_EPS_HEAD = 1e-3
# torch nn.BatchNorm2d default momentum 0.1 — the ModelConfig.eval_bn
# "frozen" option uses this so running stats converge and eval metrics are
# deterministic for fixed params (vs the reference's .9997 quirk where
# running stats ≈ the last train batch).
BN_MOMENTUM_FROZEN = 1.0 - 0.1


def autopad(k: Union[int, Sequence[int]], p=None, d: int = 1):
    """'same'-style padding for odd kernels (reference main_model.py:105-110)."""
    if d > 1:
        k = d * (k - 1) + 1 if isinstance(k, int) else [d * (x - 1) + 1 for x in k]
    if p is None:
        p = k // 2 if isinstance(k, int) else [x // 2 for x in k]
    return p


class ConvBN(nn.Module):
    """Conv2d (+bias opt) -> BatchNorm(fp32) -> activation. NHWC."""

    features: int
    kernel_size: int = 1
    strides: int = 1
    groups: int = 1
    dilation: int = 1
    use_bias: bool = True  # reference ConvBlock's nn.Conv2d keeps default bias
    act: str = "silu"  # silu | elu | none
    bn_momentum: float = BN_MOMENTUM_BODY
    bn_eps: float = BN_EPS_BODY
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = True,
        *,
        conv_input: bool = True,
        in_features: Optional[int] = None,
    ) -> jnp.ndarray:
        p = autopad(self.kernel_size, None, self.dilation)
        conv = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=((p, p), (p, p)),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        if conv_input:
            x = conv(x)
        else:
            # caller already applied (a composition of) this conv's kernel,
            # read via self.variables — e.g. the Proto phase fusion or the
            # head tower first-conv concat. The dummy call only CREATES (or
            # shape-checks) the params; the conv's input width is x's width
            # unless the caller's composition changed it (``in_features``).
            cin = x.shape[-1] if in_features is None else in_features
            _ = conv(jnp.zeros((1, 1, 1, cin), x.dtype))
        # BN statistics in fp32 for stability; result cast back to compute dtype.
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        if self.act == "silu":
            x = nn.silu(x)
        elif self.act == "elu":
            x = nn.elu(x)
        elif self.act != "none":
            raise ValueError(f"unknown act {self.act!r}")
        return x.astype(self.dtype)


class ConvBlock(nn.Module):
    """Conv+BN+SiLU with reference body BN constants (main_model.py:113-141)."""

    features: int
    kernel_size: int = 1
    strides: int = 1
    groups: int = 1
    dtype: Dtype = jnp.float32
    bn_momentum: float = BN_MOMENTUM_BODY

    @nn.compact
    def __call__(self, x, train: bool = True):
        return ConvBN(
            self.features,
            self.kernel_size,
            self.strides,
            groups=self.groups,
            use_bias=True,
            act="silu",
            bn_momentum=self.bn_momentum,
            dtype=self.dtype,
        )(x, train)


class DepthwiseConvBlock(nn.Module):
    """depthwise(k=1 default) -> pointwise -> BN -> ELU (main_model.py:62-102).

    Note the reference's depthwise conv maps in_channels->out_channels with
    groups=in_channels (requires out == in for its k=1 default use); both convs
    are bias-free; only ONE BN after the pointwise conv.

    Fast path: at k=1/s=1 the depthwise conv is a per-channel scale applied
    directly before the (linear, bias-free) pointwise conv, so the pair folds
    exactly into ONE 1x1 conv with kernel ``dw_scale[:, None] * pw`` — same
    parameter tree, gradients flow through the fold, valid in train and eval.
    """

    features: int
    kernel_size: int = 1
    strides: int = 1
    dtype: Dtype = jnp.float32
    bn_momentum: float = BN_MOMENTUM_BODY

    @nn.compact
    def __call__(self, x, train: bool = True):
        c_in = x.shape[-1]
        p = autopad(self.kernel_size)
        fold = (
            self.kernel_size == 1
            and self.strides == 1
            and self.features == c_in
            and not self.is_initializing()
        )
        if fold:
            import jax.lax as lax

            params = self.variables["params"]
            dwk = params["Conv_0"]["kernel"]  # [1,1,1,C]
            pwk = params["Conv_1"]["kernel"]  # [1,1,C,C]
            folded = (pwk * dwk[0, 0, 0][None, None, :, None]).astype(
                self.dtype
            )
            x = lax.conv_general_dilated(
                x, folded, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            x = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.strides, self.strides),
                padding=((p, p), (p, p)),
                feature_group_count=c_in,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
            x = nn.Conv(
                self.features,
                (1, 1),
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=BN_EPS_BODY,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return nn.elu(x).astype(self.dtype)


class Bottleneck(nn.Module):
    """3x3 -> 3x3 with optional residual (main_model.py:42-59)."""

    features: int
    shortcut: bool = True
    groups: int = 1
    kernel: Tuple[int, int] = (3, 3)
    e: float = 0.5
    dtype: Dtype = jnp.float32
    bn_momentum: float = BN_MOMENTUM_BODY

    @nn.compact
    def __call__(self, x, train: bool = True):
        c_hidden = int(self.features * self.e)
        y = ConvBlock(c_hidden, self.kernel[0], dtype=self.dtype,
                      bn_momentum=self.bn_momentum)(x, train)
        y = ConvBlock(
            self.features, self.kernel[1], groups=self.groups, dtype=self.dtype,
            bn_momentum=self.bn_momentum,
        )(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            return x + y
        return y


class C2f(nn.Module):
    """CSP-style block: 1x1 in, split(2), n bottlenecks on the running tail,
    concat all (2+n) chunks, 1x1 out (main_model.py:144-173)."""

    features: int
    n: int = 2
    shortcut: bool = False
    groups: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32
    bn_momentum: float = BN_MOMENTUM_BODY

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = int(self.features * self.e)
        y = ConvBlock(2 * c, 1, dtype=self.dtype,
                      bn_momentum=self.bn_momentum)(x, train)
        parts = [y[..., :c], y[..., c:]]
        for _ in range(self.n):
            parts.append(
                Bottleneck(
                    c, self.shortcut, self.groups, kernel=(3, 3), e=1.0,
                    dtype=self.dtype, bn_momentum=self.bn_momentum,
                )(parts[-1], train)
            )
        return ConvBlock(self.features, 1, dtype=self.dtype,
                         bn_momentum=self.bn_momentum)(
            jnp.concatenate(parts, axis=-1), train
        )
