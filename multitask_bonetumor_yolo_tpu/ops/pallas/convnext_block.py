"""Fused ConvNeXt block as a Pallas TPU kernel.

Why: the ConvNeXt trunk is ~90% of inference time and is HBM-bandwidth
bound — XLA materialises the depthwise-conv output, the fp32 LayerNorm
tensors, and the 4x-wide MLP intermediate in HBM every block (measured
7.9 ms/block at stage-0 640² shapes vs a ~1 ms roofline). This kernel keeps
one (row-chunk × W × C) slab resident in VMEM and does

    y = x + gamma * fc2(gelu(fc1(LN(dwconv7x7(x) + b))))

in a single pass: 49 shifted fused multiply-adds for the depthwise conv
(VPU), fp32 LayerNorm, two MXU matmuls, exact-erf GELU, layer-scale and
residual — reading x from HBM once and writing y once.

Grid: (B, H/RC) row-chunks. The 7x7 halo (±3 rows/cols) is handled by
pre-padding H and W by 3 on each side in XLA (one cheap pad per block) and
DMA-ing the overlapping (RC+6, W+6, C) window manually — BlockSpec blocks
cannot overlap.

The wrapper is a ``jax.custom_vjp``: forward = this kernel, backward = the
VJP of the numerically-identical pure-jnp reference (``convnext_block_ref``),
so training gets the fused forward with exact XLA gradients.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------- reference
def convnext_block_ref(
    x: jnp.ndarray,  # [B, H, W, C] compute dtype
    dw_kernel: jnp.ndarray,  # [7, 7, 1, C] fp32
    dw_bias: jnp.ndarray,  # [C] fp32
    ln_scale: jnp.ndarray,  # [C] fp32
    ln_bias: jnp.ndarray,  # [C] fp32
    w1: jnp.ndarray,  # [C, 4C] fp32
    b1: jnp.ndarray,  # [4C] fp32
    w2: jnp.ndarray,  # [4C, C] fp32
    b2: jnp.ndarray,  # [C] fp32
    gamma: jnp.ndarray,  # [C] fp32
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Pure-jnp ConvNeXt block, numerics identical to models.backbone
    (dwconv -> fp32 LN -> Dense 4C -> exact GELU -> Dense C -> gamma ->
    residual)."""
    dt = x.dtype
    c = x.shape[-1]
    y = lax.conv_general_dilated(
        x,
        dw_kernel.astype(dt),
        (1, 1),
        [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    ) + dw_bias.astype(dt)
    yf = y.astype(jnp.float32)
    mean = yf.mean(-1, keepdims=True)
    var = ((yf - mean) ** 2).mean(-1, keepdims=True)
    yf = (yf - mean) * lax.rsqrt(var + eps) * ln_scale + ln_bias
    y = yf.astype(dt)
    y = jnp.dot(y, w1.astype(dt), preferred_element_type=jnp.float32) + b1
    y = jax.nn.gelu(y, approximate=False)
    y = jnp.dot(y.astype(dt), w2.astype(dt), preferred_element_type=jnp.float32) + b2
    return x + (y * gamma).astype(dt)


# ---------------------------------------------------------------- kernel
def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7, fp32).

    Pallas TPU cannot lower the erf/erfc primitives exact GELU needs."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return x * 0.5 * (1.0 + _erf(x * 0.7071067811865476))


def _kernel(
    x_hbm,  # [B, H+6, W+6, C] ANY/HBM (pre-padded)
    dw_ref,  # [8, 8, C] VMEM fp32 (7x7 padded to 8x8; last row/col zero)
    dwb_ref,  # [1, C]
    lns_ref,  # [1, C]
    lnb_ref,  # [1, C]
    w1_ref,  # [C, 4C]
    b1_ref,  # [1, 4C]
    w2_ref,  # [4C, C]
    b2_ref,  # [1, C]
    g_ref,  # [1, C]
    out_ref,  # [1, RC, W, C] VMEM block
    slab,  # scratch VMEM [RC+6, W+6, C] (input window, x dtype)
    sem,  # DMA semaphore
    *,
    rc: int,
    w: int,
    c: int,
    cpad: int,
    eps: float,
    wpad: int,
):
    b = pl.program_id(0)
    r = pl.program_id(1)

    # ---- DMA the halo window: rows [r*rc, r*rc + rc+6) of padded input ----
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r * rc, rc + 6)], slab, sem
    )
    dma.start()
    dma.wait()

    # ---- depthwise 7x7 as 49 shifted FMAs (VPU) ----
    # accumulate as a value: Mosaic keeps the running sum in vregs/VMEM
    # without 49 round-trips through the scratch ref
    y = dwb_ref[0, :] * jnp.ones((rc, w, 1), jnp.float32)
    for dy in range(7):
        for dx in range(7):
            tap = slab[dy : dy + rc, dx : dx + w, :].astype(jnp.float32)
            y = y + tap * dw_ref[dy, dx, :]

    # ---- LayerNorm over the REAL channels (fp32) ----
    # channels are zero-padded to cpad for DMA alignment; pad taps/bias are
    # zero so y's pad lanes are 0 — sums over cpad divided by c are exact.
    mean = y.sum(-1, keepdims=True) * (1.0 / c)
    lane = lax.broadcasted_iota(jnp.int32, (rc, w, cpad), 2)
    d = jnp.where(lane < c, y - mean, 0.0)
    var = (d * d).sum(-1, keepdims=True) * (1.0 / c)
    y = d * lax.rsqrt(var + eps) * lns_ref[0, :] + lnb_ref[0, :]

    # ---- MLP on MXU: (rc*w, Cp) @ (Cp, 4C) -> gelu -> @ (4C, Cp) ----
    dt = slab.dtype
    rows = y.reshape(rc * w, cpad).astype(dt)
    h = (
        jnp.dot(rows, w1_ref[:].astype(dt), preferred_element_type=jnp.float32)
        + b1_ref[0, :]
    )
    h = _gelu_exact(h)
    o = (
        jnp.dot(h.astype(dt), w2_ref[:].astype(dt), preferred_element_type=jnp.float32)
        + b2_ref[0, :]
    )
    o = o * g_ref[0, :]

    # ---- residual: center of the slab is x itself ----
    resid = slab[3 : 3 + rc, 3 : 3 + w, :].astype(jnp.float32)
    out_ref[0] = (resid + o.reshape(rc, w, cpad)).astype(out_ref.dtype)


def _pick_row_chunk(h: int, w: int, c: int, dtype_bytes: int = 2) -> int:
    """Largest divisor row-chunk keeping slab + MLP intermediate + weights
    under the 16M VMEM limit (with headroom for Mosaic's own buffers)."""
    budget = 9 * 1024 * 1024
    cpad = -(-c // 128) * 128
    weights = 2 * cpad * 4 * c * dtype_bytes  # w1 + w2 in compute dtype
    best = 1
    for rc in range(1, h + 1):
        if h % rc:
            continue
        slab = (rc + 6) * (-(-(w + 6) // 8) * 8) * cpad * dtype_bytes
        inter = rc * w * 4 * c * 4  # fp32 MLP intermediate
        acc = rc * w * cpad * 4
        out = rc * w * cpad * dtype_bytes
        if weights + slab + inter + acc + out < budget:
            best = rc
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def convnext_block(
    x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
    eps: float = 1e-6,
    interpret: bool = False,
):
    """Fused ConvNeXt block (Pallas forward, XLA-reference backward)."""
    return _forward(
        x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        eps, interpret,
    )


def _forward(
    x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
    eps: float, interpret: bool,
):
    b, h, w, c = x.shape
    rc = _pick_row_chunk(h, w, c, dtype_bytes=x.dtype.itemsize)
    # Mosaic DMA slices must be tile-aligned: sublane (W) to 8 and lane (C)
    # to 128. Pad the logical width/channels; pad lanes carry zeros and the
    # kernel's masked LayerNorm keeps statistics exact over the real C.
    wpad = -(-(w + 6) // 8) * 8
    cpad = -(-c // 128) * 128
    x_pad = jnp.pad(
        x, ((0, 0), (3, 3), (3, 3 + wpad - (w + 6)), (0, cpad - c))
    )

    # 7x7 kernel [7,7,1,C] -> padded [8,8,Cp] fp32 (zeros in the extra taps)
    dw = jnp.pad(
        dw_kernel[:, :, 0, :].astype(jnp.float32),
        ((0, 1), (0, 1), (0, cpad - c)),
    )

    def row2(v, n):  # scalars/vectors must be >=2D on TPU
        out = v.astype(jnp.float32).reshape(1, -1)
        return jnp.pad(out, ((0, 0), (0, n - out.shape[1])))

    # weights travel to VMEM in the compute dtype (the kernel's MXU dots
    # cast anyway); fp32 copies would blow the stage-3 VMEM budget
    w1p = jnp.pad(w1.astype(x.dtype), ((0, cpad - c), (0, 0)))
    w2p = jnp.pad(w2.astype(x.dtype), ((0, 0), (0, cpad - c)))

    kern = functools.partial(
        _kernel, rc=rc, w=w, c=c, cpad=cpad, eps=eps, wpad=wpad
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cpad), x.dtype),
        grid=(b, h // rc),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x_pad stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rc, w, cpad), lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((rc + 6, wpad, cpad), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * (49 + 8 * c),
            bytes_accessed=2 * b * h * w * c * 2,
            transcendentals=b * h * w * 4 * c,
        ),
    )(
        x_pad, dw, row2(dw_bias, cpad), row2(ln_scale, cpad),
        row2(ln_bias, cpad), w1p, row2(b1, 4 * c), w2p, row2(b2, cpad),
        row2(gamma, cpad),
    )
    return out[..., :c]


def _fwd(x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
         eps, interpret):
    out = _forward(
        x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        eps, interpret,
    )
    return out, (x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma)


def _bwd(eps, interpret, residuals, g):
    args = residuals
    _, vjp = jax.vjp(lambda *a: convnext_block_ref(*a, eps=eps), *args)
    return vjp(g)


convnext_block.defvjp(_fwd, _bwd)
