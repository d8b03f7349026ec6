"""Fused ConvNeXt block as a Pallas TPU kernel.

Why: the ConvNeXt trunk is the largest slice of inference time and is
VPU/HBM bound — XLA materialises the depthwise-conv output, the fp32
LayerNorm tensors, and the 4x-wide MLP intermediate in HBM every block.
This kernel keeps one (row-chunk x W x C) slab resident in VMEM and does

    y = x + gamma * fc2(gelu(fc1(LN(dwconv7x7(x) + b))))

in a single pass — reading x from HBM once and writing y once.

Performance notes (round 2 rewrite, see BASELINE.md profile table):
  * depthwise 7x7: the W-dimension shift is a sublane realignment, so it is
    hoisted — 7 shifted/cast copies of the slab (one per kernel column),
    then 49 FMAs whose row offsets are free address arithmetic. The old
    per-tap slicing paid 49 realignments + 49 casts.
  * LayerNorm scale/bias are folded into the fc1 weights outside the kernel
    (w1' = ln_scale * w1, b1' = b1 + ln_bias @ w1), and layer-scale gamma
    into fc2 (w2' = w2 * gamma) — three fewer full-tensor VPU passes.
  * the input-window DMA is double-buffered across grid steps (scratch
    persists on-core), overlapping the next slab fetch with the current
    chunk's VPU/MXU work instead of the old start->wait serialisation.
  * grid steps pipeline: Mosaic overlaps step i's MXU matmuls with step
    i+1's VPU depthwise work once the DMA is async.

Grid: (B, H/RC) row-chunks. The 7x7 halo (+-3 rows/cols) is handled by
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


def _gelu_fast(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-form GELU. Max abs deviation from exact-erf GELU is ~3e-4 —
    an order of magnitude below the bf16 quantisation (~4e-3 relative) the
    surrounding matmuls already apply — and tanh is a single native VPU
    transcendental, where the erf rational costs ~15 extra VPU passes over
    the 4C-wide MLP intermediate (measured 0.86 ms/block at stage-0 640²)."""
    return x * 0.5 * (
        1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x))
    )


def _kernel(
    x_hbm,  # [B, H+6, W+6->wpad, Cp] ANY/HBM (pre-padded)
    dw_ref,  # [8, 8, Cp] VMEM fp32 (7x7 padded to 8x8; last row/col zero)
    dwb_ref,  # [1, Cp]
    w1_ref,  # [Cp, 4C]   (ln_scale pre-folded)
    b1_ref,  # [1, 4C]    (ln_bias pre-folded)
    w2_ref,  # [4C, Cp]   (gamma pre-folded)
    b2_ref,  # [1, Cp]    (gamma pre-folded)
    out_ref,  # [1, RC, W, Cp] VMEM block
    slab,  # scratch VMEM [2, RC+6, wpad, Cp] double-buffered input windows
    sem,  # DMA semaphores (2,)
    *,
    rc: int,
    w: int,
    c: int,
    cpad: int,
    eps: float,
):
    b = pl.program_id(0)
    r = pl.program_id(1)
    nrows = pl.num_programs(1)
    g = b * nrows + r
    total = pl.num_programs(0) * nrows

    def start_dma(gi):
        bi = gi // nrows
        ri = gi % nrows
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(ri * rc, rc + 6)], slab.at[gi % 2], sem.at[gi % 2]
        )

    # double-buffer: step g waits on the copy issued at step g-1 (or its own
    # prologue copy at g == 0) and prefetches step g+1's window.
    @pl.when(g == 0)
    def _():
        start_dma(0).start()

    @pl.when(g + 1 < total)
    def _():
        start_dma(g + 1).start()

    start_dma(g).wait()
    s = slab[g % 2]  # value: [rc+6, wpad, cpad], compute dtype

    # ---- depthwise 7x7, one output row per expression ----
    # Computing each output row as a single 49-term sum keeps the
    # accumulator tile register/VMEM-local instead of a loop-carried
    # full-chunk tensor that round-trips VMEM per tap (measured 2.2x
    # faster than the loop-carried form at stage-0 640² shapes).
    rows_out = [
        (
            dwb_ref[0, :]
            + sum(
                s[ri + dy, dx : dx + w, :].astype(jnp.float32)
                * dw_ref[dy, dx, :]
                for dy in range(7)
                for dx in range(7)
            )
        )[None]
        for ri in range(rc)
    ]
    y = jnp.concatenate(rows_out, axis=0)

    # ---- LayerNorm over the REAL channels (fp32); scale/bias pre-folded
    # into w1/b1. Pad lanes carry zeros so sums over cpad divided by c are
    # exact; the explicit mask is only needed when cpad != c (mean shift
    # would otherwise leak into pad lanes). ----
    mean = y.sum(-1, keepdims=True) * (1.0 / c)
    d = y - mean
    if cpad != c:
        lane = lax.broadcasted_iota(jnp.int32, (rc, w, cpad), 2)
        d = jnp.where(lane < c, d, 0.0)
    var = (d * d).sum(-1, keepdims=True) * (1.0 / c)
    z = d * lax.rsqrt(var + eps)

    # ---- MLP on MXU: (rc*w, Cp) @ (Cp, 4C) -> gelu -> @ (4C, Cp) ----
    dt = slab.dtype
    rows = z.reshape(rc * w, cpad).astype(dt)
    h = (
        jnp.dot(rows, w1_ref[:].astype(dt), preferred_element_type=jnp.float32)
        + b1_ref[0, :]
    )
    h = _gelu_fast(h)
    o = (
        jnp.dot(h.astype(dt), w2_ref[:].astype(dt), preferred_element_type=jnp.float32)
        + b2_ref[0, :]
    )

    # ---- residual: center of the slab is x itself ----
    resid = s[3 : 3 + rc, 3 : 3 + w, :].astype(jnp.float32)
    out_ref[0] = (resid + o.reshape(rc, w, cpad)).astype(out_ref.dtype)


def _pick_row_chunk(h: int, w: int, c: int, dtype_bytes: int = 2) -> int:
    """Largest divisor row-chunk keeping 2x slab + MLP intermediate + weights
    under the 16M VMEM limit (with headroom for Mosaic's own buffers)."""
    budget = 9 * 1024 * 1024
    cpad = -(-c // 128) * 128
    weights = 2 * cpad * 4 * c * dtype_bytes  # w1 + w2 in compute dtype
    best = 1
    for rc in range(1, h + 1):
        if h % rc:
            continue
        slab = 2 * (rc + 6) * (-(-(w + 6) // 8) * 8) * cpad * dtype_bytes
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

    # Fold LayerNorm scale/bias into fc1 and layer-scale gamma into fc2 —
    # the kernel then applies only (y - mean) * rsqrt(var):
    #   LN(y) @ w1 + b1 = ((y-mean)*rsqrt) @ (ln_scale*w1) + (ln_bias@w1 + b1)
    #   (... @ w2 + b2) * gamma = ... @ (w2*gamma) + b2*gamma
    w1f = ln_scale[:, None].astype(jnp.float32) * w1.astype(jnp.float32)
    b1f = b1.astype(jnp.float32) + ln_bias.astype(jnp.float32) @ w1.astype(
        jnp.float32
    )
    w2f = w2.astype(jnp.float32) * gamma[None, :].astype(jnp.float32)
    b2f = b2.astype(jnp.float32) * gamma.astype(jnp.float32)

    # weights travel to VMEM in the compute dtype (the kernel's MXU dots
    # cast anyway); fp32 copies would blow the stage-3 VMEM budget
    w1p = jnp.pad(w1f.astype(x.dtype), ((0, cpad - c), (0, 0)))
    w2p = jnp.pad(w2f.astype(x.dtype), ((0, 0), (0, cpad - c)))

    kern = functools.partial(_kernel, rc=rc, w=w, c=c, cpad=cpad, eps=eps)
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
        ],
        out_specs=pl.BlockSpec(
            (1, rc, w, cpad), lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rc + 6, wpad, cpad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * (49 + 8 * c),
            bytes_accessed=2 * b * h * w * c * 2,
            transcendentals=b * h * w * 4 * c,
        ),
    )(
        x_pad, dw, row2(dw_bias, cpad), w1p, row2(b1f, 4 * c), w2p,
        row2(b2f, cpad),
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
