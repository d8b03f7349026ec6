"""Fused ConvNeXt block as a Pallas TPU kernel.

Why: the ConvNeXt trunk is the largest slice of inference time and is
VPU/HBM bound — XLA materialises the depthwise-conv output, the fp32
LayerNorm tensors, and the 4x-wide MLP intermediate in HBM every block.
This kernel keeps one (row-chunk x W x C) slab resident in VMEM and does

    y = x + gamma * fc2(gelu(fc1(LN(dwconv7x7(x) + b))))

in a single pass — reading x from HBM once and writing y once.

Performance notes (round-2 v4 rewrite; measured numbers in BASELINE.md):
  * in-chunk split pipelining: each row-chunk is processed as two
    independent halves — the MLP matmuls of half 1 are interleaved with the
    depthwise conv of half 2 inside ONE straight-line region, so Mosaic's
    list scheduler runs them on the MXU and VPU concurrently.  (A
    cross-chunk variant with pl.when-guarded pipeline stages was measured
    SLOWER: predicated regions fragment Mosaic's scheduling window.)  The
    dwconv itself runs AT the VPU roofline (~1.8T lane-FMA/s measured via
    scripts/kernel_lab.py), so overlap is the only remaining lever on it.
  * depthwise 7x7: the W-dimension shift is a sublane realignment, so it is
    hoisted — 7 shifted/cast copies of the slab (one per kernel column),
    then 49 FMAs whose row offsets are free address arithmetic.
  * LayerNorm scale/bias are folded into the fc1 weights outside the kernel
    (w1' = ln_scale * w1, b1' = b1 + ln_bias @ w1), and layer-scale gamma
    into fc2 (w2' = w2 * gamma) — three fewer full-tensor VPU passes.
  * padded-layout chaining: ``convnext_block_padded`` consumes and produces
    the (W+halo, C)-padded layout directly, so a stage of N blocks pays ONE
    XLA pad and ONE slice instead of N of each (models/backbone.py chains
    them).  The row halo is handled by clamped manual DMA, not pre-padding.
  * the input-window DMA is double-buffered across grid steps.

Grid: flattened (B * H/RC,).  BlockSpec blocks cannot overlap, so the
+-3-row halo window is DMA'd manually from HBM.

The wrapper is a ``jax.custom_vjp``: forward = this kernel; backward = the
VJP of the numerically-identical pure-jnp reference (``convnext_block_ref``)
by default. An explicit backward whose two depthwise convolutions run as the
Pallas ``dwconv7`` kernel exists behind ``CNB_EXPLICIT_BWD=1`` — it wins in
isolation but loses in the full train step (see ``_bwd_padded``).
"""

from __future__ import annotations

import functools

# experimentation hooks (defaults = production choice; setting any of these
# env vars warns via utils.knobs — the run is then not config-described)


def _nsplit_override() -> int:
    from ...utils.knobs import env_override

    return env_override("CNB_NSPLIT", 0)


def _interleave() -> bool:
    """Emit group k's MLP right after group k+1's dwconv instead of
    all-dw-then-all-mlp. Measured (scripts/bench_block.py, batch 16 @640,
    round 5): NO gain — stage0 3.079 vs 3.059 ms, stage1 1.691 vs 1.656 —
    Mosaic's list scheduler already reorders freely within the
    straight-line region; textual emission order is not the overlap
    limiter (the dwconv's VPU occupancy is). Experiment hook only."""
    from ...utils.knobs import env_override

    return env_override("CNB_INTERLEAVE", False)


def _ln_mxu() -> bool:
    """LN-moment path: False = VPU cross-lane reductions (default), True =
    sums via ``y @ ones`` MXU matmuls. Measured (scripts/bench_block.py,
    batch 8 @640): the MXU form LOSES at every stage width — 1.53→1.59 ms
    stage0, 0.30→0.38 ms stage3 — the two extra full-slab MXU reads cost
    more than the ~7-step VPU shuffle tree they replace. Kept as an
    experiment hook only (CNB_LN_MXU=1)."""
    from ...utils.knobs import env_override

    return env_override("CNB_LN_MXU", False)


def resolve_no_z(cfg_value: bool = True) -> bool:
    """The z-free LN formulation flag: LN never materialises the normalised
    tensor. mean/rsqrt are PER-ROW scalars, so
        LN(y) @ w1 = r * (y @ w1) - (mean * r) * colsum(w1)
    — fc1 consumes the raw dwconv output y (MXU), and normalisation
    becomes a 2-FMA per-row fixup on the fc1 OUTPUT. This deletes the
    full-slab VPU normalise pass that serialised behind the dwconv
    (per-stage measurements: BASELINE.md round-5 kernel table). False =
    the round-3 materialised-z form, kept for A/B sweeps.

    Owned by ``ModelConfig.ln_zfree`` (serialized to the config.json
    sidecar); ``CNB_NO_Z`` is an experiment-only env override that warns."""
    from ...utils.knobs import env_override

    return env_override("CNB_NO_Z", cfg_value)
def _explicit_bwd() -> bool:
    from ...utils.knobs import env_override

    return env_override("CNB_EXPLICIT_BWD", False)


def _fused_bwd_v1() -> bool:
    from ...utils.knobs import env_override

    return env_override("CNB_FUSED_BWD", False)


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
def _gelu_fast(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-form GELU. Max abs deviation from exact-erf GELU is ~3e-4 —
    an order of magnitude below the bf16 quantisation (~4e-3 relative) the
    surrounding matmuls already apply — and tanh is a single native VPU
    transcendental, where an erf rational costs ~15 extra VPU passes over
    the 4C-wide MLP intermediate (measured 0.86 ms/block at stage-0 640²)."""
    return x * 0.5 * (
        1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x))
    )


def _kernel(
    x_hbm,  # [B, H, wpad, cpad] ANY/HBM (W+halo and lane padded, H raw)
    dw_ref,  # [8, 8, Cp] VMEM fp32 (7x7 padded to 8x8; last row/col zero)
    dwb_ref,  # [1, Cp]
    w1_ref,  # [Cp, 4C]   (ln_scale pre-folded)
    b1_ref,  # [1, 4C]    (ln_bias pre-folded)
    w1cs_ref,  # [1, 4C]  column sums of the folded w1 (z-free LN fixup)
    w2_ref,  # [4C, Cp]   (gamma pre-folded)
    b2_ref,  # [1, Cp]    (gamma pre-folded)
    out_ref,  # [1, RC, wpad, Cp] VMEM block
    *rest,  # with save_res: y_ref [1,RC,wpad,Cp] (pre-LN dwconv output);
    # then slab scratch [2, RC+6, wpad, Cp] and DMA semaphores (2,)
    rc: int,
    w: int,
    c: int,
    cpad: int,
    nrows: int,
    nsplit: int,
    eps: float,
    save_res: bool = False,
    no_z: bool = False,
):
    if save_res:
        y_ref, slab, sem = rest
    else:
        y_ref = None
        slab, sem = rest
    g = pl.program_id(0)  # flattened (image, row-chunk) id
    total = pl.num_programs(0)

    # ---- clamped halo DMA: rows [ri*rc-3, ri*rc+rc+3) of image bi ----
    # DMA sizes must be static, so the first/interior/last row-clamp cases
    # are separate @pl.when branches; start and wait both rebuild the same
    # descriptor (the wait amount derives from the descriptor's shape), and
    # the descriptor is created INSIDE the branch it is used in.
    h = nrows * rc

    def _cases(gi):
        bi = gi // nrows
        slot = gi % 2
        if nrows == 1:
            # single chunk covers the whole image: no interior rows exist
            yield None, lambda: pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(0, rc)],
                slab.at[slot, pl.ds(3, rc)],
                sem.at[slot],
            )
            return
        ri = gi % nrows
        yield ri == 0, lambda: pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(0, rc + 3)],
            slab.at[slot, pl.ds(3, rc + 3)],
            sem.at[slot],
        )
        yield ri == nrows - 1, lambda: pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(h - (rc + 3), rc + 3)],
            slab.at[slot, pl.ds(0, rc + 3)],
            sem.at[slot],
        )
        if nrows > 2:
            yield (ri > 0) & (ri < nrows - 1), lambda: pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(jnp.clip(ri * rc - 3, 0, h - (rc + 6)),
                                   rc + 6)],
                slab.at[slot, pl.ds(0, rc + 6)],
                sem.at[slot],
            )

    def start_dma(gi):
        for cond, mk in _cases(gi):
            if cond is None:
                mk().start()
            else:
                pl.when(cond)(lambda mk=mk: mk().start())

    def wait_dma(gi):
        for cond, mk in _cases(gi):
            if cond is None:
                mk().wait()
            else:
                pl.when(cond)(lambda mk=mk: mk().wait())

    @pl.when(g == 0)
    def _():
        start_dma(0)

    @pl.when(g + 1 < total)
    def _():
        start_dma(g + 1)

    wait_dma(g)
    slot = g % 2
    ri = g % nrows

    # stale halo rows from an earlier slot reuse must be zeroed on the
    # image's border chunks (interior chunks overwrite them via DMA)
    if nrows == 1:
        slab[slot, 0:3] = jnp.zeros((3,) + slab.shape[2:], slab.dtype)
        slab[slot, rc + 3 : rc + 6] = jnp.zeros(
            (3,) + slab.shape[2:], slab.dtype
        )
    else:
        @pl.when(ri == 0)
        def _():
            slab[slot, 0:3] = jnp.zeros((3,) + slab.shape[2:], slab.dtype)

        @pl.when(ri == nrows - 1)
        def _():
            slab[slot, rc + 3 : rc + 6] = jnp.zeros(
                (3,) + slab.shape[2:], slab.dtype
            )

    s = slab[slot]  # value: [rc+6, wpad, cpad], compute dtype
    dt = slab.dtype
    wpad = out_ref.shape[2]
    gr = rc // nsplit  # rows per split group

    # ---- the chunk is processed as nsplit independent row groups; group
    # k+1's depthwise conv (VPU) has no dependence on group k's MLP (MXU),
    # so Mosaic's scheduler overlaps them within this straight-line region
    def dw_ln(r0):
        # depthwise 7x7, one output row per expression: a single 49-term
        # sum keeps the accumulator register/VMEM-local instead of a
        # loop-carried full-chunk tensor that round-trips VMEM per tap
        # (measured 2.2x faster than the loop-carried form)
        rows_out = [
            (
                dwb_ref[0, :]
                + sum(
                    s[r0 + rr + dy, dx : dx + w, :].astype(jnp.float32)
                    * dw_ref[dy, dx, :]
                    for dy in range(7)
                    for dx in range(7)
                )
            )[None]
            for rr in range(gr)
        ]
        y = jnp.concatenate(rows_out, axis=0)
        # LayerNorm over the REAL channels (fp32); scale/bias folded into
        # w1/b1. Pad lanes carry zeros, so plain sums over cpad divided by
        # the real c are exact; E[y^2]-mean^2 gets both moments in one
        # traversal. No pad-lane mask is needed anywhere: z's pad lanes
        # hold -mean*rsqrt garbage, but the folded w1's pad ROWS are zero,
        # so fc1 annihilates them (and the out block's pad lanes come from
        # resid + o, both zero there).
        if _ln_mxu():
            # moments via MXU: a cross-lane sum on the VPU is a ~7-step
            # shuffle tree per row; y @ ones gets both sums as two tiny
            # fp32 matmuls the MXU absorbs while the VPU holds the data hot
            # (pad lanes of y are zero, so summing all cpad lanes is exact)
            flat = y.reshape(gr * w, cpad)
            ones = jnp.ones((cpad, 128), jnp.float32)
            s1 = jnp.dot(flat, ones, preferred_element_type=jnp.float32)
            s2 = jnp.dot(flat * flat, ones,
                         preferred_element_type=jnp.float32)
            mean = (s1[:, :1] * (1.0 / c)).reshape(gr, w, 1)
            var = (s2[:, :1] * (1.0 / c)).reshape(gr, w, 1) - mean * mean
        else:
            mean = y.sum(-1, keepdims=True) * (1.0 / c)
            var = (y * y).sum(-1, keepdims=True) * (1.0 / c) - mean * mean
        r = lax.rsqrt(jnp.maximum(var, 0.0) + eps)
        if save_res:
            # backward residual: the dwconv+bias output y (pre-LN). The
            # backward recomputes the LN moments from it (cheap keepdims
            # lane reductions) instead of re-running the 49-tap dwconv —
            # the expensive part of a recompute-based backward.
            y_ref[0, r0 : r0 + gr] = jnp.pad(
                y.astype(dt), ((0, 0), (3, wpad - w - 3), (0, 0))
            )
        if no_z:
            # z-free: hand the raw y to fc1; normalisation is applied to
            # the fc1 OUTPUT as a per-row 2-FMA fixup (see _no_z). No
            # full-slab normalise pass runs on the VPU.
            return y.astype(dt), mean * r, r
        z = (y * r - mean * r).astype(dt)
        return z, None, None

    def mlp_out(z, a, r, r0):
        rows = z.reshape(gr * w, cpad)
        hmat = jnp.dot(rows, w1_ref[:].astype(dt),
                       preferred_element_type=jnp.float32)
        if no_z:
            # LN(y) @ w1 + b1 = r*(y @ w1) - (mean*r)*colsum(w1) + b1
            hmat = (
                hmat * r.reshape(gr * w, 1)
                - a.reshape(gr * w, 1) * w1cs_ref[0, :]
                + b1_ref[0, :]
            )
        else:
            hmat = hmat + b1_ref[0, :]
        hmat = _gelu_fast(hmat)
        o = (
            jnp.dot(hmat.astype(dt), w2_ref[:].astype(dt),
                    preferred_element_type=jnp.float32)
            + b2_ref[0, :]
        )
        resid = s[3 + r0 : 3 + r0 + gr, 3 : 3 + w, :].astype(jnp.float32)
        val = (resid + o.reshape(gr, w, cpad)).astype(out_ref.dtype)
        # store the full padded-W rows: halo columns stay zero so the next
        # block in the chain needs no re-pad
        out_ref[0, r0 : r0 + gr] = jnp.pad(
            val, ((0, 0), (3, wpad - w - 3), (0, 0))
        )

    if _interleave():
        # explicit software-pipelined emission (A/B hook CNB_INTERLEAVE;
        # measured NO gain — see _interleave)
        prev = dw_ln(0)
        for k in range(1, nsplit):
            cur = dw_ln(k * gr)
            mlp_out(*prev, (k - 1) * gr)
            prev = cur
        mlp_out(*prev, (nsplit - 1) * gr)
    else:
        zs = [dw_ln(k * gr) for k in range(nsplit)]
        for k in range(nsplit):
            mlp_out(*zs[k], k * gr)


def _pick_row_chunk(h: int, w: int, c: int, dtype_bytes: int = 2) -> int:
    """Largest correct divisor row-chunk fitting the VMEM budget.

    Correctness: with more than two chunks per image, interior chunks need
    their full +-3-row halo inside [0, H), which requires rc >= 3 (the
    clamped-DMA scheme only special-cases the first/last chunk). If no
    correct divisor fits the budget, the smallest correct one is returned
    (VMEM-oversubscribed but Mosaic may still schedule it)."""
    budget = 9 * 1024 * 1024
    cpad = -(-c // 128) * 128
    weights = 2 * cpad * 4 * c * dtype_bytes  # w1 + w2 in compute dtype

    def vmem(rc):
        wpad = -(-(w + 6) // 8) * 8
        slab = 2 * (rc + 6) * wpad * cpad * dtype_bytes
        inter = rc * w * 4 * c * 4  # fp32 MLP intermediate (both groups)
        acc = rc * w * cpad * 4
        out = 2 * rc * wpad * cpad * dtype_bytes  # double-buffered out block
        return weights + slab + inter + acc + out

    correct = [rc for rc in range(1, h + 1)
               if h % rc == 0 and (h // rc <= 2 or rc >= 3)]
    fitting = [rc for rc in correct if vmem(rc) < budget]
    if fitting:
        return max(fitting)
    return min(correct, key=vmem)


def pad_for_blocks(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> the chained kernel layout [B, H, wpad, cpad]
    (W shifted by the 3-column halo; lanes zero-padded to a 128 multiple)."""
    b, h, w, c = x.shape
    wpad = -(-(w + 6) // 8) * 8
    cpad = -(-c // 128) * 128
    return jnp.pad(x, ((0, 0), (0, 0), (3, wpad - w - 3), (0, cpad - c)))


def unpad_from_blocks(x_pad: jnp.ndarray, w: int, c: int) -> jnp.ndarray:
    """Inverse of :func:`pad_for_blocks`."""
    return x_pad[:, :, 3 : 3 + w, :c]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15, 16)
)
def convnext_block_padded(
    x_pad, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
    w: int,
    c: int,
    eps: float = 1e-6,
    interpret: bool = False,
    row_chunk: int = 0,
    bwd: str = "ref",
    no_z: bool = True,
):
    """Fused ConvNeXt block on the padded chained layout [B, H, wpad, cpad]
    (Pallas forward; backward selected by ``bwd``). ``w``/``c`` are the real
    spatial width / channel count inside the padding. ``row_chunk=0`` picks
    the largest VMEM-fitting divisor of H (tests override it to force the
    multi-chunk pipeline on small shapes).

    ``bwd``: "ref" = vjp of the XLA reference (recomputes the forward in
    XLA); "fused" = the one-kernel Pallas backward
    (ops/pallas/convnext_block_bwd.py). Measured per stage in BASELINE.md —
    models/backbone.py picks per dim."""
    return _forward_padded(
        x_pad, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        w, c, eps, interpret, row_chunk, no_z=no_z,
    )


def _forward_padded(
    x_pad, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
    w: int, c: int, eps: float, interpret: bool, row_chunk: int = 0,
    save_res: bool = False, no_z: bool = True,
):
    b, h, wpad, cpad = x_pad.shape
    assert wpad == -(-(w + 6) // 8) * 8 and cpad == -(-c // 128) * 128, (
        x_pad.shape, w, c,
    )
    rc = row_chunk or _pick_row_chunk(h, w, c, dtype_bytes=x_pad.dtype.itemsize)
    assert h % rc == 0, (h, rc)
    nrows = h // rc
    # interior chunks need the full +-3-row halo inside the image
    assert nrows <= 2 or rc >= 3, (h, rc)

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
    w1p = jnp.pad(w1f.astype(x_pad.dtype), ((0, cpad - c), (0, 0)))
    w2p = jnp.pad(w2f.astype(x_pad.dtype), ((0, 0), (0, cpad - c)))

    # column sums of the folded fc1 weights for the z-free LN fixup
    # (over the REAL c rows; the padded rows of w1p are zero anyway)
    w1cs = jnp.sum(w1f, axis=0).reshape(1, -1)

    total = b * nrows
    nsplit = _nsplit_override() or (2 if (rc % 2 == 0 and rc >= 8) else 1)
    if rc % nsplit:
        nsplit = 1
    kern = functools.partial(
        _kernel, rc=rc, w=w, c=c, cpad=cpad, nrows=nrows, nsplit=nsplit,
        eps=eps, save_res=save_res, no_z=no_z,
    )

    def out_index(g):
        return (g // nrows, g % nrows, 0, 0)

    out_shape = jax.ShapeDtypeStruct((b, h, wpad, cpad), x_pad.dtype)
    out_spec = pl.BlockSpec(
        (1, rc, wpad, cpad), out_index, memory_space=pltpu.VMEM
    )
    if save_res:
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((b, h, wpad, cpad), x_pad.dtype),  # y
        )
        out_spec = (
            out_spec,
            pl.BlockSpec(
                (1, rc, wpad, cpad), out_index, memory_space=pltpu.VMEM
            ),
        )
    out = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(total,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x_pad stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, rc + 6, wpad, cpad), x_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        # the save_res variant's extra out blocks can exceed the 16 MB
        # default scoped-VMEM cap at large row chunks; v5e has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * (49 + 8 * c),
            bytes_accessed=2 * b * h * wpad * cpad * 2,
            transcendentals=b * h * w * 4 * c,
        ),
    )(
        x_pad, dw, row2(dw_bias, cpad), w1p, row2(b1f, 4 * c), w1cs, w2p,
        row2(b2f, cpad),
    )
    return out


def _fwd_padded(x_pad, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2,
                gamma, w, c, eps, interpret, row_chunk, bwd, no_z):
    if bwd == "fused":
        # residual-saving forward: the dwconv output y rides along so the
        # backward kernel skips the 49-tap forward recompute (the LN
        # moments are recomputed from y — cheap lane reductions)
        out, y = _forward_padded(
            x_pad, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2,
            gamma, w, c, eps, interpret, row_chunk, save_res=True, no_z=no_z,
        )
        return out, (x_pad, y, dw_kernel, dw_bias, ln_scale, ln_bias,
                     w1, b1, w2, b2, gamma)
    out = _forward_padded(
        x_pad, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        w, c, eps, interpret, row_chunk, no_z=no_z,
    )
    return out, (x_pad, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2,
                 b2, gamma)


def _bwd_padded(w, c, eps, interpret, row_chunk, bwd, no_z, residuals, g):
    """Explicit backward: the depthwise convs (forward-y recompute and the
    input-gradient correlation) run as the Pallas dwconv kernel — XLA's
    depthwise lowering is the slow piece of a vjp-of-reference backward —
    while the LN/MLP chain is plain XLA (matmuls/elementwise, already
    fast). Numerics match jax.vjp of ``convnext_block_ref`` (verified by
    tests/test_pallas_convnext.py::test_kernel_gradients_match_reference)."""
    from .dwconv import dwconv7

    if bwd == "fused":
        from .convnext_block_bwd import fused_block_bwd_v2

        x_pad, y, *params = residuals
        return fused_block_bwd_v2(
            x_pad, y, g, *params, w=w, c=c, eps=eps, interpret=interpret,
        )

    if _fused_bwd_v1():
        from .convnext_block_bwd import fused_block_bwd

        return fused_block_bwd(
            *residuals[:1], g, *residuals[1:], w=w, c=c, eps=eps,
            interpret=interpret,
        )

    if not _explicit_bwd():
        # Default: vjp of the XLA reference. The explicit path below beats
        # it measured in ISOLATION (5.2 vs 7.7 ms for a stage-0 block's
        # fwd+bwd at batch 8), but in the FULL train step the extra
        # pallas_call boundaries break XLA's fusion of the surrounding
        # backward graph and the step gets 20% slower (129.8 vs 108.7 ms);
        # revisit with a fully-fused backward kernel.
        def _ref(x_p, *a):
            return pad_for_blocks(
                convnext_block_ref(unpad_from_blocks(x_p, w, c), *a, eps=eps)
            )

        _, vjp = jax.vjp(_ref, *residuals)
        return vjp(g)

    (x_pad, dw_kernel, dw_bias, ln_scale, ln_bias,
     w1, b1, w2, b2, gamma) = residuals
    f32 = jnp.float32
    dt = x_pad.dtype
    x = unpad_from_blocks(x_pad, w, c)
    gy = unpad_from_blocks(g, w, c).astype(f32)  # halo cotangents are dead

    def tsum(t):  # reduce over batch+spatial tokens
        return t.sum((0, 1, 2))

    def flat(t):
        return t.reshape(-1, t.shape[-1])

    # ---- forward recompute (dtype flow mirrors convnext_block_ref) ----
    k77 = dw_kernel[:, :, 0, :]
    y = (
        dwconv7(x, k77.astype(dt).astype(f32), interpret=interpret)
        .astype(dt)
        + dw_bias.astype(dt)
    ).astype(f32)
    mean = y.mean(-1, keepdims=True)
    var = ((y - mean) ** 2).mean(-1, keepdims=True)
    r = lax.rsqrt(var + eps)
    z = (y - mean) * r
    z2d = (z * ln_scale + ln_bias).astype(dt)  # what fc1 consumed
    hm = jnp.dot(z2d, w1.astype(dt), preferred_element_type=f32) + b1
    a = jax.nn.gelu(hm, approximate=False)
    ad = a.astype(dt)
    o = jnp.dot(ad, w2.astype(dt), preferred_element_type=f32) + b2

    # ---- backward chain ----
    d_gamma = tsum(gy * o)
    do = gy * gamma
    d_b2 = tsum(do)
    d_w2 = flat(ad).astype(f32).T @ flat(do)
    d_a = jnp.dot(
        do.astype(dt), w2.astype(dt).T, preferred_element_type=f32
    )
    # exact-GELU derivative: Phi(h) + h * phi(h)
    inv_sqrt2 = 0.7071067811865476
    inv_sqrt2pi = 0.3989422804014327
    cdf = 0.5 * (1.0 + lax.erf(hm * inv_sqrt2))
    pdf = inv_sqrt2pi * jnp.exp(-0.5 * hm * hm)
    d_h = d_a * (cdf + hm * pdf)
    d_b1 = tsum(d_h)
    d_w1 = flat(z2d).astype(f32).T @ flat(d_h)
    d_z2 = jnp.dot(
        d_h.astype(dt), w1.astype(dt).T, preferred_element_type=f32
    )
    d_lns = tsum(d_z2 * z)
    d_lnb = tsum(d_z2)
    d_z = d_z2 * ln_scale
    m1 = d_z.mean(-1, keepdims=True)
    m2 = (d_z * z).mean(-1, keepdims=True)
    d_y = r * (d_z - m1 - z * m2)
    d_dwb = tsum(d_y)
    # input gradient: correlation == dwconv with the spatially-flipped taps
    kf = k77[::-1, ::-1, :]
    d_x = (
        dwconv7(d_y.astype(dt), kf.astype(dt).astype(f32),
                interpret=interpret).astype(dt)
        + gy.astype(dt)  # residual branch
    )
    # filter gradient: dK[dy,dx,c] = sum_p x[p-3+dy]*d_y[p]
    hgt = x.shape[1]
    xp = jnp.pad(x.astype(f32), ((0, 0), (3, 3), (3, 3), (0, 0)))
    d_k = jnp.stack(
        [
            jnp.stack(
                [
                    tsum(xp[:, dy : dy + hgt, dx : dx + w, :] * d_y)
                    for dx in range(7)
                ],
                0,
            )
            for dy in range(7)
        ],
        0,
    )[:, :, None, :]  # [7, 7, 1, C]

    return (
        pad_for_blocks(d_x),
        d_k.astype(dw_kernel.dtype),
        d_dwb.astype(dw_bias.dtype),
        d_lns.astype(ln_scale.dtype),
        d_lnb.astype(ln_bias.dtype),
        d_w1.astype(w1.dtype),
        d_b1.astype(b1.dtype),
        d_w2.astype(w2.dtype),
        d_b2.astype(b2.dtype),
        d_gamma.astype(gamma.dtype),
    )


convnext_block_padded.defvjp(_fwd_padded, _bwd_padded)


def convnext_block(
    x, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
    eps: float = 1e-6,
    interpret: bool = False,
    row_chunk: int = 0,
    bwd: str = "ref",
    no_z: bool = True,
):
    """Fused ConvNeXt block on the plain [B, H, W, C] layout.

    Convenience wrapper: pad -> chained kernel -> slice. A stage of several
    blocks should instead pad once and chain ``convnext_block_padded``
    (models/backbone.py does)."""
    _, _, w, c = x.shape
    out = convnext_block_padded(
        pad_for_blocks(x), dw_kernel, dw_bias, ln_scale, ln_bias,
        w1, b1, w2, b2, gamma, w, c, eps, interpret, row_chunk, bwd, no_z,
    )
    return unpad_from_blocks(out, w, c)
