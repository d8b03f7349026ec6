"""Fully-fused ConvNeXt block backward as ONE Pallas TPU kernel.

Motivation (measured, see BASELINE.md): the default backward (vjp of the
XLA reference) re-runs XLA's slow depthwise lowering; a hybrid backward
that offloaded just the depthwise convs to Pallas won in isolation but
LOST in the full train step because the pallas_call boundaries broke XLA's
fusion of the surrounding backward graph. This kernel removes the
boundaries entirely: per row-chunk it recomputes the forward (dwconv + LN
+ MLP), runs the whole gradient chain, writes the input gradient, and
accumulates all nine parameter gradients in revisited output blocks — one
HBM read of x and g, one write of dx, per block backward.

Grid: flattened (B * H/RC,), sequential (the parameter-gradient blocks are
accumulated across steps; their index maps are constant so Mosaic keeps
them VMEM-resident and flushes once at the end).

Halo structure: the input-gradient correlation at chunk rows needs dy over
chunk±3, and recomputing y at chunk±3 needs x over chunk±6 — so the x slab
carries a ±6-row halo (interior chunks therefore require rc >= 6) and the
g slab ±3. W-halo and channel-pad lanes are provably inert: g's halo
columns are zero (the chained-layout invariant), the folded weights' pad
rows/columns are zero, and the dwconv taps' pad lanes are zero, so garbage
never reaches a real output (asserted against jax.vjp of the reference in
tests/test_pallas_convnext.py).

GELU: the derivative uses the tanh form (matching the fused FORWARD
kernel's activation; Pallas cannot lower erf) — deviation from the exact
erf derivative is ~1e-3 absolute, inside the existing bf16-level gradient
test tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_hbm,  # [B, H, wpad, cpad] ANY (padded chained layout)
    g_hbm,  # [B, H, wpad, cpad] ANY (cotangent, same layout)
    dw_ref,  # [8, 8, Cp] fp32 (7x7 taps padded; pad taps/lanes zero)
    dwb_ref,  # [1, Cp]
    lns_ref,  # [1, Cp]
    lnb_ref,  # [1, Cp]
    w1_ref,  # [Cp, 4C] compute dtype (pad rows zero)
    b1_ref,  # [1, 4C]
    w2_ref,  # [4C, Cp] compute dtype (pad cols zero)
    b2_ref,  # [1, Cp]
    gam_ref,  # [1, Cp]
    dx_ref,  # out [1, RC, wpad, Cp] compute dtype
    ddw_ref,  # out [8, 8, Cp] fp32 (accumulated)
    ddwb_ref,  # out [1, Cp]
    dlns_ref,  # out [1, Cp]
    dlnb_ref,  # out [1, Cp]
    dw1_ref,  # out [Cp, 4C] fp32
    db1_ref,  # out [1, 4C]
    dw2_ref,  # out [4C, Cp] fp32
    db2_ref,  # out [1, Cp]
    dgam_ref,  # out [1, Cp]
    xslab,  # scratch [2, RC+12, wpad, Cp] compute dtype
    gslab,  # scratch [2, RC+6, wpad, Cp] compute dtype
    xsem,
    gsem,
    *,
    rc: int,
    w: int,
    c: int,
    cpad: int,
    nrows: int,
    eps: float,
):
    g = pl.program_id(0)
    total = pl.num_programs(0)
    h = nrows * rc
    f32 = jnp.float32

    def _cases(gi, hbm, slab, sem, halo):
        bi = gi // nrows
        slot = gi % 2
        if nrows == 1:
            yield None, lambda: pltpu.make_async_copy(
                hbm.at[bi, pl.ds(0, rc)],
                slab.at[slot, pl.ds(halo, rc)],
                sem.at[slot],
            )
            return
        ri = gi % nrows
        yield ri == 0, lambda: pltpu.make_async_copy(
            hbm.at[bi, pl.ds(0, rc + halo)],
            slab.at[slot, pl.ds(halo, rc + halo)],
            sem.at[slot],
        )
        yield ri == nrows - 1, lambda: pltpu.make_async_copy(
            hbm.at[bi, pl.ds(h - (rc + halo), rc + halo)],
            slab.at[slot, pl.ds(0, rc + halo)],
            sem.at[slot],
        )
        if nrows > 2:
            yield (ri > 0) & (ri < nrows - 1), lambda: pltpu.make_async_copy(
                hbm.at[bi, pl.ds(
                    jnp.clip(ri * rc - halo, 0, h - (rc + 2 * halo)),
                    rc + 2 * halo,
                )],
                slab.at[slot, pl.ds(0, rc + 2 * halo)],
                sem.at[slot],
            )

    def dma(gi, op):
        for args in ((x_hbm, xslab, xsem, 6), (g_hbm, gslab, gsem, 3)):
            for cond, mk in _cases(gi, *args):
                if cond is None:
                    getattr(mk(), op)()
                else:
                    pl.when(cond)(lambda mk=mk, op=op: getattr(mk(), op)())

    @pl.when(g == 0)
    def _():
        dma(0, "start")

    @pl.when(g + 1 < total)
    def _():
        dma(g + 1, "start")

    dma(g, "wait")

    slot = g % 2
    ri = g % nrows

    def zero_halo(slab, halo, n):
        if nrows == 1:
            slab[slot, 0:halo] = jnp.zeros((halo,) + slab.shape[2:], slab.dtype)
            slab[slot, rc + halo : rc + 2 * halo] = jnp.zeros(
                (halo,) + slab.shape[2:], slab.dtype
            )
        else:
            @pl.when(ri == 0)
            def _():
                slab[slot, 0:halo] = jnp.zeros(
                    (halo,) + slab.shape[2:], slab.dtype
                )

            @pl.when(ri == nrows - 1)
            def _():
                slab[slot, rc + halo : rc + 2 * halo] = jnp.zeros(
                    (halo,) + slab.shape[2:], slab.dtype
                )

    zero_halo(xslab, 6, rc + 12)
    zero_halo(gslab, 3, rc + 6)

    xs = xslab[slot]  # [rc+12, wpad, cpad]
    gs = gslab[slot]  # [rc+6, wpad, cpad]
    dt = xslab.dtype
    wpad = dx_ref.shape[2]
    next_ = rc + 6  # rows of the extended (chunk+-3) working set

    # Row sub-tiling: the MLP chain's fp32 live set scales with tokens, and
    # the whole-chunk form blows the 16 MB scoped-VMEM limit beyond stage 0
    # (observed: 20.2 M at stage 1). Process `st` rows at a time — the
    # per-tile h1/gelu/d_h/d_z2 temporaries die at the end of each tile
    # (static Python unroll, so Mosaic's live-range analysis frees them);
    # only d_y [next, w, Cp] fp32 and the running parameter-grad
    # accumulators survive tiles. Tile boundaries and the center-row
    # intersection are all static slices.
    st = _pick_row_tile(w, c, next_)

    d_y_tiles = []
    accs = {}  # running parameter-grad accumulators (summed across tiles)

    def add(name, val):
        accs[name] = val if name not in accs else accs[name] + val

    for a0 in range(0, next_, st):
        b0 = min(a0 + st, next_)
        nr = b0 - a0
        # forward recompute: y rows a0..b0 read x slab rows a0..b0+6
        rows_y = [
            (
                dwb_ref[0, :]
                + sum(
                    xs[m + dy, dx : dx + w, :].astype(f32) * dw_ref[dy, dx, :]
                    for dy in range(7)
                    for dx in range(7)
                )
            )[None]
            for m in range(a0, b0)
        ]
        y = jnp.concatenate(rows_y, axis=0)  # [nr, w, cpad] fp32
        mean = y.sum(-1, keepdims=True) * (1.0 / c)
        var = (y * y).sum(-1, keepdims=True) * (1.0 / c) - mean * mean
        r = lax.rsqrt(jnp.maximum(var, 0.0) + eps)
        z = (y - mean) * r  # pad lanes: -mean*r (inert, see module docstring)
        z2d = (z * lns_ref[0, :] + lnb_ref[0, :]).astype(dt)

        tok = nr * w
        z2f = z2d.reshape(tok, cpad)
        h1 = (
            jnp.dot(z2f, w1_ref[:], preferred_element_type=f32) + b1_ref[0, :]
        )  # [tok, 4C]
        # tanh-GELU and its derivative (shares the tanh evaluation)
        u = 0.7978845608028654 * (h1 + 0.044715 * h1 * h1 * h1)
        th = jnp.tanh(u)
        a = h1 * 0.5 * (1.0 + th)
        du = 0.7978845608028654 * (1.0 + 3.0 * 0.044715 * h1 * h1)
        dgelu = 0.5 * (1.0 + th) + h1 * 0.5 * (1.0 - th * th) * du

        # backward chain
        gy = gs[a0:b0, 3 : 3 + w, :].astype(f32)  # halo cols inert
        gyf = gy.reshape(tok, cpad)
        do = gyf * gam_ref[0, :]
        # d_a = do @ w2^T without an in-kernel transpose: contract Cp dims
        d_a = jax.lax.dot_general(
            do.astype(dt), w2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # [tok, 4C]
        d_h = d_a * dgelu
        d_z2 = jax.lax.dot_general(
            d_h.astype(dt), w1_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # [tok, Cp]; pad lanes zero (w1 pad rows zero)
        d_z = (d_z2 * lns_ref[0, :]).reshape(nr, w, cpad)
        m1 = d_z.sum(-1, keepdims=True) * (1.0 / c)
        m2 = (d_z * z).sum(-1, keepdims=True) * (1.0 / c)
        d_y_tiles.append(r * (d_z - m1 - z * m2))  # [nr, w, cpad]

        # parameter-grad contributions: center rows [3, 3+rc) only —
        # static intersection with this tile
        ca, cb = max(a0, 3), min(b0, 3 + rc)
        if ca >= cb:
            continue
        ctr = slice((ca - a0) * w, (cb - a0) * w)
        o_ctr = (
            jnp.dot(a[ctr].astype(dt), w2_ref[:], preferred_element_type=f32)
            + b2_ref[0, :]
        )
        add("dgam", (gyf[ctr] * o_ctr).sum(0, keepdims=True))
        add("db2", do[ctr].sum(0, keepdims=True))
        add(
            "dw2",
            jax.lax.dot_general(
                a[ctr].astype(dt), do[ctr].astype(dt),
                (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            ),
        )
        add("db1", d_h[ctr].sum(0, keepdims=True))
        add(
            "dw1",
            jax.lax.dot_general(
                z2f[ctr], d_h[ctr].astype(dt),
                (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            ),
        )
        zc = z.reshape(tok, cpad)[ctr]
        d_z2c = d_z2[ctr]
        add("dlns", (d_z2c * zc).sum(0, keepdims=True))
        add("dlnb", d_z2c.sum(0, keepdims=True))

    d_y = jnp.concatenate(d_y_tiles, axis=0)  # [next, w, cpad] fp32

    # ---- dx for the center rows: correlation with flipped taps + residual
    dyp = jnp.pad(d_y, ((0, 0), (3, wpad - w - 3), (0, 0)))
    rows_dx = [
        (
            sum(
                dyp[j + 6 - dy, dx_ : 0 + dx_ + w, :]
                * dw_ref[dy, 6 - dx_, :]
                for dy in range(7)
                for dx_ in range(7)
            )
        )[None]
        for j in range(rc)
    ]
    d_x = jnp.concatenate(rows_dx, axis=0)  # [rc, w, cpad] fp32
    d_x = d_x + gs[3 : 3 + rc, 3 : 3 + w, :].astype(f32)  # residual branch
    dx_ref[0] = jnp.pad(
        d_x.astype(dx_ref.dtype), ((0, 0), (3, wpad - w - 3), (0, 0))
    )

    # ---- parameter gradients (accumulated across grid steps)
    def acc(ref, val):
        ref[...] = jnp.where(g == 0, val, ref[...] + val)

    acc(dgam_ref, accs["dgam"])
    acc(db2_ref, accs["db2"])
    acc(dw2_ref, accs["dw2"])
    acc(db1_ref, accs["db1"])
    acc(dw1_ref, accs["dw1"])
    acc(dlns_ref, accs["dlns"])
    acc(dlnb_ref, accs["dlnb"])
    d_y_ctr = d_y[3 : 3 + rc]
    acc(ddwb_ref, d_y_ctr.sum((0, 1))[None])
    # filter grad: dK[dy,dx] = sum over center tokens of x[..+dy, ..+dx]*d_y
    taps = []
    for dy in range(7):
        row = []
        for dx in range(7):
            xwin = xs[3 + dy : 3 + dy + rc, dx : dx + w, :].astype(f32)
            row.append((xwin * d_y_ctr).sum((0, 1)))
        row.append(jnp.zeros((cpad,), f32))
        taps.append(jnp.stack(row, 0))
    taps.append(jnp.zeros((8, cpad), f32))
    acc(ddw_ref, jnp.stack(taps, 0))


def _kernel_v2(
    x_hbm,  # [B, H, wpad, cpad] ANY (padded chained layout)
    y_hbm,  # [B, H, wpad, cpad] ANY (saved dwconv output, pre-LN, dt)
    g_hbm,  # [B, H, wpad, cpad] ANY (cotangent)
    dw_ref,  # [8, 8, Cp] fp32
    lns_ref,  # [1, Cp]
    lnb_ref,  # [1, Cp]
    w1_ref,  # [Cp, 4C] dt raw
    w1f_ref,  # [Cp, 4C] dt folded (ln_scale * w1)
    b1f_ref,  # [1, 4C] fp32 folded (b1 + ln_bias @ w1)
    w2_ref,  # [4C, Cp] dt raw
    w2f_ref,  # [4C, Cp] dt folded (w2 * gamma)
    b2_ref,  # [1, Cp] fp32 raw
    gam_ref,  # [1, Cp]
    dx_ref,  # out [1, RC, wpad, Cp] dt
    ddw_ref,  # out [8, 8, Cp] fp32 (accumulated across grid steps)
    ddwb_ref,  # out [1, Cp]
    dlns_ref,  # out [1, Cp]
    dlnb_ref,  # out [1, Cp]
    dw1_ref,  # out [Cp, 4C] fp32
    db1_ref,  # out [1, 4C]
    dw2_ref,  # out [4C, Cp] fp32
    db2_ref,  # out [1, Cp]
    dgam_ref,  # out [1, Cp]
    xslab,  # scratch [2, RC+6, wpad, Cp] dt
    yslab,  # scratch [2, RC+6, wpad, Cp] dt
    gslab,  # scratch [2, RC+6, wpad, Cp] dt
    xsem,
    ysem,
    gsem,
    *,
    rc: int,
    w: int,
    c: int,
    cpad: int,
    nrows: int,
    eps: float,
    vec_dx: bool = False,
):
    """Residual-consuming one-kernel backward: no dwconv recompute.

    All three slabs carry a +-3-row halo (d_y is needed on chunk+-3 rows to
    form the input-gradient correlation at the chunk rows). The LN moments
    are recomputed from the saved y (keepdims lane reductions — the 49-tap
    dwconv, the expensive part of a recompute-based backward, is gone);
    the MLP quantities are recomputed from the resulting z on the MXU with
    the same folded weights the forward used."""
    g = pl.program_id(0)
    total = pl.num_programs(0)
    h = nrows * rc
    f32 = jnp.float32

    def _cases(gi, hbm, slab, sem):
        bi = gi // nrows
        slot = gi % 2
        if nrows == 1:
            yield None, lambda: pltpu.make_async_copy(
                hbm.at[bi, pl.ds(0, rc)],
                slab.at[slot, pl.ds(3, rc)],
                sem.at[slot],
            )
            return
        ri = gi % nrows
        yield ri == 0, lambda: pltpu.make_async_copy(
            hbm.at[bi, pl.ds(0, rc + 3)],
            slab.at[slot, pl.ds(3, rc + 3)],
            sem.at[slot],
        )
        yield ri == nrows - 1, lambda: pltpu.make_async_copy(
            hbm.at[bi, pl.ds(h - (rc + 3), rc + 3)],
            slab.at[slot, pl.ds(0, rc + 3)],
            sem.at[slot],
        )
        if nrows > 2:
            yield (ri > 0) & (ri < nrows - 1), lambda: pltpu.make_async_copy(
                hbm.at[bi, pl.ds(
                    jnp.clip(ri * rc - 3, 0, h - (rc + 6)), rc + 6,
                )],
                slab.at[slot, pl.ds(0, rc + 6)],
                sem.at[slot],
            )

    def dma(gi, op):
        for args in (
            (x_hbm, xslab, xsem), (y_hbm, yslab, ysem),
            (g_hbm, gslab, gsem),
        ):
            for cond, mk in _cases(gi, *args):
                if cond is None:
                    getattr(mk(), op)()
                else:
                    pl.when(cond)(lambda mk=mk, op=op: getattr(mk(), op)())

    @pl.when(g == 0)
    def _():
        dma(0, "start")

    @pl.when(g + 1 < total)
    def _():
        dma(g + 1, "start")

    dma(g, "wait")

    slot = g % 2
    ri = g % nrows

    def zero_halo(slab):
        shape = (3,) + slab.shape[2:]
        if nrows == 1:
            slab[slot, 0:3] = jnp.zeros(shape, slab.dtype)
            slab[slot, rc + 3 : rc + 6] = jnp.zeros(shape, slab.dtype)
        else:
            @pl.when(ri == 0)
            def _():
                slab[slot, 0:3] = jnp.zeros(shape, slab.dtype)

            @pl.when(ri == nrows - 1)
            def _():
                slab[slot, rc + 3 : rc + 6] = jnp.zeros(shape, slab.dtype)

    zero_halo(xslab)
    zero_halo(yslab)
    zero_halo(gslab)

    xs = xslab[slot]  # [rc+6, wpad, cpad]
    ys = yslab[slot]
    gs = gslab[slot]
    dt = xslab.dtype
    wpad = dx_ref.shape[2]
    next_ = rc + 6

    st = _pick_row_tile(w, c, next_)

    d_y_tiles = []
    accs = {}

    def add(name, val):
        accs[name] = val if name not in accs else accs[name] + val

    inv_c = 1.0 / c
    for a0 in range(0, next_, st):
        b0 = min(a0 + st, next_)
        nr = b0 - a0
        tok = nr * w
        # LN moments recomputed from the saved y (pad lanes hold zeros, so
        # plain sums over cpad divided by the real c are exact — same
        # scheme as the forward kernel)
        y_t = ys[a0:b0, 3 : 3 + w, :].astype(f32)  # [nr, w, cpad]
        mean = y_t.sum(-1, keepdims=True) * inv_c
        var = (y_t * y_t).sum(-1, keepdims=True) * inv_c - mean * mean
        r_t3 = lax.rsqrt(jnp.maximum(var, 0.0) + eps)  # [nr, w, 1]
        z3 = (y_t - mean) * r_t3  # pad lanes -mean*r: inert (w1 pad rows 0)
        z2f = z3.astype(dt).reshape(tok, cpad)
        h1 = (
            jnp.dot(z2f, w1f_ref[:], preferred_element_type=f32)
            + b1f_ref[0, :]
        )  # [tok, 4C]
        u = 0.7978845608028654 * (h1 + 0.044715 * h1 * h1 * h1)
        th = jnp.tanh(u)
        du = 0.7978845608028654 * (1.0 + 3.0 * 0.044715 * h1 * h1)
        dgelu = 0.5 * (1.0 + th) + h1 * 0.5 * (1.0 - th * th) * du

        gy = gs[a0:b0, 3 : 3 + w, :]  # dt
        gyf = gy.reshape(tok, cpad)
        # d_a = (gy*gamma) @ w2^T == gy @ w2f^T (gamma folded)
        d_a = jax.lax.dot_general(
            gyf, w2f_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # [tok, 4C]
        d_h = d_a * dgelu
        d_hd = d_h.astype(dt)
        # d_z (ln_scale applied) via folded w1; raw-space d_z2 via raw w1
        d_z = jax.lax.dot_general(
            d_hd, w1f_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        d_z2 = jax.lax.dot_general(
            d_hd, w1_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        zf = z3.reshape(tok, cpad)
        d_z3 = d_z.reshape(nr, w, cpad)
        m1 = d_z3.sum(-1, keepdims=True) * inv_c
        m2 = (d_z3 * z3).sum(-1, keepdims=True) * inv_c
        d_y_tiles.append(r_t3 * (d_z3 - m1 - z3 * m2))

        ca, cb = max(a0, 3), min(b0, 3 + rc)
        if ca >= cb:
            continue
        ctr = slice((ca - a0) * w, (cb - a0) * w)
        a_ctr = (h1[ctr] * 0.5 * (1.0 + th[ctr])).astype(dt)
        o_ctr = (
            jnp.dot(a_ctr, w2_ref[:], preferred_element_type=f32)
            + b2_ref[0, :]
        )
        add("dgam", (gyf[ctr].astype(f32) * o_ctr).sum(0, keepdims=True))
        do_ctr = (gyf[ctr].astype(f32) * gam_ref[0, :]).astype(dt)
        add("db2", do_ctr.astype(f32).sum(0, keepdims=True))
        add(
            "dw2",
            jax.lax.dot_general(
                a_ctr, do_ctr, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            ),
        )
        add("db1", d_h[ctr].sum(0, keepdims=True))
        z2d_ctr = (zf[ctr] * lns_ref[0, :] + lnb_ref[0, :]).astype(dt)
        add(
            "dw1",
            jax.lax.dot_general(
                z2d_ctr, d_hd[ctr], (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            ),
        )
        add("dlns", (d_z2[ctr] * zf[ctr]).sum(0, keepdims=True))
        add("dlnb", d_z2[ctr].sum(0, keepdims=True))

    d_y = jnp.concatenate(d_y_tiles, axis=0)  # [rc+6, w, cpad] fp32

    # ---- dx for the center rows: correlation with flipped taps + residual
    dyp = jnp.pad(d_y, ((0, 0), (3, wpad - w - 3), (0, 0)))
    if vec_dx:
        # whole-chunk form: 49 [rc, w, cpad] slice-FMAs instead of rc
        # per-row expressions — at the narrow stages (w <= ~24) the
        # per-row slices are [w, cpad] slivers whose sublane occupancy and
        # per-op overhead dominate; the 3-D form keeps one chunk-sized
        # accumulator live (rc*w*cpad fp32, ~1.2 MB at 20x20x768), far
        # under the raised VMEM cap. Measured: BASELINE.md round-5
        # measurements, vec_dx evidence bullet.
        d_x = sum(
            dyp[6 - dy : 6 - dy + rc, dx_ : dx_ + w, :]
            * dw_ref[dy, 6 - dx_, :]
            for dy in range(7)
            for dx_ in range(7)
        )
    else:
        rows_dx = [
            (
                sum(
                    dyp[j + 6 - dy, dx_ : 0 + dx_ + w, :]
                    * dw_ref[dy, 6 - dx_, :]
                    for dy in range(7)
                    for dx_ in range(7)
                )
            )[None]
            for j in range(rc)
        ]
        d_x = jnp.concatenate(rows_dx, axis=0)
    d_x = d_x + gs[3 : 3 + rc, 3 : 3 + w, :].astype(f32)
    dx_ref[0] = jnp.pad(
        d_x.astype(dx_ref.dtype), ((0, 0), (3, wpad - w - 3), (0, 0))
    )

    def acc(ref, val):
        ref[...] = jnp.where(g == 0, val, ref[...] + val)

    acc(dgam_ref, accs["dgam"])
    acc(db2_ref, accs["db2"])
    acc(dw2_ref, accs["dw2"])
    acc(db1_ref, accs["db1"])
    acc(dw1_ref, accs["dw1"])
    acc(dlns_ref, accs["dlns"])
    acc(dlnb_ref, accs["dlnb"])
    d_y_ctr = d_y[3 : 3 + rc]
    acc(ddwb_ref, d_y_ctr.sum((0, 1))[None])
    taps = []
    for dy in range(7):
        row = []
        for dx in range(7):
            xwin = xs[dy : dy + rc, dx : dx + w, :].astype(f32)
            row.append((xwin * d_y_ctr).sum((0, 1)))
        row.append(jnp.zeros((cpad,), f32))
        taps.append(jnp.stack(row, 0))
    taps.append(jnp.zeros((8, cpad), f32))
    acc(ddw_ref, jnp.stack(taps, 0))


def _pick_rc_v2(h: int, w: int, c: int, dtype_bytes: int) -> int:
    """Largest correct divisor fitting VMEM for the v2 kernel; interior
    chunks need rc >= 3 (all slabs carry a +-3 halo)."""
    budget = 40 * 1024 * 1024
    cpad = -(-c // 128) * 128
    wpad = -(-(w + 6) // 8) * 8

    def vmem(rc):
        nxt = rc + 6
        st = _pick_row_tile(w, c, nxt)
        slabs = 3 * 2 * nxt * wpad * cpad * dtype_bytes  # x, z, g
        rsl = 2 * nxt * wpad * 4
        dy = 2 * nxt * wpad * cpad * 4  # d_y + padded copy
        tile = 3 * st * w * cpad * 4 + 5 * st * w * 4 * c * 4
        wts = 4 * cpad * 4 * c * dtype_bytes + 2 * cpad * 4 * c * 4
        return slabs + rsl + dy + tile + wts

    correct = [rc for rc in range(1, h + 1)
               if h % rc == 0 and (h // rc <= 2 or rc >= 3)]
    fitting = [rc for rc in correct if vmem(rc) < budget]
    return max(fitting) if fitting else min(correct, key=vmem)


def fused_block_bwd_v2(
    x_pad, y_pad, g_pad, dw_kernel, dw_bias, ln_scale, ln_bias,
    w1, b1, w2, b2, gamma,
    w: int, c: int, eps: float = 1e-6, interpret: bool = False,
    row_chunk: int = 0,
):
    """One-kernel backward consuming the residual-saving forward's saved
    dwconv output y. Returns the 10 cotangents in the forward's argument
    order. ``dw_bias`` takes no part (y already includes it) but stays in
    the signature for symmetry."""
    del dw_bias
    b, h, wpad, cpad = x_pad.shape
    dt = x_pad.dtype
    rc = row_chunk or _pick_rc_v2(h, w, c, dt.itemsize)
    assert h % rc == 0 and (h // rc <= 2 or rc >= 3), (h, rc)
    nrows = h // rc

    dw = jnp.pad(
        dw_kernel[:, :, 0, :].astype(jnp.float32),
        ((0, 1), (0, 1), (0, cpad - c)),
    )

    def row2(v, n):
        out = v.astype(jnp.float32).reshape(1, -1)
        return jnp.pad(out, ((0, 0), (0, n - out.shape[1])))

    f32 = jnp.float32
    w1f = ln_scale[:, None].astype(f32) * w1.astype(f32)
    b1f = b1.astype(f32) + ln_bias.astype(f32) @ w1.astype(f32)
    w2f = w2.astype(f32) * gamma[None, :].astype(f32)
    w1p = jnp.pad(w1.astype(dt), ((0, cpad - c), (0, 0)))
    w1fp = jnp.pad(w1f.astype(dt), ((0, cpad - c), (0, 0)))
    w2p = jnp.pad(w2.astype(dt), ((0, 0), (0, cpad - c)))
    w2fp = jnp.pad(w2f.astype(dt), ((0, 0), (0, cpad - c)))

    kern = functools.partial(
        _kernel_v2, rc=rc, w=w, c=c, cpad=cpad, nrows=nrows, eps=eps,
        vec_dx=w <= 24,
    )
    const = lambda *_: (0, 0)
    const3 = lambda *_: (0, 0, 0)
    outs = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, wpad, cpad), dt),  # dx
            jax.ShapeDtypeStruct((8, 8, cpad), f32),  # ddw
            jax.ShapeDtypeStruct((1, cpad), f32),  # ddwb
            jax.ShapeDtypeStruct((1, cpad), f32),  # dlns
            jax.ShapeDtypeStruct((1, cpad), f32),  # dlnb
            jax.ShapeDtypeStruct((cpad, 4 * c), f32),  # dw1
            jax.ShapeDtypeStruct((1, 4 * c), f32),  # db1
            jax.ShapeDtypeStruct((4 * c, cpad), f32),  # dw2
            jax.ShapeDtypeStruct((1, cpad), f32),  # db2
            jax.ShapeDtypeStruct((1, cpad), f32),  # dgam
        ),
        grid=(b * nrows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=(
            pl.BlockSpec(
                (1, rc, wpad, cpad),
                lambda g: (g // nrows, g % nrows, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((8, 8, cpad), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cpad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cpad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cpad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((cpad, 4 * c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * c, cpad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cpad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cpad), const, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rc + 6, wpad, cpad), dt),
            pltpu.VMEM((2, rc + 6, wpad, cpad), dt),
            pltpu.VMEM((2, rc + 6, wpad, cpad), dt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * (2 * 49 + 24 * c),
            bytes_accessed=6 * b * h * wpad * cpad * 2,
            transcendentals=b * h * w * 4 * c,
        ),
    )(
        x_pad, y_pad, g_pad, dw, row2(ln_scale, cpad),
        row2(ln_bias, cpad), w1p, w1fp, row2(b1f, 4 * c), w2p, w2fp,
        row2(b2, cpad), row2(gamma, cpad),
    )
    (dx, ddw, ddwb, dlns, dlnb, dw1, db1, dw2, db2, dgam) = outs
    return (
        dx,
        ddw[:7, :7, :c][:, :, None, :].astype(dw_kernel.dtype),
        ddwb[0, :c],
        dlns[0, :c].astype(ln_scale.dtype),
        dlnb[0, :c].astype(ln_bias.dtype),
        dw1[:c].astype(w1.dtype),
        db1[0].astype(b1.dtype),
        dw2[:, :c].astype(w2.dtype),
        db2[0, :c].astype(b2.dtype),
        dgam[0, :c].astype(gamma.dtype),
    )


def _pick_row_tile(w: int, c: int, next_: int) -> int:
    """Rows per MLP sub-tile inside a chunk: bound the fp32 [st*w, 4c]
    temporaries (~5 live at once) to ~6 MB and keep the matmul M dimension
    (st*w tokens) <= ~512. At the narrow stages (w <= 24, i.e. 20x20x768)
    the 6 MB bound would leave M = 80-token sliver matmuls; a 20 MB bound
    (still well under the raised VMEM cap) gets M back to ~320-512."""
    budget = int(20e6) if w <= 24 else int(6e6)
    by_mem = max(1, budget // (w * 4 * c * 4 * 5))
    by_m = max(1, 512 // w)
    return max(1, min(next_, by_mem, by_m))


def _pick_rc(h: int, w: int, c: int, dtype_bytes: int) -> int:
    """Largest correct divisor fitting VMEM; interior chunks need rc >= 6
    (the x slab's +-6 halo).

    The budget is sized against the raised ``vmem_limit_bytes`` cap (the
    model below underestimates Mosaic's real stack by ~2x — measured
    28.8 MB actual vs ~13 MB modeled at stage 0 rc=10); larger chunks
    amortise the +-6-row forward-recompute halo (rc=10 recomputes 1.6x the
    rows; rc=40 only 1.15x)."""
    budget = 40 * 1024 * 1024
    cpad = -(-c // 128) * 128
    wpad = -(-(w + 6) // 8) * 8

    def vmem(rc):
        nxt = rc + 6
        st = _pick_row_tile(w, c, nxt)
        slabs = (2 * (rc + 12) + 2 * nxt) * wpad * cpad * dtype_bytes
        dy = 2 * nxt * wpad * cpad * 4  # d_y + its padded copy for dx
        tile = 3 * st * w * cpad * 4 + 5 * st * w * 4 * c * 4
        wts = 2 * cpad * 4 * c * (dtype_bytes + 4)  # weights + grad accums
        return slabs + dy + tile + wts

    correct = [rc for rc in range(1, h + 1)
               if h % rc == 0 and (h // rc <= 2 or rc >= 6)]
    fitting = [rc for rc in correct if vmem(rc) < budget]
    return max(fitting) if fitting else min(correct, key=vmem)


def fused_block_bwd(
    x_pad, g_pad, dw_kernel, dw_bias, ln_scale, ln_bias,
    w1, b1, w2, b2, gamma,
    w: int, c: int, eps: float = 1e-6, interpret: bool = False,
    row_chunk: int = 0,
):
    """One-kernel backward for the padded-layout ConvNeXt block. Returns the
    10 cotangents in the forward's argument order."""
    b, h, wpad, cpad = x_pad.shape
    dt = x_pad.dtype
    rc = row_chunk or _pick_rc(h, w, c, dt.itemsize)
    assert h % rc == 0 and (h // rc <= 2 or rc >= 6), (h, rc)
    nrows = h // rc

    dw = jnp.pad(
        dw_kernel[:, :, 0, :].astype(jnp.float32),
        ((0, 1), (0, 1), (0, cpad - c)),
    )

    def row2(v, n):
        out = v.astype(jnp.float32).reshape(1, -1)
        return jnp.pad(out, ((0, 0), (0, n - out.shape[1])))

    w1p = jnp.pad(w1.astype(dt), ((0, cpad - c), (0, 0)))
    w2p = jnp.pad(w2.astype(dt), ((0, 0), (0, cpad - c)))

    kern = functools.partial(
        _kernel, rc=rc, w=w, c=c, cpad=cpad, nrows=nrows, eps=eps
    )
    f32 = jnp.float32
    const = lambda *_: (0, 0)
    const3 = lambda *_: (0, 0, 0)
    outs = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, wpad, cpad), dt),  # dx
            jax.ShapeDtypeStruct((8, 8, cpad), f32),  # ddw
            jax.ShapeDtypeStruct((1, cpad), f32),  # ddwb
            jax.ShapeDtypeStruct((1, cpad), f32),  # dlns
            jax.ShapeDtypeStruct((1, cpad), f32),  # dlnb
            jax.ShapeDtypeStruct((cpad, 4 * c), f32),  # dw1
            jax.ShapeDtypeStruct((1, 4 * c), f32),  # db1
            jax.ShapeDtypeStruct((4 * c, cpad), f32),  # dw2
            jax.ShapeDtypeStruct((1, cpad), f32),  # db2
            jax.ShapeDtypeStruct((1, cpad), f32),  # dgam
        ),
        grid=(b * nrows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=(
            pl.BlockSpec(
                (1, rc, wpad, cpad),
                lambda g: (g // nrows, g % nrows, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((8, 8, cpad), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cpad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cpad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cpad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((cpad, 4 * c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * c, cpad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cpad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cpad), const, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rc + 12, -(-(w + 6) // 8) * 8, cpad), dt),
            pltpu.VMEM((2, rc + 6, -(-(w + 6) // 8) * 8, cpad), dt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        # The kernel's stack live-set (unrolled dwconv expressions + fp32
        # d_y + grad accumulators) exceeds the 16 MB default scoped-VMEM
        # limit; v5e has 128 MB of VMEM, so raise the cap instead of
        # shrinking rc below the halo-correctness minimum.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * (3 * 49 + 24 * c),
            bytes_accessed=4 * b * h * wpad * cpad * 2,
            transcendentals=b * h * w * 4 * c,
        ),
    )(
        x_pad, g_pad, dw, row2(dw_bias, cpad), row2(ln_scale, cpad),
        row2(ln_bias, cpad), w1p, row2(b1, 4 * c), w2p, row2(b2, cpad),
        row2(gamma, cpad),
    )
    (dx, ddw, ddwb, dlns, dlnb, dw1, db1, dw2, db2, dgam) = outs
    return (
        dx,
        ddw[:7, :7, :c][:, :, None, :].astype(dw_kernel.dtype),
        ddwb[0, :c].astype(dw_bias.dtype),
        dlns[0, :c].astype(ln_scale.dtype),
        dlnb[0, :c].astype(ln_bias.dtype),
        dw1[:c].astype(w1.dtype),
        db1[0].astype(b1.dtype),
        dw2[:, :c].astype(w2.dtype),
        db2[0, :c].astype(b2.dtype),
        dgam[0, :c].astype(gamma.dtype),
    )
