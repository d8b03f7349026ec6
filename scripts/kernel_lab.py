"""Isolate where time goes inside the fused ConvNeXt block kernel.

Builds stripped-down variants of the kernel (DMA-only, +dwconv, +LN, +MLP,
full) at a given stage shape and times each on the real chip. Purely a
diagnostic tool; not part of the library.

Usage: python scripts/kernel_lab.py [--stage 0] [--batch 16]
"""

from __future__ import annotations

import argparse
import functools
import numpy as np


import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _timeloop  # slope-based timing (cancels relay fetch cost)


def build_variant(variant, b, h, w, c, rc, dt, padded_io=False):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from multitask_bonetumor_yolo_tpu.ops.pallas.convnext_block import (
        _gelu_fast as _gelu_exact,
    )

    wpad = -(-(w + 6) // 8) * 8
    cpad = -(-c // 128) * 128

    def kern(x_hbm, dw_ref, w1_ref, w2_ref, out_ref, slab, sem):
        bi = pl.program_id(0)
        r = pl.program_id(1)
        nrows = pl.num_programs(1)
        g = bi * nrows + r
        total = pl.num_programs(0) * nrows

        def start_dma(gi):
            return pltpu.make_async_copy(
                x_hbm.at[gi // nrows, pl.ds((gi % nrows) * rc, rc + 6)],
                slab.at[gi % 2], sem.at[gi % 2],
            )

        @pl.when(g == 0)
        def _():
            start_dma(0).start()

        @pl.when(g + 1 < total)
        def _():
            start_dma(g + 1).start()

        start_dma(g).wait()
        s = slab[g % 2]

        if variant == "copy":
            out_ref[0] = s[3:3 + rc, 3:3 + w, :]
            return

        if variant in ("dw", "dwln", "full"):
            # loop-carried acc, hoisted fp32 dx shift
            y = jnp.zeros((rc, w, cpad), jnp.float32)
            for dx in range(7):
                sh = s[:, dx:dx + w, :].astype(jnp.float32)
                for dy in range(7):
                    y = y + sh[dy:dy + rc] * dw_ref[dy, dx, :]
        elif variant == "dwexpr":
            # one big expression tree: let Mosaic schedule the whole sum
            shs = [s[:, dx:dx + w, :].astype(jnp.float32) for dx in range(7)]
            y = sum(
                shs[dx][dy:dy + rc] * dw_ref[dy, dx, :]
                for dx in range(7)
                for dy in range(7)
            )
        elif variant == "dwbf16":
            # taps multiplied in bf16, accumulated pairwise-ish in fp32
            y = jnp.zeros((rc, w, cpad), jnp.float32)
            dwc = dw_ref[:].astype(s.dtype)
            for dx in range(7):
                sh = s[:, dx:dx + w, :]
                part = jnp.zeros((rc, w, cpad), s.dtype)
                for dy in range(7):
                    part = part + sh[dy:dy + rc] * dwc[dy, dx, :]
                y = y + part.astype(jnp.float32)
        elif variant == "dwrow":
            # per-output-row expression: acc small enough for registers
            shs = [s[:, dx:dx + w, :].astype(jnp.float32) for dx in range(7)]
            rows_out = [
                sum(
                    shs[dx][ri + dy] * dw_ref[dy, dx, :]
                    for dx in range(7)
                    for dy in range(7)
                )[None]
                for ri in range(rc)
            ]
            y = jnp.concatenate(rows_out, axis=0)
        elif variant == "dwrow2":
            # like dwrow but two output rows per expression
            shs = [s[:, dx:dx + w, :].astype(jnp.float32) for dx in range(7)]
            rows_out = [
                sum(
                    shs[dx][ri + dy:ri + dy + 2] * dw_ref[dy, dx, :]
                    for dx in range(7)
                    for dy in range(7)
                )
                for ri in range(0, rc, 2)
            ]
            y = jnp.concatenate(rows_out, axis=0)
        elif variant == "dwrownh":
            # per-row, NO hoisted shift copies: slice W per tap from the slab
            rows_out = [
                sum(
                    s[ri + dy, dx:dx + w, :].astype(jnp.float32)
                    * dw_ref[dy, dx, :]
                    for dx in range(7)
                    for dy in range(7)
                )[None]
                for ri in range(rc)
            ]
            y = jnp.concatenate(rows_out, axis=0)
        elif variant == "dwrowreg":
            # per-output-row; each input row loaded once as a value, the 7
            # dx-shifts sliced from the value (register rotations)
            rows_out = []
            for ri in range(rc):
                acc = None
                for dy in range(7):
                    row = s[ri + dy].astype(jnp.float32)  # [wpad, cpad]
                    t = sum(
                        row[dx:dx + w] * dw_ref[dy, dx, :] for dx in range(7)
                    )
                    acc = t if acc is None else acc + t
                rows_out.append(acc[None])
            y = jnp.concatenate(rows_out, axis=0)
        else:  # mlp / gelu variant skips dwconv
            y = s[3:3 + rc, 3:3 + w, :].astype(jnp.float32)

        if variant.startswith("dw") and variant not in ("dwln",):
            out_ref[0] = y.astype(out_ref.dtype)
            return

        if variant in ("dwln", "full"):
            mean = y.sum(-1, keepdims=True) * (1.0 / c)
            d = y - mean
            if cpad != c:
                lane = lax.broadcasted_iota(jnp.int32, (rc, w, cpad), 2)
                d = jnp.where(lane < c, d, 0.0)
            var = (d * d).sum(-1, keepdims=True) * (1.0 / c)
            y = d * lax.rsqrt(var + 1e-6)
        if variant == "dwln":
            out_ref[0] = y.astype(out_ref.dtype)
            return

        rows = y.reshape(rc * w, cpad).astype(dt)
        hmat = jnp.dot(rows, w1_ref[:], preferred_element_type=jnp.float32)
        if variant in ("mlpgelu", "full"):
            hmat = _gelu_exact(hmat)
        elif variant == "mlptanh":
            hmat = hmat * 0.5 * (
                1.0 + jnp.tanh(0.7978845608 * (hmat + 0.044715 * hmat**3))
            )
        elif variant == "mlpgelubf16":
            hmat = _gelu_exact(hmat.astype(dt)).astype(jnp.float32)
        o = jnp.dot(hmat.astype(dt), w2_ref[:],
                    preferred_element_type=jnp.float32)
        out_ref[0] = (s[3:3 + rc, 3:3 + w, :].astype(jnp.float32)
                      + o.reshape(rc, w, cpad)).astype(out_ref.dtype)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, h, w, c) * 2 - 1, dt)
    dw = jnp.asarray(rng.randn(8, 8, cpad) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(cpad, 4 * c) * 0.02, dt)
    w2 = jnp.asarray(rng.randn(4 * c, cpad) * 0.02, dt)

    if padded_io:
        # input pre-padded once outside the timed loop; output stays cpad
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3 + wpad - (w + 6)), (0, cpad - c)))

    def run(xin):
        if padded_io:
            x_pad = xin
        else:
            x_pad = jnp.pad(
                xin, ((0, 0), (3, 3), (3, 3 + wpad - (w + 6)), (0, cpad - c))
            )
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((b, h, w, cpad), dt),
            grid=(b, h // rc),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(
                (1, rc, w, cpad), lambda bi, ri: (bi, ri, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, rc + 6, wpad, cpad), dt),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(x_pad, dw, w1, w2)
        if padded_io:
            return out
        return out[..., :c]

    return run, x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--variants", default="copy,dw,dwln,mlp,mlpgelu,full"
    )
    ap.add_argument("--rc", type=int, default=0, help="override row chunk")
    ap.add_argument("--padded-io", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multitask_bonetumor_yolo_tpu.utils.cache import enable_compilation_cache
    from multitask_bonetumor_yolo_tpu.ops.pallas.convnext_block import (
        _pick_row_chunk,
    )

    enable_compilation_cache()
    S = args.img
    shapes = [(S // 4, 96), (S // 8, 192), (S // 16, 384), (S // 32, 768)]
    hw, c = shapes[args.stage]
    dt = jnp.bfloat16
    rc = args.rc or _pick_row_chunk(hw, hw, c, 2)
    print(f"stage{args.stage} {hw}x{hw}x{c} rc={rc} batch={args.batch} "
          f"padded_io={args.padded_io}")
    for variant in args.variants.split(","):
        run, x = build_variant(variant, args.batch, hw, hw, c, rc, dt,
                               padded_io=args.padded_io)

        def body(i):
            xin = x + i.astype(dt) * jnp.asarray(1e-6, dt)
            return run(xin).sum().astype(jnp.float32)

        ms = _timeloop(body, args.iters)
        print(f"  {variant:<8s} {ms:7.3f} ms")


if __name__ == "__main__":
    main()
