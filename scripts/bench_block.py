"""Microbenchmark: fused ConvNeXt block (Pallas) vs XLA reference, per stage.

Also checks on-chip numerical parity (max abs diff vs the XLA reference).
Usage: python scripts/bench_block.py [--batch 16] [--img 640] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import numpy as np


import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _timeloop  # slope-based timing (cancels relay fetch cost)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--stages", type=str, default="0,1,2,3")
    args = ap.parse_args()
    B, S = args.batch, args.img

    import jax
    import jax.numpy as jnp

    from multitask_bonetumor_yolo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from multitask_bonetumor_yolo_tpu.ops.pallas.convnext_block import (
        convnext_block, convnext_block_ref,
    )

    dt = jnp.bfloat16
    stage_shapes = [
        (S // 4, 96, 3), (S // 8, 192, 3), (S // 16, 384, 9), (S // 32, 768, 3),
    ]
    sel = [int(s) for s in args.stages.split(",")]
    print(f"batch={B} img={S} backend={jax.default_backend()}")
    for si in sel:
        hw, c, depth = stage_shapes[si]
        rng = np.random.RandomState(si)
        xs = jnp.asarray(rng.rand(B, hw, hw, c) * 2 - 1, dt)
        wargs = (
            jnp.asarray(rng.randn(7, 7, 1, c) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(c) * 0.05, jnp.float32),
            jnp.asarray(1 + rng.randn(c) * 0.05, jnp.float32),
            jnp.asarray(rng.randn(c) * 0.05, jnp.float32),
            jnp.asarray(rng.randn(c, 4 * c) * 0.02, jnp.float32),
            jnp.asarray(rng.randn(4 * c) * 0.02, jnp.float32),
            jnp.asarray(rng.randn(4 * c, c) * 0.02, jnp.float32),
            jnp.asarray(rng.randn(c) * 0.02, jnp.float32),
            jnp.asarray(np.full(c, 0.5), jnp.float32),
        )

        # numerical parity on chip
        got = np.asarray(jax.jit(convnext_block)(xs, *wargs), np.float32)
        want = np.asarray(jax.jit(convnext_block_ref)(xs, *wargs), np.float32)
        maxdiff = np.abs(got - want).max()
        scale = np.abs(want).max()

        def blk_body(i, fn):
            x = xs + i.astype(dt) * jnp.asarray(1e-6, dt)
            return fn(x, *wargs).sum().astype(jnp.float32)

        pal = _timeloop(functools.partial(blk_body, fn=convnext_block),
                        args.iters)
        ref = _timeloop(functools.partial(blk_body, fn=convnext_block_ref),
                        args.iters)
        mlp_gf = 2 * B * hw * hw * c * 8 * c / 1e9
        print(
            f"stage{si} {hw}x{hw}x{c}: pallas {pal:7.3f} ms  xla {ref:7.3f} ms"
            f"  speedup {ref/pal:4.2f}x  mlp-mfu {mlp_gf/pal/197:5.1%}"
            f"  maxdiff {maxdiff:.4f} (|y|max {scale:.1f})"
            f"  -> stage total {min(pal, ref) * depth:.2f} ms"
        )


if __name__ == "__main__":
    main()
