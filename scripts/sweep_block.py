"""Time the production fused ConvNeXt block at one (stage, rc, nsplit).

Run as a subprocess per configuration (CNB_NSPLIT is read at import):

  for rc in 8 10 16 20; do for ns in 1 2 4; do
    CNB_NSPLIT=$ns python scripts/sweep_block.py --stage 0 --rc $rc
  done; done
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _timeloop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--rc", type=int, default=0)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax.numpy as jnp

    from multitask_bonetumor_yolo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from multitask_bonetumor_yolo_tpu.ops.pallas.convnext_block import (
        convnext_block,
    )

    S = args.img
    shapes = [(S // 4, 96), (S // 8, 192), (S // 16, 384), (S // 32, 768)]
    hw, c = shapes[args.stage]
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, hw, hw, c) * 2 - 1, dt)
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

    def body(i):
        xin = x + i.astype(dt) * jnp.asarray(1e-6, dt)
        return convnext_block(
            xin, *wargs, 1e-6, False, args.rc
        ).sum().astype(jnp.float32)

    ms = _timeloop(body, args.iters)
    print(
        f"stage{args.stage} rc={args.rc or 'auto'} "
        f"nsplit={os.environ.get('CNB_NSPLIT', '0')} -> {ms:.3f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
