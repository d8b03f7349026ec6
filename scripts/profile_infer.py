"""Per-component timing of the batch-16 640² multitask inference path.

Prints a table attributing the end-to-end batch latency to: each ConvNeXt
stage (per-block, Pallas vs XLA), stem/downsamples, C2f adapters, BiFPN,
heads, decode, NMS, and the seg-projector resize. Methodology per bench.py:
everything is timed inside ONE jitted ``lax.fori_loop`` with index-perturbed
inputs and a device->host fetch of an accumulated scalar (the axon relay
neither honours block_until_ready nor re-executes value-identical dispatches).

Usage: python scripts/profile_infer.py [--batch 16] [--img 640] [--iters 20]
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
    args = ap.parse_args()
    B, S = args.batch, args.img

    import jax
    import jax.numpy as jnp

    from multitask_bonetumor_yolo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from multitask_bonetumor_yolo_tpu.models import ModelConfig, MultitaskModel
    from multitask_bonetumor_yolo_tpu.models.backbone import (
        ConvNeXtFeatures, ConvNeXtTiny,
    )
    from multitask_bonetumor_yolo_tpu.models.bifpn import BiFPN
    from multitask_bonetumor_yolo_tpu.models.heads import (
        DetectHead, SegmentHead, decode_detections,
    )
    from multitask_bonetumor_yolo_tpu.ops.nms import postprocess_detections
    from multitask_bonetumor_yolo_tpu.ops.pallas.convnext_block import (
        convnext_block, convnext_block_ref,
    )
    from multitask_bonetumor_yolo_tpu.ops.resize import resize_bilinear

    dt = jnp.bfloat16
    rows = []

    def report(name, ms, note=""):
        rows.append((name, ms, note))
        print(f"  {name:<46s} {ms:8.3f} ms  {note}")

    key = jax.random.PRNGKey(0)

    # ---------------- full model ----------------
    cfg = ModelConfig(img_size=S, dtype="bfloat16")
    model = MultitaskModel(cfg)
    x0 = jnp.asarray(np.random.rand(B, S, S, 3), jnp.float32)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, S, S, 3)), train=True, mode="train")
    )(key)
    v = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    def full_body(i):
        x = x0 + i.astype(jnp.float32) * 1e-6
        out, _ = model.apply(v, x, train=False, mode="infer",
                             mutable=["batch_stats"])
        nms = postprocess_detections(out["det_preds"], S)
        return (nms.scores.sum() + out["seg_prob"].sum().astype(jnp.float32)
                + out["cls_probs"].sum())

    print(f"batch={B} img={S} backend={jax.default_backend()}")
    full_ms = _timeloop(full_body, args.iters)
    report("FULL multitask infer (model+decode+NMS)", full_ms)

    # ---------------- ConvNeXt blocks per stage, pallas vs XLA -------------
    stage_shapes = [
        (S // 4, 96, 3), (S // 8, 192, 3), (S // 16, 384, 9), (S // 32, 768, 3),
    ]
    stage_ms = {}
    for si, (hw, c, depth) in enumerate(stage_shapes):
        xs = jnp.asarray(np.random.rand(B, hw, hw, c), dt)
        wkey = jax.random.PRNGKey(si)
        ks = jax.random.split(wkey, 8)
        wargs = (
            jax.random.normal(ks[0], (7, 7, 1, c), jnp.float32) * 0.1,
            jnp.zeros((c,), jnp.float32),
            jnp.ones((c,), jnp.float32),
            jnp.zeros((c,), jnp.float32),
            jax.random.normal(ks[1], (c, 4 * c), jnp.float32) * 0.02,
            jnp.zeros((4 * c,), jnp.float32),
            jax.random.normal(ks[2], (4 * c, c), jnp.float32) * 0.02,
            jnp.zeros((c,), jnp.float32),
            jnp.full((c,), 1e-6, jnp.float32),
        )

        def blk_body(i, fn):
            x = xs + i.astype(dt) * jnp.asarray(1e-6, dt)
            return fn(x, *wargs).sum().astype(jnp.float32)

        pal = _timeloop(functools.partial(blk_body, fn=convnext_block),
                        args.iters)
        ref = _timeloop(functools.partial(blk_body, fn=convnext_block_ref),
                        args.iters)
        best = min(pal, ref)
        stage_ms[si] = best * depth
        report(f"stage{si} block {hw}x{hw}x{c} pallas", pal,
               f"xla={ref:.3f} x{depth} -> stage {best * depth:.2f} ms best")

    # ---------------- stem + downsamples (XLA convs) ----------------
    trunk = ConvNeXtFeatures(dtype=dt, pallas="auto")
    tvars = jax.jit(lambda k: trunk.init(k, jnp.zeros((1, S, S, 3), dt)))(key)

    def trunk_body(i):
        x = (x0 + i.astype(jnp.float32) * 1e-6).astype(dt)
        outs = trunk.apply(tvars, x)
        return sum(o.sum().astype(jnp.float32) for o in outs)

    trunk_ms = _timeloop(trunk_body, args.iters)
    blocks_total = sum(stage_ms.values())
    report("TRUNK total", trunk_ms,
           f"blocks~{blocks_total:.2f} stem/downsample~"
           f"{trunk_ms - blocks_total:.2f}")

    # ---------------- backbone (trunk + C2f adapters) ----------------
    bb = ConvNeXtTiny(dtype=dt, pallas="auto")
    bvars = jax.jit(
        lambda k: bb.init(k, jnp.zeros((1, S, S, 3), dt), train=True)
    )(key)
    bv = {"params": bvars["params"], "batch_stats": bvars["batch_stats"]}

    def bb_body(i):
        x = (x0 + i.astype(jnp.float32) * 1e-6).astype(dt)
        outs = bb.apply(bv, x, train=False)
        return sum(o.sum().astype(jnp.float32) for o in outs)

    bb_ms = _timeloop(bb_body, args.iters)
    report("BACKBONE (trunk + 3 C2f adapters)", bb_ms,
           f"C2f adapters~{bb_ms - trunk_ms:.2f}")

    # ---------------- BiFPN ----------------
    feats0 = [
        jnp.asarray(np.random.rand(B, S // 8, S // 8, 256), dt),
        jnp.asarray(np.random.rand(B, S // 16, S // 16, 384), dt),
        jnp.asarray(np.random.rand(B, S // 32, S // 32, 512), dt),
    ]
    neck = BiFPN(256, 2, dtype=dt)
    nvars = jax.jit(lambda k: neck.init(k, feats0, True))(key)
    nv = {"params": nvars["params"], "batch_stats": nvars["batch_stats"]}

    def neck_body(i):
        f = [x + i.astype(dt) * jnp.asarray(1e-6, dt) for x in feats0]
        outs = neck.apply(nv, f, False)
        return sum(o.sum().astype(jnp.float32) for o in outs)

    neck_ms = _timeloop(neck_body, args.iters)
    report("BiFPN x2", neck_ms)

    # ---------------- heads ----------------
    pfeats = [
        jnp.asarray(np.random.rand(B, S // 8, S // 8, 256), dt),
        jnp.asarray(np.random.rand(B, S // 16, S // 16, 256), dt),
        jnp.asarray(np.random.rand(B, S // 32, S // 32, 256), dt),
    ]
    seg = SegmentHead(nc=2, nm=32, npr=256, ch0=256, reg_max=16, dtype=dt)
    svars = jax.jit(lambda k: seg.init(k, pfeats, True))(key)
    sv = {"params": svars["params"], "batch_stats": svars["batch_stats"]}

    def seg_body(i):
        f = [x + i.astype(dt) * jnp.asarray(1e-6, dt) for x in pfeats]
        raw, coeffs, protos = seg.apply(sv, f, False)
        return (sum(r.sum().astype(jnp.float32) for r in raw)
                + coeffs.sum().astype(jnp.float32)
                + protos.sum().astype(jnp.float32))

    report("Segment head", _timeloop(seg_body, args.iters))

    det = DetectHead(nc=2, ch0=256, reg_max=16, dtype=dt)
    dvars = jax.jit(lambda k: det.init(k, pfeats, True))(key)
    dv = {"params": dvars["params"], "batch_stats": dvars["batch_stats"]}

    def det_body(i):
        f = [x + i.astype(dt) * jnp.asarray(1e-6, dt) for x in pfeats]
        raw = det.apply(dv, f, False)
        return sum(r.sum().astype(jnp.float32) for r in raw)

    report("Detect head", _timeloop(det_body, args.iters))

    # ---------------- decode + NMS ----------------
    raw_feats = [
        jnp.asarray(np.random.rand(B, S // s, S // s, 64 + 2), jnp.float32)
        for s in (8, 16, 32)
    ]

    def decode_body(i):
        f = [x + i.astype(jnp.float32) * 1e-6 for x in raw_feats]
        return decode_detections(f, 2, S, 16).sum()

    report("decode_detections", _timeloop(decode_body, args.iters))

    na = (S // 8) ** 2 + (S // 16) ** 2 + (S // 32) ** 2
    preds0 = jnp.asarray(np.random.rand(B, na, 6), jnp.float32)

    def nms_body(i):
        p = preds0 + i.astype(jnp.float32) * 1e-6
        r = postprocess_detections(p, S)
        return r.scores.sum()

    report("NMS postprocess", _timeloop(nms_body, args.iters))

    # ---------------- seg projector resize (160->640 @ B) ----------------
    protos0 = jnp.asarray(np.random.rand(B, S // 4, S // 4, 1), jnp.float32)

    def rs_body(i):
        p = protos0 + i.astype(jnp.float32) * 1e-6
        return resize_bilinear(p, S, S).sum()

    report("seg-logit resize 1ch -> SxS", _timeloop(rs_body, args.iters))

    print("\nSummary (ms per batch of %d):" % B)
    for name, ms, note in rows:
        print(f"  {name:<46s} {ms:8.3f}  {note}")
    print(f"  full model throughput: {B / full_ms * 1000:.1f} img/s")


if __name__ == "__main__":
    main()
