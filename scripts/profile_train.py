"""Per-component timing of the batch-8 640² multitask TRAIN step (fwd+bwd).

The backward-pass analogue of scripts/profile_infer.py (VERDICT r2 #1: the
train step was never profiled). Attributes the step to: full step, fwd+bwd
without the optimizer, loss-only grad, per-stage ConvNeXt block fwd+bwd
(default vjp-of-XLA-reference vs the fully-fused Pallas backward kernel),
backbone/BiFPN/heads fwd+bwd, the AdamW+clip update, and the augment stage.
Methodology per bench.py: jitted fori_loop, index-perturbed inputs,
slope-timed (the axon relay neither honours block_until_ready nor
re-executes value-identical dispatches).

Usage: python scripts/profile_train.py [--batch 8] [--img 640] [--iters 10]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _timeloop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-full", action="store_true",
                    help="skip the three full-model sections (fast re-run "
                    "of the per-component sections)")
    args = ap.parse_args()
    B, S = args.batch, args.img

    import jax
    import jax.numpy as jnp

    from multitask_bonetumor_yolo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from multitask_bonetumor_yolo_tpu.data.preprocess import AugmentConfig, augment_batch
    from multitask_bonetumor_yolo_tpu.losses import LossConfig, multitask_loss
    from multitask_bonetumor_yolo_tpu.models import ModelConfig, MultitaskModel
    from multitask_bonetumor_yolo_tpu.models.backbone import ConvNeXtTiny
    from multitask_bonetumor_yolo_tpu.models.bifpn import BiFPN
    from multitask_bonetumor_yolo_tpu.models.heads import DetectHead, SegmentHead
    from multitask_bonetumor_yolo_tpu.ops.pallas.convnext_block import (
        convnext_block, convnext_block_ref, pad_for_blocks,
    )
    from multitask_bonetumor_yolo_tpu.ops.pallas.convnext_block_bwd import (
        fused_block_bwd,
    )
    from multitask_bonetumor_yolo_tpu.train import (
        TrainConfig, create_train_state, make_train_step,
    )

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    def report(name, ms, note=""):
        print(f"  {name:<52s} {ms:8.3f} ms  {note}", flush=True)

    def timed(body, iters=args.iters):
        """_timeloop, but a compile failure (e.g. kernel VMEM OOM) reports
        -1 instead of killing the whole attribution run."""
        try:
            return _timeloop(body, iters)
        except Exception as e:  # noqa: BLE001
            print(f"    FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
            return -1.0

    cfg = ModelConfig(img_size=S, dtype="bfloat16")
    model = MultitaskModel(cfg)
    loss_cfg = LossConfig(img_size=S)
    x0 = jnp.asarray(np.random.rand(B, S, S, 3), jnp.float32)
    gt = {
        "boxes": jnp.tile(jnp.asarray([[0, 0.5, 0.5, 0.3, 0.3]], jnp.float32),
                          (B, 8, 1)),
        "box_valid": jnp.tile(jnp.asarray([True] + [False] * 7), (B, 1)),
        "mask": jnp.zeros((B, S, S, 1)),
        "img_cls": jnp.zeros((B,), jnp.int32),
        "id": jnp.arange(B, dtype=jnp.int32),
    }

    print(f"batch={B} img={S} backend={jax.default_backend()}", flush=True)

    if not args.skip_full:
        # ---------------- FULL train step (fwd+bwd+AdamW, donated) --------
        state = create_train_state(cfg, TrainConfig(steps_per_epoch=1))
        step_nodonate = make_train_step(cfg, loss_cfg, AugmentConfig(),
                                        donate=False)

        def full_body(i):
            b = dict(gt)
            b["image"] = ((x0 + i.astype(jnp.float32) * 1e-6) * 255).astype(
                jnp.uint8
            )
            new_state, metrics, _ = step_nodonate(state, b, jax.random.PRNGKey(0))
            # Depend on EVERY updated leaf or XLA dead-code-eliminates the
            # backward + optimizer (observed: 29 ms "full step" < 109 ms fwd+bwd).
            return metrics["loss_total"] + sum(
                jnp.sum(p).astype(jnp.float32)
                for p in jax.tree.leaves(new_state.params)
            ) * 1e-12

        report("FULL train step (fwd+bwd+AdamW, no donate)",
               _timeloop(full_body, args.iters))

        # ---------------- fwd+bwd only (no optimizer) ---------------------
        variables = jax.jit(
            lambda k: model.init(k, jnp.zeros((1, S, S, 3)), train=True,
                                 mode="train")
        )(key)
        params, stats = variables["params"], variables["batch_stats"]

        def fwdbwd_body(i):
            x = x0 + i.astype(jnp.float32) * 1e-6

            def loss_fn(p):
                out, _ = model.apply(
                    {"params": p, "batch_stats": stats}, x,
                    train=True, mode="train", mutable=["batch_stats"],
                )
                return multitask_loss(out, {**gt, "image": x}, loss_cfg,
                                      True).total

            loss, grads = jax.value_and_grad(loss_fn)(params)
            return loss + sum(
                jnp.sum(g).astype(jnp.float32) for g in jax.tree.leaves(grads)
            ) * 0.0

        report("fwd+bwd (value_and_grad, no opt)",
               _timeloop(fwdbwd_body, args.iters))

        # ---------------- forward only ------------------------------------
        def fwd_body(i):
            x = x0 + i.astype(jnp.float32) * 1e-6
            out, _ = model.apply(
                {"params": params, "batch_stats": stats}, x,
                train=True, mode="train", mutable=["batch_stats"],
            )
            return multitask_loss(out, {**gt, "image": x}, loss_cfg, True).total

        report("forward + loss only", _timeloop(fwd_body, args.iters))

        # ---------------- forward only, no loss ---------------------------
        def fwd_noloss_body(i):
            x = x0 + i.astype(jnp.float32) * 1e-6
            out, _ = model.apply(
                {"params": params, "batch_stats": stats}, x,
                train=True, mode="train", mutable=["batch_stats"],
            )
            return sum(
                jnp.sum(v).astype(jnp.float32)
                for v in jax.tree.leaves(out)
            )

        report("forward only (train mode, no loss)",
               timed(fwd_noloss_body))

        # ---------------- loss fwd+bwd only (frozen model outputs) --------
        out0, _ = jax.jit(
            lambda x: model.apply(
                {"params": params, "batch_stats": stats}, x,
                train=True, mode="train", mutable=["batch_stats"],
            )
        )(x0)

        def loss_grad_body(i):
            o = jax.tree.map(
                lambda v: v + i.astype(v.dtype) * jnp.asarray(1e-6, v.dtype),
                out0,
            )
            g = jax.grad(
                lambda oo: multitask_loss(
                    oo, {**gt, "image": x0}, loss_cfg, True
                ).total
            )(o)
            return sum(
                jnp.sum(v).astype(jnp.float32) for v in jax.tree.leaves(g)
            )

        report("loss fwd+bwd only (vs frozen outputs)",
               timed(loss_grad_body))

        # ---------------- optimizer update only ---------------------------
        zgrads = jax.tree.map(jnp.zeros_like, params)

        def opt_body(i):
            g = jax.tree.map(
                lambda z: z + i.astype(z.dtype) * 1e-9, zgrads
            )
            st, _ = state.apply_gradients(grads=g, batch_stats=stats)
            # depend on EVERY updated leaf (a single-leaf fetch lets XLA
            # dead-code-eliminate the rest of the update: measured 0.000 ms)
            return sum(
                p.sum().astype(jnp.float32)
                for p in jax.tree.leaves(st.params)
            ) * 1e-9

        report("AdamW + clip update only", _timeloop(opt_body, args.iters))

    # ---------------- per-stage block fwd+bwd ----------------
    stage_shapes = [
        (S // 4, 96, 3), (S // 8, 192, 3), (S // 16, 384, 9), (S // 32, 768, 3),
    ]
    tot_def, tot_fused, tot_ref = 0.0, 0.0, 0.0
    for si, (hw, c, depth) in enumerate(stage_shapes):
        xs = jnp.asarray(np.random.rand(B, hw, hw, c), dt)
        ks = jax.random.split(jax.random.PRNGKey(si), 4)
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

        def grad_body(i, fn):
            x = xs + i.astype(dt) * jnp.asarray(1e-6, dt)

            def f(xx, *a):
                return fn(xx, *a).sum().astype(jnp.float32)

            g = jax.grad(f, argnums=(0, 1, 5, 7))(x, *wargs)
            return sum(x.sum().astype(jnp.float32) for x in jax.tree.leaves(g))

        # default: Pallas fwd + vjp-of-XLA-reference bwd (custom_vjp path)
        d_ms = timed(functools.partial(grad_body, fn=convnext_block))
        # pure-XLA fwd+bwd
        r_ms = timed(functools.partial(grad_body, fn=convnext_block_ref))

        # fused: Pallas fwd + ONE-kernel Pallas bwd, called directly
        def fused_body(i):
            x = xs + i.astype(dt) * jnp.asarray(1e-6, dt)
            xp = pad_for_blocks(x)
            y = convnext_block(x, *wargs)
            g = fused_block_bwd(
                xp, pad_for_blocks(jnp.ones_like(y)), *wargs, w=hw, c=c
            )
            return sum(
                t.sum().astype(jnp.float32) for t in jax.tree.leaves(g)
            ) + y.sum().astype(jnp.float32)

        f_ms = timed(fused_body)
        tot_def += d_ms * depth
        tot_fused += f_ms * depth
        tot_ref += r_ms * depth
        report(
            f"stage{si} block {hw}x{hw}x{c} fwd+bwd default", d_ms,
            f"fused={f_ms:.3f} xla={r_ms:.3f} x{depth}",
        )
    report("TRUNK fwd+bwd totals", tot_def,
           f"fused={tot_fused:.2f} xla={tot_ref:.2f}")

    # ---------------- backbone / neck / heads fwd+bwd ----------------
    bb = ConvNeXtTiny(dtype=dt, pallas="auto")
    bvars = jax.jit(
        lambda k: bb.init(k, jnp.zeros((1, S, S, 3), dt), train=True)
    )(key)

    def bb_grad(i):
        x = (x0 + i.astype(jnp.float32) * 1e-6).astype(dt)

        def f(p):
            outs, _ = bb.apply(
                {"params": p, "batch_stats": bvars["batch_stats"]}, x,
                train=True, mutable=["batch_stats"],
            )
            return sum(o.sum().astype(jnp.float32) for o in outs)

        g = jax.grad(f)(bvars["params"])
        return sum(t.sum().astype(jnp.float32) for t in jax.tree.leaves(g))

    report("BACKBONE fwd+bwd (trunk + C2f)", timed(bb_grad))

    feats0 = [
        jnp.asarray(np.random.rand(B, S // 8, S // 8, 256), dt),
        jnp.asarray(np.random.rand(B, S // 16, S // 16, 384), dt),
        jnp.asarray(np.random.rand(B, S // 32, S // 32, 512), dt),
    ]
    neck = BiFPN(256, 2, dtype=dt)
    nvars = jax.jit(lambda k: neck.init(k, feats0, True))(key)

    def neck_grad(i):
        f0 = [x + i.astype(dt) * jnp.asarray(1e-6, dt) for x in feats0]

        def f(p):
            outs, _ = neck.apply(
                {"params": p, "batch_stats": nvars["batch_stats"]}, f0,
                True, mutable=["batch_stats"],
            )
            return sum(o.sum().astype(jnp.float32) for o in outs)

        g = jax.grad(f)(nvars["params"])
        return sum(t.sum().astype(jnp.float32) for t in jax.tree.leaves(g))

    report("BiFPN x2 fwd+bwd", timed(neck_grad))

    pfeats = [
        jnp.asarray(np.random.rand(B, S // 8, S // 8, 256), dt),
        jnp.asarray(np.random.rand(B, S // 16, S // 16, 256), dt),
        jnp.asarray(np.random.rand(B, S // 32, S // 32, 256), dt),
    ]
    seg = SegmentHead(nc=2, nm=32, npr=256, ch0=256, reg_max=16, dtype=dt)
    svars = jax.jit(lambda k: seg.init(k, pfeats, True))(key)

    def seg_grad(i):
        f0 = [x + i.astype(dt) * jnp.asarray(1e-6, dt) for x in pfeats]

        def f(p):
            raw, coeffs, protos = seg.apply(
                {"params": p, "batch_stats": svars["batch_stats"]}, f0,
                True, mutable=["batch_stats"],
            )[0]
            return (sum(r.sum().astype(jnp.float32) for r in raw)
                    + coeffs.sum().astype(jnp.float32)
                    + protos.sum().astype(jnp.float32))

        g = jax.grad(f)(svars["params"])
        return sum(t.sum().astype(jnp.float32) for t in jax.tree.leaves(g))

    report("Segment head fwd+bwd", timed(seg_grad))

    det = DetectHead(nc=2, ch0=256, reg_max=16, dtype=dt)
    dvars = jax.jit(lambda k: det.init(k, pfeats, True))(key)

    def det_grad(i):
        f0 = [x + i.astype(dt) * jnp.asarray(1e-6, dt) for x in pfeats]

        def f(p):
            raw, _ = det.apply(
                {"params": p, "batch_stats": dvars["batch_stats"]}, f0,
                True, mutable=["batch_stats"],
            )
            return sum(r.sum().astype(jnp.float32) for r in raw)

        g = jax.grad(f)(dvars["params"])
        return sum(t.sum().astype(jnp.float32) for t in jax.tree.leaves(g))

    report("Detect head fwd+bwd", timed(det_grad))


if __name__ == "__main__":
    main()
