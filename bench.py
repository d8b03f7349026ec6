"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): images/sec/chip at 640x640 multitask
inference (detect decode + NMS + seg probs + image-cls), batch 16, bf16.

``vs_baseline`` divides by REF_GPU_EQUIV_IPS — an ESTIMATED single-GPU
throughput for the reference PyTorch stack on this model/size (the reference
publishes no numbers and cannot run here: no CUDA, no ultralytics/timm).
The constant is a deliberately generous estimate of an A100 running the
~51M-param dual-head model at 640² with per-image torchvision NMS; the
BASELINE.json target of 5x this equivalence = vs_baseline >= 5.0.

``python bench.py --all`` additionally reports the other BASELINE.json
configs (single-image det forward+NMS, fused preprocessing, train step,
full eval) as extra JSON lines on stderr-like prefixed rows.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REF_GPU_EQUIV_IPS = 250.0  # estimated reference GPU images/sec (see docstring)


def _block(x):
    import jax

    jax.block_until_ready(x)
    return x


def bench_multitask_inference(batch: int = 16, img: int = 640, iters: int = 20):
    import jax
    import jax.numpy as jnp

    from multitask_bonetumor_yolo_tpu.models import ModelConfig, MultitaskModel
    from multitask_bonetumor_yolo_tpu.ops.nms import postprocess_detections

    cfg = ModelConfig(img_size=img, dtype="bfloat16")
    model = MultitaskModel(cfg)

    @jax.jit
    def init(key):
        return model.init(key, jnp.zeros((1, img, img, 3)), train=True, mode="train")

    variables = init(jax.random.PRNGKey(0))

    @jax.jit
    def infer(params, batch_stats, images):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=False, mode="infer", mutable=["batch_stats"],
        )
        nms = postprocess_detections(out["det_preds"], img)
        return nms.boxes, nms.scores, out["seg_prob"], out["cls_probs"]

    x = jnp.asarray(np.random.rand(batch, img, img, 3), jnp.float32)
    _block(infer(variables["params"], variables["batch_stats"], x))  # compile
    # chain each iteration's input on the previous output — defeats any
    # dispatch coalescing/overlap so wall time == true serialized execution
    t0 = time.perf_counter()
    carry = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        r = infer(variables["params"], variables["batch_stats"], x + carry)
        carry = r[1][0, 0] * 0.0
    _block(r)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt * 1000.0


def bench_single_image_det(img: int = 640, iters: int = 20):
    ips, ms = bench_multitask_inference(batch=1, img=img, iters=iters)
    return ips, ms


def bench_train_step(batch: int = 8, img: int = 640, iters: int = 10):
    import jax
    import jax.numpy as jnp

    from multitask_bonetumor_yolo_tpu.data.preprocess import AugmentConfig
    from multitask_bonetumor_yolo_tpu.losses import LossConfig
    from multitask_bonetumor_yolo_tpu.models import ModelConfig
    from multitask_bonetumor_yolo_tpu.train import (
        TrainConfig, create_train_state, make_train_step,
    )

    cfg = ModelConfig(img_size=img, dtype="bfloat16")
    state = create_train_state(cfg, TrainConfig(steps_per_epoch=100, seed=0))
    step = make_train_step(cfg, LossConfig(img_size=img), AugmentConfig(),
                           donate=False)
    rng = np.random.RandomState(0)
    batch_d = {
        "image": jnp.asarray(rng.randint(0, 255, (batch, img, img, 3)), jnp.uint8),
        "boxes": jnp.tile(jnp.asarray([[0, 0.5, 0.5, 0.3, 0.3]], jnp.float32),
                          (batch, 8, 1)),
        "box_valid": jnp.tile(jnp.asarray([True] + [False] * 7), (batch, 1)),
        "mask": jnp.zeros((batch, img, img, 1)),
        "img_cls": jnp.zeros((batch,), jnp.int32),
        "id": jnp.arange(batch, dtype=jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    state, m = step(state, batch_d, key)  # compile
    _block(m["loss_total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch_d, key)
    _block(m["loss_total"])
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt * 1000.0


def bench_preprocess(batch: int = 16, img: int = 640, iters: int = 50):
    import jax
    import jax.numpy as jnp

    from multitask_bonetumor_yolo_tpu.data.preprocess import (
        AugmentConfig, augment_batch,
    )

    acfg = AugmentConfig(hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, hflip_prob=0.5,
                         mosaic_prob=1.0)
    rng = np.random.RandomState(0)
    batch_d = {
        "image": jnp.asarray(rng.randint(0, 255, (batch, img, img, 3)), jnp.uint8),
        "boxes": jnp.tile(jnp.asarray([[0, 0.5, 0.5, 0.3, 0.3]], jnp.float32),
                          (batch, 8, 1)),
        "box_valid": jnp.tile(jnp.asarray([True] + [False] * 7), (batch, 1)),
        "mask": jnp.zeros((batch, img, img, 1)),
        "img_cls": jnp.zeros((batch,), jnp.int32),
        "id": jnp.arange(batch, dtype=jnp.int32),
    }
    fn = jax.jit(lambda b, k: augment_batch(b, k, acfg))
    key = jax.random.PRNGKey(0)
    _block(fn(batch_d, key)["image"])
    t0 = time.perf_counter()
    carry = jnp.zeros((), jnp.uint8)
    for _ in range(iters):
        batch_d["image"] = batch_d["image"] + carry  # serialize iterations
        out = fn(batch_d, key)
        carry = (out["image"][0, 0, 0, 0] * 0.0).astype(jnp.uint8)
    _block(out["image"])
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt * 1000.0


def main():
    from multitask_bonetumor_yolo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="run every config")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    ips, p50 = bench_multitask_inference(args.batch, args.img, args.iters)
    result = {
        "metric": "multitask_inference_images_per_sec_per_chip_640",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / REF_GPU_EQUIV_IPS, 3),
        "extra": {"p50_batch_latency_ms": round(p50, 2), "batch": args.batch},
    }
    if args.all:
        s_ips, s_ms = bench_single_image_det(args.img, args.iters)
        t_ips, t_ms = bench_train_step(8, args.img, max(3, args.iters // 2))
        p_ips, p_ms = bench_preprocess(args.batch, args.img)
        result["extra"].update(
            single_image_ips=round(s_ips, 2),
            single_image_p50_ms=round(s_ms, 2),
            train_step_ips=round(t_ips, 2),
            train_step_ms=round(t_ms, 2),
            preprocess_ips=round(p_ips, 2),
            preprocess_ms=round(p_ms, 3),
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
