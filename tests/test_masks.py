"""compose_masks vs a numpy einsum oracle (reference semantics:
/root/reference/src/test_model.py:81-85, NCHW einsum "bqc,bchw->bqhw")."""

import numpy as np
import jax.numpy as jnp

from multitask_bonetumor_yolo_tpu.ops.masks import compose_masks
from multitask_bonetumor_yolo_tpu.ops.nms import NMSResult


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _make_inputs(rng, b=2, a=50, nm=8, hp=16, k=5):
    coeffs = rng.randn(b, a, nm).astype(np.float32)
    protos = rng.randn(b, hp, hp, nm).astype(np.float32)
    idx = np.stack([rng.choice(a, k, replace=False) for _ in range(b)]).astype(
        np.int32
    )
    valid = rng.rand(b, k) < 0.7
    idx[~valid] = -1
    boxes = np.zeros((b, k, 4), np.float32)
    boxes[..., :2] = rng.rand(b, k, 2) * 30
    boxes[..., 2:] = boxes[..., :2] + rng.rand(b, k, 2) * 30 + 2
    nms = NMSResult(
        boxes=jnp.asarray(boxes),
        scores=jnp.asarray(rng.rand(b, k).astype(np.float32)),
        labels=jnp.zeros((b, k), jnp.int32),
        valid=jnp.asarray(valid),
        indices=jnp.asarray(idx),
    )
    return coeffs, protos, nms, boxes, idx, valid


def test_compose_matches_einsum_oracle(rng):
    coeffs, protos, nms, _, idx, valid = _make_inputs(rng)
    got = np.asarray(compose_masks(
        jnp.asarray(coeffs), jnp.asarray(protos), nms, crop=False
    ))
    b, k = idx.shape
    hp = protos.shape[1]
    # oracle: reference einsum (channel-first) per kept instance
    protos_chw = protos.transpose(0, 3, 1, 2)
    for bi in range(b):
        for ki in range(k):
            if not valid[bi, ki]:
                assert (got[bi, ki] == 0).all()
                continue
            want = _sigmoid(
                np.einsum("c,chw->hw", coeffs[bi, idx[bi, ki]], protos_chw[bi])
            )
            np.testing.assert_allclose(got[bi, ki], want, atol=1e-5)


def test_compose_crop_zeroes_outside_box(rng):
    coeffs, protos, nms, boxes, idx, valid = _make_inputs(rng)
    img_size = 64  # protos 16x16 -> scale 0.25
    got = np.asarray(compose_masks(
        jnp.asarray(coeffs), jnp.asarray(protos), nms, crop=True,
        img_size=img_size,
    ))
    # crop happens at proto resolution (16x16) before the 4x bilinear
    # upsample, so zero-ness holds strictly outside the box plus a margin of
    # two proto cells (interpolation support)
    cell = img_size // protos.shape[1]
    margin = 2 * cell
    ys = np.arange(img_size) + 0.5
    xs = np.arange(img_size) + 0.5
    for bi in range(boxes.shape[0]):
        for ki in range(boxes.shape[1]):
            if not valid[bi, ki]:
                continue
            x1, y1, x2, y2 = boxes[bi, ki]
            far_outside = (
                (xs[None, :] < x1 - margin) | (xs[None, :] > x2 + margin)
                | (ys[:, None] < y1 - margin) | (ys[:, None] > y2 + margin)
            )
            assert (got[bi, ki][far_outside] == 0).all()
            inside = (
                (xs[None, :] > x1) & (xs[None, :] < x2)
                & (ys[:, None] > y1) & (ys[:, None] < y2)
            )
            if inside.any():
                assert (got[bi, ki][inside] != 0).any()


def test_compose_upsample_and_binarize(rng):
    coeffs, protos, nms, _, _, valid = _make_inputs(rng)
    out = compose_masks(
        jnp.asarray(coeffs), jnp.asarray(protos), nms, crop=False,
        img_size=64, binarize=True,
    )
    assert out.shape == (2, 5, 64, 64)
    assert out.dtype == jnp.bool_
    # invalid slots stay empty after upsample
    inv = np.asarray(out)[~valid]
    assert not inv.any()
