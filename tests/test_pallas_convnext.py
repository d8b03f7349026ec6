"""Pallas fused ConvNeXt block vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multitask_bonetumor_yolo_tpu.ops.pallas.convnext_block import (
    convnext_block,
    convnext_block_ref,
)


def make_args(rng, b=2, h=16, w=16, c=32, dtype=jnp.float32):
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32), dtype)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
    return (
        x,
        f(7, 7, 1, c),
        f(c),
        f(c) + 1.0,
        f(c),
        f(c, 4 * c),
        f(4 * c),
        f(4 * c, c),
        f(c),
        f(c) * 0.5,
    )


def test_kernel_matches_reference(rng):
    args = make_args(rng)
    want = convnext_block_ref(*args)
    got = convnext_block(*args, 1e-6, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_kernel_matches_reference_bf16(rng):
    args = make_args(rng, dtype=jnp.bfloat16)
    want = np.asarray(convnext_block_ref(*args)).astype(np.float32)
    got = np.asarray(convnext_block(*args, 1e-6, True)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)


def test_kernel_nonsquare_and_odd_rows(rng):
    # h=12, w=20 exercises the row-chunk divisor logic
    args = make_args(rng, b=1, h=12, w=20, c=16)
    want = convnext_block_ref(*args)
    got = convnext_block(*args, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_kernel_gradients_match_reference(rng):
    args = make_args(rng, b=1, h=8, w=8, c=16)

    def loss_pallas(*a):
        return jnp.sum(convnext_block(*a, 1e-6, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(convnext_block_ref(*a) ** 2)

    gp = jax.grad(loss_pallas, argnums=tuple(range(10)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=2e-3)


def test_kernel_multichunk_pipeline(rng):
    """Force several row-chunks per image: exercises the clamped first /
    interior / last halo DMAs, the triple-buffered slab, and the one-step
    MXU pipeline delay across chunk AND image boundaries."""
    args = make_args(rng, b=2, h=16, w=8, c=16)
    want = convnext_block_ref(*args)
    got = convnext_block(*args, 1e-6, True, 4)  # row_chunk=4 -> 4 chunks/img
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
    # two chunks per image: every chunk is a border chunk (no interior case)
    got2 = convnext_block(*args, 1e-6, True, 8)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), atol=2e-4)


def test_padded_chaining_roundtrip(rng):
    """pad_for_blocks -> two chained padded blocks -> unpad == two plain
    reference blocks (the stage-level chaining models/backbone.py uses)."""
    from multitask_bonetumor_yolo_tpu.ops.pallas.convnext_block import (
        convnext_block_padded, pad_for_blocks, unpad_from_blocks,
    )

    args = make_args(rng, b=1, h=8, w=8, c=16)
    x, rest = args[0], args[1:]
    want = convnext_block_ref(convnext_block_ref(x, *rest), *rest)
    xp = pad_for_blocks(x)
    xp = convnext_block_padded(xp, *rest, 8, 16, 1e-6, True)
    xp = convnext_block_padded(xp, *rest, 8, 16, 1e-6, True)
    got = unpad_from_blocks(xp, 8, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=4e-4)


def test_backbone_pallas_flag_structure(rng):
    """pallas='off' and 'on'(interpreted) share one param tree."""
    from multitask_bonetumor_yolo_tpu.models.backbone import ConvNeXtBlock

    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    off = ConvNeXtBlock(16, pallas="off")
    vars_ = off.init(jax.random.PRNGKey(0), x)
    assert set(vars_["params"].keys()) == {
        "dw_kernel", "dw_bias", "ln_scale", "ln_bias",
        "w1", "b1", "w2", "b2", "gamma",
    }
    out_off = off.apply(vars_, x)
    assert out_off.shape == x.shape


def test_dwconv7_matches_lax(rng):
    from multitask_bonetumor_yolo_tpu.ops.pallas.dwconv import dwconv7

    x = jnp.asarray(rng.randn(2, 12, 20, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(7, 7, 16).astype(np.float32) * 0.1)
    got = dwconv7(x, k, interpret=True)
    want = jax.lax.conv_general_dilated(
        x, k[:, :, None, :], (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=16,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_dwconv7_multichunk_matches_lax(rng):
    from multitask_bonetumor_yolo_tpu.ops.pallas.dwconv import dwconv7

    x = jnp.asarray(rng.randn(2, 16, 8, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(7, 7, 16).astype(np.float32) * 0.1)
    want = jax.lax.conv_general_dilated(
        x, k[:, :, None, :], (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=16,
    )
    for rc in (4, 8):  # first/interior/last clamp cases + two-chunk case
        got = dwconv7(x, k, interpret=True, row_chunk=rc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)


def test_fused_bwd_v2_custom_vjp_matches_ref(rng):
    """grad through convnext_block with bwd='fused' (the residual-saving
    forward + v2 one-kernel backward) vs grad of the XLA reference, with
    several row-chunks per image."""
    args = make_args(rng, b=2, h=24, w=8, c=16)

    def loss_fused(*a):
        return jnp.sum(convnext_block(*a, 1e-6, True, 6, "fused") ** 2)

    def loss_ref(*a):
        return jnp.sum(convnext_block_ref(*a) ** 2)

    gp = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=5e-3)


def test_fused_bwd_v2_single_chunk(rng):
    """v2 backward with one chunk per image (nrows=1 halo case)."""
    args = make_args(rng, b=1, h=8, w=8, c=16)

    def loss_fused(*a):
        return jnp.sum(convnext_block(*a, 1e-6, True, 0, "fused"))

    def loss_ref(*a):
        return jnp.sum(convnext_block_ref(*a))

    gp = jax.grad(loss_fused, argnums=(0, 1, 3, 5, 7, 9))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 3, 5, 7, 9))(*args)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=5e-3)


def test_fused_bwd_multichunk_matches_ref_vjp(rng):
    """The fully-fused backward kernel vs jax.vjp of the reference, with
    several row-chunks per image (first/interior/last halo DMA cases)."""
    from multitask_bonetumor_yolo_tpu.ops.pallas.convnext_block import (
        pad_for_blocks, unpad_from_blocks,
    )
    from multitask_bonetumor_yolo_tpu.ops.pallas.convnext_block_bwd import (
        fused_block_bwd,
    )

    args = make_args(rng, b=2, h=24, w=8, c=16)
    out, vjp = jax.vjp(lambda *a: convnext_block_ref(*a), *args)
    g = jnp.asarray(rng.randn(*out.shape).astype(np.float32))
    want = vjp(g)
    got = fused_block_bwd(
        pad_for_blocks(args[0]), pad_for_blocks(g), *args[1:],
        w=8, c=16, interpret=True, row_chunk=6,
    )
    gx = unpad_from_blocks(got[0], 8, 16)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(want[0]),
                               atol=5e-3, rtol=5e-3)
    for i in range(1, 10):
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(want[i]), atol=2e-2, rtol=2e-2
        )
