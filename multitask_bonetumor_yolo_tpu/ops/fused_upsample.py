"""Fused 2x-transposed-conv + 3x3 conv (the Proto hot path).

The reference Proto (ultralytics; /root/reference/src/main_model.py:326-328)
runs ``ConvTranspose(2x2, stride 2)`` then a 3x3 conv at the UPSAMPLED
resolution — at 640² input that 3x3 conv alone is 483 GFLOP/batch-16, the
single most expensive conv in the model. Both ops are linear and the
nonlinearity (BN+SiLU) only comes after the 3x3 conv, so they compose
exactly into FOUR 2x2 phase convolutions at the LOW resolution plus a
pixel-shuffle — 215 GF total, removing the 483 GF entirely.

Derivation (validated numerically vs flax in tests/test_fused_upsample.py):
flax ``ConvTranspose(k=2, s=2, SAME)`` scatters with a FLIPPED kernel:
    z[2i+a, 2j+b] = x[i, j] @ kt[1-a, 1-b] + bt
and the following ``Conv(3x3, SAME)`` correlates:
    y[p, q] = sum_{u,v in [0,3)} z[p+u-1, q+v-1] @ k3[u, v].
Substituting, output phase (a, b) of y is a 2-tap-per-dim convolution of x
with composite kernels
    F_ab[r, s] = sum_{(u,v): divmod(a+u-1,2)=(r-1+a?, ap)} kt[1-ap,1-bp] @ k3[u,v]
where the taps land on di in {-1, 0} for a=0 and {0, 1} for a=1 (same for
dj/b). The ConvTranspose bias does NOT fold to a constant: the 3x3 conv's
SAME zero-padding clips it at the map border, so the exact per-position bias
is R @ t @ C^T with t[u,v] = bt @ k3[u,v] and R/C 0/1 tap-inclusion masks.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def fused_upsample_conv3x3_phases(
    x: jnp.ndarray,  # [B, H, W, C]
    kt: jnp.ndarray,  # [2, 2, C, M] flax ConvTranspose kernel
    bt: jnp.ndarray,  # [M] ConvTranspose bias
    k3: jnp.ndarray,  # [3, 3, M, O] flax Conv kernel (bias-free, as in Proto)
):
    """The four output phases of ``Conv3x3(ConvTranspose2x2s2(x))`` at LOW
    resolution, bias included: ``phases[a][b][i, j] == full[2i+a, 2j+b]``.

    Keeping the result per-phase lets the caller run further per-pixel work
    (BN, activation, 1x1 convs) at H x W before the 2x pixel shuffle — at
    Proto's shapes that moves the shuffle from 256 to 32 channels."""
    b, h, w, c = x.shape
    o = k3.shape[-1]
    dt = x.dtype
    kt = kt.astype(jnp.float32)
    k3 = k3.astype(jnp.float32)

    # composite per-phase kernels: F[(a, b)][(r, s)] with r,s in {0,1}
    # mapping to taps di = r - 1 + a ... built directly from the derivation
    def phase_kernel(a, bb):
        taps = {}
        for u in range(3):
            di, ap = divmod(a + u - 1, 2)
            for v in range(3):
                dj, bp = divmod(bb + v - 1, 2)
                # tap position inside the 2x2 kernel: row index 0 is the
                # more-negative di ({-1,0} for a=0, {0,1} for a=1)
                r = di - (a - 1)  # a=0: di in {-1,0} -> r in {0,1}... a=1: {0,1}->{?}
                s = dj - (bb - 1)
                w_co = jnp.einsum(
                    "cm,mo->co", kt[1 - ap, 1 - bp], k3[u, v]
                )
                key = (r, s)
                taps[key] = taps.get(key, 0) + w_co
        k = jnp.stack(
            [jnp.stack([taps[(r, s)] for s in range(2)], 0) for r in range(2)],
            0,
        )  # [2, 2, C, O]
        return k

    def phase_conv(a, bb):
        k = phase_kernel(a, bb).astype(dt)
        pad_h = (1, 0) if a == 0 else (0, 1)
        pad_w = (1, 0) if bb == 0 else (0, 1)
        return lax.conv_general_dilated(
            x, k, (1, 1), [pad_h, pad_w],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # exact border-clipped bias of the composed pair
    t = jnp.einsum("m,uvmo->uvo", bt.astype(jnp.float32), k3)  # [3,3,O]
    h2, w2 = 2 * h, 2 * w
    rows = jnp.arange(h2)[:, None]  # tap u contributes iff 0 <= p+u-1 < h2
    u_idx = jnp.arange(3)[None, :]
    rmask = ((rows + u_idx - 1 >= 0) & (rows + u_idx - 1 < h2)).astype(
        jnp.float32
    )  # [h2, 3]
    cols = jnp.arange(w2)[:, None]
    cmask = ((cols + u_idx - 1 >= 0) & (cols + u_idx - 1 < w2)).astype(
        jnp.float32
    )  # [w2, 3]

    phases = {}
    for a in range(2):
        for bb in range(2):
            bias_ab = jnp.einsum(
                "pu,uvo,qv->pqo", rmask[a::2], t, cmask[bb::2]
            )  # [h, w, O]
            phases[(a, bb)] = phase_conv(a, bb) + bias_ab[None].astype(dt)
    return phases


def shuffle_phases(phases) -> jnp.ndarray:
    """Interleave the four phase maps back to [B, 2H, 2W, O]."""
    p = phases
    b, h, w, o = p[(0, 0)].shape
    y = jnp.stack([p[(0, 0)], p[(0, 1)], p[(1, 0)], p[(1, 1)]], axis=3)
    y = y.reshape(b, h, w, 2, 2, o)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, o)


def fused_upsample_conv3x3(
    x: jnp.ndarray, kt: jnp.ndarray, bt: jnp.ndarray, k3: jnp.ndarray
) -> jnp.ndarray:  # [B, 2H, 2W, O] == Conv3x3(ConvTranspose(x))
    return shuffle_phases(fused_upsample_conv3x3_phases(x, kt, bt, k3))
