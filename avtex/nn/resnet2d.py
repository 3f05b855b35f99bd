"""2D ResNet image encoder (flax, NHWC).

Used for (a) the classic baseline's per-frame "ResNet" feature mode
(reference: baselines/classic_video_textures/computeD1.py:98-150, which
takes torchvision resnet18's penultimate features) and (b) the legacy 2D
contrastive path (reference: models/resnet.py:145-343).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .resnet3d import _norm

PAD1_2D = ((1, 1), (1, 1))


class BasicBlock2D(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    norm: str = "group"
    expansion = 1

    @nn.compact
    def __call__(self, x):
        r = x
        s = (self.stride, self.stride)
        y = nn.Conv(self.features, (3, 3), s, padding=PAD1_2D, use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.relu(_norm(self.features, self.dtype, self.norm)(y))
        y = nn.Conv(self.features, (3, 3), padding=PAD1_2D, use_bias=False,
                    dtype=self.dtype)(y)
        y = _norm(self.features, self.dtype, self.norm)(y)
        if r.shape[-1] != self.features or self.stride != 1:
            r = nn.Conv(self.features, (1, 1), s, use_bias=False,
                        dtype=self.dtype)(x)
            r = _norm(self.features, self.dtype, self.norm)(r)
        return nn.relu(y + r.astype(y.dtype))


class ResNet2D(nn.Module):
    """Image encoder [B, H, W, 3] -> [B, feat_dim] (penultimate features)."""

    layers: Sequence[int] = (2, 2, 2, 2)
    width: int = 64
    dtype: Any = jnp.bfloat16
    norm: str = "group"

    @property
    def feat_dim(self) -> int:
        return self.width * 8 * BasicBlock2D.expansion

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.relu(_norm(64, self.dtype, self.norm)(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=PAD1_2D)
        for i, n_blocks in enumerate(self.layers):
            feats = self.width * (2 ** i)
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = BasicBlock2D(feats, stride, dtype=self.dtype,
                                 norm=self.norm)(x)
        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)


resnet2d18 = functools.partial(ResNet2D, layers=(2, 2, 2, 2))
resnet2d34 = functools.partial(ResNet2D, layers=(3, 4, 6, 3))


class FrameMean2D(nn.Module):
    """Clip encoder from a 2D backbone: per-frame features, temporal mean.

    The reference's legacy 2D contrastive path wraps torchvision ResNets the
    same way (reference: models/models.py:470-505 ModelBuilder + adaptive
    pooling). Registered as ``resnet18_2d`` / ``resnet34_2d``.
    """

    layers: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = jnp.bfloat16
    norm: str = "group"

    @property
    def feat_dim(self) -> int:
        return ResNet2D(layers=self.layers).feat_dim

    @nn.compact
    def __call__(self, x):
        # [B, T, H, W, 3] -> fold T into batch for the 2D net
        b, t = x.shape[:2]
        flat = x.reshape((-1,) + x.shape[2:])
        feats = ResNet2D(layers=self.layers, dtype=self.dtype,
                         norm=self.norm)(flat)
        return feats.reshape(b, t, -1).mean(axis=1)
