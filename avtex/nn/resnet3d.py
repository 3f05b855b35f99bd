"""3D ResNet video encoders (flax, NDHWC).

Topology follows the reference's r3d family — BasicBlock/Bottleneck, conv1
7³ with spatial-only stride (1,2,2), stage strides 2 from layer2 on, global
average pool (reference: models/video_models/resnet3d.py:119-191). TPU-first
differences: channels-last layout, GroupNorm instead of BatchNorm (stateless
under jit; the reference only ever ran these eval-mode with frozen stats),
bfloat16 compute with fp32 norm/head.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def _norm(ch: int, dtype):
    return nn.GroupNorm(num_groups=min(32, ch), dtype=jnp.float32)


class BasicBlock3D(nn.Module):
    features: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.bfloat16
    expansion = 1

    @nn.compact
    def __call__(self, x):
        r = x
        y = nn.Conv(self.features, (3, 3, 3), self.stride, padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        y = _norm(self.features, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3, 3), padding="SAME",
                    use_bias=False, dtype=self.dtype)(y)
        y = _norm(self.features, self.dtype)(y)
        if r.shape[-1] != self.features or self.stride != (1, 1, 1):
            r = nn.Conv(self.features, (1, 1, 1), self.stride,
                        use_bias=False, dtype=self.dtype)(x)
            r = _norm(self.features, self.dtype)(r)
        return nn.relu(y + r.astype(y.dtype))


class Bottleneck3D(nn.Module):
    features: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    groups: int = 1
    dtype: Any = jnp.bfloat16
    expansion = 4

    @nn.compact
    def __call__(self, x):
        r = x
        out_ch = self.features * self.expansion
        y = nn.Conv(self.features, (1, 1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        y = _norm(self.features, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3, 3), self.stride, padding="SAME",
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype)(y)
        y = _norm(self.features, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1, 1), use_bias=False, dtype=self.dtype)(y)
        y = _norm(out_ch, self.dtype)(y)
        if r.shape[-1] != out_ch or self.stride != (1, 1, 1):
            r = nn.Conv(out_ch, (1, 1, 1), self.stride, use_bias=False,
                        dtype=self.dtype)(x)
            r = _norm(out_ch, self.dtype)(r)
        return nn.relu(y + r.astype(y.dtype))


class ResNet3D(nn.Module):
    """Video encoder on [B, T, H, W, 3] clips; returns [B, feat_dim]."""

    block: Any = BasicBlock3D
    layers: Sequence[int] = (2, 2, 2, 2)
    groups: int = 1
    width: int = 64
    dtype: Any = jnp.bfloat16

    @property
    def feat_dim(self) -> int:
        return self.width * 8 * self.block.expansion

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7, 7), (1, 2, 2), padding=((3, 3), (3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype)(x)
        x = _norm(64, self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3, 3), (2, 2, 2), padding="SAME")
        for i, n_blocks in enumerate(self.layers):
            feats = self.width * (2 ** i)
            for j in range(n_blocks):
                stride = (2, 2, 2) if (i > 0 and j == 0) else (1, 1, 1)
                kwargs = dict(features=feats, stride=stride, dtype=self.dtype)
                if issubclass(self.block, Bottleneck3D):
                    kwargs["groups"] = self.groups
                x = self.block(**kwargs)(x)
        x = jnp.mean(x, axis=(1, 2, 3))  # global avg pool over T, H, W
        return x.astype(jnp.float32)


resnet3d10 = functools.partial(ResNet3D, block=BasicBlock3D, layers=(1, 1, 1, 1))
resnet3d18 = functools.partial(ResNet3D, block=BasicBlock3D, layers=(2, 2, 2, 2))
resnet3d34 = functools.partial(ResNet3D, block=BasicBlock3D, layers=(3, 4, 6, 3))
resnet3d50 = functools.partial(ResNet3D, block=Bottleneck3D, layers=(3, 4, 6, 3))
