"""3D DenseNet video encoders (flax, NDHWC).

DenseNet-BC topology matching the reference's 3D variants — growth-rate 32,
bottleneck 4×, compression 0.5, stem 7³ stride (1,2,2)
(reference: models/video_models/densenet3d.py:131-213). GroupNorm replaces
BatchNorm (stateless under jit); ``feat_dim`` is the real final feature
count, unlike the reference's hardcoded 128 (models/models.py:584).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .resnet3d import _norm


class DenseLayer3D(nn.Module):
    growth_rate: int
    bn_size: int = 4
    dtype: Any = jnp.bfloat16
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        y = _norm(x.shape[-1], self.dtype, self.norm)(x)
        y = nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth_rate, (1, 1, 1),
                    use_bias=False, dtype=self.dtype)(y)
        y = _norm(y.shape[-1], self.dtype, self.norm)(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth_rate, (3, 3, 3), padding="SAME",
                    use_bias=False, dtype=self.dtype)(y)
        return jnp.concatenate([x, y.astype(x.dtype)], axis=-1)


class DenseNet3D(nn.Module):
    """Video encoder on [B, T, H, W, 3]; returns [B, feat_dim]."""

    block_config: Sequence[int] = (6, 12, 24, 16)
    growth_rate: int = 32
    init_features: int = 64
    dtype: Any = jnp.bfloat16
    norm: str = "group"

    @property
    def feat_dim(self) -> int:
        ch = self.init_features
        for i, n in enumerate(self.block_config):
            ch += n * self.growth_rate
            if i != len(self.block_config) - 1:
                ch = ch // 2
        return ch

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(self.init_features, (7, 7, 7), (1, 2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = _norm(self.init_features, self.dtype, self.norm)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3, 3), (2, 2, 2), padding="SAME")
        for i, n_layers in enumerate(self.block_config):
            for _ in range(n_layers):
                x = DenseLayer3D(self.growth_rate, dtype=self.dtype,
                                 norm=self.norm)(x)
            if i != len(self.block_config) - 1:
                x = _norm(x.shape[-1], self.dtype, self.norm)(x)
                x = nn.relu(x)
                x = nn.Conv(x.shape[-1] // 2, (1, 1, 1), use_bias=False,
                            dtype=self.dtype)(x)
                x = nn.avg_pool(x, (2, 2, 2), (2, 2, 2))
        x = _norm(x.shape[-1], self.dtype, self.norm)(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2, 3))
        return x.astype(jnp.float32)


densenet3d121 = functools.partial(DenseNet3D, block_config=(6, 12, 24, 16))
densenet3d169 = functools.partial(DenseNet3D, block_config=(6, 12, 32, 32))
densenet3d201 = functools.partial(DenseNet3D, block_config=(6, 12, 48, 32))
densenet3d264 = functools.partial(DenseNet3D, block_config=(6, 12, 64, 48))
