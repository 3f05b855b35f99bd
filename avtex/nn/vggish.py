"""VGGish audio CNN (flax).

Same topology as the reference's 4-block VGG feature stack on log-mel
patches (reference: models/audio_models/vggish.py:4-46): conv-relu-pool ×2
then double-conv-relu-pool ×2, returning *flattened conv features* — the
reference's fc head is defined but bypassed, and we keep that contract.

Input is channels-last [B, frames, bands, 1] (the reference uses NCHW
[B, 1, 96, 64]); our frontend emits 100-frame examples
(avtex/audio/params.py), giving 512·6·4 = 12288 features after 4 pools.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class VGGish(nn.Module):
    """VGG-style audio feature extractor; returns [B, feat_dim]."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 3:
            x = x[..., None]
        x = x.astype(self.dtype)
        for widths in ((64,), (128,), (256, 256), (512, 512)):
            for w in widths:
                x = nn.Conv(w, (3, 3), padding="SAME", dtype=self.dtype)(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x.reshape(x.shape[0], -1).astype(jnp.float32)


def vggish_feat_dim(frames: int = 100, bands: int = 64) -> int:
    """Flattened feature size for a given mel-patch geometry."""
    f, b = frames, bands
    for _ in range(4):
        f, b = f // 2, b // 2
    return 512 * f * b
