"""Joint audio-visual feature network (SoundNet-style fusion).

Parity with the reference's ``AudioVisualFeatures``
(reference: models/audio_visual_features.py:75-163, exported by
models/__init__.py:9 but unused by the main path — kept for API
completeness): a 1-D conv audio tower over raw waveforms and a 3-D conv
video tower, fused by tiling the audio embedding across the video feature
map and concatenating, then projected to a joint embedding.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class AudioTower1D(nn.Module):
    """Strided 1-D convs over a raw waveform [B, T] -> [B, D]."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        x = wav[..., None].astype(self.dtype)      # [B, T, 1]
        for feats, k, s in ((16, 64, 2), (32, 32, 2), (64, 16, 2),
                            (128, 8, 2), (256, 4, 2)):
            x = nn.Conv(feats, (k,), (s,), padding="SAME",
                        dtype=self.dtype)(x)
            x = nn.relu(x)
            # SAME pooling keeps at least one step for short waveforms
            x = nn.max_pool(x, (4,), (4,), padding="SAME")
        return jnp.mean(x, axis=1).astype(jnp.float32)   # [B, 256]


class VideoTower3D(nn.Module):
    """3-D convs over a clip [B, T, H, W, 3] -> [B, t', h', w', D]."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, clip: jnp.ndarray) -> jnp.ndarray:
        x = clip.astype(self.dtype)
        for feats in (32, 64, 128, 256):
            x = nn.Conv(feats, (3, 3, 3), (1, 2, 2), padding="SAME",
                        dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class AudioVisualFeatures(nn.Module):
    """Tile-and-concat fusion -> joint embedding [B, emb_dim]."""

    emb_dim: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, clip: jnp.ndarray, wav: jnp.ndarray) -> jnp.ndarray:
        v = VideoTower3D(self.dtype)(clip)          # [B, t, h, w, 256]
        a = AudioTower1D(self.dtype)(wav)           # [B, 256]
        a_t = jnp.broadcast_to(a[:, None, None, None, :].astype(v.dtype),
                               v.shape[:-1] + (a.shape[-1],))
        x = jnp.concatenate([v, a_t], axis=-1)
        x = nn.Conv(256, (1, 1, 1), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2, 3))
        x = nn.Dense(self.emb_dim, dtype=self.dtype)(x).astype(jnp.float32)
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
