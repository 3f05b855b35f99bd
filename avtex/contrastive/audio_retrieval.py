"""Audio->video retrieval head ("Contrastive" driving-audio features).

Re-expression of the reference's ``VideoForAudio``
(reference: models/audio_visual_matches.py:9-67): an audio query (VGGish
features -> MLP -> 128-d) scored against N video segments (3D encoder ->
Dense -> 128-d) by cosine/temp. Used at synthesis when ``-daf Contrastive``
(reference: validate.py:268-296, models.py:441-443); trained standalone
with InfoNCE where the positive is the segment whose audio matches.

The reference file also carries a second, divergent ModelBuilder3D with a
missing-comma bug (audio_visual_matches.py:83) — not reproduced; encoders
come from the single avtex registry.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from avtex.nn.encoders import build_encoder
from avtex.nn.vggish import VGGish

from .model import AudioMLP


class VideoForAudio(nn.Module):
    """score(audio_example, video_windows) -> [B, N] cosine/temp logits."""

    arch: str = "resnet18"
    emb_dim: int = 128
    temp: float = 0.1
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.audio_encoder = VGGish(dtype=self.dtype)
        self.audio_mlp = AudioMLP(self.emb_dim, dtype=self.dtype)
        module, feat_dim, kind = build_encoder(self.arch, dtype=self.dtype)
        if kind != "clip":
            raise ValueError("VideoForAudio requires a clip encoder")
        self.video_encoder = module
        self.video_head = nn.Dense(self.emb_dim, dtype=self.dtype)

    def embed_audio(self, audio_example: jnp.ndarray) -> jnp.ndarray:
        a = self.audio_mlp(self.audio_encoder(audio_example))
        return a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)

    def embed_video(self, windows: jnp.ndarray) -> jnp.ndarray:
        v = self.video_head(self.video_encoder(windows)).astype(jnp.float32)
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)

    def __call__(self, audio_example: jnp.ndarray, video_windows: jnp.ndarray
                 ) -> jnp.ndarray:
        """audio_example: [B, mel, bands]; video_windows: [B, N, T, H, W, 3]."""
        a = self.embed_audio(audio_example)
        b, n = video_windows.shape[:2]
        flat = video_windows.reshape((-1,) + video_windows.shape[2:])
        v = self.embed_video(flat).reshape(b, n, -1)
        logits = jnp.einsum("bd,bnd->bn", a, v,
                            preferred_element_type=jnp.float32)
        return logits / self.temp


def video_for_audio_logits(module: VideoForAudio, params,
                           driving_examples, video_tables: jnp.ndarray,
                           temp: Optional[float] = None) -> jnp.ndarray:
    """[steps, L] rows from precomputed video-side embeddings.

    ``video_tables`` are the embed_video outputs for all L segments
    (precomputed once — same embed-once trick as the main engine).
    """
    @jax.jit
    def run(p, a):
        return module.apply(p, a, method=module.embed_audio)

    a = run(params, jnp.asarray(driving_examples))
    t = temp if temp is not None else module.temp
    return (a @ video_tables.T).astype(jnp.float32) / t
