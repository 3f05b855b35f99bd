"""ClassicTemporal head: embedding-space L2 distances to every target.

Port of the reference's ``ClassicTemporal`` (models/models.py:136-230,
exported by models/__init__.py:7): embed the query segment and each target
segment (video encoder + optional audio features), L2-normalize, and score
each target by Euclidean distance to the query — the "classic" non-learned
scoring head over learned embeddings. The reference never instantiates it
from main.py/validate.py (dead in its live path) and the shipped forward
has bugs it never hit: ``output`` is hardcoded to 512 features
(models.py:210) regardless of fc_dim, the appended query slot
(models.py:182: ``t_f = cat(t_f, q_f)``) is never filled so its distance
is always 0, and the inner minibatch loop writes the same embeddings for
every batch row (models.py:213-226 ignores ``i`` on the ``t_f`` side).

avtex keeps the meaningful contract — [B, N+1] distances with the query
appended as the final target (self-distance 0) — computed from normalized
embeddings in one fused expression: for unit vectors,
``||q - t|| = sqrt(2 - 2 q.t)``, so the whole head is a batched matmul on
the MXU instead of the reference's per-row device loop.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .model import SegmentEmbedder


def classic_temporal_distances(q: jnp.ndarray, t: jnp.ndarray
                               ) -> jnp.ndarray:
    """[B, D] normalized queries + [B, N, D] normalized targets ->
    [B, N+1] L2 distances, final column = query-vs-itself (0).

    Equivalent to the reference's ``torch.norm(q - emb, dim=2)``
    (models.py:228) with the query appended as target N (models.py:182).
    """
    sim = jnp.einsum("bd,bnd->bn", q, t,
                     preferred_element_type=jnp.float32)
    d = jnp.sqrt(jnp.maximum(2.0 - 2.0 * sim, 0.0))
    return jnp.concatenate([d, jnp.zeros_like(d[:, :1])], axis=-1)


class ClassicTemporal(nn.Module):
    """Query/target embedders + distance scoring (reference
    models.py:136-230). One shared tower embeds both sides — the reference
    passes the SAME ``video_enc_model`` for queries and targets
    (models.py:146: a single ``v_encoder``)."""

    arch: str = "resnet18"
    model_type: int = 1
    audio_encoder: Optional[nn.Module] = None
    dtype: Any = jnp.bfloat16
    norm: str = "group"

    def setup(self):
        self.embedder = SegmentEmbedder(self.arch, self.model_type,
                                        audio_encoder=self.audio_encoder,
                                        dtype=self.dtype, norm=self.norm)

    def __call__(self, q_frames, t_frames, q_audio=None, t_audio=None
                 ) -> jnp.ndarray:
        """q_frames [B, T, H, W, 3], t_frames [B, N, T, H, W, 3] ->
        [B, N+1] distances (column N = appended query, always 0)."""
        q = self.embedder(q_frames, q_audio)
        if isinstance(t_frames, tuple):
            b, n = t_frames[0].shape[:2]
            flat = tuple(p.reshape((-1,) + p.shape[2:]) for p in t_frames)
        else:
            b, n = t_frames.shape[:2]
            flat = t_frames.reshape((-1,) + t_frames.shape[2:])
        t_audio_flat = (t_audio.reshape((-1,) + t_audio.shape[2:])
                        if t_audio is not None else None)
        t = self.embedder(flat, t_audio_flat).reshape(b, n, -1)
        return classic_temporal_distances(q, t)
