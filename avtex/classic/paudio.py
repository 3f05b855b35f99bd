"""P_audio: driving-audio transition distribution for the classic baseline.

Parity with reference baselines/classic_video_textures/computePaudio.py:6-18:
cosine similarity of one driving-audio embedding against every source
segment's audio embedding, normalized by the RAW sum (+1e-6) — the
reference applies no shift, so the "distribution" can carry negative
entries and need not sum to exactly 1 when cosines are negative; that
is its contract and callers weight rows with it as-is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def compute_paudio(driving_emb: jnp.ndarray,
                   segment_embs: jnp.ndarray) -> jnp.ndarray:
    """[N] per-segment weights (reference: p_audio = cos / (cos.sum()+1e-6)).

    Args:
      driving_emb: [D] (or [1, D]) driving-audio feature vector.
      segment_embs: [N, D] per-segment audio features.
    """
    d = driving_emb.reshape(-1)
    d = d / (jnp.linalg.norm(d) + 1e-12)
    s = segment_embs.reshape(segment_embs.shape[0], -1)
    s = s / (jnp.linalg.norm(s, axis=1, keepdims=True) + 1e-12)
    sims = s @ d                       # [-1, 1]
    return sims / (jnp.sum(sims) + 1e-6)
