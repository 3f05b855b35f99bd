"""InfoNCE loss on the MXU.

The reference computes cosine-similarity logits between one query embedding
and (1 positive + n negatives) target embeddings, divides by temperature and
takes CrossEntropy against all-zero labels (positive at column 0)
(reference: models/models.py:412-417, train.py:129-132).

Here the whole thing is one batched matmul + log-softmax; everything is
jit/grad-friendly and runs in bfloat16 with fp32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cosine_logits(q: jnp.ndarray, t: jnp.ndarray, temp: float) -> jnp.ndarray:
    """Cosine-similarity logits.

    Args:
      q: [B, D] query embeddings (unnormalized).
      t: [B, N, D] target embeddings (positive at index 0 along N).
      temp: softmax temperature.

    Returns:
      [B, N] logits = <q/|q|, t/|t|> / temp, accumulated in fp32.
    """
    qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    tn = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)
    logits = jnp.einsum("bd,bnd->bn", qn, tn,
                        preferred_element_type=jnp.float32)
    return logits / temp


def info_nce_from_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """Mean InfoNCE loss on precomputed [B, N] logits, positive at column 0
    (CrossEntropy against all-zero labels, reference: train.py:129-132)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(logp[:, 0])


def info_nce_loss(q: jnp.ndarray, t: jnp.ndarray, temp: float) -> jnp.ndarray:
    """Mean InfoNCE loss with the positive at column 0."""
    return info_nce_from_logits(cosine_logits(q, t, temp))
