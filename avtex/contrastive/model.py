"""Contrastive segment-successor model (flax).

Re-expression of the reference's ``ContrastivePredictionTemporal``
(reference: models/models.py:233-467) as pure embedding functions:

- ``SegmentEmbedder``: window frames (+ optional audio example) -> one
  L2-normalized embedding. Video features are the encoder's raw pooled
  features; audio features are the raw flattened VGGish conv features —
  the reference defines 4096-4096-128 MLPs (``q_a_mlp``/``t_a_mlp``,
  models.py:267-284) but its forward never applies them: it concatenates
  the raw VGGish features directly, *then* normalizes (models.py:335-351,
  411-417). We reproduce that behavior (and ship the MLP as ``AudioMLP``
  for VideoForAudio, which does use one).
- ``ContrastiveTextures``: a query embedder and a target embedder with
  separate video-encoder parameters (the reference builds two encoder
  copies, main.py:328-334) but ONE audio encoder shared across both towers
  (models.py:265,276: ``q_a_encoder`` and ``t_a_encoder`` are the same
  instance). ``train_logits`` computes the [B, 1+negs] InfoNCE logit rows;
  embedding tables for synthesis come from ``embed``.

The reference's inference-time chunk re-slicing (models.py:354-383) does not
exist here: synthesis precomputes both embedding tables once and scores with
one matmul per step (SURVEY.md §3.2 note) — that machinery lives in
avtex/synth/.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from avtex.nn.encoders import build_encoder


class AudioMLP(nn.Module):
    """VGGish-features -> 128-d audio embedding (reference: models.py:267-284)."""

    out_dim: int = 128
    hidden: int = 4096
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.out_dim, dtype=self.dtype)(x))
        return x.astype(jnp.float32)


class SegmentEmbedder(nn.Module):
    """One segment (frames + optional audio) -> one normalized embedding.

    ``audio_encoder`` is injected by the parent so both towers share one
    instance (reference: models.py:265,276 assign the same
    ``audio_enc_model`` to ``q_a_encoder`` and ``t_a_encoder``)."""

    arch: str = "resnet18"
    model_type: int = 1           # 1: video only; 2: video + audio
    audio_encoder: Optional[nn.Module] = None
    dtype: Any = jnp.bfloat16
    norm: str = "group"           # "affine" = folded frozen-BN inference
    remat: bool = False           # checkpoint encoder blocks (train memory)

    def setup(self):
        module, feat_dim, kind = build_encoder(self.arch, dtype=self.dtype,
                                               norm=self.norm,
                                               remat=self.remat)
        self.video_encoder = module
        self.input_kind = kind
        self.video_feat_dim = feat_dim
        if self.model_type == 2 and self.audio_encoder is None:
            raise ValueError("model_type=2 requires an audio_encoder")

    def __call__(self, frames, audio_example: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        """frames: [B, T, H, W, 3] (or (slow, fast) tuple for slowfast);
        audio_example: [B, mel_frames, bands] when model_type == 2."""
        if self.input_kind == "slowfast":
            slow, fast = frames
            v = self.video_encoder(slow, fast)
        else:
            v = self.video_encoder(frames)
        if self.model_type == 2:
            if audio_example is None:
                raise ValueError("model_type=2 requires audio examples")
            # Raw flattened VGGish conv features, no MLP — the reference's
            # forward concatenates q_a/t_a directly (models.py:341-351).
            a = self.audio_encoder(audio_example)
            v = jnp.concatenate([v, a], axis=-1)
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)


class ContrastiveTextures(nn.Module):
    """Query + target embedders with separate parameters."""

    arch: str = "resnet18"
    model_type: int = 1
    temp: float = 0.1
    dtype: Any = jnp.bfloat16
    norm: str = "group"           # "affine" = folded frozen-BN inference
    remat: bool = False           # checkpoint encoder blocks (train memory)

    def setup(self):
        audio_enc = None
        if self.model_type == 2:
            from avtex.nn.vggish import VGGish
            # One shared VGGish for both towers (models.py:265,276); params
            # live under this module's 'audio_encoder' scope.
            self.audio_encoder = VGGish(dtype=self.dtype)
            audio_enc = self.audio_encoder
        self.q_embedder = SegmentEmbedder(self.arch, self.model_type,
                                          audio_encoder=audio_enc,
                                          dtype=self.dtype, norm=self.norm,
                                          remat=self.remat)
        self.t_embedder = SegmentEmbedder(self.arch, self.model_type,
                                          audio_encoder=audio_enc,
                                          dtype=self.dtype, norm=self.norm,
                                          remat=self.remat)

    def _flatten_targets(self, t_frames):
        """[B, N, ...] -> ([B*N, ...], B, N) for batched encoding."""
        if isinstance(t_frames, tuple):
            b, n = t_frames[0].shape[:2]
            flat = tuple(p.reshape((-1,) + p.shape[2:]) for p in t_frames)
        else:
            b, n = t_frames.shape[:2]
            flat = t_frames.reshape((-1,) + t_frames.shape[2:])
        return flat, b, n

    def __call__(self, q_frames, t_frames, q_audio=None, t_audio=None
                 ) -> jnp.ndarray:
        """Training forward: [B, 1+negs] logits, positive at column 0
        (reference: models.py:307-417)."""
        q = self.q_embedder(q_frames, q_audio)                # [B, D]
        flat, b, n = self._flatten_targets(t_frames)
        t_audio_flat = (t_audio.reshape((-1,) + t_audio.shape[2:])
                        if t_audio is not None else None)
        t = self.t_embedder(flat, t_audio_flat).reshape(b, n, -1)
        logits = jnp.einsum("bd,bnd->bn", q, t,
                            preferred_element_type=jnp.float32)
        return logits / self.temp

    def embed(self, frames, audio=None, *, tower: str = "target"
              ) -> jnp.ndarray:
        """Embed a batch of segments with one tower (for table precompute)."""
        emb = self.t_embedder if tower == "target" else self.q_embedder
        return emb(frames, audio)
