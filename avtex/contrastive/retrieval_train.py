"""Trainer for the VideoForAudio retrieval head.

The reference trains this model in a separate project and loads it via
``--daf_resume`` (reference: validate.py:287-294); avtex includes the
training loop so the "Contrastive" driving-audio mode is self-contained:
InfoNCE where each audio example's positive is its own video segment and
negatives are other segments of the same video.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from avtex.contrastive.infonce import info_nce_from_logits
import numpy as np
import optax

from avtex.contrastive.segments import gather_windows, num_segments
from avtex.data.preprocess import preprocess_clip

from .audio_retrieval import VideoForAudio


def train_video_for_audio(frames: np.ndarray, audio_examples: np.ndarray,
                          window: int, stride: int, *,
                          arch: str = "resnet18", img_size: int = 112,
                          batch_size: int = 8, n_negs: int = 7,
                          epochs: int = 10, lr: float = 1e-3,
                          temp: float = 0.1, seed: int = 0
                          ) -> Tuple[VideoForAudio, dict, List[float]]:
    """Returns (module, params, per-epoch losses)."""
    model = VideoForAudio(arch=arch, temp=temp)
    L = num_segments(len(frames), window, stride, "val")
    windows = gather_windows(frames, window, stride, "val")
    aud_ids = np.minimum(np.arange(L), len(audio_examples) - 1)
    audio = np.asarray(audio_examples)[aud_ids]

    rng_np = np.random.default_rng(seed)
    x0 = preprocess_clip(jnp.asarray(windows[:1]), size=img_size)
    params = jax.jit(model.init)(jax.random.key(seed),
                                 jnp.zeros((1,) + audio.shape[1:]),
                                 x0[:, None])
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, a_batch, v_batch):
        def loss_fn(p):
            x = preprocess_clip(v_batch, size=img_size)
            logits = model.apply(p, a_batch, x)
            return info_nce_from_logits(logits)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history: List[float] = []
    n = 1 + n_negs
    for _ in range(epochs):
        order = rng_np.permutation(L)
        losses = []
        for b0 in range(0, L - batch_size + 1, batch_size):
            ids = order[b0:b0 + batch_size]
            # targets: own segment first, then random negatives
            negs = np.stack([
                rng_np.choice(np.delete(np.arange(L), i), n_negs,
                              replace=False) for i in ids])
            t_ids = np.concatenate([ids[:, None], negs], axis=1)  # [B, n]
            a_batch = jnp.asarray(audio[ids])
            v_batch = jnp.asarray(windows[t_ids])
            params, opt_state, loss = step(params, opt_state, a_batch,
                                           v_batch)
            losses.append(float(loss))
        history.append(float(np.mean(losses)) if losses else float("nan"))
    return model, params, history
