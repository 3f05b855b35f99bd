"""Embed-once segment tables — the core TPU win.

The reference re-encodes EVERY segment of the source video at EVERY
synthesis step (reference: validate.py:441-522, models.py:354-412; cost
analysis in SURVEY.md §3.2/§6). Embeddings never change during synthesis,
so here both towers embed all L segments exactly once, in fixed-size
batches (static shapes -> one compiled kernel, padded tail), and synthesis
becomes matmuls. The batched embed is the unit the parallel layer shards
over the segment axis (avtex/parallel/).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avtex.contrastive.model import ContrastiveTextures
from avtex.data.preprocess import preprocess_clip
from avtex.nn.slowfast import slowfast_pathways


@functools.lru_cache(maxsize=32)
def _embed_batch_fn(model: ContrastiveTextures, size: int, slowfast: bool,
                    tower: str):
    @jax.jit
    def run(params, frames_u8, audio):
        x = preprocess_clip(frames_u8, size=size, slowfast=slowfast)
        if slowfast:
            x = slowfast_pathways(x)
        return model.apply(params, x, audio, tower=tower, method=model.embed)
    return run


@functools.lru_cache(maxsize=32)
def _embed_from_video_fn(model: ContrastiveTextures, size: int,
                         slowfast: bool, tower: str, window: int):
    """Embed a batch of segments by gathering windows ON DEVICE from a
    resident frame buffer — overlapping windows (stride < window) mean the
    host-side windowed copy is ~W/S× larger than the video itself; keeping
    the video on device transfers each frame once.

    lru_cache: flax modules are frozen dataclasses (hashable), so repeated
    calls reuse the compiled step instead of re-tracing per invocation.
    """
    @jax.jit
    def run(params, video_u8, starts, audio):
        idx = starts[:, None] + jnp.arange(window)[None, :]   # [B, W]
        frames = video_u8[idx]                                # [B, W, H, W, 3]
        x = preprocess_clip(frames, size=size, slowfast=slowfast)
        if slowfast:
            x = slowfast_pathways(x)
        return model.apply(params, x, audio, tower=tower, method=model.embed)
    return run


@functools.lru_cache(maxsize=32)
def _embed_table_fn(model: ContrastiveTextures, size: int, slowfast: bool,
                    tower: str, window: int, with_audio: bool):
    """Whole embedding table in ONE jitted program: lax.map over fixed-size
    batches of on-device window gathers. A per-batch Python loop costs one
    host<->device round trip per dispatch (dozens of RTTs per table, which
    dominated wall-clock on remote-attached TPUs); here the loop is inside
    the program."""
    @jax.jit
    def run(params, video_u8, starts, audio):
        def body(args):
            st, aud = args
            idx = st[:, None] + jnp.arange(window)[None, :]
            frames = video_u8[idx]
            x = preprocess_clip(frames, size=size, slowfast=slowfast)
            if slowfast:
                x = slowfast_pathways(x)
            return model.apply(params, x, aud, tower=tower,
                               method=model.embed)
        out = jax.lax.map(body, (starts, audio))   # [n_b, batch, D]
        return out.reshape(-1, out.shape[-1])
    return run


def embed_segments_from_video(model: ContrastiveTextures, params,
                              video_u8, window: int, stride: int,
                              num_segments: int,
                              audio_examples: Optional[np.ndarray] = None,
                              *, tower: str = "target", img_size: int = 224,
                              batch_size: int = 32,
                              single_dispatch: bool = False) -> jnp.ndarray:
    """[L, D] table from a device-resident video buffer (bandwidth-optimal
    variant of embed_segments; same numerics).

    Default is an async per-batch dispatch loop — batches overlap on device
    and wall-clock beats the fused variant. ``single_dispatch=True`` runs
    the whole table as one lax.map program (fewer host round trips; useful
    when dispatch latency dominates, e.g. very high-latency attachments).
    """
    slowfast = model.arch == "slowfast"
    video_u8 = jnp.asarray(video_u8)  # one transfer, reused every batch
    L = num_segments
    audio = None
    with_audio = audio_examples is not None and model.model_type == 2
    if with_audio:
        ids = np.minimum(np.arange(L), len(audio_examples) - 1)
        audio = np.asarray(audio_examples)[ids]

    starts_all = np.arange(L, dtype=np.int32) * stride
    pad = (-L) % batch_size
    if pad:
        starts_all = np.concatenate(
            [starts_all, np.repeat(starts_all[-1:], pad)])
        if with_audio:
            audio = np.concatenate([audio, np.repeat(audio[-1:], pad, 0)])
    n_b = len(starts_all) // batch_size

    if single_dispatch:
        starts = jnp.asarray(starts_all.reshape(n_b, batch_size))
        a_in = (jnp.asarray(
            audio.reshape((n_b, batch_size) + audio.shape[1:]))
            if with_audio else None)
        run = _embed_table_fn(model, img_size, slowfast, tower, window,
                              with_audio)
        return run(params, video_u8, starts, a_in)[:L]

    run = _embed_from_video_fn(model, img_size, slowfast, tower, window)
    out = []
    for b in range(n_b):
        starts = jnp.asarray(starts_all[b * batch_size:(b + 1) * batch_size])
        a_chunk = (jnp.asarray(audio[b * batch_size:(b + 1) * batch_size])
                   if with_audio else None)
        out.append(run(params, video_u8, starts, a_chunk))
    return jnp.concatenate(out, axis=0)[:L]


@functools.lru_cache(maxsize=32)
def _embed_both_fn(model: ContrastiveTextures, size: int, slowfast: bool,
                   window: int):
    """One jitted step embedding a batch through BOTH towers: the window
    gather + preprocessing (the bandwidth-heavy part) is shared, and both
    tower graphs land in one dispatch (one host->device round trip instead
    of two — the remote-pool RTT is ~30 ms each)."""
    @jax.jit
    def run(params, video_u8, starts, audio):
        idx = starts[:, None] + jnp.arange(window)[None, :]
        frames = video_u8[idx]
        x = preprocess_clip(frames, size=size, slowfast=slowfast)
        if slowfast:
            x = slowfast_pathways(x)
        q = model.apply(params, x, audio, tower="query", method=model.embed)
        t = model.apply(params, x, audio, tower="target",
                        method=model.embed)
        return q, t
    return run


def embed_segments(model: ContrastiveTextures, params,
                   windows_u8: np.ndarray,
                   audio_examples: Optional[np.ndarray] = None,
                   *, tower: str = "target", img_size: int = 224,
                   batch_size: int = 32) -> jnp.ndarray:
    """Embed all segment windows with one tower.

    Args:
      windows_u8: [L, W, H, W_px, 3] uint8 segment windows
        (from contrastive.segments.gather_windows).
      audio_examples: [L', mel_frames, 64] per-segment examples; ids past
        the last example are clipped (reference: validate.py:345).

    Returns:
      [L, D] embedding table (L2-normalized by the embedder).
    """
    from avtex.utils.batching import batched_apply
    slowfast = model.arch == "slowfast"
    run = _embed_batch_fn(model, img_size, slowfast, tower)
    L = len(windows_u8)
    if audio_examples is not None and model.model_type == 2:
        ids = np.minimum(np.arange(L), len(audio_examples) - 1)
        audio = np.asarray(audio_examples)[ids]
        return batched_apply(lambda f, a: run(params, f, a),
                             windows_u8, audio, batch_size=batch_size)
    return batched_apply(lambda f: run(params, f, None),
                         windows_u8, batch_size=batch_size)


def precompute_embeddings(model: ContrastiveTextures, params,
                          windows_u8: np.ndarray,
                          audio_examples: Optional[np.ndarray] = None,
                          *, img_size: int = 224, batch_size: int = 32
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Q, T) tables: all segments through both towers, once each."""
    q = embed_segments(model, params, windows_u8, audio_examples,
                       tower="query", img_size=img_size,
                       batch_size=batch_size)
    t = embed_segments(model, params, windows_u8, audio_examples,
                       tower="target", img_size=img_size,
                       batch_size=batch_size)
    return q, t


def precompute_embeddings_from_video(model: ContrastiveTextures, params,
                                     video_u8, window: int, stride: int,
                                     num_segments: int,
                                     audio_examples=None, *,
                                     img_size: int = 224,
                                     batch_size: int = 32
                                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Q, T) tables via the device-resident-video path.

    Both towers run inside each batch's single dispatch (shared window
    gather + preprocess; one RTT per batch, not two — see _embed_both_fn).
    """
    video_dev = jnp.asarray(video_u8)  # single H2D transfer for both towers
    L = num_segments
    with_audio = audio_examples is not None and model.model_type == 2
    audio = None
    if with_audio:
        ids = np.minimum(np.arange(L), len(audio_examples) - 1)
        audio = np.asarray(audio_examples)[ids]

    # Shrink the batch to the smallest multiple of 8 (sublane quantum)
    # covering L in the same number of dispatches: with L=297 and bs=128,
    # 3x128 wastes 23% of slots on padding, 3x104 only 5%.
    n_b = -(-L // batch_size)
    batch_size = min(batch_size, ((-(-L // n_b) + 7) // 8) * 8)

    starts_all = np.arange(L, dtype=np.int32) * stride
    pad = (-L) % batch_size
    if pad:
        starts_all = np.concatenate(
            [starts_all, np.repeat(starts_all[-1:], pad)])
        if with_audio:
            audio = np.concatenate([audio, np.repeat(audio[-1:], pad, 0)])
    n_b = len(starts_all) // batch_size

    run = _embed_both_fn(model, img_size, model.arch == "slowfast", window)
    qs, ts = [], []
    for b in range(n_b):
        starts = jnp.asarray(starts_all[b * batch_size:(b + 1) * batch_size])
        a_chunk = (jnp.asarray(audio[b * batch_size:(b + 1) * batch_size])
                   if with_audio else None)
        q, t = run(params, video_dev, starts, a_chunk)
        qs.append(q)
        ts.append(t)
    return (jnp.concatenate(qs, axis=0)[:L],
            jnp.concatenate(ts, axis=0)[:L])


def vggish_audio_features(vggish_module, vggish_params,
                          examples: np.ndarray,
                          batch_size: int = 64) -> jnp.ndarray:
    """Raw VGGish conv features for audio examples ([N, feat]).

    Used for the driving-audio "VGG" scoring branch
    (reference: validate.py:260-296, models.py:424-439).
    """
    from avtex.utils.batching import batched_apply

    run = _vggish_fn(vggish_module)
    return batched_apply(lambda x: run(vggish_params, x), np.asarray(examples),
                         batch_size=batch_size)


@functools.lru_cache(maxsize=8)
def _vggish_fn(vggish_module):
    """Jitted VGGish apply, cached per module (fresh closures re-trace
    per call — CLAUDE.md cached-closure rule; this runs per driving-audio
    request in a warm TextureServer)."""
    @jax.jit
    def run(p, x):
        return vggish_module.apply(p, x)

    return run
