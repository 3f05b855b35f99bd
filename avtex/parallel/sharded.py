"""Sharded embedding pass + distributed train step.

The embed-once pass shards the *segment* axis: each device embeds L/n
segments, the [L, D] table materializes via XLA's all-gather — exactly the
parallel structure the reference hand-builds with per-GPU chunk dealing
(reference: validate.py:441-493), minus all the bookkeeping.

Training shards the batch over 'data' (grads all-reduced by XLA) and the
audio path's widest kernels over 'model' (tensor parallelism): the shared
VGGish 512-channel convs in ContrastiveTextures, and the 12288x4096 /
4096x4096 AudioMLP matmuls in VideoForAudio, column/row-split so each
device holds 1/tp of them.
"""

from __future__ import annotations

import functools
import re
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avtex.data.preprocess import preprocess_clip
from avtex.nn.slowfast import slowfast_pathways

# (param-path regex, ndim) -> PartitionSpec. Megatron-style column-then-row
# splits: the audio MLP's wide Dense kernels (VideoForAudio), and the shared
# VGGish's 512-channel conv pair in ContrastiveTextures (Conv_4 output
# channels column-split, Conv_5 input channels row-split — XLA inserts the
# psum). Everything else replicated.
_TP_RULES = (
    (re.compile(r"audio_mlp.*Dense_0.*kernel"), P(None, "model")),
    (re.compile(r"audio_mlp.*Dense_0.*bias"), P("model")),
    (re.compile(r"audio_mlp.*Dense_1.*kernel"), P("model", None)),
    (re.compile(r"audio_encoder.*Conv_4.*kernel"), P(None, None, None, "model")),
    (re.compile(r"audio_encoder.*Conv_4.*bias"), P("model")),
    (re.compile(r"audio_encoder.*Conv_5.*kernel"), P(None, None, "model", None)),
)


def param_shardings(params, mesh: Mesh):
    """Sharding pytree for params: TP rules on the audio MLP, rest replicated."""
    def one(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        for pattern, spec in _TP_RULES:
            if pattern.search(name) and len(spec) <= leaf.ndim:
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(one, params)


def sharded_embed_segments(model, params, mesh: Mesh,
                           windows_u8: np.ndarray,
                           audio_examples: Optional[np.ndarray] = None,
                           *, tower: str = "target", img_size: int = 224
                           ) -> jnp.ndarray:
    """Embed all segments with the segment axis sharded over 'data'.

    Pads L to a multiple of the data-axis size; returns the unpadded
    [L, D] table (replicated).
    """
    n_data = mesh.shape["data"]
    L = len(windows_u8)
    pad = (-L) % n_data
    if pad:
        windows_u8 = np.concatenate(
            [windows_u8, np.repeat(windows_u8[-1:], pad, 0)])
    audio = None
    if audio_examples is not None and model.model_type == 2:
        ids = np.minimum(np.arange(L + pad), len(audio_examples) - 1)
        audio = np.asarray(audio_examples)[ids]

    params = jax.device_put(params, param_shardings(params, mesh))
    run = _embed_segments_fn(model, mesh, img_size, tower,
                             audio is not None)
    table = run(params, jnp.asarray(windows_u8),
                None if audio is None else jnp.asarray(audio))
    return table[:L]


@functools.lru_cache(maxsize=32)
def _embed_segments_fn(model, mesh, img_size, tower, with_audio):
    """Jitted sharded embed over pre-gathered windows, cached per
    (model, mesh, geometry) — fresh closures re-trace the full encoder
    per call (CLAUDE.md cached-closure rule). Params arrive COMMITTED
    (device_put with param_shardings at the call site), so the jit
    infers their shardings instead of pinning a params-tree-shaped
    in_shardings that would defeat the cache."""
    slowfast = model.arch == "slowfast"
    seg_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    @functools.partial(jax.jit,
                       in_shardings=(None, seg_sharding,
                                     seg_sharding if with_audio else None),
                       out_shardings=rep)
    def run(p, frames, aud):
        x = preprocess_clip(frames, size=img_size, slowfast=slowfast)
        if slowfast:
            x = slowfast_pathways(x)
        return model.apply(p, x, aud, tower=tower, method=model.embed)

    return run


def sharded_embed_from_video(model, params, mesh: Mesh, video_u8,
                             window: int, stride: int, num_segments: int,
                             audio_examples: Optional[np.ndarray] = None,
                             *, tower: str = "target", img_size: int = 224
                             ) -> jnp.ndarray:
    """Segment-sharded embed from a device-resident video buffer.

    The video replicates once to every device; segment start indices shard
    over 'data', so each device gathers and embeds L/n segments and XLA
    all-gathers the [L, D] table. This is the bandwidth-optimal multi-chip
    analogue of embeddings.embed_segments_from_video.
    """
    n_data = mesh.shape["data"]
    L = num_segments
    pad = (-L) % n_data
    starts = np.arange(L + pad, dtype=np.int32) * stride
    starts[L:] = (L - 1) * stride
    audio = None
    with_audio = audio_examples is not None and model.model_type == 2
    if with_audio:
        ids = np.minimum(np.arange(L + pad), len(audio_examples) - 1)
        audio = np.asarray(audio_examples)[ids]

    params = jax.device_put(params, param_shardings(params, mesh))
    run = _embed_from_video_fn(model, mesh, img_size, tower, window,
                               with_audio)
    table = run(params, jnp.asarray(video_u8), jnp.asarray(starts),
                None if not with_audio else jnp.asarray(audio))
    return table[:L]


@functools.lru_cache(maxsize=32)
def _embed_from_video_fn(model, mesh, img_size, tower, window, with_audio):
    """Jitted sharded embed with on-device window gather, cached per
    (model, mesh, geometry) — see _embed_segments_fn for the contract."""
    slowfast = model.arch == "slowfast"
    seg = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(None, rep, seg, seg if with_audio else None),
        out_shardings=rep)
    def run(p, video, st, aud):
        idx = st[:, None] + jnp.arange(window)[None, :]
        frames = video[idx]
        x = preprocess_clip(frames, size=img_size, slowfast=slowfast)
        if slowfast:
            x = slowfast_pathways(x)
        return model.apply(p, x, aud, tower=tower, method=model.embed)

    return run


def make_sharded_train_step(model, mesh: Mesh, size: int,
                            slowfast: bool) -> Callable:
    """DP+TP version of train.loop.make_train_step: batch sharded over
    'data', grads reduced by XLA. The returned step PLACES state.params
    with param_shardings each call (a no-op once committed), so the
    documented TP split happens without the caller pre-placing params —
    previously the rules were silently skipped for anyone who didn't."""
    from avtex.train.loop import make_train_step

    base_step = make_train_step(model, size, slowfast)
    batch_sharding = NamedSharding(mesh, P("data"))

    def place(state, batch, rng):
        state = state.replace(
            params=jax.device_put(state.params,
                                  param_shardings(state.params, mesh)))
        batch = {k: jax.device_put(jnp.asarray(v), batch_sharding)
                 for k, v in batch.items()}
        return base_step(state, batch, rng)

    return place
