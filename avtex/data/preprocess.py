"""Device-side clip preprocessing (jit-able).

The reference preprocesses on the host per batch: torchvision resize-224 +
ImageNet normalize for clip encoders, float/255 + RGB->BGR + slowfast
normalize for SlowFast (reference: dataset/dataset.py:43-73), plus the
functional augs in dataset/transform.py:9-312. TPU-first inversion: the host
ships raw uint8 windows once; cast, resize, augment and normalize all run
inside the jitted train/embed step, so HBM traffic is uint8 and the VPU does
the rest.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# ImageNet statistics (reference: train.py:179-188, dataset.py:48-58).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# SlowFast normalization (reference slowfast cfg DATA.MEAN/STD).
SLOWFAST_MEAN = (0.45, 0.45, 0.45)
SLOWFAST_STD = (0.225, 0.225, 0.225)


def _resize_clip(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear resize of [..., H, W, C] to (size, size).

    Identity sizes return the input unchanged — jax.image.resize would
    otherwise still emit the full bilinear gather (two [size, size] weight
    matmuls per image), which dominated the embed pass when videos already
    matched the model resolution.
    """
    if x.shape[-3] == size and x.shape[-2] == size:
        return x
    out_shape = x.shape[:-3] + (size, size, x.shape[-1])
    return jax.image.resize(x, out_shape, method="bilinear")


@functools.partial(jax.jit, static_argnames=("size", "slowfast"))
def preprocess_clip(frames: jnp.ndarray, size: int = 224,
                    slowfast: bool = False) -> jnp.ndarray:
    """uint8 [..., T, H, W, 3] -> normalized float [..., T, size, size, 3]."""
    x = frames.astype(jnp.float32) / 255.0
    x = _resize_clip(x, size)
    mean, std = ((SLOWFAST_MEAN, SLOWFAST_STD) if slowfast
                 else (IMAGENET_MEAN, IMAGENET_STD))
    return (x - jnp.asarray(mean)) / jnp.asarray(std)


@functools.partial(jax.jit, static_argnames=("size", "slowfast"))
def augment_and_preprocess(frames: jnp.ndarray, rng: jax.Array,
                           size: int = 224, slowfast: bool = False,
                           scale_range: Tuple[float, float] = (0.8, 1.2),
                           jitter: float = 0.2) -> jnp.ndarray:
    """Train-time augs, whole-clip-consistent (reference: transform.py,
    dataset_utils.py:11-62): scale jitter + random crop + h-flip +
    brightness/contrast/saturation jitter, then normalize.

    frames: uint8 [B, T, H, W, 3] (aug params drawn per batch element).
    """
    b = frames.shape[0]
    k_scale, k_crop, k_flip, k_bright, k_contrast, k_sat = jax.random.split(rng, 6)
    x = frames.astype(jnp.float32) / 255.0

    # Scale jitter + crop: resize to a jittered size then crop back to
    # `size`. Implemented as a fixed resize to round(size*max_scale) and a
    # random crop window per element (static shapes under jit).
    big = int(round(size * scale_range[1]))
    x = _resize_clip(x, big)
    lim = big - size
    offs = jax.random.randint(k_crop, (b, 2), 0, lim + 1)

    def crop_one(clip, off):
        return jax.lax.dynamic_slice(
            clip, (0, off[0], off[1], 0),
            (clip.shape[0], size, size, clip.shape[3]))

    x = jax.vmap(crop_one)(x, offs)

    # Horizontal flip (p=0.5 per element).
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    x = jnp.where(flip[:, None, None, None, None], x[..., ::-1, :], x)

    # Color jitter: brightness/contrast/saturation factors in [1-j, 1+j].
    def factors(key):
        return 1.0 + jax.random.uniform(key, (b, 1, 1, 1, 1),
                                        minval=-jitter, maxval=jitter)

    x = x * factors(k_bright)
    mean_l = x.mean(axis=(-3, -2, -1), keepdims=True)
    x = (x - mean_l) * factors(k_contrast) + mean_l
    gray = x.mean(axis=-1, keepdims=True)
    x = (x - gray) * factors(k_sat) + gray
    x = jnp.clip(x, 0.0, 1.0)

    mean, std = ((SLOWFAST_MEAN, SLOWFAST_STD) if slowfast
                 else (IMAGENET_MEAN, IMAGENET_STD))
    return (x - jnp.asarray(mean)) / jnp.asarray(std)
