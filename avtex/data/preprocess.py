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

# Live normalization constants of the reference's non-SlowFast path
# (reference: dataset/dataset.py:48-58 and validate.py:88-93 both use
# mean=[0.4345, 0.4051, 0.3775], std=[0.2768, 0.2713, 0.2737]).
CLIP_MEAN = (0.4345, 0.4051, 0.3775)
CLIP_STD = (0.2768, 0.2713, 0.2737)
# ImageNet statistics — used only by the reference's scale_jitter_crop_norm
# composite (dataset/dataset_utils.py:11-62), which its main paths never
# call; kept for the eval uniform-crop composite below.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# SlowFast normalization (reference slowfast cfg DATA.MEAN/STD).
SLOWFAST_MEAN = (0.45, 0.45, 0.45)
SLOWFAST_STD = (0.225, 0.225, 0.225)


def _resize_clip(x: jnp.ndarray, size: int,
                 antialias: bool = True) -> jnp.ndarray:
    """Bilinear resize of [..., H, W, C] to (size, size).

    Identity sizes return the input unchanged — jax.image.resize would
    otherwise still emit the full bilinear gather (two [size, size] weight
    matmuls per image), which dominated the embed pass when videos already
    matched the model resolution.

    antialias=True matches the reference's live PIL Resize (validate.py:88);
    antialias=False matches torch F.interpolate(align_corners=False) used by
    its scale_jitter_crop_norm composite (dataset_utils.py:40-42) — both use
    half-pixel source centers.
    """
    if x.shape[-3] == size and x.shape[-2] == size:
        return x
    out_shape = x.shape[:-3] + (size, size, x.shape[-1])
    return jax.image.resize(x, out_shape, method="bilinear",
                            antialias=antialias)


@functools.partial(jax.jit, static_argnames=("size", "slowfast"))
def preprocess_clip(frames: jnp.ndarray, size: int = 224,
                    slowfast: bool = False) -> jnp.ndarray:
    """uint8 RGB [..., T, H, W, 3] -> normalized float [..., T, size, size, 3].

    Non-SlowFast: square resize + the reference's live normalize constants
    (dataset.py:43-58). SlowFast: float/255 + RGB->BGR channel swap
    (dataset.py:70-73) + slowfast DATA.MEAN/STD normalize (the reference
    delegates that to slowfast's process_cv2_inputs).
    """
    x = frames.astype(jnp.float32) / 255.0
    x = _resize_clip(x, size)
    if slowfast:
        x = x[..., ::-1]  # RGB -> BGR (reference: dataset.py:70-73)
        mean, std = SLOWFAST_MEAN, SLOWFAST_STD
    else:
        mean, std = CLIP_MEAN, CLIP_STD
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

    if slowfast:
        x = x[..., ::-1]  # RGB -> BGR, matching preprocess_clip
        mean, std = SLOWFAST_MEAN, SLOWFAST_STD
    else:
        mean, std = CLIP_MEAN, CLIP_STD
    return (x - jnp.asarray(mean)) / jnp.asarray(std)


def uniform_crop(x: jnp.ndarray, size: int, spatial_idx: int = 1
                 ) -> jnp.ndarray:
    """Uniform spatial crop of [..., H, W, C] (reference: dataset/
    transform.py:99-133 ``uniform_crop``). spatial_idx 0/1/2 = left/center/
    right (width-major) or top/center/bottom (height-major); offsets use the
    reference's ceil((dim-size)/2) center rule.
    """
    h, w = x.shape[-3], x.shape[-2]
    y_off = -(-(h - size) // 2)
    x_off = -(-(w - size) // 2)
    if h > w:
        y_off = {0: 0, 1: y_off, 2: h - size}[spatial_idx]
    else:
        x_off = {0: 0, 1: x_off, 2: w - size}[spatial_idx]
    return x[..., y_off:y_off + size, x_off:x_off + size, :]


@functools.partial(jax.jit,
                   static_argnames=("scale_size", "crop_size", "spatial_idx"))
def scale_uniform_crop_norm(frames: jnp.ndarray, scale_size: int = 240,
                            crop_size: int = 224, spatial_idx: int = 1
                            ) -> jnp.ndarray:
    """Eval-split composite: scale to (scale_size, scale_size) then uniform
    crop to crop_size and ImageNet-normalize.

    This is the val branch of the reference's ``scale_jitter_crop_norm``
    (dataset/dataset_utils.py:36-62). Note the reference never calls that
    function from its live paths (dataset.py/validate.py use the plain
    resize in preprocess_clip above), and its val call site passes
    ``uniform_crop(frames, crop_size)`` without the required spatial_idx —
    a TypeError as shipped. We pin spatial_idx=1 (center), the only
    behavior consistent with "Uniform crop" eval semantics.
    """
    x = frames.astype(jnp.float32) / 255.0
    x = _resize_clip(x, scale_size, antialias=False)
    x = uniform_crop(x, crop_size, spatial_idx)
    return ((x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD))
