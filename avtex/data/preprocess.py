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


def _jittered_scale_crop(x: jnp.ndarray, k_scale: jax.Array,
                         k_crop: jax.Array, size: int,
                         min_size: int, max_size: int) -> jnp.ndarray:
    """Short-side scale jitter + random crop with the reference's EXACT
    distribution, fused into one gather per element.

    Reference semantics composed (transform.py:9-51 then :54-77): sample
    short-side target s = round(uniform(min, max)), resize so the short
    side is s (long side floor-scaled, bilinear align_corners=False, no
    antialias), then crop at integer offsets drawn from randint(0, d-size)
    (EXCLUSIVE high — the reference's crop never touches the last
    position; quirk preserved). TPU-first: instead of materializing the
    resized clip, the resize∘crop composition is a single
    ``jax.image.scale_and_translate`` with traced scale (nh/H, nw/W) and
    translation (-oy, -ox) — verified equal to torch resize-then-crop to
    fp32 rounding, including border crops. Static output shape; the
    sampled size only enters as a traced float.
    """
    b, _, h, w = x.shape[:4]
    s = jnp.round(jax.random.uniform(
        k_scale, (b,), minval=float(min_size), maxval=float(max_size)))
    # short-side rule; h, w are static so the branch resolves at trace time
    if w < h:
        nw, nh = s, jnp.floor(h / w * s)
    elif h < w:
        nh, nw = s, jnp.floor(w / h * s)
    else:
        nh = nw = s
    u = jax.random.uniform(k_crop, (b, 2))
    lim_y, lim_x = nh - size, nw - size
    oy = jnp.where(lim_y > 0, jnp.floor(u[:, 0] * lim_y), 0.0)
    ox = jnp.where(lim_x > 0, jnp.floor(u[:, 1] * lim_x), 0.0)

    def one(clip, nh1, nw1, oy1, ox1):
        return jax.image.scale_and_translate(
            clip, (clip.shape[0], size, size, clip.shape[3]), (1, 2),
            jnp.stack([nh1 / h, nw1 / w]), jnp.stack([-oy1, -ox1]),
            "bilinear", antialias=False)

    return jax.vmap(one)(x, nh, nw, oy, ox)


@functools.partial(jax.jit, static_argnames=("size", "slowfast"))
def augment_and_preprocess(frames: jnp.ndarray, rng: jax.Array,
                           size: int = 224, slowfast: bool = False,
                           scale_range: Tuple[float, float] = (0.8, 1.2),
                           jitter: float = 0.2) -> jnp.ndarray:
    """Train-time augs, whole-clip-consistent (reference: transform.py,
    dataset_utils.py:11-62): short-side scale jitter + random crop (the
    reference's exact distribution, fused — see _jittered_scale_crop) +
    h-flip + brightness/contrast/saturation jitter, then normalize.

    frames: uint8 [B, T, H, W, 3] (aug params drawn per batch element).
    scale_range maps to short-side targets [round(size*lo), round(size*hi)]
    clamped so the crop always fits (short side >= size).
    """
    b = frames.shape[0]
    k_scale, k_crop, k_flip, k_bright, k_contrast, k_sat = jax.random.split(rng, 6)
    x = frames.astype(jnp.float32) / 255.0

    min_size = max(size, int(round(size * scale_range[0])))
    max_size = max(min_size + 1, int(round(size * scale_range[1])))
    x = _jittered_scale_crop(x, k_scale, k_crop, size, min_size, max_size)

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


def random_short_side_scale_jitter(frames: jnp.ndarray, min_size: int,
                                   max_size: int, rng=None,
                                   inverse_uniform_sampling: bool = False
                                   ) -> jnp.ndarray:
    """Short-side scale jitter, reference-exact (transform.py:9-51), NHWC.

    Samples a short-side target ``round(uniform(min, max))`` (or the
    reciprocal-uniform variant), returns the frames unchanged when the
    short side already matches, else resizes so the short side is the
    target and the long side is ``floor(ratio * target)`` — bilinear
    align_corners=False, no antialias (torch F.interpolate semantics).

    ``rng`` needs ``.uniform``; pass the legacy ``np.random`` module (the
    reference's global stream) for bit-identical draws — the default.
    Host-side by design (output shape is data-dependent); the jitted
    training path uses the fused fixed-shape composition in
    ``_jittered_scale_crop`` with this same distribution. Unlike the
    reference — which returns a 1-tuple when it resizes and the bare
    tensor when it skips (transform.py:39 vs :47-51) — this always
    returns the array, and always as float32: the reference converts in
    its caller, so without the up-front cast a uint8 input's output
    dtype would depend on which branch the RNG draw lands in.
    """
    import math

    import numpy as np

    if rng is None:
        rng = np.random
    frames = jnp.asarray(frames, jnp.float32)
    if inverse_uniform_sampling:
        size = int(round(1.0 / rng.uniform(1.0 / max_size, 1.0 / min_size)))
    else:
        size = int(round(rng.uniform(min_size, max_size)))
    h, w = frames.shape[-3], frames.shape[-2]
    if (w <= h and w == size) or (h <= w and h == size):
        return frames
    new_h = new_w = size
    if w < h:
        new_h = int(math.floor(float(h) / w * size))
    else:
        new_w = int(math.floor(float(w) / h * size))
    out_shape = frames.shape[:-3] + (new_h, new_w, frames.shape[-1])
    return jax.image.resize(frames, out_shape,
                            method="bilinear", antialias=False)


def lighting_jitter(frames: jnp.ndarray, alphastd: float, eigval,
                    eigvec, rng=None) -> jnp.ndarray:
    """AlexNet-style PCA lighting jitter, reference-exact
    (transform.py:264-291), NHWC.

    One alpha ~ N(0, alphastd)^3 draw per call (whole-clip-consistent);
    the per-channel shift is ``rgb[2 - c]`` — the reference indexes the
    PCA shift CHANNEL-REVERSED (transform.py:288), a quirk preserved here
    for parity. ``rng`` needs ``.normal``; defaults to the legacy
    ``np.random`` module (the reference's global stream).
    """
    import numpy as np

    if rng is None:
        rng = np.random
    if alphastd == 0:
        return frames
    alpha = rng.normal(0, alphastd, size=(1, 3))
    eig_vec = np.array(eigvec)
    eig_val = np.reshape(eigval, (1, 3))
    rgb = np.sum(eig_vec * np.repeat(alpha, 3, axis=0)
                 * np.repeat(eig_val, 3, axis=0), axis=1)
    # out[..., c] = frames[..., c] + rgb[2 - c]
    shift = jnp.asarray(rgb[::-1].copy(), jnp.float32)
    return frames.astype(jnp.float32) + shift
