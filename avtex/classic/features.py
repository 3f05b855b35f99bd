"""Per-frame features for the classic baseline's distance matrix.

The reference's three modes (reference: baselines/classic_video_textures/
computeD1.py:27-238):
- "RGB": raw flattened frames, *no* per-row normalization;
- "ResNet": per-frame ResNet-18 penultimate features, L2-normalized rows;
- "ResNet_VGGish": per-frame ResNet features concatenated with the
  matching audio segment's VGGish features, L2-normalized.

Here features are computed in batches on device; the distance matrix itself
is the Gram-form kernel in avtex/classic/d1.py (no O(N^2 F) repeats).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avtex.data.preprocess import preprocess_clip


def rgb_features(frames: np.ndarray) -> Tuple[jnp.ndarray, bool]:
    """(features, normalize_rows) for the raw-RGB mode."""
    x = jnp.asarray(frames, jnp.float32).reshape(len(frames), -1)
    return x, False


def resnet_features(frames: np.ndarray, module=None, params=None,
                    img_size: int = 112, batch_size: int = 64
                    ) -> Tuple[jnp.ndarray, bool]:
    """Per-frame ResNet-18 penultimate features (normalize_rows=True).

    The reference uses torchvision's IMAGENET-PRETRAINED resnet18
    (computeD1.py:99); a pretrained checkpoint is loaded when one can be
    found ($AVTEX_ENCODER_CKPT or pretrained/resnet18-imagenet.pth,
    BN-folded into the affine variant), else this warns LOUDLY and runs
    random weights — distances from random features are structurally
    valid but semantically meaningless.
    """
    from avtex.nn.resnet2d import resnet2d18
    if module is None:
        import sys

        from avtex.utils.convert import maybe_load_encoder
        x0 = jnp.zeros((1, img_size, img_size, 3))
        module = resnet2d18(norm="affine")
        params = jax.jit(module.init)(jax.random.key(0), x0)
        params, loaded = maybe_load_encoder(
            "resnet18_2d", module, params, x0,
            context="classic ResNet features")
        if not loaded:
            print("[avtex] WARNING: no pretrained resnet18 checkpoint "
                  "found (classic ResNet features); the reference uses "
                  "torchvision resnet18(pretrained=True) — random "
                  "features make the distance matrix meaningless. Set "
                  "$AVTEX_ENCODER_CKPT or place "
                  "pretrained/resnet18-imagenet.pth.", file=sys.stderr)
            module = resnet2d18()
            params = jax.jit(module.init)(jax.random.key(0), x0)

    from avtex.utils.batching import batched_apply

    run = _frame_features_fn(module, img_size)
    return batched_apply(lambda x: run(params, x), np.asarray(frames),
                         batch_size=batch_size), True


@functools.lru_cache(maxsize=8)
def _frame_features_fn(module, img_size: int):
    """Jitted per-frame feature apply, cached per (module, size)
    (CLAUDE.md cached-closure rule)."""
    @jax.jit
    def run(p, x):
        xx = preprocess_clip(x[:, None], size=img_size)[:, 0]
        return module.apply(p, xx)

    return run


def resnet_vggish_features(frames: np.ndarray,
                           audio_examples: Optional[np.ndarray],
                           window: int, stride: int,
                           img_size: int = 112) -> Tuple[jnp.ndarray, bool]:
    """ResNet frame features + per-frame audio VGGish features.

    Each frame gets the audio example of the segment containing it
    (reference: computeD1.py:152-238 pairs frame i with audio segment
    i // stride clipped to the last example).
    """
    vfeats, _ = resnet_features(frames, img_size=img_size)
    if audio_examples is None:
        return vfeats, True
    from avtex.nn.vggish import VGGish
    from avtex.synth.embeddings import vggish_audio_features
    from avtex.utils.convert import maybe_load_vggish
    m = VGGish()
    params = jax.jit(m.init)(jax.random.key(0),
                    jnp.zeros((1,) + np.asarray(audio_examples).shape[1:]))
    # the reference scores with PRETRAINED VGGish (computeD1.py:152-238);
    # warns loudly when the checkpoint is absent
    params, _ = maybe_load_vggish(params,
                                  context="classic ResNet_VGGish features")
    afeats = vggish_audio_features(m, params, audio_examples)
    ids = np.minimum(np.arange(len(frames)) // stride, len(afeats) - 1)
    afeats_per_frame = afeats[ids]
    return jnp.concatenate([vfeats, afeats_per_frame], axis=1), True
