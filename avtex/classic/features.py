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
    """Per-frame ResNet-18 penultimate features (normalize_rows=True)."""
    from avtex.nn.resnet2d import resnet2d18
    if module is None:
        module = resnet2d18()
        params = jax.jit(module.init)(jax.random.key(0),
                             jnp.zeros((1, img_size, img_size, 3)))

    from avtex.utils.batching import batched_apply

    @jax.jit
    def run(p, x):
        x = preprocess_clip(x[:, None], size=img_size)[:, 0]
        return module.apply(p, x)

    return batched_apply(lambda x: run(params, x), np.asarray(frames),
                         batch_size=batch_size), True


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
    m = VGGish()
    params = jax.jit(m.init)(jax.random.key(0),
                    jnp.zeros((1,) + np.asarray(audio_examples).shape[1:]))
    afeats = vggish_audio_features(m, params, audio_examples)
    ids = np.minimum(np.arange(len(frames)) // stride, len(afeats) - 1)
    afeats_per_frame = afeats[ids]
    return jnp.concatenate([vfeats, afeats_per_frame], axis=1), True
