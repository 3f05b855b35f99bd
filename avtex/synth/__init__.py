"""Autoregressive texture synthesis engine.

The reference's validate.py:63-874 loop re-encodes every segment of the
video at every step (SURVEY.md §3.2). Here the engine is split device/host:

- ``embeddings.py``: embed every segment ONCE (batched, shardable) ->
  [L, D] query and target tables.
- ``engine.py``: the whole transition walk as one ``lax.scan`` over a
  precomputed [L, L] logit matrix (+ [steps, L] audio logits when driving
  audio is given) with the reference's exact normalize/blend/threshold/
  uniform-sample semantics.
- ``stitcher.py``: host-side frame assembly (native C++ gather), SuperSloMo
  or crossfade interpolation at jumps, audio-track assembly.
- ``server.py``: warm-process serving — embed once, synthesize many
  (per-request length/threshold/alpha/seed/driving audio).
"""

from .embeddings import (precompute_embeddings, embed_segments,
                         embed_segments_from_video,
                         precompute_embeddings_from_video)
from .engine import SynthesisResult, synthesize_indices, num_synthesis_steps
from .server import TextureServer
from .stitcher import stitch_texture

__all__ = ["precompute_embeddings", "embed_segments", "SynthesisResult",
           "synthesize_indices", "num_synthesis_steps", "stitch_texture",
           "TextureServer"]
