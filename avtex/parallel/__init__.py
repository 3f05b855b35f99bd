"""Parallelism: device meshes, sharded embedding, distributed training.

Replaces the reference's only strategy — single-process
``torch.nn.DataParallel`` with hand-rolled per-GPU batch construction
(reference: main.py:420, validate.py:320-366,441-493; SURVEY.md §2.5) —
with jax.sharding over an ICI mesh:

- ``data`` axis: batch sharding for training (DP) and segment-axis sharding
  for the embed-once pass (the reference's manual round-robin chunk deal
  becomes one NamedSharding; XLA inserts the all-gather).
- ``model`` axis: tensor parallelism for the wide audio-MLP matmuls.

Multi-host DCN is a mesh-shape change, not a code change (SURVEY.md §5.8).
"""

from .mesh import make_mesh, replicate, shard_leading
from .sharded import (param_shardings, sharded_embed_segments,
                      sharded_embed_from_video, make_sharded_train_step)

__all__ = ["make_mesh", "replicate", "shard_leading", "param_shardings",
           "sharded_embed_segments", "sharded_embed_from_video",
           "make_sharded_train_step"]
