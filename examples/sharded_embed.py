"""Multi-device SPMD embedding over a jax.sharding.Mesh.

The video buffer replicates to every device; segment start indices shard
over the 'data' axis, so each device window-gathers, preprocesses and
embeds L/n segments and XLA all-gathers the [L, D] table over ICI.
The same `('data', 'model')` mesh drives the DP+TP train step
(avtex.parallel.make_sharded_train_step — what `__graft_entry__.
dryrun_multichip` validates every round). Multi-host is only a
mesh-shape change.

Run with 8 virtual devices on CPU:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_embed.py
On a real TPU slice, drop the env vars — make_mesh() picks up the chips.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # checkout use; no-op when installed

import numpy as np

import jax
import jax.numpy as jnp

from avtex.contrastive.model import ContrastiveTextures
from avtex.contrastive.segments import num_segments
from avtex.data.preprocess import preprocess_clip
from avtex.parallel.mesh import make_mesh
from avtex.parallel.sharded import sharded_embed_from_video
from avtex.synth.embeddings import embed_segments_from_video

n = len(jax.devices())
mesh = make_mesh((n, 1))  # (data, model)
print(f"mesh: {dict(mesh.shape)} on {jax.devices()[0].platform}")

# procedural video -> uint8 buffer (decode once, embed sharded)
t, res, W, S = 64, 16, 4, 2
yy, xx = np.mgrid[0:res, 0:res]
video = np.stack([
    np.clip(np.sin(xx / 3 + 2 * np.pi * i / 16) * 90 + 127 + yy, 0, 255)
    for i in range(t)
]).astype(np.uint8)[..., None].repeat(3, -1)
L = num_segments(t, W, S)

model = ContrastiveTextures(arch="resnet10", model_type=1)
x = preprocess_clip(jnp.asarray(video[None, :W]), size=res)
params = jax.jit(model.init)(jax.random.key(0), x, x[:, None])

table = np.asarray(sharded_embed_from_video(
    model, params, mesh, video, W, S, L, img_size=res))
print(f"sharded table: {table.shape} ({L} segments over {n} devices)")

# cross-check vs the single-device path
ref = np.asarray(embed_segments_from_video(
    model, params, video, W, S, L, img_size=res))
np.testing.assert_allclose(table, ref, atol=2e-2, rtol=2e-2)
print("matches the unsharded embed")
