"""avtex — TPU-native audio-conditioned video textures.

A brand-new JAX / XLA / Pallas / pjit framework with the capabilities of
medhini/audio-video-textures ("Strumming to the Beat: Audio-Conditioned
Contrastive Video Textures", WACV 2022). See SURVEY.md for the structural
analysis of the reference and the idiomatic-TPU design decisions.

Subpackages
-----------
- ``avtex.config``      — single dataclass config mirroring the reference CLI
  (reference: contrastive_video_textures/main.py:41-296).
- ``avtex.media``       — host-side media I/O (video decode, wav, native AVI muxing).
- ``avtex.data``        — segment batch sampler, prefetch, device-side preprocessing.
- ``avtex.audio``       — jnp log-mel frontend (VGGish feature semantics).
- ``avtex.nn``          — flax encoders: SlowFast-R50, 3D ResNet/ResNeXt/DenseNet,
  VGGish, SuperSloMo UNet.
- ``avtex.ops``         — Pallas TPU kernels (all-pairs L2, diagonal conv, blend).
- ``avtex.contrastive`` — segment indexing, InfoNCE, embedding tables.
- ``avtex.synth``       — autoregressive texture engine (lax.scan).
- ``avtex.classic``     — Schödl classic video-textures DP pipeline.
- ``avtex.baselines``   — audio-NN / random / random-segment / random-shift.
- ``avtex.train``       — optax train loop, checkpoint latest/best contract.
- ``avtex.parallel``    — jax.sharding mesh setup + sharded embedding pass.
- ``avtex.obs``         — meters, loggers, visualizations, profiler hooks.
- ``avtex.cli``         — reference-compatible command-line drivers.
- ``avtex.utils``       — optical flow, torch-checkpoint conversion, batching
  parity helpers, XLA compile cache.
- ``avtex.native``      — C++ runtime (AVI muxer, frame stitcher) via ctypes.
"""

__version__ = "0.1.0"
