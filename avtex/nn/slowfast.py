"""SlowFast-R50 two-pathway video encoder (flax, NDHWC).

The reference imports this from the external facebookresearch/SlowFast
package with caffe2 weights and strips the classifier head
(reference: models/models.py:565-580; pathway shapes pinned by
models.py:392-397 — slow [B,C,8,H,W], fast [B,C,32,H,W]). Re-implemented
here natively, TPU-first:

- channels-last [B, T, H, W, C]; temporal convs expressed as (t,1,1)
  kernels fused by XLA into the bottleneck matmuls;
- SlowFast-8x8 geometry: alpha=4 (fast 32 frames -> slow 8), beta=1/8
  (fast width = slow/8), lateral fast->slow fusions after stem and
  res2/res3/res4 via time-strided (7,1,1) convs + norm + relu
  (pyslowfast FuseFastToSlow with SLOWFAST_8x8_R50's
  FUSION_KERNEL_SZ=7, FUSION_CONV_CHANNEL_RATIO=2);
- R50 bottlenecks [3,4,6,3]; slow pathway has temporal kernels only in
  res4/res5, fast everywhere; spatial-only stage strides;
- head = concat of global-avg-pooled pathways: 2048 + 256 = 2304 features.

GroupNorm replaces BatchNorm for training (stateless under jit);
``norm="affine"`` is the folded frozen-BN inference variant that
``avtex.utils.convert.convert_slowfast`` imports SLOWFAST_8x8_R50
checkpoints into (the reference only ever runs this encoder frozen in
eval mode, models/models.py:565-580).

Padding is torch-explicit (k//2 per axis) rather than XLA "SAME" so
activations align bit-for-bit with pyslowfast's nn.Conv3d padding at
stride 2 — required for exact pretrained-weight parity (same contract as
avtex/nn/resnet3d.py).

CHECKPOINT-COMPAT NOTE (round 3): lateral fusions gained norm+relu and
went (5,1,1)->(7,1,1), and padding switched SAME->explicit, matching the
reference architecture exactly. norm="group" checkpoints trained before
round 3 are structurally incompatible (no shipped checkpoints were).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .resnet3d import Affine, gn_dtype

ALPHA = 4          # fast/slow frame-rate ratio
BETA_INV = 8       # slow/fast channel ratio
FAST_FRAMES = 32
SLOW_FRAMES = FAST_FRAMES // ALPHA

# The structured-rematerialization knob lives in avtex.nn.resnet3d
# (REMAT_POLICY, shared by every 3D encoder family); it is read at TRACE
# time via the module attribute so tools/train_ab.py can flip it between
# closures. Conv outputs inside SFBottleneck carry the same
# checkpoint_name("conv_out") tags the resnet3d blocks do.


class _ConvKernel(nn.Module):
    """Param holder matching nn.Conv's tree (Conv_k/kernel) so the fused
    Pallas path and the plain path share checkpoints. The method is ``get``
    (not __call__) so capture_intermediates passes don't record the 5-D
    kernel as an activation."""

    shape: Tuple[int, ...]

    @nn.compact
    def get(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _AffineParams(nn.Module):
    """Param holder matching Affine's tree (Affine_k/{scale,bias})."""

    ch: int

    @nn.compact
    def get(self):
        return (self.param("scale", nn.initializers.ones, (self.ch,),
                           jnp.float32),
                self.param("bias", nn.initializers.zeros, (self.ch,),
                           jnp.float32))


class SFBottleneck(nn.Module):
    """Bottleneck with the temporal kernel on the first 1x1 conv.

    With ``norm="affine"`` and ``fuse`` (inference), the 1x1 convolutions
    run through the fused Pallas kernel (avtex/ops/fused_matmul.py): the
    folded-norm affine, the residual add and the final relu all happen in
    the matmul's VMEM epilogue instead of separate XLA elementwise passes,
    and small-channel contractions are G-folded onto full MXU lanes.
    Module names are pinned so fused and plain checkpoints are one tree.
    ``fuse`` must be False to take gradients (pallas_call has no VJP);
    training uses norm="group" anyway.
    """

    features: int
    t_kernel: int = 1
    spatial_stride: int = 1
    dtype: Any = jnp.bfloat16
    norm: str = "group"
    fuse: Any = True       # True/"all" | "conv3" (output epilogue only) | False
    expansion = 4

    @nn.compact
    def __call__(self, x):
        fuse = bool(self.fuse) and self.norm == "affine"
        fuse_all = fuse and self.fuse in (True, "all")
        r = x
        s = (1, self.spatial_stride, self.spatial_stride)
        out_ch = self.features * self.expansion

        def conv(idx, z, feats, kernel, strides=(1, 1, 1)):
            # torch-explicit padding (k//2 per axis): identical to SAME at
            # stride 1, tap-exact vs torch at stride 2 on even extents.
            # Outputs are checkpoint_name-tagged so a save_only_these_names
            # remat policy (see REMAT_POLICY) can keep conv results and
            # recompute only the norm/relu tail; the tag is a no-op
            # otherwise.
            from jax.ad_checkpoint import checkpoint_name
            pad = tuple((kk // 2, kk // 2) for kk in kernel)
            y = nn.Conv(feats, kernel, strides, padding=pad,
                        use_bias=False, dtype=self.dtype,
                        name=f"Conv_{idx}")(z)
            return checkpoint_name(y, "conv_out")

        def norm(idx, ch):
            if self.norm == "affine":
                return Affine(ch, name=f"Affine_{idx}")
            return nn.GroupNorm(num_groups=min(32, ch),
                                dtype=gn_dtype(self.dtype),
                                name=f"GroupNorm_{idx}")

        def fused(idx, z, feats, residual=None, relu=True):
            from avtex.ops.fused_matmul import fused_conv1x1
            k = _ConvKernel((1, 1, 1, z.shape[-1], feats),
                            name=f"Conv_{idx}").get()
            sc, bi = _AffineParams(feats, name=f"Affine_{idx}").get()
            return fused_conv1x1(z.astype(self.dtype), k[0, 0, 0], sc, bi,
                                 residual=residual, relu=relu)

        if fuse_all and self.t_kernel == 1:
            y = fused(0, x, self.features)
        else:
            y = conv(0, x, self.features, (self.t_kernel, 1, 1))
            y = nn.relu(norm(0, self.features)(y))
        y = conv(1, y, self.features, (1, 3, 3), s)
        y = nn.relu(norm(1, self.features)(y))
        need_proj = r.shape[-1] != out_ch or self.spatial_stride != 1
        if fuse:
            if need_proj:
                if fuse_all:
                    xs = (x[:, :, ::self.spatial_stride,
                            ::self.spatial_stride]
                          if self.spatial_stride != 1 else x)
                    r = fused(3, xs, out_ch, relu=False)
                else:
                    r = conv(3, x, out_ch, (1, 1, 1), s)
                    r = norm(3, out_ch)(r)
            return fused(2, y, out_ch, residual=r.astype(self.dtype))
        y = conv(2, y, out_ch, (1, 1, 1))
        y = norm(2, out_ch)(y)
        if need_proj:
            r = conv(3, x, out_ch, (1, 1, 1), s)
            r = norm(3, out_ch)(r)
        return nn.relu(y + r.astype(y.dtype))


class SlowFastR50(nn.Module):
    """Two-pathway encoder; __call__(slow, fast) -> [B, 2304].

    ``s2d_stem`` (default on): run the fast-pathway stem via the
    space-to-depth re-expression (avtex/ops/s2d_stem.py — exact same
    arithmetic, 4x the MXU output lanes; measured 212 vs 236 ms on the
    batch-128 affine embed). In affine (inference) mode BOTH stems run
    fully fused in s2d space (conv+affine+relu+pool, no de-s2d layout
    round trip); the slow stem is the kt=1 case of the same transform
    and its 3-channel conv is the worst MXU-filler in the trunk.
    Weight shapes are identical either way, so the flag can be flipped
    on trained checkpoints.
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    dtype: Any = jnp.bfloat16
    s2d_stem: bool = True
    fusion_kernel: int = 7  # lateral conv temporal extent (SLOWFAST_8x8: 7)
    norm: str = "group"  # "affine" = folded frozen-BN (see resnet3d._norm)
    remat: bool = False  # checkpoint each bottleneck (training memory)
    max_stage: int = 4   # perf-attribution knob (tools/embed_stage_bench):
                         # run only res-stages < max_stage (0 = stems only).
                         # Default 4 = the full network; not a model config.
    fuse: Any = False    # Pallas fused 1x1+affine+residual epilogues in
                         # affine mode: "all"/True | "conv3" | False.
                         # Default OFF: measured slower in-context (210 ->
                         # 266-282 ms at batch 128) — XLA re-lays-out the
                         # big activations around every custom call, which
                         # costs more than the fused epilogues save. See
                         # NOTES_r2 "Negative results". The kernel itself
                         # is exact and fast standalone
                         # (avtex/ops/fused_matmul.py, tests).

    @property
    def feat_dim(self) -> int:
        # slow head (width*8*expansion) + fast head (slow/BETA_INV): 2048+256.
        top = self.width * 8 * SFBottleneck.expansion
        return top + top // BETA_INV

    def _named_norm(self, ch: int, idx: int):
        """Top-level norm with an explicit name equal to the auto-name it
        had before round 3's fused-stem path (Affine_0..5/GroupNorm_0..5)
        — explicit so the fused fast stem can own 'Affine_1' via a param
        holder without colliding with flax's per-type auto-counter, while
        every checkpoint tree stays byte-identical."""
        if self.norm == "affine":
            return Affine(ch, name=f"Affine_{idx}")
        return nn.GroupNorm(num_groups=min(32, ch),
                            dtype=gn_dtype(self.dtype),
                            name=f"GroupNorm_{idx}")

    def _lateral(self, fast, out_ch, norm_idx):
        """Fast->slow fusion: time-strided conv + norm + relu (pyslowfast
        FuseFastToSlow: conv_f2s/bn/relu then concat onto the slow path).
        The conv name is pinned to its pre-round-3 auto-name (Conv_1..4,
        after the slow stem's Conv_0) so the fused-slow-stem path — which
        replaces the stem nn.Conv with a param holder and would otherwise
        reset the auto-counter — keeps the checkpoint tree byte-identical."""
        fk = self.fusion_kernel
        y = nn.Conv(out_ch, (fk, 1, 1), (ALPHA, 1, 1),
                    padding=((fk // 2, fk // 2), (0, 0), (0, 0)),
                    use_bias=False, dtype=self.dtype,
                    name=f"Conv_{norm_idx - 1}")(fast)
        return nn.relu(self._named_norm(out_ch, norm_idx)(y))

    @nn.compact
    def __call__(self, slow: jnp.ndarray, fast: jnp.ndarray) -> jnp.ndarray:
        slow = slow.astype(self.dtype)
        fast = fast.astype(self.dtype)
        w = self.width
        wf = w // BETA_INV

        # Stems: slow has no temporal extent, fast a 5-frame one.
        use_s2d = (self.s2d_stem and fast.shape[2] % 4 == 0
                   and fast.shape[3] % 4 == 0)
        slow_pooled = False
        if use_s2d and self.norm == "affine":
            # The slow stem is the kt=1 case of the same stride-(1,2,2)
            # torch-padded stem conv: its 3 input channels fill 3 of the
            # MXU's 128 lanes, so run the whole stem (conv+affine+relu+
            # pool) through the s2d-by-4 re-expression too (48-channel
            # contraction, 256 output lanes). Param tree unchanged: the
            # holder owns Conv_0/kernel exactly as nn.Conv did.
            from avtex.ops.s2d_stem import fast_stem_s2d_pooled
            k_slow = _ConvKernel((1, 7, 7, slow.shape[-1], w),
                                 name="Conv_0").get().astype(self.dtype)
            sc0, bi0 = _AffineParams(w, name="Affine_0").get()
            slow = fast_stem_s2d_pooled(slow, k_slow, sc0, bi0)
            slow_pooled = True
        else:
            slow = nn.Conv(w, (1, 7, 7), (1, 2, 2),
                           padding=((0, 0), (3, 3), (3, 3)),
                           use_bias=False, dtype=self.dtype,
                           name="Conv_0")(slow)
            slow = nn.relu(self._named_norm(w, 0)(slow))
        # One param serves every stem implementation, so the s2d flag can
        # flip on any checkpoint.
        k_fast = self.param(
            "fast_stem_kernel", nn.initializers.lecun_normal(),
            (5, 7, 7, fast.shape[-1], wf), jnp.float32).astype(self.dtype)
        fast_pooled = False
        if use_s2d and self.norm == "affine":
            # Whole fast stem (conv+affine+relu+pool) in s2d space: the
            # de-s2d transpose/copy chain was ~18 ms of the batch-64
            # embed (profiled round 3, tools/embed_stage_bench.py).
            from avtex.ops.s2d_stem import fast_stem_s2d_pooled
            sc, bi = _AffineParams(wf, name="Affine_1").get()
            fast = fast_stem_s2d_pooled(fast, k_fast, sc, bi)
            fast_pooled = True
        elif use_s2d:
            from avtex.ops.s2d_stem import fast_stem_s2d
            fast = fast_stem_s2d(fast, k_fast)
        else:
            import jax
            fast = jax.lax.conv_general_dilated(
                fast, k_fast, (1, 2, 2), ((2, 2), (3, 3), (3, 3)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=self.dtype)
        if not fast_pooled:
            fast = nn.relu(self._named_norm(wf, 1)(fast))
        pool_pad = ((0, 0), (1, 1), (1, 1))
        if not slow_pooled:
            slow = nn.max_pool(slow, (1, 3, 3), (1, 2, 2), padding=pool_pad)
        if not fast_pooled:
            fast = nn.max_pool(fast, (1, 3, 3), (1, 2, 2), padding=pool_pad)
        slow = jnp.concatenate(
            [slow, self._lateral(fast, 2 * wf, 2).astype(slow.dtype)],
            axis=-1)

        # slow temporal kernels per stage: res2/res3 degenerate, res4/res5 = 3.
        # nn.remat trades recompute for activation memory: the backward pass
        # holds one bottleneck's activations at a time (SlowFast@224 grad
        # step OOMs a 16 GB chip at 20 clips without it). Names are pinned
        # to the plain class's auto-names so remat (train) and non-remat
        # (inference) checkpoints stay interchangeable.
        # resnet3d.REMAT_POLICY (module-level trace-time knob) selects
        # WHAT the backward saves; None keeps the blanket save-nothing
        # default.
        from . import resnet3d as _r3d
        Block = (nn.remat(SFBottleneck, policy=_r3d.REMAT_POLICY)
                 if self.remat else SFBottleneck)
        block_idx = 0
        slow_t = (1, 1, 3, 3)
        for i, n_blocks in enumerate(self.layers):
            if i >= self.max_stage:
                break
            feats = w * (2 ** i)
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                slow = Block(feats, slow_t[i], stride,
                             dtype=self.dtype, norm=self.norm,
                             fuse=self.fuse,
                             name=f"SFBottleneck_{block_idx}")(slow)
                fast = Block(feats // BETA_INV, 3, stride,
                             dtype=self.dtype, norm=self.norm,
                             fuse=self.fuse,
                             name=f"SFBottleneck_{block_idx + 1}")(fast)
                block_idx += 2
            if i != len(self.layers) - 1:
                lateral = self._lateral(fast, 2 * (feats // BETA_INV)
                                        * SFBottleneck.expansion, 3 + i)
                slow = jnp.concatenate([slow, lateral.astype(slow.dtype)],
                                       axis=-1)

        slow = jnp.mean(slow, axis=(1, 2, 3))
        fast = jnp.mean(fast, axis=(1, 2, 3))
        return jnp.concatenate([slow, fast], axis=-1).astype(jnp.float32)


def slowfast_pathways(frames: jnp.ndarray,
                      fast_frames: int = FAST_FRAMES,
                      alpha: int = ALPHA) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniformly sample a window into (slow, fast) pathway clips.

    Matches the reference's frame-sampling contract: the fast pathway gets
    ``fast_frames`` uniformly-spaced frames of the window, the slow pathway
    every ``alpha``-th of those (reference: dataset/dataset.py:60-66 via
    slowfast's process_cv2_inputs; SLOWFAST_8x8: 32 and 8 frames).

    Args:
      frames: [B, T, H, W, C] (or [T, H, W, C]) window of decoded frames.

    Returns:
      (slow [.., fast_frames//alpha, H, W, C], fast [.., fast_frames, ...]).
    """
    t_axis = frames.ndim - 4
    t = frames.shape[t_axis]
    idx = np.linspace(0, t - 1, fast_frames).round().astype(np.int32)
    fast = jnp.take(frames, jnp.asarray(idx), axis=t_axis)
    slow = jnp.take(fast, jnp.arange(alpha // 2, fast_frames, alpha),
                    axis=t_axis)
    return slow, fast
