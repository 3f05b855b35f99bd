"""3D ResNet video encoders (flax, NDHWC).

Topology follows the reference's r3d family — BasicBlock/Bottleneck, conv1
7³ with spatial-only stride (1,2,2), stage strides 2 from layer2 on, global
average pool (reference: models/video_models/resnet3d.py:119-191). TPU-first
differences: channels-last layout, bfloat16 compute with fp32 norm/head,
and a ``norm`` choice:

- ``"group"`` (default, for training from scratch): GroupNorm — stateless
  under jit, no running stats to shard or sync.
- ``"affine"`` (inference / pretrained import): per-channel scale+shift,
  exactly what frozen BatchNorm reduces to. The reference only ever runs
  these encoders eval-mode with frozen stats (resnet3d.py:18-24 pretrained
  r3d18_KM_200ep.pth), so folding BN into an affine is lossless — and on
  TPU it turns every norm into a conv-epilogue fusion instead of a
  reduction pass (see avtex/utils/convert.py::convert_bn_folded).

Padding is torch-explicit (pad 1 on 3³ convs and the stem maxpool) rather
than XLA "SAME", so activations align bit-for-bit with the reference's
nn.Conv3d(padding=1) even at stride 2 — required for exact pretrained-
weight parity (SAME places the extra pad on the high side at even sizes).

CHECKPOINT-COMPAT NOTE: the SAME→explicit-(1,1) padding switch (round 2)
shifts stride-2 taps by one pixel at even sizes, so ``norm="group"``
checkpoints trained BEFORE that change produce slightly different
activations when evaluated under the current padding. All shipped parity
tests and any checkpoint trained at/after round 2 use the explicit
padding; only pre-round-2 experimental checkpoints (none were shipped)
are affected.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

PAD1 = ((1, 1), (1, 1), (1, 1))


class Affine(nn.Module):
    """Folded frozen-BatchNorm: y = x*scale + bias, per channel."""

    ch: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.ch,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.ch,),
                          jnp.float32)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


GN_F32_OUT = False  # A/B knob: True restores pre-round-3 fp32 GN outputs

# Structured-rematerialization knob, read at TRACE time (like GN_F32_OUT):
# a jax.checkpoint policy passed to nn.remat when a model's remat flag is
# on — shared by every 3D encoder family (ResNet3D/ResNeXt/DenseNet via
# this module, SlowFast via avtex/nn/slowfast.py). None = the blanket
# nothing-saveable default. Conv outputs inside the blocks are tagged
# checkpoint_name("conv_out"), so
# jax.checkpoint_policies.save_only_these_names("conv_out") saves the
# expensive conv results and rematerializes only the cheap norm/relu tail
# (convs are conv_general_dilated in the jaxpr — invisible to the stock
# dots_* policies). A/B'd in one process by tools/train_ab.py.
REMAT_POLICY = None


def _tag_conv(y):
    """checkpoint_name tag for conv outputs (no-op unless a
    save_only_these_names REMAT_POLICY is active)."""
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(y, "conv_out")


def gn_dtype(dtype):
    """GroupNorm OUTPUT dtype. Stats are always computed in fp32 (flax
    force-promotes reductions), so returning the model compute dtype
    (bf16) is numerically safe and halves every post-norm activation's
    HBM bytes — the train step's fp32 GroupNorm chains were 30% of
    device time (kLoop fusions, tools/op_trace.py --prog train,
    round 3). GN_F32_OUT pins the old behavior for A/B tooling."""
    return jnp.float32 if GN_F32_OUT else dtype


def _norm(ch: int, dtype, norm: str = "group"):
    if norm == "affine":
        return Affine(ch)
    return nn.GroupNorm(num_groups=min(32, ch), dtype=gn_dtype(dtype))


class BasicBlock3D(nn.Module):
    features: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.bfloat16
    norm: str = "group"
    expansion = 1

    @nn.compact
    def __call__(self, x):
        r = x
        y = _tag_conv(nn.Conv(self.features, (3, 3, 3), self.stride,
                              padding=PAD1, use_bias=False,
                              dtype=self.dtype)(x))
        y = _norm(self.features, self.dtype, self.norm)(y)
        y = nn.relu(y)
        y = _tag_conv(nn.Conv(self.features, (3, 3, 3), padding=PAD1,
                              use_bias=False, dtype=self.dtype)(y))
        y = _norm(self.features, self.dtype, self.norm)(y)
        if r.shape[-1] != self.features or self.stride != (1, 1, 1):
            r = _tag_conv(nn.Conv(self.features, (1, 1, 1), self.stride,
                                  use_bias=False, dtype=self.dtype)(x))
            r = _norm(self.features, self.dtype, self.norm)(r)
        return nn.relu(y + r.astype(y.dtype))


class Bottleneck3D(nn.Module):
    features: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    groups: int = 1
    dtype: Any = jnp.bfloat16
    norm: str = "group"
    expansion = 4

    @nn.compact
    def __call__(self, x):
        r = x
        out_ch = self.features * self.expansion
        y = _tag_conv(nn.Conv(self.features, (1, 1, 1), use_bias=False,
                              dtype=self.dtype)(x))
        y = _norm(self.features, self.dtype, self.norm)(y)
        y = nn.relu(y)
        y = _tag_conv(nn.Conv(self.features, (3, 3, 3), self.stride,
                              padding=PAD1,
                              feature_group_count=self.groups,
                              use_bias=False, dtype=self.dtype)(y))
        y = _norm(self.features, self.dtype, self.norm)(y)
        y = nn.relu(y)
        y = _tag_conv(nn.Conv(out_ch, (1, 1, 1), use_bias=False,
                              dtype=self.dtype)(y))
        y = _norm(out_ch, self.dtype, self.norm)(y)
        if r.shape[-1] != out_ch or self.stride != (1, 1, 1):
            r = _tag_conv(nn.Conv(out_ch, (1, 1, 1), self.stride,
                                  use_bias=False, dtype=self.dtype)(x))
            r = _norm(out_ch, self.dtype, self.norm)(r)
        return nn.relu(y + r.astype(y.dtype))


class ResNet3D(nn.Module):
    """Video encoder on [B, T, H, W, 3] clips; returns [B, feat_dim]."""

    block: Any = BasicBlock3D
    layers: Sequence[int] = (2, 2, 2, 2)
    groups: int = 1
    width: int = 64
    dtype: Any = jnp.bfloat16
    norm: str = "group"
    remat: bool = False  # checkpoint each block (training memory)

    @property
    def feat_dim(self) -> int:
        return self.width * 8 * self.block.expansion

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7, 7), (1, 2, 2), padding=((3, 3), (3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype)(x)
        x = _norm(64, self.dtype, self.norm)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3, 3), (2, 2, 2), padding=PAD1)
        # nn.remat changes the auto-generated module names; pin the plain
        # class's names explicitly so remat (train) and non-remat
        # (inference) checkpoints stay interchangeable. REMAT_POLICY
        # (module-level trace-time knob) selects WHAT the backward saves.
        block_cls = (nn.remat(self.block, policy=REMAT_POLICY)
                     if self.remat else self.block)
        idx = 0
        for i, n_blocks in enumerate(self.layers):
            feats = self.width * (2 ** i)
            for j in range(n_blocks):
                stride = (2, 2, 2) if (i > 0 and j == 0) else (1, 1, 1)
                kwargs = dict(features=feats, stride=stride, dtype=self.dtype,
                              norm=self.norm,
                              name=f"{self.block.__name__}_{idx}")
                idx += 1
                if issubclass(self.block, Bottleneck3D):
                    kwargs["groups"] = self.groups
                x = block_cls(**kwargs)(x)
        x = jnp.mean(x, axis=(1, 2, 3))  # global avg pool over T, H, W
        return x.astype(jnp.float32)


resnet3d10 = functools.partial(ResNet3D, block=BasicBlock3D, layers=(1, 1, 1, 1))
resnet3d18 = functools.partial(ResNet3D, block=BasicBlock3D, layers=(2, 2, 2, 2))
resnet3d34 = functools.partial(ResNet3D, block=BasicBlock3D, layers=(3, 4, 6, 3))
resnet3d50 = functools.partial(ResNet3D, block=Bottleneck3D, layers=(3, 4, 6, 3))
