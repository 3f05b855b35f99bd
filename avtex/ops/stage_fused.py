"""Whole-residual-stage fusion: N bottlenecks in ONE Pallas kernel.

STATUS (round 3, final): MEASURED SLOWER THAN XLA — kept as
exactness-tested infrastructure only, never on the model path. On
slow-res3 [832,56,56,320] -> [832,28,28,512] steady-state (healthy
pool, jitted, in-process A/B): XLA native convs 45-48 ms, this kernel
97 ms at k=1 and 103.6 ms at k=4. k>1 row-concatenation (this round)
and python unrolling (round 2) both failed to close the gap — per-step
overhead was never the cost; the in-VMEM tap-accumulation dataflow
itself loses ~2.1x to XLA's conv emitters. See NOTES_r3.md.

Round-2 motivation (kept for history): per-op Pallas insertion loses to
custom-call relayouts, so the fusion must swallow a whole stage — each
grid step loads k (b, t) activation slices into VMEM and runs the
entire stage (1x1 convs as matmuls, 3x3 via in-VMEM im2col, folded-norm
affines, residual adds, relus), writing the stage output once.

Semantics are exactly SFBottleneck with norm="affine"
(avtex/nn/slowfast.py): conv1 1x1 -> affine -> relu -> conv2 3x3 (SAME,
stride on block 0) -> affine -> relu -> conv3 1x1 -> affine -> +residual
-> relu, with a projection shortcut (1x1 strided conv + affine) on block 0.
A pure-jnp reference (`stage_reference`) mirrors the kernel for tests.

Inference-only (no VJP), like everything in the affine configuration.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class BlockWeights(NamedTuple):
    """One bottleneck's folded weights (all [K, N] matrices, bf16-ready)."""

    w1: jnp.ndarray          # [C_in, F]
    s1: jnp.ndarray          # [F] affine scale
    b1: jnp.ndarray          # [F] affine bias
    w2: jnp.ndarray          # [3, 3, F, F] spatial conv
    s2: jnp.ndarray
    b2: jnp.ndarray
    w3: jnp.ndarray          # [F, C_out]
    s3: jnp.ndarray
    b3: jnp.ndarray
    wp: Optional[jnp.ndarray]    # [C_in, C_out] projection (block 0) or None
    sp: Optional[jnp.ndarray]
    bp: Optional[jnp.ndarray]


def _affine_relu(y, s, b, relu=True):
    y = y * s + b
    return jnp.maximum(y, 0.0) if relu else y


def _mm(a, w):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _block_body(v, blk: BlockWeights, stride: int):
    """One bottleneck on [K, H, W, C_in] slices -> [K, H/s, W/s, C_out].

    Pure jnp on values — identical code runs inside the Pallas kernel (on
    VMEM-loaded arrays) and as the XLA reference. The leading K axis
    row-concatenates the slices into SINGLE matmuls ([K*H*W, C] @ [C, F]),
    so k>1 grid steps amortize per-step overhead with NO code-size growth
    (the round-2 python-unrolled k>1 variant exploded the Mosaic compile;
    this is the row-concatenated shape NOTES_r2 prescribed).
    """
    k, h, w, cin = v.shape
    f = blk.w1.shape[1]
    cout = blk.w3.shape[1]
    ho, wo = h // stride, w // stride

    if k == 1:
        # Rank-3 fast path: Mosaic lowers 3D pad/slice/reshape onto the
        # native (sublane, lane) tiling; the same ops with a leading unit
        # axis (rank 4) measured ~500x slower on v5e (see NOTES_r3).
        return _block_body_3d(v[0], blk, stride)[None]

    y = _affine_relu(_mm(v.reshape(k * h * w, cin), blk.w1), blk.s1, blk.b1)
    y = y.astype(jnp.bfloat16).reshape(k, h, w, f)

    # 3x3 conv via im2col in VMEM, torch-explicit padding (1, 1) at every
    # stride — matching SFBottleneck's round-3 padding contract
    # (avtex/nn/slowfast.py: nn.Conv padding=((0,0),(1,1),(1,1))). At
    # stride 2 the max tap index is dh + 2*(ho-1) + 1 <= h + 2, so the
    # (1, 1) pad is exactly enough for the decimating reshape below.
    # Slices pad independently, so taps never cross slice boundaries.
    # Mosaic cannot lower strided slices (>2D gather), so stride-2 taps
    # slice contiguously then decimate via reshape + phase-0 indexing.
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def tap(dh, dw):
        t = jax.lax.slice(yp, (0, dh, dw, 0),
                          (k, dh + ho * stride, dw + wo * stride, f))
        if stride == 1:
            return t
        # (k, ho*2) rows group as (k*ho, 2) in the same linear order
        return t.reshape(k * ho, stride, wo, stride, f)[:, 0, :, 0, :]

    # Tap-wise accumulation (Mosaic cannot concat vectors whose sublane
    # offsets differ, which the shifted taps do): nine [K*ho*wo, F] x
    # [F, F] matmuls summed in fp32 — same arithmetic as the single
    # im2col matmul, K = F >= 128 on the slow tower keeps MXU rows full.
    w2 = blk.w2.reshape(3, 3, f, f)
    acc = None
    for dh in range(3):
        for dw in range(3):
            part = _mm(tap(dh, dw).reshape(k * ho * wo, f), w2[dh, dw])
            acc = part if acc is None else acc + part
    y = _affine_relu(acc, blk.s2, blk.b2)
    y = y.astype(jnp.bfloat16)

    y = _mm(y, blk.w3) * blk.s3 + blk.b3              # [K*ho*wo, C_out]

    if blk.wp is not None:
        vs = (v.reshape(k * ho, stride, wo, stride, cin)[:, 0, :, 0, :]
              if stride > 1 else v).reshape(k * ho * wo, cin)
        r = _affine_relu(_mm(vs, blk.wp), blk.sp, blk.bp, relu=False)
    else:
        r = v.reshape(k * ho * wo, cout).astype(jnp.float32)
    return jnp.maximum(y + r, 0.0).astype(jnp.bfloat16) \
        .reshape(k, ho, wo, cout)


def _block_body_3d(v, blk: BlockWeights, stride: int):
    """Rank-3 bottleneck body ([H, W, C] -> [H/s, W/s, C_out]) — the k=1
    kernel path (round-2 formulation, torch-explicit padding)."""
    h, w, cin = v.shape
    f = blk.w1.shape[1]
    cout = blk.w3.shape[1]
    ho, wo = h // stride, w // stride

    y = _affine_relu(_mm(v.reshape(h * w, cin), blk.w1), blk.s1, blk.b1)
    y = y.astype(jnp.bfloat16).reshape(h, w, f)
    yp = jnp.pad(y, ((1, 1), (1, 1), (0, 0)))

    def tap(dh, dw):
        t = jax.lax.slice(yp, (dh, dw, 0),
                          (dh + ho * stride, dw + wo * stride, f))
        if stride == 1:
            return t
        return t.reshape(ho, stride, wo, stride, f)[:, 0, :, 0, :]

    w2 = blk.w2.reshape(3, 3, f, f)
    acc = None
    for dh in range(3):
        for dw in range(3):
            part = _mm(tap(dh, dw).reshape(ho * wo, f), w2[dh, dw])
            acc = part if acc is None else acc + part
    y = _affine_relu(acc, blk.s2, blk.b2).astype(jnp.bfloat16)
    y = _mm(y, blk.w3) * blk.s3 + blk.b3

    if blk.wp is not None:
        vs = (v.reshape(ho, stride, wo, stride, cin)[:, 0, :, 0, :]
              if stride > 1 else v).reshape(ho * wo, cin)
        r = _affine_relu(_mm(vs, blk.wp), blk.sp, blk.bp, relu=False)
    else:
        r = v.reshape(ho * wo, cout).astype(jnp.float32)
    return jnp.maximum(y + r, 0.0).astype(jnp.bfloat16).reshape(ho, wo, cout)


def stage_reference(x: jnp.ndarray, blocks: Sequence[BlockWeights],
                    stride: int) -> jnp.ndarray:
    """XLA reference: the same body over the whole (b*t) axis at once."""
    for i, blk in enumerate(blocks):
        x = _block_body(x, blk, stride if i == 0 else 1)
    return x


def _stage_kernel(*refs, n_blocks: int, stride: int):
    x_ref = refs[0]
    out_ref = refs[-1]
    w_refs = refs[1:-1]

    v = x_ref[...]
    i = 0
    for b in range(n_blocks):
        has_proj = b == 0
        n_fields = 12 if has_proj else 9
        fields = [r[:] for r in w_refs[i:i + n_fields]]
        i += n_fields

        # vectors arrive as [1, F]; w2 stays [9F, F] (reshape in the body
        # is a no-op on it)
        def vec(a):
            return a[0]

        if has_proj:
            (w1, s1, b1, w2, s2, b2, w3, s3, b3, wp, sp, bp) = fields
            blk = BlockWeights(w1, vec(s1), vec(b1), w2,
                               vec(s2), vec(b2), w3, vec(s3), vec(b3),
                               wp, vec(sp), vec(bp))
        else:
            (w1, s1, b1, w2, s2, b2, w3, s3, b3) = fields
            blk = BlockWeights(w1, vec(s1), vec(b1), w2,
                               vec(s2), vec(b2), w3, vec(s3), vec(b3),
                               None, None, None)
        v = _block_body(v, blk, stride if b == 0 else 1)
    out_ref[...] = v


def stage_weights_from_params(params, block_indices: Sequence[int]
                              ) -> List[BlockWeights]:
    """Extract a slow-pathway stage's BlockWeights from SlowFastR50 params.

    ``block_indices``: the SFBottleneck_{i} indices of the stage's blocks in
    order (slow blocks are even: res2 = [0, 2, 4], res3 = [6, 8, 10, 12] —
    see SlowFastR50.__call__'s interleaved numbering). Only t_kernel == 1
    blocks qualify (conv1 kernels must be [1,1,1,Cin,F]).
    """
    tree = params.get("params", params)
    blocks = []
    for j, idx in enumerate(block_indices):
        p = tree[f"SFBottleneck_{idx}"]
        w1 = p["Conv_0"]["kernel"]
        if w1.shape[0] != 1:
            raise ValueError(
                f"SFBottleneck_{idx} has a temporal conv1 "
                f"(kernel {w1.shape}); stage fusion needs t_kernel == 1")
        w2 = p["Conv_1"]["kernel"]          # [1, 3, 3, F, F]
        w3 = p["Conv_2"]["kernel"]          # [1, 1, 1, F, Cout]
        has_proj = "Conv_3" in p
        if (j == 0) != has_proj:
            raise ValueError(f"SFBottleneck_{idx}: projection expected only "
                             "on the stage's first block")
        blocks.append(BlockWeights(
            w1=w1[0, 0, 0], s1=p["Affine_0"]["scale"],
            b1=p["Affine_0"]["bias"],
            w2=w2[0], s2=p["Affine_1"]["scale"], b2=p["Affine_1"]["bias"],
            w3=w3[0, 0, 0], s3=p["Affine_2"]["scale"],
            b3=p["Affine_2"]["bias"],
            wp=p["Conv_3"]["kernel"][0, 0, 0] if has_proj else None,
            sp=p["Affine_3"]["scale"] if has_proj else None,
            bp=p["Affine_3"]["bias"] if has_proj else None))
    return blocks


def fused_stage(x: jnp.ndarray, blocks: Sequence[BlockWeights],
                stride: int = 1, interpret: bool = False,
                slices_per_step: int = 1) -> jnp.ndarray:
    """Run a whole bottleneck stage on [BT, H, W, C_in] -> [BT, Ho, Wo, C_out].

    ``slices_per_step`` (k): (b*t) slices per grid step. Slices
    row-concatenate into single [k*H*W, C] matmuls inside the kernel
    (leading-axis batching, NOT python unrolling — the round-2 unrolled
    variant exploded the Mosaic compile; this one's code size is
    k-independent), so larger k amortizes per-step overhead at the cost
    of k x the activation VMEM footprint.
    """
    bt, h, w, cin = x.shape
    ho, wo = h // stride, w // stride
    cout = blocks[0].w3.shape[1]
    k = slices_per_step
    assert bt % k == 0

    operands = [x.astype(jnp.bfloat16)]
    in_specs = [pl.BlockSpec((k, h, w, cin), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)]

    def add_w(a):
        a = a.astype(jnp.bfloat16) if a.ndim >= 2 else \
            a.astype(jnp.float32)[None, :]
        if a.ndim == 4:  # [3,3,F,F] -> [9F, F]
            a = a.reshape(-1, a.shape[-1])
        operands.append(a)
        shp = a.shape
        in_specs.append(pl.BlockSpec(
            shp, (lambda b, n=len(shp): (0,) * n),
            memory_space=pltpu.VMEM))

    for i, blk in enumerate(blocks):
        fields = [blk.w1, blk.s1, blk.b1, blk.w2, blk.s2, blk.b2,
                  blk.w3, blk.s3, blk.b3]
        if i == 0:
            assert blk.wp is not None, "block 0 must carry the projection"
            fields += [blk.wp, blk.sp, blk.bp]
        else:
            assert blk.wp is None
        for a in fields:
            add_w(a)

    kernel = functools.partial(_stage_kernel, n_blocks=len(blocks),
                               stride=stride)
    return pl.pallas_call(
        kernel,
        grid=(bt // k,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((k, ho, wo, cout), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bt, ho, wo, cout), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            # the whole stage's weights + one slice's activations exceed
            # the conservative 16M default scoped limit by ~10%
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
