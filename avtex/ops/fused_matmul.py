"""Fused 1x1-conv + folded-norm + residual + relu as one Pallas kernel.

Why this exists (profiled on v5e, batch-128 SlowFast affine embed): XLA
cannot fuse elementwise consumers into convolution outputs, so every
bottleneck's ``relu(conv3(y)*scale + bias + residual)`` runs as a conv
followed by a separate ``add_maximum`` fusion — a full extra read+write of
the block's largest activation. Those elementwise passes alone were 51 ms
of a 164 ms embed (31%). Here the whole epilogue happens in the matmul's
VMEM accumulator: one read of y, one read of the residual, one write.

Scope: K >= 128 and N >= 128 only — the slow pathway's bottlenecks, which
own the largest activations. G-folding small-channel fast-tower convs
(reshape [M, K] -> [M/G, G*K] with block-diagonal kron(I_G, w)) was built
and measured, and REJECTED: the folded reshape forces the producer chain
out of XLA's packed small-channel layouts into canonical row-major, whose
(8,128) tiling pads C=8 activations 16x — the stem relu alone ballooned to
12.25 GB of HBM temp and the whole model OOMed. Sub-128-channel convs stay
on the XLA path (fallback below), which keeps the packed layouts.

Inference-path only: pallas_call has no automatic VJP, and the fused
epilogue exists for the ``norm="affine"`` (frozen-BN) configuration —
training runs GroupNorm, whose statistics cannot fold into an epilogue
anyway. Non-TPU backends fall back to the identical jnp expression.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 256
BN = 512
BK = 512


def _kernel_res(x_ref, w_ref, s_ref, b_ref, r_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        y = acc_ref[:] * s_ref[0, :] + b_ref[0, :]
        y = y + r_ref[:].astype(jnp.float32)
        o_ref[:] = jnp.maximum(y, 0.0).astype(o_ref.dtype)


def _kernel_nores(x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref, *, relu):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        y = acc_ref[:] * s_ref[0, :] + b_ref[0, :]
        if relu:
            y = jnp.maximum(y, 0.0)
        o_ref[:] = y.astype(o_ref.dtype)


def _jnp_reference(x, w, scale, bias, residual, relu):
    """XLA fallback, kept in the input's native rank: reshaping [..., C<128]
    activations to 2D forces XLA out of its packed small-channel layouts
    into canonical row-major (measured: giant relayout while-loops around
    every call). A 1x1 conv on the original N-D tensor lets XLA keep the
    layouts it picked for the surrounding convs."""
    if x.ndim == 2:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    else:
        lhs = x[None] if x.ndim == 3 else x
        kern = w.astype(x.dtype)[(None,) * (lhs.ndim - 2)]
        dn = {4: ("NHWC", "HWIO", "NHWC"),
              5: ("NDHWC", "DHWIO", "NDHWC")}[lhs.ndim]
        y = jax.lax.conv_general_dilated(
            lhs, kern, (1,) * (lhs.ndim - 2), "VALID",
            dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        if x.ndim == 3:
            y = y[0]
    y = y * scale + bias
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


def fused_conv1x1(x: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray,
                  bias: jnp.ndarray, residual: jnp.ndarray = None,
                  relu: bool = True, interpret: bool = False,
                  force_pallas: bool = False) -> jnp.ndarray:
    """relu((x @ w) * scale + bias [+ residual]) with everything fused.

    Args:
      x: [..., K] activations (any leading shape; flattened to M rows).
      w: [K, N] 1x1-conv kernel.
      scale, bias: [N] folded-norm affine (Affine module params).
      residual: optional [..., N], added before relu (the block shortcut).
      relu: apply the final relu (shortcut-projection calls skip it).

    Returns [..., N] in x's dtype (bf16 in production towers).
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = w.shape[-1]
    M = 1
    for d in lead:
        M *= d

    G = 1  # see module docstring: G-folding rejected for layout reasons

    use_pallas = ((force_pallas or interpret
                   or jax.default_backend() == "tpu")
                  and K >= 128 and N >= 128)
    # Row-block size: the largest power of two (<= BM) dividing the folded
    # row count — e.g. the 7x7 final stage gives M/G = B*T*49, which is not
    # a 256-multiple for every batch.
    bm = BM
    while bm > 4 and (M // G) % bm != 0:
        bm //= 2
    if (not use_pallas or M % G != 0 or (M // G) % bm != 0 or bm < 8
            or (G * K) % 128 != 0 or (G * N) % 128 != 0):
        out = _jnp_reference(x, w, scale, bias, residual, relu)
        return out.astype(x.dtype).reshape(lead + (N,))

    K2, N2 = G * K, G * N
    dtype = x.dtype

    def _divisor_block(dim, cap):
        b = cap
        while b > 8 and dim % b != 0:
            b //= 2
        return b

    bk = _divisor_block(K2, BK)
    bn = _divisor_block(N2, BN)
    if K2 % bk != 0 or N2 % bn != 0 or bn % 128 != 0:
        out = _jnp_reference(x.reshape(M, K), w, scale, bias,
                             None if residual is None
                             else residual.reshape(M, N), relu)
        return out.astype(x.dtype).reshape(lead + (N,))
    # Reshape straight to the folded 2D form — an [M, K<128] intermediate
    # would carry a lane-padded layout (16x HBM for K=8) if it ever
    # materialized at a call boundary.
    xf = x.reshape(M // G, K2)
    if G > 1:
        w2 = jnp.einsum("gh,kn->gkhn", jnp.eye(G, dtype=w.dtype), w)
        w2 = w2.reshape(K2, N2)
        s2 = jnp.tile(scale.astype(jnp.float32), G)[None, :]
        b2 = jnp.tile(bias.astype(jnp.float32), G)[None, :]
    else:
        w2 = w
        s2 = scale.astype(jnp.float32)[None, :]
        b2 = bias.astype(jnp.float32)[None, :]
    w2 = w2.astype(dtype)

    grid = (M // G // bm, N2 // bn, K2 // bk)
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xf, w2, s2, b2]
    if residual is not None:
        kernel = _kernel_res
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                                     memory_space=pltpu.VMEM))
        operands.append(residual.reshape(M // G, N2).astype(dtype))
        assert relu, "residual epilogue always ends in relu (block output)"
    else:
        kernel = functools.partial(_kernel_nores, relu=relu)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M // G, N2), dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K2 * N2 // G,
            bytes_accessed=(M * K + K2 * N2 + M * N
                            + (M * N if residual is not None else 0)) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(lead + (N,))
