"""Tiled all-pairs L2 distance as a Pallas TPU kernel.

The classic baseline's D1 matrix (reference: computeD1.py:47-96) is the
O(N² F) hot op. The XLA Gram-form version (avtex/classic/d1.py) already
avoids the reference's materialized [N, N, F] repeats; this kernel goes
further for large F: the feature axis is tiled through VMEM with an fp32
accumulator, and the ‖a‖² + ‖b‖² − 2ab, clamp, sqrt and diagonal-zero all
fuse into the final k-step — one pass over HBM for the feature matrix, one
write of the output block.

Grid: (N/BN, N/BN, F/BK), k innermost so each output block accumulates in
a VMEM scratch across k-steps (see pallas_guide.md "Grid and Block
Specifications" / accumulation pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN = 128   # output tile (MXU-aligned)
BK = 512   # feature tile


def _kernel(x_ref, y_ref, sq_ref, out_ref, acc_ref):
    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], y_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _():
        sq_i = sq_ref[0, pl.ds(i * BN, BN)]
        sq_j = sq_ref[0, pl.ds(j * BN, BN)]
        d2 = sq_i[:, None] + sq_j[None, :] - 2.0 * acc_ref[:]
        d2 = jnp.maximum(d2, 0.0)
        row = jax.lax.broadcasted_iota(jnp.int32, (BN, BN), 0) + i * BN
        col = jax.lax.broadcasted_iota(jnp.int32, (BN, BN), 1) + j * BN
        d2 = jnp.where(row == col, 0.0, d2)  # exact zeros on the diagonal
        out_ref[:] = jnp.sqrt(d2)


@functools.partial(jax.jit, static_argnames=("normalize", "interpret"))
def pairwise_l2_pallas(feats: jnp.ndarray, normalize: bool = False,
                       interpret: bool = False) -> jnp.ndarray:
    """[N, N] pairwise L2 distances between rows of [N, F].

    Same semantics as avtex.classic.d1.pairwise_l2; pads N to 128 and F to
    512 (zero-padding features is exact for L2).
    """
    x = feats.reshape(feats.shape[0], -1).astype(jnp.float32)
    if normalize:
        x = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
    n, f = x.shape
    n_pad = (-n) % BN
    f_pad = (-f) % BK
    xp = jnp.pad(x, ((0, n_pad), (0, f_pad)))
    np_, fp_ = xp.shape
    sq = jnp.sum(xp * xp, axis=1)[None, :]  # [1, N] (2D for SMEM-friendliness)

    grid = (np_ // BN, np_ // BN, fp_ // BK)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BN, BK), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, BK), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BN, BN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BN, BN), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * np_ * fp_,
            bytes_accessed=2 * np_ * fp_ * 4 + np_ * np_ * 4,
            transcendentals=np_ * np_,
        ),
        interpret=interpret,
    )(xp, xp, sq)
    return out[:n, :n]
