"""Mesh-sharded classic pipeline: row-block SPMD over the 'data' axis.

The single-chip fused pipeline (avtex/classic/fused.py) holds the whole
[N, N] matrix chain on one device; its memory and FLOPs are O(N^2 [F]).
This variant shards the heavy stages by OUTPUT-ROW BLOCKS across a
`jax.sharding.Mesh`, the classic analogue of the segment-axis embed
sharding (avtex/parallel/sharded.py; SURVEY.md §5.7 — the reference's
only answer at scale is CPU/GPU tiling loops, computeD1.py:58-96):

- D1: each shard computes its Gram row block [rows_local, N] from the
  replicated features (one local MXU matmul; no [N, N] materialization
  anywhere).
- D2: the diagonal-binomial smoothing consumes only the local block
  (the fs-row halo is folded into the block's row range).
- D3: Jacobi value iteration with a per-sweep `all_gather` of the
  per-row mins (a [M]-vector — the ONLY cross-shard traffic) and a
  `psum` of the convergence delta, inside `lax.while_loop` inside
  `shard_map`.

The assembled D3 then runs the cheap finishing math (probs + shift +
threshold) replicated, reusing the single-device code. Numerics match
the fused path (tests/test_parallel.py::test_classic_sharded_matches);
the reference quirks (row 0 never updated, diagonal-zero D1, the
one-row P shift) are preserved exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .d1 import distance_to_transition_probs
from .d2 import binomial_coeffs
from .future_cost import threshold_rows


def classic_transition_matrix_sharded(
        feats, mesh: Mesh, sigma_factor: float, *,
        filter_size: int = 16, stride: int = 1, normalize: bool = False,
        p: float = 0.7, alpha: float = 0.997, eps: float = 1e-2,
        thresholding: float = 0.75, axis: str = "data") -> jnp.ndarray:
    """P3_new from row-block-sharded D1/D2/D3 over ``mesh[axis]``."""
    x = jnp.asarray(feats, jnp.float32).reshape(np.asarray(feats).shape[0],
                                                -1)
    n, _ = x.shape
    fs, s = filter_size, stride
    m = (n - fs) // s + 1            # D2/D3 matrix size (valid mode)
    ndev = mesh.shape[axis]
    mp = -(-m // ndev)               # rows per shard (padded tail)
    coeffs = jnp.asarray(binomial_coeffs(fs), jnp.float32)

    if normalize:
        x = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-12)

    def shard_body(xf):
        sid = jax.lax.axis_index(axis)
        i0 = sid * mp
        # ---- local D1 row block (rows i0*s .. i0*s + (mp-1)*s + fs) --- #
        r = (mp - 1) * s + fs
        rows = jnp.clip(i0 * s + jnp.arange(r), 0, n - 1)
        a = xf[rows]
        sq_a = jnp.sum(a * a, axis=1)
        sq_b = jnp.sum(xf * xf, axis=1)
        gram = jax.lax.dot_general(
            a, xf, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        d2sq = jnp.maximum(sq_a[:, None] + sq_b[None, :] - 2.0 * gram, 0.0)
        # exact diagonal zeros, like pairwise_l2
        d2sq = d2sq * (rows[:, None] != jnp.arange(n)[None, :])
        b = jnp.sqrt(d2sq)
        # ---- D2: diagonal binomial smoothing of the local block ------- #
        acc = jnp.zeros((mp, m), jnp.float32)
        for k in range(fs):
            blk = jax.lax.slice(b, (k, k),
                                (k + (mp - 1) * s + 1, k + (m - 1) * s + 1),
                                (s, s))
            acc = acc + coeffs[k] * blk
        # ---- D3: Jacobi sweeps with all_gather'd mins ----------------- #
        base = acc.astype(jnp.float32) ** p
        row_ids = i0 + jnp.arange(mp)
        real = (row_ids < m).astype(jnp.float32)
        diag_inf = jnp.where(row_ids[:, None] == jnp.arange(m)[None, :],
                             jnp.inf, 0.0)

        def sweep(state):
            d3_old, _, it = state
            mins_local = jnp.min(d3_old + diag_inf, axis=1)
            mins = jax.lax.all_gather(mins_local, axis, tiled=True)[:m]
            d3_new = jnp.where((row_ids >= 1)[:, None],
                               base + alpha * mins[None, :], base)
            delta = jax.lax.psum(
                jnp.sum(((d3_new - d3_old) * real[:, None]) ** 2), axis)
            return d3_new, delta / (m * m), it + 1

        def cont(state):
            _, delta, it = state
            return jnp.logical_and(delta > eps, it < 10_000)

        init = (base, jnp.float32(jnp.inf), jnp.int32(0))
        d3, _, _ = jax.lax.while_loop(cont, sweep, init)
        return d3

    from jax.experimental.shard_map import shard_map
    spec_rows = P(*[axis if i == 0 else None for i in range(2)])
    fn = shard_map(shard_body, mesh=mesh, in_specs=P(None, None),
                   out_specs=spec_rows, check_rep=False)

    @functools.partial(jax.jit,
                       out_shardings=NamedSharding(mesh, P(None, None)))
    def finish(xf):
        d3 = fn(xf)[:m]
        p3, _ = distance_to_transition_probs(d3, sigma_factor)
        return threshold_rows(p3, thresholding)

    return finish(jax.device_put(x, NamedSharding(mesh, P(None, None))))
