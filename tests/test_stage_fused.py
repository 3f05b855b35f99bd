"""Whole-stage fused kernel (avtex/ops/stage_fused.py) correctness.

Interpret-mode Pallas vs the jnp reference, and the whole path (weight
extraction + kernel) vs the actual flax SFBottleneck chain it replaces.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avtex.ops.stage_fused import (BlockWeights, fused_stage,
                                   stage_reference,
                                   stage_weights_from_params)


def _mk(g, *shape, scale=0.1):
    return jnp.asarray(g.standard_normal(shape).astype(np.float32) * scale)


def _make_block(g, cin, f, cout, proj):
    return BlockWeights(
        w1=_mk(g, cin, f), s1=_mk(g, f, scale=0.2) + 1, b1=_mk(g, f),
        w2=_mk(g, 3, 3, f, f, scale=0.05),
        s2=_mk(g, f, scale=0.2) + 1, b2=_mk(g, f),
        w3=_mk(g, f, cout), s3=_mk(g, cout, scale=0.2) + 1, b3=_mk(g, cout),
        wp=_mk(g, cin, cout) if proj else None,
        sp=(_mk(g, cout, scale=0.2) + 1) if proj else None,
        bp=_mk(g, cout) if proj else None)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("k", [1, 2, 3])
def test_fused_stage_matches_reference(stride, k):
    g = np.random.default_rng(0)
    cin, f, cout = 24, 16, 64
    blocks = [_make_block(g, cin, f, cout, True),
              _make_block(g, cout, f, cout, False)]
    x = _mk(g, 6, 16, 16, cin, scale=1).astype(jnp.bfloat16)
    ref = np.asarray(stage_reference(x, blocks, stride), np.float32)
    got = np.asarray(fused_stage(x, blocks, stride, interpret=True,
                                 slices_per_step=k), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_fused_stage_matches_flax_blocks():
    """Extracted weights + kernel reproduce the flax SFBottleneck chain
    (affine mode) — the exact computation the fusion replaces."""
    import flax.linen as nn

    from avtex.nn.slowfast import SFBottleneck

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, x):
            # mimic a slow res-stage: t_kernel=1, stride 2 on block 0
            x = SFBottleneck(16, 1, 2, dtype=jnp.float32, norm="affine",
                             fuse=False, name="SFBottleneck_0")(x)
            x = SFBottleneck(16, 1, 1, dtype=jnp.float32, norm="affine",
                             fuse=False, name="SFBottleneck_2")(x)
            return x

    g = np.random.default_rng(1)
    x5 = jnp.asarray(g.random((2, 3, 16, 16, 24)).astype(np.float32))
    m = Stage()
    params = m.init(jax.random.key(0), x5)
    # randomize affines so folding is non-trivial
    params = jax.tree.map(
        lambda a: jnp.asarray(
            np.random.default_rng(3).standard_normal(a.shape)
            .astype(np.float32) * 0.1 + (1.0 if a.ndim == 1 else 0.0)),
        params)
    want = np.asarray(m.apply(params, x5), np.float32)

    blocks = stage_weights_from_params(params, [0, 2])
    bt = x5.shape[0] * x5.shape[1]
    x4 = x5.reshape((bt,) + x5.shape[2:])
    got = np.asarray(
        fused_stage(x4, blocks, stride=2, interpret=True), np.float32)
    got = got.reshape(want.shape)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_stage_weights_rejects_temporal_conv1():
    from avtex.nn.slowfast import SFBottleneck
    m = SFBottleneck(8, 3, 1, dtype=jnp.float32, norm="affine", fuse=False,
                     name="SFBottleneck_0")
    x = jnp.zeros((1, 4, 8, 8, 8))
    params = {"params": {"SFBottleneck_0":
                         m.init(jax.random.key(0), x)["params"]}}
    with pytest.raises(ValueError):
        stage_weights_from_params(params, [0])
