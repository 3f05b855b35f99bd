"""Exactness tests for the fused 1x1-conv + affine + residual + relu kernel
(avtex/ops/fused_matmul.py), in Pallas interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avtex.ops.fused_matmul import fused_conv1x1, _jnp_reference


def _case(M, K, N, residual, relu, seed=0):
    g = np.random.default_rng(seed)
    x = jnp.asarray(g.standard_normal((M, K)).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(g.standard_normal((K, N)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    scale = jnp.asarray(g.random(N).astype(np.float32) + 0.5)
    bias = jnp.asarray(g.standard_normal(N).astype(np.float32) * 0.1)
    r = (jnp.asarray(g.standard_normal((M, N)).astype(np.float32),
                     jnp.bfloat16) if residual else None)
    got = np.asarray(fused_conv1x1(x, w, scale, bias, residual=r,
                                   relu=relu, interpret=True),
                     dtype=np.float32)
    want = np.asarray(_jnp_reference(x, w, scale, bias, r, relu)
                      .astype(jnp.bfloat16), dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("K,N", [(128, 512), (256, 1024)])
def test_fused_no_fold(K, N):
    _case(512, K, N, residual=True, relu=True)


@pytest.mark.parametrize("K,N,G", [(8, 32, 16), (16, 64, 8), (64, 256, 2)])
def test_fused_small_channels_fall_back(K, N, G):
    """Sub-128-channel shapes take the XLA fallback (G-folding was measured
    and rejected — see module docstring); numerics must be unchanged."""
    M = 256 * G * 2
    _case(M, K, N, residual=True, relu=True)


def test_fused_no_residual_no_relu():
    _case(512, 128, 512, residual=False, relu=False)


def test_fused_odd_rows_fall_back():
    """Row counts that defeat blocking take the jnp path, same numerics."""
    _case(8 * 49, 128, 256, residual=True, relu=True)  # 392 rows -> bm=8
    _case(100, 128, 256, residual=False, relu=True)    # non-pow2 fallback


@pytest.mark.parametrize("K,N", [(1280, 256), (320, 1024)])
def test_fused_non_pow2_k(K, N):
    """Non-power-of-two contraction dims (lateral-concat channel counts)
    must tile with a dividing block or fall back — never drop columns."""
    _case(512, K, N, residual=True, relu=True)
