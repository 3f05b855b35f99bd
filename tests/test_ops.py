"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np

from avtex.classic.d1 import pairwise_l2
from avtex.ops import pairwise_l2_pallas


def test_pairwise_pallas_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((37, 75)), jnp.float32)
    ref = np.asarray(pairwise_l2(x))
    out = np.asarray(pairwise_l2_pallas(x, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4)
    assert np.all(np.diag(out) == 0.0)


def test_pairwise_pallas_normalized(rng):
    x = jnp.asarray(rng.standard_normal((20, 600)), jnp.float32)  # F > BK
    ref = np.asarray(pairwise_l2(x, normalize=True))
    out = np.asarray(pairwise_l2_pallas(x, normalize=True, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_s2d_stem_exact_equivalence(rng):
    """s2d stem must reproduce the plain stride-(1,2,2) torch-padded conv
    (pad (kt//2, 3, 3) — the reference's nn.Conv3d padding) exactly."""
    import jax
    import jax.numpy as jnp
    from avtex.ops.s2d_stem import fast_stem_s2d

    x = jnp.asarray(rng.standard_normal((2, 6, 16, 20, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, 7, 7, 3, 8)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 2, 2),
        padding=((2, 2), (3, 3), (3, 3)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    out = fast_stem_s2d(x, k)
    assert out.shape == ref.shape
    # fp32 reassociation noise only (different contraction order)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_s2d_stem_pooled_exact_equivalence(rng):
    """The fused stem (s2d-via-conv + conv + affine/relu in s2d space +
    pool-de-s2d max, BOTH pool impls) must equal the unfused chain conv
    -> affine -> relu -> max_pool(3, stride 2, pad 1) exactly (fp32)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from avtex.ops import s2d_stem
    from avtex.ops.s2d_stem import fast_stem_s2d_pooled

    x = jnp.asarray(rng.standard_normal((2, 6, 16, 20, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, 7, 7, 3, 8)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(8), jnp.float32)  # signed, like
    bias = jnp.asarray(rng.standard_normal(8), jnp.float32)   # folded BN
    y = jax.lax.conv_general_dilated(
        x, k, (1, 2, 2), ((2, 2), (3, 3), (3, 3)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    ref = nn.max_pool(jax.nn.relu(y * scale + bias), (1, 3, 3), (1, 2, 2),
                      padding=((0, 0), (1, 1), (1, 1)))
    orig = s2d_stem.POOL_IMPL
    try:
        for impl in ("rw", "slice9"):
            s2d_stem.POOL_IMPL = impl
            out = fast_stem_s2d_pooled(x, k, scale, bias)
            assert out.shape == ref.shape
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"pool impl {impl}")
    finally:
        s2d_stem.POOL_IMPL = orig


def test_s2d_stem_pooled_f8_exact(rng):
    """f=8 (full-MXU-lane fast-stem geometry: O=8, H,W divisible by 8;
    opt-in via STEM_F — measured a wash vs f=4 in-context, kept as
    exactness-tested infrastructure) must equal the unfused chain
    exactly, including the 4x4-phase refold before the pool."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from avtex.ops import s2d_stem
    from avtex.ops.s2d_stem import fast_stem_s2d_pooled

    x = jnp.asarray(rng.standard_normal((2, 6, 16, 24, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, 7, 7, 3, 8)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(8), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(8), jnp.float32)
    y = jax.lax.conv_general_dilated(
        x, k, (1, 2, 2), ((2, 2), (3, 3), (3, 3)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    ref = nn.max_pool(jax.nn.relu(y * scale + bias), (1, 3, 3), (1, 2, 2),
                      padding=((0, 0), (1, 1), (1, 1)))
    try:
        s2d_stem.STEM_F = 8
        out8 = fast_stem_s2d_pooled(x, k, scale, bias)
    finally:
        s2d_stem.STEM_F = None
    assert out8.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out8), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # and the default f=4 on the same inputs agrees too
    out4 = fast_stem_s2d_pooled(x, k, scale, bias)
    np.testing.assert_allclose(np.asarray(out4), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_s2d_stem_pooled_kt1_slow_stem(rng):
    """kt=1 (the SLOW stem's geometry: no temporal extent, 64 outputs)
    through the fused s2d stem must equal the unfused chain — this is the
    configuration avtex/nn/slowfast.py routes the slow pathway through."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from avtex.ops.s2d_stem import fast_stem_s2d_pooled

    x = jnp.asarray(rng.standard_normal((2, 3, 16, 20, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 7, 7, 3, 16)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(16), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(16), jnp.float32)
    y = jax.lax.conv_general_dilated(
        x, k, (1, 2, 2), ((0, 0), (3, 3), (3, 3)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    ref = nn.max_pool(jax.nn.relu(y * scale + bias), (1, 3, 3), (1, 2, 2),
                      padding=((0, 0), (1, 1), (1, 1)))
    out = fast_stem_s2d_pooled(x, k, scale, bias)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_s2d_stem_224(rng):
    import jax
    import jax.numpy as jnp
    from avtex.ops.s2d_stem import fast_stem_s2d
    x = jnp.asarray(rng.standard_normal((1, 5, 224, 224, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, 7, 7, 3, 8)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 2, 2), ((2, 2), (3, 3), (3, 3)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    out = fast_stem_s2d(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
