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
