"""SuperSloMo wrapper producing a stitcher-compatible interp_fn.

Mirrors the reference's ``interpolate`` module contract
(reference: interpolate.py:50-146): pad frames to multiples of 32,
mean-normalize, run the nets for t = k/SF, un-normalize. Weights come from
``init_slomo`` (random) or a converted checkpoint; with no weights the
stitcher uses native crossfade instead.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avtex.nn.slomo import SLOMO_MEAN, SuperSloMo


def _pad32(h: int, w: int) -> Tuple[int, int]:
    return -(-h // 32) * 32, -(-w // 32) * 32


def init_slomo(rng=None, size: Tuple[int, int] = (64, 64)):
    """(module, params) with random weights (no pretrained ckpt is shipped
    with the reference either — SURVEY.md §2.4)."""
    if rng is None:
        rng = jax.random.key(0)
    m = SuperSloMo()
    h, w = _pad32(*size)
    params = jax.jit(m.init, static_argnums=3)(rng, jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)),
                    (0.5,))
    return m, params


def make_interp_fn(module: SuperSloMo, params) -> Callable:
    """Returns (frame0 u8, frame1 u8, n_mid) -> [n_mid, H, W, 3] u8."""
    mean = jnp.asarray(SLOMO_MEAN)

    @functools.partial(jax.jit, static_argnames=("n_mid", "ph", "pw"))
    def run(f0, f1, n_mid: int, ph: int, pw: int):
        x0 = f0.astype(jnp.float32) / 255.0 - mean
        x1 = f1.astype(jnp.float32) / 255.0 - mean
        x0 = jnp.pad(x0, ((0, ph - f0.shape[0]), (0, pw - f0.shape[1]),
                          (0, 0)))
        x1 = jnp.pad(x1, ((0, ph - f1.shape[0]), (0, pw - f1.shape[1]),
                          (0, 0)))
        ts = tuple((k + 1) / (n_mid + 1) for k in range(n_mid))
        out = module.apply(params, x0[None], x1[None], ts)[:, 0]
        out = (out + mean) * 255.0
        return jnp.clip(out, 0, 255).astype(jnp.uint8)

    def interp(frame0: np.ndarray, frame1: np.ndarray, n_mid: int
               ) -> np.ndarray:
        h, w = frame0.shape[:2]
        ph, pw = _pad32(h, w)
        out = run(jnp.asarray(frame0), jnp.asarray(frame1), n_mid, ph, pw)
        return np.asarray(out)[:, :h, :w]

    return interp
