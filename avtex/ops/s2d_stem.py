"""Space-to-depth re-expression of the SlowFast stem convolutions.

Written for the fast-pathway stem (the names below keep that history);
every entry point is generic over the temporal kernel extent, and the
slow stem — the kt=1, O=64 case of the same stride-(1,2,2) 7x7 conv —
uses `fast_stem_s2d_pooled` too (avtex/nn/slowfast.py, affine mode).

The stem conv bf16[B,32,224,224,3] ⊛ (5,7,7,3,8) -> [B,32,112,112,8] is the
single hottest op of the embed path (profiled ~30 % of device time at ~5 %
MXU utilization): its 8 output channels occupy 8 of the MXU's 128 lanes.

Exact-equivalence transform: space-to-depth the input by 4 in H,W (channels
3 -> 48) and group 2x2 output positions into channels (8 -> 32 lanes), so
the same arithmetic runs as a (5,3,3,48,32) stride-1 conv — 4x the output
lanes and a 720-deep contraction. The kernel is a zero-scattered
rearrangement of the original weights; equivalence is bit-exact in fp32
(see tests/test_ops.py).

Derivation (per spatial axis, stride 2, kernel 7): in PADDED coordinates
the tap index is always
  out[2I+a] = sum_kh xp[4I + (2a+kh)] K[kh]
independent of the pad split — the left-pad amount only decides which
input value sits at each padded index. Writing 2a+kh = 4*dU + u (dU in
{0,1,2}, u in {0..3}), the tap lands on s2d row I+dU, phase-channel u.
Output phase a selects the output-channel block. Padding here is
torch-explicit (3,3) to match the reference's nn.Conv3d(padding=3)
tap alignment (see avtex/nn/slowfast.py padding contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def s2d_stem_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(kt,7,7,C,O) stride-2 stem weights -> (kt,3,3,16*C,4*O) s2d weights."""
    kt, kh_n, kw_n, c, o = k.shape
    assert kh_n == 7 and kw_n == 7
    out = jnp.zeros((kt, 3, 3, 16 * c, 4 * o), dtype=k.dtype)
    for a in range(2):
        for b in range(2):
            for kh in range(7):
                for kw in range(7):
                    du, u = divmod(2 * a + kh, 4)
                    dv, v = divmod(2 * b + kw, 4)
                    ci = (u * 4 + v) * c
                    oi = (a * 2 + b) * o
                    out = out.at[:, du, dv, ci:ci + c, oi:oi + o].set(
                        k[:, kh, kw])
    return out


@functools.partial(jax.jit, static_argnames=())
def fast_stem_s2d(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Apply the stride-(1,2,2) torch-padded stem conv via s2d.

    Args:
      x: [B, T, H, W, C] with H, W divisible by 4.
      k: original stem weights [kt, 7, 7, C, O] (kt odd).

    Returns:
      [B, T, H//2, W//2, O] — identical to
      lax.conv(x, k, strides (1,2,2), padding ((kt//2,)*2, (3,3), (3,3)))
      (torch nn.Conv3d(padding=(kt//2, 3, 3)) semantics).
    """
    b, t, h, w, c = x.shape
    kt, _, _, _, o = k.shape
    tp = kt // 2
    # torch pads for kernel 7 are (3, 3); extend the right pad so the
    # padded extent is divisible by 4 (extra zero columns never reach a
    # surviving tap).
    pad_r_h = 3 + (-(h + 3 + 3)) % 4
    pad_r_w = 3 + (-(w + 3 + 3)) % 4
    xp = jnp.pad(x, ((0, 0), (tp, tp), (3, pad_r_h), (3, pad_r_w), (0, 0)))
    hp, wp = xp.shape[2], xp.shape[3]
    x4 = (xp.reshape(b, t + 2 * tp, hp // 4, 4, wp // 4, 4, c)
          .transpose(0, 1, 2, 4, 3, 5, 6)
          .reshape(b, t + 2 * tp, hp // 4, wp // 4, 16 * c))
    kp = s2d_stem_kernel(k)
    y = jax.lax.conv_general_dilated(
        x4, kp, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)
    # y: [B, T, h//4, w//4, 4*O] -> de-s2d 2x2 output phases
    oh, ow = y.shape[2], y.shape[3]
    out = (y.reshape(b, t, oh, ow, 2, 2, o)
           .transpose(0, 1, 2, 4, 3, 5, 6)
           .reshape(b, t, 2 * oh, 2 * ow, o))
    return out[:, :, : h // 2, : w // 2]


def _s2d4_via_conv(x: jnp.ndarray) -> jnp.ndarray:
    """Space-to-depth by 4 expressed as a one-hot conv with the spatial
    pads folded in — ONE streaming op instead of the pad + transpose +
    reshape chain, which the TPU backend materializes as ~14 ms of layout
    copies at batch 64 (profiled: copy.34/copy.35/copy.36 + pad.2 in the
    stems HLO, 2026-08 round 3). The temporal pad is NOT applied here —
    it folds into the following conv's padding.

    x: [B, T, H, W, C] -> [B, T, (H+6+pad_r)/4, (W+6+pad_r)/4, 16*C]
    with phase-major channels (u*4+v)*C + c, matching s2d_stem_kernel.
    """
    b, t, h, w, c = x.shape
    pad_r_h = 3 + (-(h + 6)) % 4
    pad_r_w = 3 + (-(w + 6)) % 4
    eye = np.zeros((1, 4, 4, c, 16 * c), np.float32)
    for u in range(4):
        for v in range(4):
            for ci in range(c):
                eye[0, u, v, ci, (u * 4 + v) * c + ci] = 1.0
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(eye, x.dtype), window_strides=(1, 4, 4),
        padding=((0, 0), (3, pad_r_h), (3, pad_r_w)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


POOL_IMPL = "rw"  # "rw" | "slice9" — see _pool_des2d


def _pool_des2d(y: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 pad-1 spatial maxpool of the DENSE [2H,2W] image,
    computed directly from its s2d-by-2 phase planes — the de-s2d
    transpose and the pool collapse into streaming max ops.

    y: [B, T, H, W, 4*O] phase-major ((a*2+b)*O + c, a=row phase).
    Returns [B, T, H, W, O].

    Derivation: dense tap 2i+d (d in {-1,0,1}) lives at s2d row
    (i, phase 0/1) for d in {0,1} and (i-1, phase 1) for d = -1; columns
    are independent, so the 3x3 dense window is SEPARABLE per phase:
    phase (a,b)'s contribution is a (1+a)x(1+b) windowed max with
    top/left -inf pad a/b (exactly the pool's pad=1 semantics; the dense
    window never reaches the bottom or right edge pads).

    Two exact implementations (POOL_IMPL / the ``impl`` argument):

    - "rw" (default): per-phase `lax.reduce_window` + a 4-way max. Each
      phase plane is read once with a local access pattern.
    - "slice9": 9 shifted-slice terms reduced by jnp.maximum. Measured
      SLOWER at batch 64 (slow pool 9.2 ms vs the conv's own 2.3 ms):
      XLA materializes the shifted pad copies as full-tensor fusions
      (profiled round 3, tools/op_trace.py).
    """
    o = y.shape[-1] // 4
    p = [y[..., k * o:(k + 1) * o] for k in range(4)]

    if POOL_IMPL == "rw":
        neg = jnp.array(-jnp.inf, y.dtype)

        def rw(z, wh, ww):
            return jax.lax.reduce_window(
                z, neg, jax.lax.max, (1, 1, wh, ww, 1), (1, 1, 1, 1, 1),
                ((0, 0), (0, 0), (wh - 1, 0), (ww - 1, 0), (0, 0)))

        return jnp.maximum(jnp.maximum(p[0], rw(p[1], 1, 2)),
                           jnp.maximum(rw(p[2], 2, 1), rw(p[3], 2, 2)))

    def sh(z, dh, dw):
        h_, w_ = z.shape[2], z.shape[3]
        pad = ((0, 0), (0, 0), (dh, 0), (dw, 0), (0, 0))
        z = jnp.pad(z, pad, constant_values=-jnp.inf)
        return z[:, :, :h_, :, :][:, :, :, :w_, :]

    terms = [p[0], p[1], sh(p[1], 0, 1), p[2], sh(p[2], 1, 0),
             p[3], sh(p[3], 0, 1), sh(p[3], 1, 0), sh(p[3], 1, 1)]
    return functools.reduce(jnp.maximum, terms)


def fast_stem_s2d_pooled(x: jnp.ndarray, k: jnp.ndarray,
                         scale: jnp.ndarray,
                         bias: jnp.ndarray) -> jnp.ndarray:
    """The full fast-pathway stem — stride-(1,2,2) torch-padded conv,
    per-channel affine (folded frozen BN), relu, 3x3 stride-2 pad-1
    maxpool — computed end-to-end in s2d space:

      1. input s2d by 4 as a one-hot conv (pads folded; no transposes),
      2. the (kt,3,3,16C,4O) scattered-weight conv (T pad folded),
      3. affine+relu on phase-major channels (scale/bias tiled 4x),
      4. pool + de-s2d as a 9-slice max (_pool_des2d).

    Exactly equals (fp32)
      max_pool(relu(conv(x) * scale + bias), (3,3), (2,2), pad 1)
    and replaces ~18 ms of layout copies around the batch-64 stem with
    streaming ops (see tools/stem_bench.py for the A/B).

    Affine-norm inference path only: GroupNorm needs dense-layout stats
    ordering and keeps the fast_stem_s2d + module-norm + max_pool chain.
    """
    assert x.shape[2] % 4 == 0 and x.shape[3] % 4 == 0, (
        "fast_stem_s2d_pooled requires H, W divisible by 4 "
        f"(got {x.shape}); VALID s2d-conv rows are exact only then")
    kt = k.shape[0]
    x4 = _s2d4_via_conv(x)
    kp = s2d_stem_kernel(k)
    y = jax.lax.conv_general_dilated(
        x4, kp, window_strides=(1, 1, 1),
        padding=((kt // 2, kt // 2), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)
    # y: [B, T, H//4, W//4, 4*O] — exact (pad_r extends H+6 to a multiple
    # of 4, and (H+8)/4 - 2 == H//4 when H % 4 == 0)
    sc = jnp.tile(scale.astype(y.dtype), 4)
    bi = jnp.tile(bias.astype(y.dtype), 4)
    y = jax.nn.relu(y * sc + bi)
    return _pool_des2d(y)
