"""Space-to-depth re-expression of the SlowFast fast-pathway stem.

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
