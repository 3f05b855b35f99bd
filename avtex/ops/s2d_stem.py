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


def s2d_stem_kernel(k: jnp.ndarray, f: int = 4) -> jnp.ndarray:
    """(kt,7,7,C,O) stride-2 stem weights -> s2d-by-``f`` scattered weights.

    f=4: (kt,3,3,16C,4O) — 4x the output lanes (the original transform).
    f=8: (kt,2,2,64C,16O) — 16x the lanes; with O=8 (the fast stem) the
    128-lane MXU is exactly full. Same derivation with 2a+kh = f*dU + u.
    """
    kt, kh_n, kw_n, c, o = k.shape
    assert kh_n == 7 and kw_n == 7
    op = f // 2
    ksz = (2 * (op - 1) + 6) // f + 1
    out = jnp.zeros((kt, ksz, ksz, f * f * c, op * op * o), dtype=k.dtype)
    for a in range(op):
        for b in range(op):
            for kh in range(7):
                for kw in range(7):
                    du, u = divmod(2 * a + kh, f)
                    dv, v = divmod(2 * b + kw, f)
                    ci = (u * f + v) * c
                    oi = (a * op + b) * o
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


def _s2d_via_conv(x: jnp.ndarray, f: int = 4) -> jnp.ndarray:
    """Space-to-depth by ``f`` expressed as a one-hot conv with the
    spatial pads folded in — ONE streaming op instead of the pad +
    transpose + reshape chain, which the TPU backend materializes as
    ~14 ms of layout copies at batch 64 (profiled: copy.34/copy.35/
    copy.36 + pad.2 in the stems HLO, 2026-08 round 3). The temporal pad
    is NOT applied here — it folds into the following conv's padding.

    x: [B, T, H, W, C] -> [B, T, (H+6+pad_r)/f, (W+6+pad_r)/f, f*f*C]
    with phase-major channels (u*f+v)*C + c, matching s2d_stem_kernel.
    """
    b, t, h, w, c = x.shape
    pad_r_h = 3 + (-(h + 6)) % f
    pad_r_w = 3 + (-(w + 6)) % f
    eye = np.zeros((1, f, f, c, f * f * c), np.float32)
    for u in range(f):
        for v in range(f):
            for ci in range(c):
                eye[0, u, v, ci, (u * f + v) * c + ci] = 1.0
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(eye, x.dtype), window_strides=(1, f, f),
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


STEM_F = None  # None = auto; 4|8 pins the factor for A/B tooling


def _refold_8_to_4(y: jnp.ndarray) -> jnp.ndarray:
    """f=8 conv output [B,T,Hb,Wb,16O] (4x4 spatial phases, phase-major
    (a*4+b)*O) -> the f=4 layout [B,T,2Hb,2Wb,4O] the pool consumes.

    Dense row 4I+a = 2*(2I + a//2) + a%2, so the high phase bit becomes
    the new block row and the low bit the f=4 row phase (same per axis).
    One transpose-copy; XLA fuses the preceding affine+relu into it.
    """
    b, t, hb, wb, cc = y.shape
    o = cc // 16
    y = y.reshape(b, t, hb, wb, 2, 2, 2, 2, o)   # [ah, al, bh, bl, o]
    y = y.transpose(0, 1, 2, 4, 3, 6, 5, 7, 8)   # b,t,hb,ah,wb,bh,al,bl,o
    return y.reshape(b, t, 2 * hb, 2 * wb, 4 * o)


def fast_stem_s2d_pooled(x: jnp.ndarray, k: jnp.ndarray,
                         scale: jnp.ndarray,
                         bias: jnp.ndarray) -> jnp.ndarray:
    """The full stem — stride-(1,2,2) torch-padded conv, per-channel
    affine (folded frozen BN), relu, 3x3 stride-2 pad-1 maxpool —
    computed end-to-end in s2d space:

      1. input s2d by f as a one-hot conv (pads folded; no transposes),
      2. the scattered-weight conv (T pad folded) — f=4: (kt,3,3,16C,4O);
         f=8: (kt,2,2,64C,16O), filling all 128 MXU lanes when O=8 (the
         fast stem, whose f=4 conv at 32 lanes was the single largest op
         of the embed program — tools/op_trace.py, round 3),
      3. affine+relu on phase-major channels (scale/bias tiled),
      4. f=8 only: refold the 4x4 output phases to the f=4 layout (one
         transpose, fused with 3),
      5. pool + de-s2d as separable per-phase reduce_window
         (_pool_des2d).

    Exactly equals (fp32)
      max_pool(relu(conv(x) * scale + bias), (3,3), (2,2), pad 1).

    Affine-norm inference path only: GroupNorm needs dense-layout stats
    ordering and keeps the fast_stem_s2d + module-norm + max_pool chain.
    """
    assert x.shape[2] % 4 == 0 and x.shape[3] % 4 == 0, (
        "fast_stem_s2d_pooled requires H, W divisible by 4 "
        f"(got {x.shape}); VALID s2d-conv rows are exact only then")
    kt, o = k.shape[0], k.shape[-1]
    # Auto = f=4. f=8 fills all 128 MXU lanes for the O=8 fast stem but
    # measured a WASH in-context at batch 64 (stems 65.4 vs 65.2 ms,
    # full trunk 142.4 vs 145.4 — within pool noise, 2026-08 round 3):
    # the conv is not lane-limited at these shapes, and the 4x4-phase
    # refold spends what the extra lanes save. Kept opt-in (STEM_F=8,
    # exactness-tested) for future hardware where the balance differs.
    f = STEM_F or 4
    if f == 8 and not (o <= 8 and x.shape[2] % 8 == 0
                       and x.shape[3] % 8 == 0):
        f = 4
    xf = _s2d_via_conv(x, f)
    kp = s2d_stem_kernel(k, f)
    y = jax.lax.conv_general_dilated(
        xf, kp, window_strides=(1, 1, 1),
        padding=((kt // 2, kt // 2), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)
    # y: [B, T, H//f, W//f, (f/2)^2*O] — exact (pad_r extends H+6 to a
    # multiple of f, and the VALID window count lands on H//f when
    # H % f == 0)
    reps = (f // 2) ** 2
    sc = jnp.tile(scale.astype(y.dtype), reps)
    bi = jnp.tile(bias.astype(y.dtype), reps)
    y = jax.nn.relu(y * sc + bi)
    if f == 8:
        y = _refold_8_to_4(y)
    return _pool_des2d(y)
