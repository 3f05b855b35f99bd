"""Encoder zoo + contrastive model shape/semantics tests (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avtex.contrastive.model import ContrastiveTextures, SegmentEmbedder
from avtex.nn import build_encoder, slowfast_pathways
from avtex.nn.vggish import VGGish, vggish_feat_dim


@pytest.mark.parametrize("arch,expect_dim", [
    ("resnet10", 512), ("resnet18", 512), ("resnet50", 2048),
    ("resnext50", 2048), ("densenet121", 1024), ("slowfast", 2304),
])
def test_encoder_feat_dims(arch, expect_dim):
    module, feat_dim, kind = build_encoder(arch)
    assert feat_dim == expect_dim
    assert kind == ("slowfast" if arch == "slowfast" else "clip")


@pytest.mark.parametrize("arch", ["resnet10"])
def test_clip_encoder_forward(arch):
    module, feat_dim, _ = build_encoder(arch)
    x = jnp.zeros((2, 4, 32, 32, 3))
    params = module.init(jax.random.key(0), x)
    out = module.apply(params, x)
    assert out.shape == (2, feat_dim)
    assert out.dtype == jnp.float32


@pytest.mark.slow
def test_slowfast_forward():
    module, feat_dim, _ = build_encoder("slowfast")
    frames = jnp.zeros((1, 10, 24, 24, 3))
    slow, fast = slowfast_pathways(frames)
    assert slow.shape == (1, 8, 24, 24, 3)
    assert fast.shape == (1, 32, 24, 24, 3)
    params = module.init(jax.random.key(0), slow, fast)
    out = module.apply(params, slow, fast)
    assert out.shape == (1, 2304)


def test_vggish_feat_dim():
    m = VGGish()
    x = jnp.zeros((3, 100, 64))
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert out.shape == (3, vggish_feat_dim(100, 64))
    assert vggish_feat_dim(96, 64) == 512 * 24  # reference geometry


def test_segment_embedder_normalized():
    m = SegmentEmbedder(arch="resnet10", model_type=1)
    x = jnp.asarray(np.random.default_rng(0).random((2, 4, 32, 32, 3)),
                    jnp.float32)
    params = m.init(jax.random.key(0), x)
    emb = m.apply(params, x)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1),
                               1.0, atol=1e-3)


def test_contrastive_logits_shape_and_scale():
    m = ContrastiveTextures(arch="resnet10", model_type=1, temp=0.1)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.random((2, 4, 16, 16, 3)), jnp.float32)
    t = jnp.asarray(rng.random((2, 3, 4, 16, 16, 3)), jnp.float32)
    params = m.init(jax.random.key(0), q, t)
    logits = m.apply(params, q, t)
    assert logits.shape == (2, 3)
    # cosine/temp bound: |logit| <= 1/temp
    assert np.all(np.abs(np.asarray(logits)) <= 1.0 / 0.1 + 1e-4)


@pytest.mark.slow
def test_contrastive_audio_model():
    m = ContrastiveTextures(arch="resnet10", model_type=2, temp=0.1)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.random((1, 4, 16, 16, 3)), jnp.float32)
    t = jnp.asarray(rng.random((1, 3, 4, 16, 16, 3)), jnp.float32)
    qa = jnp.asarray(rng.random((1, 100, 64)), jnp.float32)
    ta = jnp.asarray(rng.random((1, 3, 100, 64)), jnp.float32)
    params = m.init(jax.random.key(0), q, t, qa, ta)
    logits = m.apply(params, q, t, qa, ta)
    assert logits.shape == (1, 3)
    # embedding tables via embed()
    emb = m.apply(params, t[0], ta[0], tower="target", method=m.embed)
    assert emb.shape[0] == 3


@pytest.mark.slow
def test_slowfast_s2d_stem_equivalence():
    """The s2d_stem flag must not change the network's output."""
    import jax
    m_plain = build_encoder("slowfast")[0]
    from avtex.nn.slowfast import SlowFastR50
    m_s2d = SlowFastR50(dtype=jnp.float32, s2d_stem=True)
    m_plain = SlowFastR50(dtype=jnp.float32, s2d_stem=False)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((1, 10, 16, 16, 3)), jnp.float32)
    slow, fast = slowfast_pathways(frames)
    params = jax.jit(m_plain.init)(jax.random.key(0), slow, fast)
    a = np.asarray(m_plain.apply(params, slow, fast))
    b = np.asarray(m_s2d.apply(params, slow, fast))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_groupnorm_bf16_output_keeps_fp32_stats():
    """The round-3 train-perf change (GroupNorm outputs in bf16) relies on
    flax force-promoting the stat reductions to fp32. Guard that contract:
    on data with a large common mode (mean ~100, signal ~1), bf16-dtype
    GroupNorm must match the fp32-dtype module to bf16 rounding — if the
    stats ever degraded to bf16, the normalized signal would be garbage."""
    import flax.linen as nn
    import jax

    rng = np.random.default_rng(0)
    # Exactly bf16-representable inputs: both modules see identical data,
    # so the only difference left is stat/normalize precision.
    x = np.asarray(jnp.asarray(
        (100.0 + rng.standard_normal((2, 5, 4, 4, 32))).astype(np.float32),
        jnp.bfloat16), np.float32)
    gn32 = nn.GroupNorm(num_groups=8, dtype=jnp.float32)
    gn16 = nn.GroupNorm(num_groups=8, dtype=jnp.bfloat16)
    params = gn32.init(jax.random.key(0), jnp.asarray(x))
    ref = np.asarray(gn32.apply(params, jnp.asarray(x)))
    out = np.asarray(gn16.apply(params, jnp.asarray(x, jnp.bfloat16))
                     ).astype(np.float32)
    assert np.isfinite(out).all()
    # bf16 has ~3 decimal digits; normalized outputs are O(1)
    np.testing.assert_allclose(out, ref, atol=0.15)
    assert abs(out.mean()) < 0.05 and 0.8 < out.std() < 1.2
