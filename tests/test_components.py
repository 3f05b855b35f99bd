"""Tests for the long-tail parity components: P_audio, visualizations,
joint AV net, retrieval trainer, optical flow, weight conversion."""

import numpy as np
import pytest


def test_compute_paudio(rng):
    """Reference formula exactly: p = cos / (cos.sum() + 1e-6) — no shift
    (computePaudio.py:6-18; an earlier avtex version applied (x+1)/2,
    which flattens the conditioning: sims [0.2, 0.8] must weight 1:4,
    not 2:3)."""
    import jax.numpy as jnp
    from avtex.classic.paudio import compute_paudio
    segs = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)
    p = np.asarray(compute_paudio(segs[3], segs))
    assert p.shape == (8,)
    assert p.argmax() == 3  # self-similarity wins
    # numpy oracle of the reference's torch lines
    s = np.asarray(segs, np.float64)
    s = s / np.linalg.norm(s, axis=1, keepdims=True)
    cos = s @ (s[3] / np.linalg.norm(s[3]))
    np.testing.assert_allclose(p, cos / (cos.sum() + 1e-6), rtol=2e-4)


def test_overlay_cam_and_barplot(tmp_path, rng):
    from avtex.obs.visualizations import overlay_cam, save_bar_plot
    img = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
    cam = rng.random((8, 12))
    out = overlay_cam(img, cam)
    assert out.shape == img.shape and out.dtype == np.uint8
    p = save_bar_plot([1.0, 2.0, 0.5], str(tmp_path / "e.png"), "entropy")
    import os
    assert os.path.getsize(p) > 0


def test_html_report(tmp_path):
    from avtex.obs.visualizations import generate_html_report
    p = generate_html_report(str(tmp_path / "r.html"),
                             {"tex": "a.mp4"}, {"jumps": 3})
    with open(p) as f:
        doc = f.read()
    assert "a.mp4" in doc and "jumps" in doc


def test_av_features_net(rng):
    import jax
    import jax.numpy as jnp
    from avtex.contrastive.av_features import AudioVisualFeatures
    m = AudioVisualFeatures(emb_dim=32)
    clip = jnp.asarray(rng.random((2, 4, 16, 16, 3)), jnp.float32)
    wav = jnp.asarray(rng.random((2, 4096)), jnp.float32)
    params = jax.jit(m.init)(jax.random.key(0), clip, wav)
    out = m.apply(params, clip, wav)
    assert out.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0,
                               atol=1e-3)


@pytest.mark.slow
def test_retrieval_trainer_runs(rng):
    from avtex.contrastive.retrieval_train import train_video_for_audio
    frames = (rng.random((30, 16, 16, 3)) * 255).astype(np.uint8)
    audio = rng.random((12, 100, 64)).astype(np.float32)
    model, params, history = train_video_for_audio(
        frames, audio, window=4, stride=2, arch="resnet10", img_size=16,
        batch_size=4, n_negs=2, epochs=1)
    assert len(history) == 1 and np.isfinite(history[0])


def test_farneback_flow(rng):
    from avtex.utils.flow import farneback_flow
    frames = (rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)
    flow = farneback_flow(frames)
    assert flow.shape == (3, 32, 32, 2)


def test_vggish_weight_conversion(rng):
    """Roundtrip: synth torch-layout weights -> flax; outputs must change
    deterministically to the converted values."""
    import jax
    import jax.numpy as jnp
    from avtex.nn.vggish import VGGish
    from avtex.utils.convert import convert_vggish

    m = VGGish()
    x = jnp.asarray(rng.random((1, 100, 64)), jnp.float32)
    params = jax.jit(m.init)(jax.random.key(0), x)

    # fabricate a torch state dict with the right conv shapes
    shapes = [(64, 1), (128, 64), (256, 128), (256, 256), (512, 256),
              (512, 512)]
    torch_state = {}
    for i, (out_c, in_c) in enumerate(shapes):
        torch_state[f"features.{i}.weight"] = \
            rng.standard_normal((out_c, in_c, 3, 3)).astype(np.float32)
        torch_state[f"features.{i}.bias"] = \
            rng.standard_normal(out_c).astype(np.float32)

    new_params = convert_vggish(torch_state, params)
    k0 = np.asarray(jax.tree.leaves(new_params)[0])
    # first conv kernel must equal the transposed torch weight
    expect = np.transpose(torch_state["features.0.weight"], (2, 3, 1, 0))
    found = False
    for leaf in jax.tree.leaves(new_params):
        if np.shape(leaf) == expect.shape and np.allclose(leaf, expect):
            found = True
    assert found


def test_convert_shape_mismatch_raises(rng):
    import jax
    import jax.numpy as jnp
    from avtex.nn.vggish import VGGish
    from avtex.utils.convert import convert_vggish
    m = VGGish()
    params = jax.jit(m.init)(jax.random.key(0),
                             jnp.zeros((1, 100, 64)))
    bad = {"features.0.weight": np.zeros((7, 7, 3, 3), np.float32)}
    with pytest.raises(ValueError):
        convert_vggish(bad, params)


@pytest.mark.slow
def test_train_resume(tmp_path, rng):
    from avtex.config import Config
    from avtex.train import save_checkpoint, train_video
    t, h, w = 40, 24, 24
    _, xx = np.mgrid[0:h, 0:w]
    vid = np.clip(np.stack([np.sin(xx / 3 + i / 2) * 100 + 127
                            for i in range(t)])[..., None].repeat(3, -1),
                  0, 255).astype(np.uint8)
    cfg = Config(enc_arch="resnet10", model_type=1, img_size=32, window=4,
                 train_stride=2, stride=2, n_negs=4, batch_size=4,
                 early_stop_loss=1e-9)
    state, history = train_video(cfg, vid, epochs=1)
    path = save_checkpoint(str(tmp_path), "r", state.params, 1, "resnet10",
                           history[0], is_best=True)
    state2, history2 = train_video(cfg, vid, epochs=3, resume=path)
    assert len(history2) == 2  # resumed at epoch 1 of 3


def test_classic_temporal_distances(rng):
    """ClassicTemporal scoring: [B, N+1] L2 distances over normalized
    embeddings, query appended as the always-0 final column (reference
    models/models.py:136-230 semantics, minus its dead-code bugs)."""
    import jax
    import jax.numpy as jnp
    from avtex.contrastive import ClassicTemporal, classic_temporal_distances

    # pure scoring math vs direct norms
    q = rng.standard_normal((3, 16)).astype(np.float32)
    t = rng.standard_normal((3, 5, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    d = np.asarray(classic_temporal_distances(jnp.asarray(q),
                                              jnp.asarray(t)))
    ref = np.linalg.norm(q[:, None] - t, axis=-1)
    np.testing.assert_allclose(d[:, :5], ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(d[:, 5], 0.0)

    # full module: one shared tower, distances finite and self-col 0
    m = ClassicTemporal(arch="resnet10", model_type=1)
    qf = jnp.asarray(rng.random((2, 4, 16, 16, 3)), jnp.float32)
    tf = jnp.asarray(rng.random((2, 3, 4, 16, 16, 3)), jnp.float32)
    params = jax.jit(m.init)(jax.random.key(0), qf, tf)
    out = np.asarray(jax.jit(m.apply)(params, qf, tf))
    assert out.shape == (2, 4)
    assert np.isfinite(out).all() and np.all(out[:, 3] == 0.0)
    # one embedder serves both sides (reference: single v_encoder)
    assert set(params["params"]) == {"embedder"}


def test_profiler_trace_smoke(tmp_path):
    """obs.trace captures an XSpace artifact around a jitted block (and is
    a no-op when logdir is None) — the §5.1 hook tools/op_trace.py builds
    on."""
    import glob

    import jax
    import jax.numpy as jnp

    from avtex.obs.profiler import trace

    with trace(None):  # no-op path
        pass
    f = jax.jit(lambda x: (x * 2).sum())
    logdir = str(tmp_path / "prof")
    with trace(logdir):
        float(f(jnp.arange(8.0)))
    assert glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
