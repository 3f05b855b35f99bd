"""End-to-end pipeline tests: synthesize() and the CLIs on a tiny clip."""

import os

import numpy as np
import pytest

from avtex.config import Config
from avtex.media import write_video, write_wav


@pytest.fixture(scope="module")
def tiny_clip(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    t, h, w = 60, 32, 32
    yy, xx = np.mgrid[0:h, 0:w]
    vid = np.stack([np.sin(xx / 4 + i / 3) * 100 + 127 for i in range(t)])
    vid = np.clip(vid[..., None].repeat(3, -1) + yy[..., None], 0, 255)
    video_path = str(d / "clip.mp4")
    write_video(vid.astype(np.uint8), video_path, fps=8.0)
    sr = 16000
    wav = (0.3 * np.sin(np.arange(sr * 8) / sr * 2 * np.pi * 220)
           ).astype(np.float32)
    audio_path = str(d / "clip.wav")
    write_wav(audio_path, wav, sr)
    return {"dir": str(d), "video": video_path, "audio": audio_path}


def test_synthesize_end_to_end(tiny_clip, tmp_path):
    from avtex.synth.pipeline import synthesize
    cfg = Config(enc_arch="resnet10", model_type=1, img_size=32,
                 new_video_length=3, threshold=0.5, interpolation=True,
                 SF=3, mini_batchsize=8, seed=0)
    out = synthesize(cfg, tiny_clip["video"], params=None,
                     audio_path=tiny_clip["audio"],
                     out_dir=str(tmp_path))
    # fps=8 -> W=4, S=2 (same geometry as the train tests: compile reuse)
    assert out["window"] == 4 and out["stride"] == 2
    r = out["result"]
    assert len(r.indices) >= 1
    assert "texture" in out["paths"] and os.path.exists(out["paths"]["texture"])
    assert out["stitched"]["audio"] is not None
    assert set(out["timings"]) >= {"decode_s", "embed_s", "walk_s", "stitch_s"}


def test_synthesize_with_driving_audio(tiny_clip, tmp_path):
    from avtex.synth.pipeline import synthesize
    cfg = Config(enc_arch="resnet10", model_type=2, img_size=32,
                 new_video_length=2, threshold=0.5, alpha=0.5,
                 da_feats="Mel", interpolation=False, seed=0)
    out = synthesize(cfg, tiny_clip["video"], params=None,
                     audio_path=tiny_clip["audio"],
                     driving_audio_path=tiny_clip["audio"],
                     out_dir=str(tmp_path))
    assert len(out["result"].indices) >= 1
    assert out["paths"]
    # the driving-audio scoring stage must be wall-attributed (it was the
    # dominant untimed chunk in the round-5 hardware run)
    assert "audio_rows_s" in out["timings"]


def test_synthesize_subsample_rate(tiny_clip, tmp_path):
    """-subsample 2: encode every 2nd frame, but the texture must play at
    the ORIGINAL rate — each walked id expands to 2 consecutive original
    frames and max_length counts originals (reference: validate.py:111-113,
    324, 621-630). Regression: the pipeline used to drop the non-kept
    frames at decode and run ~2x the steps, emitting a 2x-fast texture."""
    from avtex.synth.pipeline import synthesize
    cfg = Config(enc_arch="resnet10", model_type=1, img_size=32,
                 new_video_length=2, threshold=0.5, interpolation=False,
                 mini_batchsize=8, seed=0, subsample_rate=2)
    out = synthesize(cfg, tiny_clip["video"], params=None,
                     audio_path=tiny_clip["audio"],
                     out_dir=str(tmp_path))
    # 60 frames @8fps -> 30 encoded, W=4/S=2 -> (30-4)//2 = 13 segments
    # (the reference's val-split count, dataset/dataset.py:114-119)
    assert out["num_segments"] == 13
    fps = out["fps"]
    max_length = int(2 * fps)  # original-rate frames
    frames = out["stitched"]["frames"]
    assert len(frames) >= max_length  # NOT max_length/2 (the old bug)
    # emitted ids are original-rate consecutive pairs (2k, 2k+1)
    ids = out["stitched"]["frame_ids"]
    assert ids.max() < 60
    np.testing.assert_array_equal(ids[1::2], ids[::2] + 1)
    assert ids[::2].max() % 2 == 0
    # audio follows the walked ids at apf = sr*sub/fps
    assert out["stitched"]["audio"] is not None
    apf = int(16000 * 2 / fps)
    assert len(out["stitched"]["audio"]) == (len(ids) // 2) * apf


def test_eval_without_checkpoint_fails_loudly(tiny_clip, tmp_path):
    """-e with no checkpoint at the flag-derived path must fail like the
    reference's assert (main.py:536) — synthesizing on random weights is
    only allowed with the explicit -allow_random_init opt-out (or
    norm=affine, whose pretrained auto-load is the intended no-ckpt path).
    """
    from avtex.cli.main import main
    args = ["-m", "1", "-e", "-vdata", tiny_clip["dir"], "-vl", "clip",
            "-ea", "resnet10", "-size", "32", "-th", "0.5", "-nvl", "2",
            "-ckpt", str(tmp_path / "no_ckpt"), "-nintp",
            "-results_folder", str(tmp_path / "res"),
            "-logdir", str(tmp_path / "logs")]
    with pytest.raises(FileNotFoundError, match="No checkpoint found"):
        main(args)
    main(args + ["-allow_random_init"])
    assert os.listdir(tmp_path / "res")


def test_classic_cli(tiny_clip, tmp_path):
    from avtex.cli.classic_main import main
    main(["-m", "1", "-vdata", tiny_clip["dir"], "-vl", "clip",
          "-fs", "8", "-sigma", "4.5", "-nvl", "2",
          "-results_folder", str(tmp_path / "rc")])
    written = os.listdir(tmp_path / "rc")
    assert any(f.endswith((".mp4", ".avi")) for f in written)


def test_contrastive_cli_train_and_eval(tiny_clip, tmp_path):
    from avtex.cli.main import main
    ckpt = str(tmp_path / "ckpt")
    main(["-m", "1", "-vdata", tiny_clip["dir"], "-vl", "clip",
          "-ea", "resnet10", "-size", "32", "-bs", "4", "-negs", "4",
          "-epochs", "1", "-ckpt", ckpt,
          "-logdir", str(tmp_path / "logs")])
    assert os.listdir(ckpt)
    # No -vl: the driver discovers ["clip"] from -vdata (reference
    # main.py:495-502; clip.mp4 + clip.wav dedupe to one name) and writes
    # into the per-video results_{video} folder (main.py:506) under the
    # explicitly-passed -results_folder parent.
    main(["-m", "1", "-e", "-vdata", tiny_clip["dir"],
          "-ea", "resnet10", "-size", "32", "-bs", "4", "-negs", "4",
          "-th", "0.5", "-nvl", "2", "-ckpt", ckpt, "-nintp",
          "-results_folder", str(tmp_path / "res"),
          "-logdir", str(tmp_path / "logs")])
    assert os.listdir(tmp_path / "res" / "results_clip")


def test_discover_video_list(tmp_path):
    """-vl omitted: first-dot-component of every non-hidden file in -vdata,
    sorted (reference: main.py:495-502), deduped across extensions."""
    from avtex.cli.main import discover_video_list
    for f in ["b.mp4", "a.mp4", "a.wav", ".hidden", "c.tag.mp4"]:
        (tmp_path / f).touch()
    (tmp_path / "subdir").mkdir()  # e.g. a driving-audio dir — not a video
    assert discover_video_list(str(tmp_path)) == ["a", "b", "c"]


def test_per_video_config_pairs_by_index():
    """Driving audio / daf checkpoints pair with video #itr, never as a
    cross-product (reference: validate.py:168,287), and the results folder
    takes the reference's results_{video}[_target_{video}_{audio}] name
    (main.py:506,541-545)."""
    from avtex.cli.main import per_video_config
    cfg = Config(evaluate=True, driving_audio=["songA", "songB"],
                 daf_resume=["ckptA", "ckptB"])
    c1 = per_video_config(cfg, "vid1", 1)
    assert c1.driving_audio == ["songB"]
    assert c1.daf_resume == ["ckptB"]
    assert c1.results_folder == "results_vid1_target_vid1_songB"
    with pytest.raises(ValueError, match="pairs them by index"):
        per_video_config(cfg, "vid2", 2)
    # train mode: plain per-video folder, no target suffix
    c0 = per_video_config(Config(driving_audio=["songA"]), "vid0", 0)
    assert c0.results_folder == "results_vid0"
    # explicit -results_folder becomes the parent directory
    c2 = per_video_config(Config(results_folder="out/dir"), "vid", 0)
    assert c2.results_folder == os.path.join("out/dir", "results_vid")


@pytest.mark.slow
def test_synthesize_contrastive_da_branch(tiny_clip, tmp_path):
    """-daf Contrastive: VideoForAudio retrieval head scores the driving
    audio against precomputed video-side embeddings."""
    from avtex.synth.pipeline import synthesize
    cfg = Config(enc_arch="resnet10", model_type=1, img_size=32,
                 new_video_length=2, threshold=0.5, alpha=0.5,
                 da_feats="Contrastive", interpolation=False, seed=0,
                 mini_batchsize=8)
    out = synthesize(cfg, tiny_clip["video"], params=None,
                     audio_path=tiny_clip["audio"],
                     driving_audio_path=tiny_clip["audio"],
                     out_dir=str(tmp_path))
    assert len(out["result"].indices) >= 1
    assert out["paths"]


def test_too_short_video_raises():
    from avtex.data.pipeline import SegmentBatches
    with pytest.raises(ValueError, match="too short"):
        SegmentBatches(np.zeros((5, 8, 8, 3), np.uint8), window=6, stride=2)


def test_synthesize_vcam_outputs(tiny_clip, tmp_path):
    """-vcam writes CAM overlay videos (reference validate.py:745-778 —
    whose own flag is undefined as shipped; avtex defines it)."""
    from avtex.synth.pipeline import synthesize
    cfg = Config(enc_arch="resnet10", model_type=1, img_size=32,
                 new_video_length=2, threshold=0.5, interpolation=False,
                 mini_batchsize=8, seed=0, vcam=True)
    out = synthesize(cfg, tiny_clip["video"], params=None,
                     out_dir=str(tmp_path))
    for key in ("cam_q_video", "cam_p_video"):
        assert key in out["paths"] and os.path.exists(out["paths"][key])
    import cv2
    cap = cv2.VideoCapture(out["paths"]["cam_q_video"])
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    assert n == len(out["result"].indices)
    ok, frame = cap.read()
    assert ok and frame.shape[:2] == (32, 32)
    assert "cam_s" in out["timings"]


def test_segment_cams_shapes(tiny_clip):
    """segment_cams: one finite [h, w] map per segment from a capture pass."""
    import jax
    import jax.numpy as jnp
    from avtex.contrastive.model import ContrastiveTextures
    from avtex.media import read_video
    from avtex.synth.cam import segment_cams

    video, fps = read_video(tiny_clip["video"], 1)
    W, S, L = 4, 2, 6
    model = ContrastiveTextures(arch="resnet10", model_type=1)
    x = jnp.zeros((1, W, 32, 32, 3), jnp.uint8)
    from avtex.data.preprocess import preprocess_clip
    xp = preprocess_clip(x, size=32)
    params = jax.jit(model.init)(jax.random.key(0), xp, xp[:, None])
    cams = segment_cams(model, params, video, W, S, L, img_size=32,
                        batch_size=4)
    assert cams.shape[0] == L and cams.ndim == 3
    assert np.isfinite(cams).all()


def test_driving_audio_without_source_audio_raises(tiny_clip, tmp_path):
    """-da with -daf Mel/VGG but no source audio must fail loudly: those
    modes score driving audio against the SOURCE track (the reference
    loads the source wav unconditionally, validate.py:150-162), so a
    silent no-blend walk would ignore alpha without telling anyone."""
    from avtex.synth.pipeline import synthesize
    cfg = Config(enc_arch="resnet10", model_type=1, img_size=32,
                 new_video_length=2, threshold=0.5, alpha=0.5,
                 da_feats="Mel", interpolation=False, seed=0)
    with pytest.raises(ValueError, match="source"):
        synthesize(cfg, tiny_clip["video"], params=None,
                   audio_path=None,
                   driving_audio_path=tiny_clip["audio"],
                   out_dir=str(tmp_path))


def test_vcam_2d_encoder_skips_gracefully(tiny_clip, tmp_path):
    """-vcam with a 2D frame-mean encoder (no 5-D spatial intermediate):
    texture outputs still land; CAM videos are skipped with a warning
    instead of crashing after the expensive embed+walk."""
    from avtex.synth.pipeline import synthesize
    cfg = Config(enc_arch="resnet18_2d", model_type=1, img_size=32,
                 new_video_length=2, threshold=0.5, interpolation=False,
                 mini_batchsize=8, seed=0, vcam=True)
    out = synthesize(cfg, tiny_clip["video"], params=None,
                     out_dir=str(tmp_path))
    assert os.path.exists(out["paths"]["texture"])
    assert "cam_q_video" not in out["paths"]


def test_segment_cams_model_type2_uses_audio(tiny_clip):
    """model_type=2 CAMs embed with per-segment audio examples (was a
    ValueError crash when segment_cams passed audio=None)."""
    import jax
    import jax.numpy as jnp
    from avtex.contrastive.model import ContrastiveTextures
    from avtex.media import read_video
    from avtex.synth.cam import segment_cams

    video, fps = read_video(tiny_clip["video"], 1)
    W, S, L = 4, 2, 6
    model = ContrastiveTextures(arch="resnet10", model_type=2)
    from avtex.data.preprocess import preprocess_clip
    xp = preprocess_clip(jnp.zeros((1, W, 32, 32, 3), jnp.uint8), size=32)
    qa = jnp.zeros((1, 100, 64))
    params = jax.jit(model.init)(jax.random.key(0), xp, xp[:, None],
                                 qa, qa[:, None])
    audio_examples = np.random.default_rng(0).random((L, 100, 64)) \
        .astype(np.float32)
    cams = segment_cams(model, params, video, W, S, L,
                        audio_examples=audio_examples, img_size=32,
                        batch_size=4)
    assert cams.shape[0] == L and np.isfinite(cams).all()
    with pytest.raises(ValueError, match="audio_examples"):
        segment_cams(model, params, video, W, S, L, img_size=32)


def test_synthesize_affine_norm(tiny_clip, tmp_path):
    """-norm affine (folded frozen-BN inference variant) runs the full
    pipeline — the configuration pretrained imports produce."""
    from avtex.synth.pipeline import synthesize
    cfg = Config(enc_arch="resnet10", model_type=1, img_size=32,
                 new_video_length=2, threshold=0.5, interpolation=False,
                 mini_batchsize=8, seed=0, norm="affine")
    out = synthesize(cfg, tiny_clip["video"], params=None,
                     out_dir=str(tmp_path))
    assert len(out["result"].indices) >= 1
    assert os.path.exists(out["paths"]["texture"])
