"""Warm-serving API (avtex/synth/server.py): one embed, many requests."""

import numpy as np

from avtex.config import Config


def test_texture_server_multiple_requests(tmp_path):
    from avtex.media import write_video, write_wav
    from avtex.synth.server import TextureServer

    t, h, w = 60, 32, 32
    yy, xx = np.mgrid[0:h, 0:w]
    vid = np.clip(np.stack([np.sin(xx / 4 + i / 3) * 100 + 127
                            for i in range(t)])[..., None].repeat(3, -1)
                  + yy[..., None], 0, 255).astype(np.uint8)
    vp = str(tmp_path / "clip.mp4")
    write_video(vid, vp, fps=8.0)
    sr = 16000
    wav = (0.3 * np.sin(np.arange(sr * 8) / sr * 2 * np.pi * 220)
           ).astype(np.float32)
    ap = str(tmp_path / "clip.wav")
    write_wav(ap, wav, sr)

    cfg = Config(enc_arch="resnet10", model_type=1, img_size=32,
                 new_video_length=2, threshold=0.5, mini_batchsize=8, seed=0)
    server = TextureServer(cfg, vp, params=None, audio_path=ap)
    assert server.L > 4

    a = server.synthesize(seconds=2, threshold=0.5, seed=1)
    b = server.synthesize(seconds=3, threshold=0.2, seed=2)
    assert len(b["result"].indices) > len(a["result"].indices)
    assert a["frames"] is not None and len(a["frames"]) >= 2 * 8 * 0.9
    # identical request -> identical walk (deterministic serving)
    a2 = server.synthesize(seconds=2, threshold=0.5, seed=1)
    np.testing.assert_array_equal(a["result"].indices, a2["result"].indices)
    # distinct seeds explore different walks
    assert not np.array_equal(a["result"].indices, b["result"].indices)

    # every response names its audio's sample rate (the mux contract)
    assert a["sample_rate"] == sr

    # per-request interpolation honors the knob (cfg default is
    # interpolation=True; this cfg left it True)
    d = server.synthesize(seconds=2, seed=1, interpolate=True)
    assert d["frames_intp"] is not None
    assert len(d["frames_intp"]) > len(d["frames"])
    e = server.synthesize(seconds=2, seed=1, interpolate=False)
    assert e["frames_intp"] is None

    # driving-audio request on the same resident tables (Mel mode: no
    # pretrained VGGish in the test env)
    server.cfg = server.cfg.__class__(**{**server.cfg.__dict__,
                                         "da_feats": "Mel"})
    c = server.synthesize(seconds=2, driving_audio=ap, alpha=0.5, seed=3)
    assert len(c["result"].indices) >= 1
    assert c["audio"] is not None
    # driving audio returns at ITS OWN rate (here the same wav/rate, but
    # the field must come from the driving file, not the source)
    assert c["sample_rate"] == sr
    # the scoring state (models, source features, tables) is built once
    # and reused across driving requests — warm serving stays warm
    scorer1 = server._audio_scorer
    assert scorer1 is not None
    c2 = server.synthesize(seconds=2, driving_audio=ap, alpha=0.5, seed=4)
    assert server._audio_scorer is scorer1
    assert len(c2["result"].indices) >= 1
