"""Config contract tests: logname identity strings and geometry derivation.

The flag-string lognames are load-bearing — they key checkpoints, logs and
results, and eval auto-derives the best-checkpoint path from them
(reference: main.py:377-415,520-534).
"""

import math

from avtex.config import ClassicConfig, Config


def test_train_logname_matches_reference_format():
    cfg = Config(vdata="/data/videos", model_type=2, batch_size=8, n_negs=4,
                 window=15, stride=6, temp=0.1, threshold=0.2,
                 enc_arch="slowfast", subsample_rate=2, logname="exp")
    expect = ("exp_model_2_vd_videos_vn_surf_bs_8_negs_4_w_15_stride_6_"
              "temp_0.1_th_0.2_enca_slowfast_subr_2_eval_False")
    assert cfg.train_logname("surf") == expect


def test_eval_logname_matches_reference_format():
    cfg = Config(vdata="/data/videos", model_type=2, batch_size=8,
                 window=15, stride=6, temp=0.1, threshold=0.2,
                 enc_arch="slowfast", subsample_rate=1, logname="exp",
                 driving_audio=["song"], alpha=0.5, da_feats="VGG")
    expect = ("exp_model_2_vd_videos_vn_surf_bs_8_w_15_stride_6_"
              "temp_0.1_th_0.2_enca_slowfast_subr_1_eval_True"
              "alpha_0.5_daf_VGG")  # reference appends without separator
    assert cfg.eval_logname("surf") == expect


def test_default_ckpt_path_freezes_train_temp_th():
    """Eval with any -temp/-th resolves the ckpt trained at the defaults
    (reference hardcodes temp_0.1_th_0.0 — main.py:522)."""
    cfg = Config(vdata="/d/v", threshold=0.9, temp=0.7, window=4, stride=2,
                 batch_size=8, n_negs=20, enc_arch="resnet18", ckpt="./ckpt")
    path = cfg.default_ckpt_path("clip")
    assert "temp_0.1_th_0.0" in path
    assert path.endswith("_eval_False_best")


def test_geometry_derivation():
    cfg = Config().derive_geometry(30.0)
    assert (cfg.window, cfg.stride) == (15, 6)
    cfg = Config().derive_geometry(29.97)
    assert (cfg.window, cfg.stride) == (math.ceil(29.97 / 2),
                                        math.ceil(29.97 / 5))


def test_classic_defaults_match_reference():
    c = ClassicConfig()
    assert tuple(c.sigmas) == (4.45, 4.5, 4.52, 4.55, 4.58)
    assert (c.q_alpha, c.q_p, c.q_eps) == (0.997, 0.7, 1e-2)
    assert c.start_frame == 100
