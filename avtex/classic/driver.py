"""Classic video-textures driver: the sigma sweep end to end.

Re-specifies the reference's ``main`` (reference: baselines/
classic_video_textures/video_textures.py:244-454) including the pieces its
repo lost (``read_data``/``save_video`` imports point at a module that
doesn't exist — SURVEY.md §7 "Missing reference pieces"): decode, feature
extraction, D1 -> D2 -> value iteration -> threshold, a texture walk per
sigma, muxed outputs, matrix figures and the jump-count chart.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from avtex.config import ClassicConfig
from avtex.media import read_video, read_wav, save_texture_outputs
from avtex.obs import Logger

from .d1 import compute_d1
from .d2 import compute_d2
from .features import resnet_features, resnet_vggish_features, rgb_features
from .future_cost import compute_d3
from .interp_track import burn_position_bars, classic_interp_track
from .sampler import expand_walk_to_frames, sample_texture_walk


def run_classic(cfg: ClassicConfig, video_path: str,
                audio_path: Optional[str] = None,
                out_dir: Optional[str] = None,
                logger: Optional[Logger] = None,
                num_steps: Optional[int] = None,
                interp_fn=None) -> Dict:
    """Run the full classic pipeline on one video.

    Args:
      interp_fn: (frame0, frame1, n_mid) -> mids for the jump-interpolation
        track (mode 1 only); defaults to the native crossfade — the
        reference loads SuperSloMo.ckpt (video_textures.py:258-261), which
        is not shipped with its repo either.

    Returns {"sigma_results": {sigma: {...}}, "jump_counts": {...}}.
    """
    frames, fps = read_video(video_path)
    name = os.path.splitext(os.path.basename(video_path))[0]
    out_dir = out_dir or cfg.results_folder

    audio = None
    sr = cfg.sr
    audio_examples = None
    if audio_path is not None and os.path.exists(audio_path):
        audio, sr = read_wav(audio_path)
        from avtex.audio.mel import waveform_to_examples
        audio_examples = np.asarray(waveform_to_examples(audio, sr))

    if cfg.feats == "RGB":
        feats, normalize = rgb_features(frames)
    elif cfg.feats == "ResNet":
        feats, normalize = resnet_features(frames)
    else:  # ResNet_VGGish
        feats, normalize = resnet_vggish_features(
            frames, audio_examples, cfg.filter_size, cfg.stride)

    if num_steps is None:
        num_steps = int(cfg.new_video_length * fps)

    results: Dict = {"sigma_results": {}, "jump_counts": {}}
    for i, sigma_factor in enumerate(cfg.sigmas):
        d1, p1, s1 = compute_d1(feats, sigma_factor, normalize=normalize)
        stride = cfg.stride if cfg.model_type == 3 else 1
        d2, p2, s2 = compute_d2(d1, sigma_factor, cfg.filter_size, stride)
        d3, p3, p3_new, s3 = compute_d3(
            d2, sigma_factor, p=cfg.q_p, alpha=cfg.q_alpha, eps=cfg.q_eps,
            thresholding=cfg.threshold)

        n = p3_new.shape[0]
        start = min(cfg.start_frame, n - 1)
        # mode 2 transitions from min(chosen + stride, n-1) and clips its
        # emitted blocks to the MATRIX size, not the frame count
        # (reference: video_textures.py:148-169).
        adv = cfg.stride if cfg.model_type == 2 else 0
        walk, jumps = sample_texture_walk(
            p3_new, start, num_steps, jax.random.key(cfg.seed + i),
            advance=adv)
        walk = np.asarray(walk)
        clip_n = n if cfg.model_type == 2 else len(frames)
        frame_ids = expand_walk_to_frames(
            walk, cfg.model_type, cfg.stride, cfg.filter_size, clip_n)
        frame_ids = np.clip(frame_ids, 0, len(frames) - 1)

        # main track: red position bar burned into every frame, always
        # (reference: video_textures.py:216-221 — unconditional there)
        tex_frames = burn_position_bars(frames[frame_ids], frame_ids,
                                        len(frames))
        tex_audio = None
        if audio is not None:
            apf = int(sr / fps)
            tex_audio = np.concatenate(
                [audio[f * apf:(f + 1) * apf] for f in frame_ids])
        frames_intp = None
        if cfg.interpolation and cfg.model_type == 1:
            # jump-interpolated track at fps*(SF+1)/2
            # (reference: video_textures.py:52-129)
            fn = interp_fn
            if fn is None:
                # pretrained SuperSloMo when the checkpoint exists
                # (reference: classic interpolate.py:54-159), else the
                # native crossfade
                from avtex.utils.convert import maybe_make_slomo_interp_fn
                fn = maybe_make_slomo_interp_fn(size=frames.shape[1:3])
            if fn is None:
                from avtex.native import stitch as native_stitch
                fn = native_stitch.crossfade
            frames_intp = classic_interp_track(frames, walk, cfg.SF, fn,
                                               len(frames))
        paths = save_texture_outputs(
            out_dir, f"{name}_classic_m{cfg.model_type}_sigma{sigma_factor}",
            tex_frames, fps, audio=tex_audio, sample_rate=sr,
            frames_intp=frames_intp, sf=cfg.SF)

        jump_count = int(np.asarray(jumps).sum())
        results["sigma_results"][sigma_factor] = {
            "paths": paths, "walk": walk, "jump_count": jump_count,
            "sigmas": (float(s1), float(s2), float(s3)),
        }
        results["jump_counts"][sigma_factor] = jump_count

        if logger is not None:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            for tag, mat in (("D1", d1), ("P1", p1), ("D2", d2), ("P2", p2),
                             ("D3", d3), ("P3", p3), ("P3_new", p3_new)):
                fig = plt.figure()
                ax = fig.add_subplot(1, 1, 1)
                im = ax.imshow(np.asarray(mat), interpolation="nearest")
                fig.colorbar(im)
                logger.log_figure(fig, f"classic/{tag}", i)
                plt.close(fig)

    if logger is not None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig = plt.figure()
        ax = fig.add_subplot(1, 1, 1)
        ax.bar([str(s) for s in results["jump_counts"]],
               list(results["jump_counts"].values()))
        ax.set_xlabel("sigma factor")
        ax.set_ylabel("jumps")
        logger.log_figure(fig, "classic/jump_counts", 0)
        plt.close(fig)

    return results
