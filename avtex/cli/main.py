"""Contrastive video-textures CLI, flag-compatible with the reference.

Reproduces the reference's argparse surface and per-video driver loop
(reference: contrastive_video_textures/main.py:41-296,486-548): same flag
names (-m, -e, -w, -stride, -temp, -th, -bs, -negs, -da, -alpha, ...), the
fps -> W/S derivation at eval, the auto-derived best-checkpoint path, and
the train-then-save / load-then-synthesize split.

Usage (matches README.md:35-53 of the reference):
  python -m avtex.cli.main -m 1 -vdata data/videos -vl clip -bs 8 -negs 8
  python -m avtex.cli.main -m 2 -e -vdata data/videos -vl clip \
      -da song -alpha 0.5
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
from typing import List, Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("avtex contrastive video textures")
    p.add_argument("-m", "--model_type", type=int, default=1,
                   help="(1) video textures (2) audio+video textures")
    p.add_argument("-e", "--evaluate", action="store_true")
    p.add_argument("-ve", "--visualize_evaluate", action="store_true",
                   help="log extra synthesis figures to TensorBoard")
    p.add_argument("-ea", "--enc_arch", default="resnet18")
    p.add_argument("-vdata", default=None, help="dir of <name>.mp4 videos")
    p.add_argument("-adata", default=None, help="dir of <name>.wav audio")
    p.add_argument("-dadata", default="audio/target")
    p.add_argument("-vl", "--video_list", nargs="+", default=None)
    p.add_argument("-da", "--driving_audio", nargs="+", default=None)
    p.add_argument("-daf", "--da_feats", default="VGG",
                   choices=["VGG", "Contrastive", "Mel"])
    p.add_argument("-alpha", type=float, default=0.5)
    p.add_argument("-w", "--window", type=int, default=20)
    p.add_argument("-stride", type=int, default=4)
    p.add_argument("-train_stride", type=int, default=None)
    p.add_argument("-temp", type=float, default=0.1)
    p.add_argument("-th", "--threshold", type=float, default=0.0)
    p.add_argument("-bs", "--batch_size", type=int, default=32)
    p.add_argument("-mbs", "--mini_batchsize", type=int, default=150)
    p.add_argument("-negs", "--n_negs", type=int, default=20)
    p.add_argument("-size", "--img_size", type=int, default=224)
    p.add_argument("-subsample", "--subsample_rate", type=int, default=1)
    p.add_argument("-nvl", "--new_video_length", type=int, default=30)
    p.add_argument("-SF", type=int, default=5)
    p.add_argument("-nintp", dest="interpolation", action="store_false")
    p.add_argument("-noaug", dest="augment", action="store_false",
                   help="train with the reference's exact preprocessing "
                        "(resize+normalize, no augmentation)")
    p.add_argument("-fb", "--frames_bar", action="store_true")
    p.add_argument("-norm", choices=["group", "affine"], default="group",
                   help="encoder norm: group (training) or affine (folded "
                        "frozen-BN inference, e.g. imported checkpoints)")
    p.add_argument("-vcam", action="store_true",
                   help="write CAM overlay videos (reference validate.py"
                        ":745-778; its own flag is undefined as shipped)")
    p.add_argument("-epochs", type=int, default=60)
    p.add_argument("-lr", type=float, default=1e-2)
    p.add_argument("-lr_steps", type=int, default=30)
    p.add_argument("-momentum", type=float, default=0.9)
    p.add_argument("-wd", "--weight_decay", type=float, default=1e-4)
    p.add_argument("-workers", "-j", type=int, default=0)
    p.add_argument("-seed", type=int, default=0)
    p.add_argument("-resume", "--resume", default="")
    p.add_argument("-allow_random_init", action="store_true",
                   help="synthesize with random-init params when no "
                        "checkpoint is found (the reference asserts, "
                        "main.py:536; this is the explicit opt-out)")
    p.add_argument("-daf_resume", "--daf_resume", nargs="+", default=None,
                   help="VideoForAudio checkpoint(s) for -daf Contrastive")
    p.add_argument("-fps", type=float, default=None,
                   help="override container fps (normally auto-derived)")
    p.add_argument("-l2", action="store_true",
                   help="accepted for parity (embeddings are always "
                        "L2-normalized, like the reference's live path)")
    p.add_argument("-long", "--long", action="store_true",
                   help="accepted for parity; unused in the reference too")
    p.add_argument("-pdata", default=None,
                   help="accepted for parity; poses unused in the reference")
    p.add_argument("-fdata", default=None,
                   help="accepted for parity; flow unused in the reference")
    p.add_argument("-p", "--print_freq", type=int, default=5)
    p.add_argument("-lf", "--log_freq", type=int, default=10)
    p.add_argument("-vf", "--val_freq", type=int, default=5)
    p.add_argument("--start_epoch", type=int, default=None)
    p.add_argument("-logdir", default="./logs")
    p.add_argument("-logname", default="exp")
    p.add_argument("-rf", "-results_folder", "--results_folder",
                   default="results")
    p.add_argument("-ckpt", default="./ckpt")
    p.add_argument("--mesh", action="store_true",
                   help="shard embed/training over all local devices")
    return p


def args_to_config(args: argparse.Namespace):
    from avtex.config import Config
    return Config(
        enc_arch=args.enc_arch, model_type=args.model_type,
        temp=args.temp, threshold=args.threshold, img_size=args.img_size,
        vdata=args.vdata, adata=args.adata, dadata=args.dadata,
        video_list=args.video_list, subsample_rate=args.subsample_rate,
        window=args.window, stride=args.stride,
        train_stride=args.train_stride,  # None => fps-derived stride
        fps_override=args.fps,
        n_negs=args.n_negs, new_video_length=args.new_video_length,
        alpha=args.alpha, interpolation=args.interpolation, SF=args.SF,
        augment=args.augment,
        frames_bar=args.frames_bar, vcam=args.vcam, norm=args.norm,
        driving_audio=args.driving_audio,
        da_feats=args.da_feats, seed=args.seed, epochs=args.epochs,
        batch_size=args.batch_size, mini_batchsize=args.mini_batchsize,
        lr=args.lr, lr_steps=args.lr_steps, momentum=args.momentum,
        weight_decay=args.weight_decay, workers=args.workers,
        daf_resume=args.daf_resume, print_freq=args.print_freq,
        log_freq=args.log_freq, val_freq=args.val_freq,
        start_epoch=args.start_epoch,
        resume=args.resume, evaluate=args.evaluate,
        allow_random_init=args.allow_random_init,
        visualize_evaluate=args.visualize_evaluate, logdir=args.logdir,
        logname=args.logname, results_folder=args.results_folder,
        ckpt=args.ckpt,
    )


def discover_video_list(vdata: str) -> List[str]:
    """Default video list when -vl is omitted: every file in -vdata.

    The reference scans the dataset dir, takes each filename's first
    dot-component, skips hidden files, and sorts
    (reference: main.py:495-502). Deviations: duplicates are dropped
    (the reference would process "clip" twice when both clip.mp4 and
    clip.wav sit in -vdata) and subdirectories are skipped (the
    reference would try to read "<subdir>.mp4" and crash).
    """
    names = sorted(f.split(".")[0] for f in sorted(os.listdir(vdata))
                   if not f.startswith(".")
                   and os.path.isfile(os.path.join(vdata, f)))
    out: List[str] = []
    for n in names:
        if n not in out:
            out.append(n)
    return out


def per_video_config(cfg, video_name: str, itr: int):
    """Specialize the config to video #itr the way the reference does.

    - Driving audio and VideoForAudio checkpoints pair with the video BY
      INDEX, not as a cross-product (reference: validate.py:168
      ``args.driving_audio[itr]``, validate.py:287 ``args.daf_resume[itr]``).
    - The results folder becomes ``results_{video}`` and, when synthesizing
      with driving audio, gains the reference's
      ``_target_{video}_{audio}`` suffix (reference: main.py:506,541-545,
      where the -rf flag is dead). Deviation: an explicitly-passed
      -results_folder is kept as the PARENT directory so the flag stays
      useful without losing the reference's per-video layout.
    """
    da = cfg.driving_audio
    daf = cfg.daf_resume
    if da:
        if itr >= len(da):
            raise ValueError(
                f"-da lists {len(da)} driving audio(s) for {itr + 1}+ "
                f"videos; the reference pairs them by index "
                f"(validate.py:168) — pass one per video.")
        da = [da[itr]]
    if daf:
        if itr >= len(daf):
            raise ValueError(
                f"-daf_resume lists {len(daf)} checkpoint(s) for "
                f"{itr + 1}+ videos; the reference pairs them by index "
                f"(validate.py:287) — pass one per video.")
        daf = [daf[itr]]
    rf = f"results_{video_name}"
    if (cfg.evaluate or cfg.visualize_evaluate) and da:
        target = os.path.split(da[0])[-1].split(".")[0]
        rf += f"_target_{video_name}_{target}"
    if cfg.results_folder and cfg.results_folder != "results":
        rf = os.path.join(cfg.results_folder, rf)
    return dataclasses.replace(cfg, driving_audio=da, daf_resume=daf,
                               results_folder=rf)


def run_one_video(cfg, video_name: str, mesh=None) -> None:
    """Train or synthesize one video (reference: main.py:299-477)."""
    from avtex.audio.mel import waveform_to_examples
    from avtex.media import read_video, read_wav, video_fps
    from avtex.obs import Logger

    video_path = os.path.join(cfg.vdata or ".", f"{video_name}.mp4")
    audio_path = (os.path.join(cfg.adata, f"{video_name}.wav")
                  if cfg.adata else None)

    if not cfg.evaluate:
        from avtex.train import train_video
        frames, fps = read_video(video_path, cfg.subsample_rate)
        cfg = cfg.derive_geometry(fps)
        audio_examples = None
        if cfg.model_type == 2:
            if audio_path is None or not os.path.exists(audio_path):
                raise FileNotFoundError(
                    f"model_type=2 requires {audio_path}")
            wav, sr = read_wav(audio_path)
            audio_examples = np.asarray(waveform_to_examples(wav, sr))
        logger = Logger(cfg.logdir, cfg.train_logname(video_name))
        # Saves _latest every epoch / _best on improvement inside the loop
        # and resumes params+opt-state+best_loss (reference: main.py:356-370,
        # 461-483).
        state, history = train_video(cfg, frames, audio_examples,
                                     logger=logger,
                                     resume=cfg.resume or None,
                                     ckpt_dir=cfg.ckpt,
                                     ckpt_name=cfg.train_logname(video_name))
        best = min(history) if history else float("inf")
        print(f"[avtex] trained {video_name}: {len(history)} epochs, "
              f"best loss {best:.4f}")
        return

    # ---- evaluate / synthesize ----------------------------------------- #
    from avtex.contrastive.model import ContrastiveTextures
    from avtex.synth.pipeline import synthesize
    from avtex.train.checkpoint import restore_checkpoint

    fps = video_fps(video_path)
    cfg = cfg.derive_geometry(fps)

    resume = cfg.resume or cfg.default_ckpt_path(video_name)
    params = None
    if os.path.exists(resume):
        import time

        import jax
        import jax.numpy as jnp
        from avtex.data.preprocess import preprocess_clip
        t0 = time.perf_counter()
        model = ContrastiveTextures(arch=cfg.enc_arch,
                                    model_type=cfg.model_type, temp=cfg.temp)
        # init a template for restore (the jitted full-model init compile
        # below is the dominant pre-pipeline cost on cold runs — printed so
        # CLI wall time stays attributable alongside the pipeline timings)
        dummy = jnp.zeros((1, cfg.window, 32, 32, 3), jnp.uint8)
        x = preprocess_clip(dummy, size=cfg.img_size,
                            slowfast=cfg.enc_arch == "slowfast")
        if cfg.enc_arch == "slowfast":
            from avtex.nn.slowfast import slowfast_pathways
            x = slowfast_pathways(x)
        t_in = (tuple(p[:, None] for p in x) if isinstance(x, tuple)
                else x[:, None])
        qa = (jnp.zeros((1, 100, 64)) if cfg.model_type == 2 else None)
        ta = (jnp.zeros((1, 1, 100, 64)) if cfg.model_type == 2 else None)
        template = jax.jit(model.init)(jax.random.key(0), x, t_in, qa, ta)
        payload = restore_checkpoint(resume, template)
        params = payload["state"]
        print(f"[avtex] restored checkpoint {resume} "
              f"(epoch {payload['epoch']}, loss {payload['best_loss']:.4f}, "
              f"init+restore {time.perf_counter() - t0:.1f}s)")
    else:
        # The reference asserts here (main.py:536) — a missing checkpoint at
        # eval means the train/eval flag strings don't match and the walk
        # would silently run on random weights. norm="affine" is exempt:
        # that configuration auto-loads pretrained frozen-BN imports inside
        # synthesize() and needs no train checkpoint.
        if not (cfg.allow_random_init or cfg.norm == "affine"):
            raise FileNotFoundError(
                f"No checkpoint found at '{resume}'. Pass the same "
                f"hyperparameter flags (-bs/-negs/-w/-stride/...) used at "
                f"training so the derived path matches, give -resume "
                f"explicitly, or pass -allow_random_init to synthesize "
                f"with random weights anyway.")
        print(f"[avtex] no checkpoint at {resume}; random-init params",
              file=sys.stderr)
        model = ContrastiveTextures(arch=cfg.enc_arch,
                                    model_type=cfg.model_type, temp=cfg.temp)
        params = None  # synthesize() will init below

    driving_paths: List[Optional[str]] = [None]
    if cfg.driving_audio:
        driving_paths = [os.path.join(cfg.dadata, f"{d}.wav")
                         for d in cfg.driving_audio]

    logger = Logger(cfg.logdir, cfg.eval_logname(video_name))
    for d_path in driving_paths:
        out = synthesize(cfg, video_path, params, audio_path=audio_path,
                         driving_audio_path=d_path,
                         out_dir=cfg.results_folder, mesh=mesh,
                         logger=logger)
        r = out["result"]
        print(f"[avtex] {video_name}: {len(r.indices)} steps, "
              f"{int(r.jumps.sum())} jumps, timings {out['timings']}, "
              f"outputs {list(out['paths'].values())}")


def main(argv=None) -> None:
    from avtex.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    cfg = args_to_config(args)
    if not cfg.video_list:
        # Reference default: every file in -vdata (main.py:495-502).
        if cfg.vdata and os.path.isdir(cfg.vdata):
            cfg = dataclasses.replace(
                cfg, video_list=discover_video_list(cfg.vdata))
        if not cfg.video_list:
            raise SystemExit(
                "need -vl video names (or -vdata pointing at a directory "
                "of videos to discover them from)")
    mesh = None
    if args.mesh:
        from avtex.parallel import make_mesh
        mesh = make_mesh()
    for itr, video_name in enumerate(cfg.video_list):
        run_one_video(per_video_config(cfg, video_name, itr), video_name,
                      mesh=mesh)


if __name__ == "__main__":
    main()
