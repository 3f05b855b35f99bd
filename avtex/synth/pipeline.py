"""End-to-end synthesis orchestration: media in -> texture out.

The TPU-shaped replacement for reference validate.py:63-874: decode once,
derive geometry from fps, embed every segment once (optionally sharded over
the mesh), build the driving-audio logit rows, run the scan walk, stitch on
the host, mux. Device work is front-loaded; the data-dependent tail
(interpolation at jumps, muxing) runs on host — unlike the reference's
interleaved per-step GPU loop.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from avtex.audio.mel import waveform_to_examples
from avtex.config import Config
from avtex.contrastive.model import ContrastiveTextures
from avtex.contrastive.segments import gather_windows
from avtex.media import read_video, read_wav, save_texture_outputs
from avtex.obs import Timer

from .embeddings import vggish_audio_features
from .engine import (driving_audio_logits, num_synthesis_steps, seed_segment,
                     synthesize_indices, synthesize_indices_host)
from .stitcher import stitch_texture


def synthesize(cfg: Config, video_path: str, params,
               audio_path: Optional[str] = None,
               driving_audio_path: Optional[str] = None,
               out_dir: Optional[str] = None,
               mesh=None, interp_fn=None, logger=None,
               walk_on_device: bool = False) -> Dict:
    """Synthesize one texture (reference: main.py:429-437 -> validate).

    Args:
      params: trained ContrastiveTextures params (from avtex.train).
      mesh: optional jax.sharding.Mesh — shards the embed pass over 'data'.

    Returns dict with the SynthesisResult, output paths and stage timings.
    """
    name = os.path.splitext(os.path.basename(video_path))[0]
    timings: Dict[str, float] = {}

    with Timer() as t:
        video_full, fps = read_video(video_path)
    timings["decode_s"] = t.elapsed
    cfg = cfg.derive_geometry(fps)
    W, S = cfg.window, cfg.stride
    # Subsampled view for ENCODING; stitching expands each walked id back
    # to `sub` consecutive original-rate frames (reference: validate.py:
    # 111-113 encodes input_frames = video[::sub], :621-630 emits the
    # expanded originals and counts THEM toward max_length).
    sub = max(1, int(cfg.subsample_rate))
    video = video_full[::sub]
    from avtex.contrastive.segments import require_segments
    L = require_segments(len(video), W, S, "val",
                         what=os.path.basename(video_path))

    audio = None
    sr = 22050
    audio_examples = None
    if audio_path is not None and os.path.exists(audio_path):
        audio, sr = read_wav(audio_path)
        # Examples on the SUBSAMPLED timeline (rate scaled by sub) with the
        # waveform clipped to the encoded frames' span — reference
        # validate.py:155-159.
        apf = int(np.floor(sr * sub / fps))
        audio = audio[: len(video) * apf]
        audio_examples = np.asarray(waveform_to_examples(audio, sr * sub))

    driving = None
    driving_examples = None
    if driving_audio_path is not None:
        driving, d_sr = read_wav(driving_audio_path)
        # Scaled like the source examples (reference: validate.py:173-175);
        # the muxed output track stays the raw waveform at d_sr.
        driving_examples = np.asarray(
            waveform_to_examples(driving, d_sr * sub))

    model = ContrastiveTextures(arch=cfg.enc_arch, model_type=cfg.model_type,
                                temp=cfg.temp, norm=cfg.norm)
    if params is None:  # random-init fallback (no checkpoint supplied)
        params = init_params_for_synthesis(cfg, model, video, W)

    # ---- embed once ---------------------------------------------------- #
    with Timer() as t:
        if mesh is not None:
            from avtex.parallel import sharded_embed_from_video
            q_table = sharded_embed_from_video(
                model, params, mesh, video, W, S, L, audio_examples,
                tower="query", img_size=cfg.img_size)
            t_table = sharded_embed_from_video(
                model, params, mesh, video, W, S, L, audio_examples,
                tower="target", img_size=cfg.img_size)
        else:
            from .embeddings import precompute_embeddings_from_video
            q_table, t_table = precompute_embeddings_from_video(
                model, params, video, W, S, L, audio_examples,
                img_size=cfg.img_size, batch_size=cfg.mini_batchsize)
    timings["embed_s"] = t.elapsed

    # ---- synthesis length + steps -------------------------------------- #
    # max_length counts ORIGINAL-rate frames; each walk step emits S
    # subsampled ids = S*sub originals, so the step count divides by sub
    # (reference: `while len(new_frames) < max_length`, validate.py:324,
    # with new_frames extended by the expanded ids).
    max_length = int(cfg.new_video_length * fps)
    if driving is not None:
        # clip to driving-audio length (reference: validate.py:257-263);
        # driving examples live on the subsampled timeline, so the real
        # seconds they cover scale back up by sub.
        max_length = min(max_length,
                         int(len(driving_examples) / 10 * fps) * sub)
    steps = num_synthesis_steps(-(-max_length // sub), W, S)

    # ---- driving-audio rows -------------------------------------------- #
    audio_logits = None
    seed_id = min(cfg.start_segment, L - 1)
    if driving_examples is not None:
        with Timer() as t:
            audio_logits, sid = driving_audio_rows(
                cfg, video, audio_examples, driving_examples, steps, L, W, S)
        timings["audio_rows_s"] = t.elapsed
        if sid is not None:
            seed_id = sid

    # ---- the walk ------------------------------------------------------- #
    # Host walk by default: same semantics, zero compile cost per new
    # (L, steps) shape; pass walk_on_device=True for the fused lax.scan.
    with Timer() as t:
        if walk_on_device:
            result = synthesize_indices(
                q_table, t_table, steps, temp=cfg.temp,
                threshold=cfg.threshold, alpha=cfg.alpha,
                audio_logits=audio_logits, seed_id=seed_id,
                rng=jax.random.key(cfg.seed))
        else:
            result = synthesize_indices_host(
                q_table, t_table, steps, temp=cfg.temp,
                threshold=cfg.threshold, alpha=cfg.alpha,
                audio_logits=audio_logits, seed_id=seed_id,
                rng=np.random.default_rng(cfg.seed))
    timings["walk_s"] = t.elapsed

    # ---- stitch + outputs ----------------------------------------------- #
    if interp_fn is None and cfg.interpolation:
        # Pretrained SuperSloMo when the checkpoint exists (the reference
        # always loads it, validate.py:183-185); crossfade otherwise.
        from avtex.utils.convert import maybe_make_slomo_interp_fn
        with Timer() as t:
            interp_fn = maybe_make_slomo_interp_fn(size=video_full.shape[1:3])
        timings["interp_load_s"] = t.elapsed
    with Timer() as t:
        stitched = stitch_texture(
            video_full, result.indices, W, S, sf=cfg.SF,
            subsample_rate=sub,
            interpolate=cfg.interpolation, interp_fn=interp_fn,
            frames_bar=cfg.frames_bar,
            source_audio=audio if driving is None else None,
            audio_sample_rate=sr, fps=fps)
    timings["stitch_s"] = t.elapsed

    out_audio = stitched["audio"]
    out_sr = sr
    if driving is not None:
        out_audio, out_sr = driving, d_sr

    paths = {}
    if out_dir is not None:
        with Timer() as t:
            paths = save_texture_outputs(
                out_dir, cfg.eval_logname(name), stitched["frames"], fps,
                audio=out_audio, sample_rate=out_sr,
                frames_intp=stitched["frames_intp"], sf=cfg.SF)
        timings["mux_s"] = t.elapsed
        # entropy / non-zero bar plots + HTML gallery
        # (reference: validate.py:732-743, utils/visualizations.py:31-81)
        from avtex.obs.visualizations import (generate_html_report,
                                              save_bar_plot)
        base = os.path.join(out_dir, cfg.eval_logname(name))
        paths["entropy_png"] = save_bar_plot(
            result.entropies, base + "_entropy.png", "per-step entropy")
        paths["nonzero_png"] = save_bar_plot(
            result.nonzero_counts, base + "_nonzero.png",
            "surviving candidates per step")
        if cfg.vcam:
            # CAM overlay videos (reference: validate.py:745-778 — dead as
            # shipped since --vcam is never defined; implemented embed-once
            # in avtex/synth/cam.py).
            from avtex.media.video import write_video
            from avtex.synth.cam import cam_step_frames, segment_cams
            with Timer() as t:
                try:
                    cams = segment_cams(model, params, video, W, S, L,
                                        audio_examples=audio_examples,
                                        tower="query", img_size=cfg.img_size)
                except ValueError as e:
                    # 2D frame-mean encoders have no 5-D spatial
                    # intermediate, and model_type=2 without source audio
                    # cannot embed — skip CAMs, keep the texture outputs.
                    import sys
                    print(f"[avtex] WARNING: skipping CAM videos ({e})",
                          file=sys.stderr)
                    cams = None
                if cams is not None:
                    q_ids = np.concatenate([[result.seed_id],
                                            np.asarray(result.indices[:-1])])
                    q_frames, p_frames = cam_step_frames(video, cams, q_ids,
                                                         W, S)
                    paths["cam_q_video"] = write_video(
                        q_frames, base + "_cam_q.mp4", fps)
                    paths["cam_p_video"] = write_video(
                        p_frames, base + "_cam_p.mp4", fps)
            timings["cam_s"] = t.elapsed
        paths["report"] = generate_html_report(
            base + "_report.html",
            {k: os.path.basename(v) for k, v in paths.items()
             if str(v).endswith((".mp4", ".avi"))},
            {"jumps": int(stitched["jump_count"]),
             "steps": len(result.indices),
             "segments": L,
             "seed_segment": result.seed_id})

    if logger is not None:
        for i, e in enumerate(result.entropies):
            logger.log_scalar(float(e), "synth/entropy", i)
            logger.log_scalar(int(result.nonzero_counts[i]),
                              "synth/nonzero", i)
        # the reference counts jumps only past the first step
        # (validate.py:586: p_q_id != -1), exactly walk_frame_ids' count
        logger.log_scalar(int(stitched["jump_count"]), "synth/jump_count", 0)
        if cfg.visualize_evaluate:
            # query/choice frame strips at jumps (reference: validate.py:649-671)
            prev = result.seed_id
            for i, q_id in enumerate(result.indices):
                if bool(result.jumps[i]) and i > 0:
                    logger.log_video(video[prev * S:prev * S + W],
                                     "synth/jump_query", i)
                    logger.log_video(video[int(q_id) * S:int(q_id) * S + W],
                                     "synth/jump_choice", i)
                prev = int(q_id)

            # per-step probability-row figures (reference: validate.py:546-551)
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            probs = np.asarray(
                (q_table @ t_table.T) / cfg.temp)
            for i, q_id in enumerate([result.seed_id]
                                     + list(result.indices[:-1])):
                fig = plt.figure()
                ax = fig.add_subplot(1, 1, 1)
                im = ax.imshow(np.tile(probs[int(q_id)], (20, 1)),
                               interpolation="nearest", aspect="auto")
                fig.colorbar(im)
                logger.log_figure(fig, "synth/probs_queryframe", i)
                plt.close(fig)

    return {
        "result": result,
        "paths": paths,
        "timings": timings,
        "stitched": stitched,
        "num_segments": L,
        "fps": fps,
        "window": W,
        "stride": S,
    }


def init_params_for_synthesis(cfg: Config, model, video, window: int):
    """Random-init params shaped for synthesis (no checkpoint supplied);
    model_type=2 grafts pretrained VGGish when the file exists
    (reference: main.py:338)."""
    from avtex.data.preprocess import preprocess_clip
    dummy = jnp.zeros((1, window) + video.shape[1:3] + (3,), jnp.uint8)
    x = preprocess_clip(dummy, size=cfg.img_size,
                        slowfast=cfg.enc_arch == "slowfast")
    if cfg.enc_arch == "slowfast":
        from avtex.nn.slowfast import slowfast_pathways
        x = slowfast_pathways(x)
    t_in = (tuple(p[:, None] for p in x) if isinstance(x, tuple)
            else x[:, None])
    qa = jnp.zeros((1, 100, 64)) if cfg.model_type == 2 else None
    ta = jnp.zeros((1, 1, 100, 64)) if cfg.model_type == 2 else None
    params = jax.jit(model.init)(jax.random.key(cfg.seed), x, t_in, qa, ta)
    if cfg.model_type == 2:
        from avtex.utils.convert import maybe_load_vggish_into_model
        params, _ = maybe_load_vggish_into_model(
            params, context="model_type=2 synthesis (random init)")
    if cfg.norm == "affine":
        # The affine configuration exists to run pretrained frozen-BN
        # imports; random affine weights defeat it. Auto-load the encoder
        # checkpoint into both towers when one is present (reference:
        # models/models.py:556-580).
        from avtex.utils.convert import maybe_load_encoder_into_model
        params, _ = maybe_load_encoder_into_model(
            cfg.enc_arch, params, window=window,
            context="norm=affine synthesis (no trained checkpoint)")
    return params


def make_audio_scorer(cfg: Config, video, audio_examples, L: int, W: int,
                      S: int):
    """Build the REUSABLE driving-audio scoring state for ``cfg.da_feats``.

    The three ``-daf`` modes of the reference (validate.py:260-296,
    models.py:420-462): "Contrastive" (VideoForAudio retrieval head),
    "VGG" (pretrained VGGish features — the reference default), "Mel"
    (raw flattened log-mel examples). Everything that depends only on the
    SOURCE (model init, checkpoint load, source audio features, the
    Contrastive mode's per-segment video table) is computed here once;
    the returned callable ``(driving_examples, steps) -> (audio_logits
    [steps, L], seed_id or None)`` does only per-request work — what a
    warm TextureServer needs to stay warm across driving-audio requests.
    """
    if cfg.da_feats == "Contrastive":
        # audio->video retrieval head (reference: validate.py:268-296)
        from avtex.contrastive.audio_retrieval import (VideoForAudio,
                                                       video_for_audio_logits)
        from avtex.data.preprocess import preprocess_clip
        vfa = VideoForAudio(arch=cfg.enc_arch if cfg.enc_arch != "slowfast"
                            else "resnet18", temp=cfg.temp)
        windows = gather_windows(video, W, S, "val")
        x0 = preprocess_clip(jnp.asarray(windows[:1]), size=cfg.img_size)
        vfa_params = jax.jit(vfa.init)(jax.random.key(cfg.seed),
                                       jnp.zeros((1, 100, 64)), x0[:, None])
        if cfg.daf_resume:
            from avtex.train.checkpoint import restore_checkpoint
            payload = restore_checkpoint(cfg.daf_resume[0], vfa_params)
            if payload is not None:
                vfa_params = payload["state"]

        @jax.jit
        def embed_v(p, frames):
            xx = preprocess_clip(frames, size=cfg.img_size)
            return vfa.apply(p, xx, method=vfa.embed_video)

        tables = []
        bsz = max(cfg.mini_batchsize, 1)
        for b0 in range(0, L, bsz):
            chunk = windows[b0:b0 + bsz]
            pad = bsz - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            emb = embed_v(vfa_params, jnp.asarray(chunk))
            tables.append(emb[:bsz - pad] if pad else emb)
        v_table = jnp.concatenate(tables)

        def score(driving_examples, steps: int):
            steps_ids = np.minimum(np.arange(steps),
                                   len(driving_examples) - 1)
            audio_logits = video_for_audio_logits(
                vfa, vfa_params, driving_examples[steps_ids], v_table,
                cfg.temp)
            seed_id = None
            if audio_examples is not None:
                seed_id = seed_segment(jnp.asarray(audio_examples),
                                       jnp.asarray(driving_examples[0]),
                                       num_segments=L)
            return audio_logits, seed_id

        return score

    if audio_examples is None:
        # -daf VGG/Mel score driving audio against the SOURCE video's audio
        # track; without it alpha-blending would be silently skipped. The
        # reference fails outright here (validate.py:150-162 loads the
        # source wav unconditionally) — fail loudly like it would.
        raise ValueError(
            f"driving audio given with -daf {cfg.da_feats} but the source "
            "video has no audio track (-adata): VGG/Mel modes score "
            "driving audio against source audio. Provide the source wav "
            "or use -daf Contrastive.")

    if cfg.da_feats == "Mel":
        src = jnp.asarray(audio_examples.reshape(len(audio_examples), -1))

        def featurize(examples):
            return jnp.asarray(examples.reshape(len(examples), -1))
    else:  # "VGG" (default): raw VGGish conv features
        from avtex.nn.vggish import VGGish
        from avtex.utils.convert import maybe_load_vggish
        vg = VGGish()
        vparams = jax.jit(vg.init)(
            jax.random.key(0), jnp.zeros((1,) + audio_examples.shape[1:]))
        # reference always scores with pretrained VGGish (main.py:338);
        # warns loudly if no checkpoint is available.
        vparams, _ = maybe_load_vggish(vparams, context="-daf VGG scoring")
        src = vggish_audio_features(vg, vparams, audio_examples)

        def featurize(examples):
            return vggish_audio_features(vg, vparams, examples)

    # source rows must align to segment ids (clip like validate.py:345)
    seg_ids = np.minimum(np.arange(L), len(audio_examples) - 1)
    src_rows = src[jnp.asarray(seg_ids)]

    def score(driving_examples, steps: int):
        drv = featurize(driving_examples)
        # one row per step; segment ids past the end clip to the last row
        ids = np.minimum(np.arange(steps), len(driving_examples) - 1)
        audio_logits = driving_audio_logits(src_rows, drv[jnp.asarray(ids)],
                                            cfg.temp)
        seed_id = seed_segment(jnp.asarray(audio_examples),
                               jnp.asarray(driving_examples[0]),
                               num_segments=L)
        return audio_logits, seed_id

    return score


def driving_audio_rows(cfg: Config, video, audio_examples, driving_examples,
                       steps: int, L: int, W: int, S: int):
    """One-shot wrapper over make_audio_scorer (the batch pipeline builds
    the scoring state and uses it once; a TextureServer keeps the scorer).

    Returns (audio_logits [steps, L] or None, seed_id or None).
    """
    return make_audio_scorer(cfg, video, audio_examples, L, W, S)(
        driving_examples, steps)
