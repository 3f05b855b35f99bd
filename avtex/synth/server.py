"""Warm-process texture serving: pay embed once, synthesize many.

The reference's validate.py couples everything into one batch job: every
request would re-decode, re-embed every segment at every step, and exit
(reference: validate.py:63-874). The embed-once design makes a serving
loop natural: decode + embed ONCE at load, then each request is one walk
(milliseconds — BASELINE.md "Walk backends") plus stitching. This is the
deployment shape for the "infinite texture" product: one resident model
per source video, many variations/lengths/audio tracks served from it.

    server = TextureServer(cfg, "surf.mp4", params)
    a = server.synthesize(seconds=30, threshold=0.4, seed=1)
    b = server.synthesize(seconds=60, threshold=0.2, seed=2)
    c = server.synthesize(seconds=30, driving_audio="song.wav", alpha=0.5)

Per-request knobs mirror the reference CLI flags (-th, -alpha, -da,
length); the embed tables, decoded frames, audio features AND the
driving-audio scoring state (VGGish/VideoForAudio params, source
features, the Contrastive mode's video table) are shared across
requests — only the driving wav's own featurization is per-request.
For L >= ~1k segments pass ``walk_on_device=True`` to use the fused
lax.scan walk (its one-time compile amortizes across requests — the
crossover measured in avtex/synth/engine.py).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from avtex.config import Config


class TextureServer:
    """One source video, resident embeddings, many synthesis requests."""

    def __init__(self, cfg: Config, video_path: str, params=None,
                 audio_path: Optional[str] = None, mesh=None):
        import jax
        import jax.numpy as jnp

        from avtex.audio import waveform_to_examples
        from avtex.contrastive.model import ContrastiveTextures
        from avtex.media import read_video, read_wav

        # Full-rate frames for stitching; subsampled view for encoding
        # (reference: validate.py:111-113, 621-630 — see pipeline.py).
        self.video_full, self.fps = read_video(video_path)
        self.cfg = cfg.derive_geometry(self.fps)
        self.sub = max(1, int(cfg.subsample_rate))
        self.video = self.video_full[::self.sub]
        self.W, self.S = self.cfg.window, self.cfg.stride
        from avtex.contrastive.segments import require_segments
        self.L = require_segments(len(self.video), self.W, self.S, "val",
                                  what=os.path.basename(video_path))
        self.name = os.path.splitext(os.path.basename(video_path))[0]

        self.audio = None
        self.sample_rate = 22050
        self.audio_examples = None
        if audio_path is not None and os.path.exists(audio_path):
            self.audio, self.sample_rate = read_wav(audio_path)
            apf = int(np.floor(self.sample_rate * self.sub / self.fps))
            self.audio = self.audio[: len(self.video) * apf]
            self.audio_examples = np.asarray(waveform_to_examples(
                self.audio, self.sample_rate * self.sub))

        self.model = ContrastiveTextures(
            arch=self.cfg.enc_arch, model_type=self.cfg.model_type,
            temp=self.cfg.temp, norm=self.cfg.norm)
        if params is None:
            from avtex.synth.pipeline import init_params_for_synthesis
            params = init_params_for_synthesis(self.cfg, self.model,
                                               self.video, self.W)
        self.params = params

        # ---- the one-time embed --------------------------------------- #
        if mesh is not None:
            from avtex.parallel import sharded_embed_from_video
            self.q_table = sharded_embed_from_video(
                self.model, params, mesh, self.video, self.W, self.S,
                self.L, self.audio_examples, tower="query",
                img_size=self.cfg.img_size)
            self.t_table = sharded_embed_from_video(
                self.model, params, mesh, self.video, self.W, self.S,
                self.L, self.audio_examples, tower="target",
                img_size=self.cfg.img_size)
        else:
            from avtex.synth.embeddings import (
                precompute_embeddings_from_video)
            self.q_table, self.t_table = precompute_embeddings_from_video(
                self.model, params, self.video, self.W, self.S, self.L,
                self.audio_examples, img_size=self.cfg.img_size,
                batch_size=max(self.cfg.mini_batchsize, 1))
        jax.block_until_ready((self.q_table, self.t_table))
        self._jnp = jnp
        self._audio_scorer = None  # built lazily on first driving request
        self._interp_fn = None  # built lazily on first interp request

    def _scorer(self):
        """Driving-audio scoring state, built once per server."""
        if self._audio_scorer is None:
            from avtex.synth.pipeline import make_audio_scorer
            self._audio_scorer = make_audio_scorer(
                self.cfg, self.video, self.audio_examples, self.L,
                self.W, self.S)
        return self._audio_scorer

    def synthesize(self, seconds: Optional[float] = None,
                   threshold: Optional[float] = None,
                   alpha: Optional[float] = None,
                   seed: Optional[int] = None,
                   seed_segment_id: Optional[int] = None,
                   driving_audio: Optional[str] = None,
                   walk_on_device: bool = False,
                   stitch: bool = True,
                   interpolate: Optional[bool] = None) -> Dict:
        """One texture from the resident tables.

        Returns {"result": SynthesisResult, "frames": [...] or None,
        "frames_intp": ..., "audio": ..., "sample_rate": ..., "fps": ...}.
        ``audio`` is the raw driving waveform at ITS rate when
        ``driving_audio`` is given (``sample_rate`` says which), else the
        walked source-audio slices at the source rate. All knobs default
        to the server's cfg; ``interpolate`` follows cfg.interpolation.
        """
        import jax

        from avtex.synth.engine import (num_synthesis_steps,
                                        synthesize_indices,
                                        synthesize_indices_host)
        from avtex.synth.stitcher import stitch_texture

        cfg = self.cfg
        seconds = cfg.new_video_length if seconds is None else seconds
        threshold = cfg.threshold if threshold is None else threshold
        alpha = cfg.alpha if alpha is None else alpha
        seed = cfg.seed if seed is None else seed
        interpolate = cfg.interpolation if interpolate is None \
            else interpolate

        audio_logits = None
        drv = None
        d_sr = self.sample_rate
        seed_id = (cfg.start_segment if seed_segment_id is None
                   else seed_segment_id)
        max_length = int(seconds * self.fps)  # original-rate frames
        if driving_audio is not None:
            from avtex.audio import waveform_to_examples
            from avtex.media import read_wav
            drv, d_sr = read_wav(driving_audio)
            drv_eg = np.asarray(waveform_to_examples(drv, d_sr * self.sub))
            max_length = min(max_length,
                             int(len(drv_eg) / 10 * self.fps) * self.sub)
            steps0 = num_synthesis_steps(-(-max_length // self.sub),
                                         self.W, self.S)
            audio_logits, sid = self._scorer()(drv_eg, steps0)
            if sid is not None:
                seed_id = sid
        seed_id = min(seed_id, self.L - 1)
        steps = num_synthesis_steps(-(-max_length // self.sub),
                                    self.W, self.S)

        if walk_on_device:
            result = synthesize_indices(
                self.q_table, self.t_table, steps, temp=cfg.temp,
                threshold=threshold, alpha=alpha,
                audio_logits=audio_logits, seed_id=seed_id,
                rng=jax.random.key(seed))
        else:
            result = synthesize_indices_host(
                self.q_table, self.t_table, steps, temp=cfg.temp,
                threshold=threshold, alpha=alpha,
                audio_logits=audio_logits, seed_id=seed_id,
                rng=np.random.default_rng(seed))

        out = {"result": result, "fps": self.fps, "frames": None,
               "frames_intp": None,
               "audio": drv if drv is not None else self.audio,
               "sample_rate": d_sr if drv is not None else self.sample_rate}
        if stitch:
            if interpolate and self._interp_fn is None:
                from avtex.utils.convert import maybe_make_slomo_interp_fn
                self._interp_fn = maybe_make_slomo_interp_fn(
                    size=self.video_full.shape[1:3])
            stitched = stitch_texture(
                self.video_full, result.indices, self.W, self.S, sf=cfg.SF,
                subsample_rate=self.sub, interpolate=interpolate,
                interp_fn=self._interp_fn if interpolate else None,
                source_audio=None if drv is not None else self.audio,
                audio_sample_rate=self.sample_rate, fps=self.fps)
            out["frames"] = stitched["frames"]
            out["frames_intp"] = stitched["frames_intp"]
            out["audio"] = (drv if drv is not None
                            else stitched.get("audio"))
        return out
