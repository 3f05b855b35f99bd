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
length); the embed tables, decoded frames and audio features are shared
across requests. For L >= ~1k segments pass ``walk_on_device=True`` to
use the fused lax.scan walk (its one-time compile amortizes across
requests — the crossover measured in avtex/synth/engine.py).
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

        self.video, self.fps = read_video(video_path, cfg.subsample_rate)
        self.cfg = cfg.derive_geometry(self.fps)
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
            self.audio_examples = np.asarray(
                waveform_to_examples(self.audio, self.sample_rate))

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

    def synthesize(self, seconds: Optional[float] = None,
                   threshold: Optional[float] = None,
                   alpha: Optional[float] = None,
                   seed: Optional[int] = None,
                   seed_segment_id: Optional[int] = None,
                   driving_audio: Optional[str] = None,
                   walk_on_device: bool = False,
                   stitch: bool = True) -> Dict:
        """One texture from the resident tables.

        Returns {"result": SynthesisResult, "frames": [...] or None,
        "audio": ..., "fps": ...}. All knobs default to the server's cfg.
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

        audio_logits = None
        drv = None
        seed_id = (cfg.start_segment if seed_segment_id is None
                   else seed_segment_id)
        max_length = int(seconds * self.fps)
        if driving_audio is not None:
            from avtex.audio import waveform_to_examples
            from avtex.media import read_wav
            from avtex.synth.pipeline import driving_audio_rows
            drv, d_sr = read_wav(driving_audio)
            drv_eg = np.asarray(waveform_to_examples(drv, d_sr))
            max_length = min(max_length, int(len(drv_eg) / 10 * self.fps))
            steps0 = num_synthesis_steps(max_length, self.W, self.S)
            audio_logits, sid = driving_audio_rows(
                cfg, self.video, self.audio_examples, drv_eg, steps0,
                self.L, self.W, self.S)
            if sid is not None:
                seed_id = sid
        seed_id = min(seed_id, self.L - 1)
        steps = num_synthesis_steps(max_length, self.W, self.S)

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
               "audio": drv if drv is not None else self.audio}
        if stitch:
            stitched = stitch_texture(
                self.video, result.indices, self.W, self.S, sf=cfg.SF,
                subsample_rate=1, interpolate=False,
                source_audio=None if drv is not None else self.audio,
                audio_sample_rate=self.sample_rate, fps=self.fps)
            out["frames"] = stitched["frames"]
            out["audio"] = (drv if drv is not None
                            else stitched.get("audio"))
        return out
