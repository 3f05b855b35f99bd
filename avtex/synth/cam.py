"""Synthesis-time class-activation-map (CAM) videos.

The reference hooks the target/query encoders' last-stage conv activations
and per-segment embedding weights, builds a CAM per synthesis step, and
writes ``cam_q_video_*`` / ``cam_p_video_*`` outputs (reference:
validate.py:53-61 construct_cam, :299-315 activation hooks, :424-519
weight/activation capture, :745-778 output muxing). As shipped that path
is dead — ``--vcam`` is never defined in the argparse (main.py:41-296), so
enabling it crashes; avtex defines the flag properly.

Embed-once inversion: activations never change during synthesis, so the
spatial map of every segment is captured ONCE (flax capture_intermediates
on the embed pass — no hook machinery) and each step's CAM is a lookup.

CAM semantics match construct_cam: cam(seg) = sum_c w_c * act_c with the
segment's own embedding as channel weights, min-max normalized and
upsampled onto the frame by avtex.obs.visualizations.overlay_cam.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avtex.contrastive.model import ContrastiveTextures
from avtex.data.preprocess import preprocess_clip
from avtex.nn.slowfast import slowfast_pathways


def _last_spatial_intermediate(tree) -> jnp.ndarray:
    """Deepest 5-D ([B, T, h, w, C]) captured activation, in call order.

    For SlowFast this lands on the last slow-pathway bottleneck (the fast
    tower's final map has 8x fewer channels and loses the tie-break).
    """
    best = None

    def walk(d):
        nonlocal best
        for k, v in d.items():
            if k == "__call__":
                for out in (v if isinstance(v, (tuple, list)) else (v,)):
                    if hasattr(out, "ndim") and out.ndim == 5:
                        if best is None or out.shape[-1] >= best.shape[-1]:
                            best = out
            elif hasattr(v, "items"):
                walk(v)

    walk(tree)
    if best is None:
        raise ValueError("no 5-D spatial intermediate captured")
    return best


def segment_cams(model: ContrastiveTextures, params, video_u8,
                 window: int, stride: int, num_segments: int, *,
                 audio_examples=None, tower: str = "query",
                 img_size: int = 224, batch_size: int = 16) -> np.ndarray:
    """[L, h, w] activation maps, one per segment, from one embed pass.

    cam[l] = sum_c emb[l, c] * act[l, ..., c] (T-averaged), the reference's
    construct_cam with the segment's own embedding as weights.
    ``audio_examples`` ([N, mel, bands]) is required for model_type=2
    models — the embed pass consumes each segment's audio example just
    like the table precompute does.
    """
    slowfast = model.arch == "slowfast"
    video_dev = jnp.asarray(video_u8)
    emb_name = f"{'q' if tower == 'query' else 't'}_embedder"
    L = num_segments
    if model.model_type == 2:
        if audio_examples is None:
            raise ValueError("model_type=2 CAMs require audio_examples")
        seg_ids = np.minimum(np.arange(L), len(audio_examples) - 1)
        seg_audio = np.asarray(audio_examples)[seg_ids]

    @jax.jit
    def run(params, starts, aud):
        idx = starts[:, None] + jnp.arange(window)[None, :]
        x = preprocess_clip(video_dev[idx], size=img_size, slowfast=slowfast)
        if slowfast:
            x = slowfast_pathways(x)
        emb, state = model.apply(
            params, x, aud, tower=tower, method=model.embed,
            capture_intermediates=lambda mod, name: name == "__call__")
        act = _last_spatial_intermediate(
            state["intermediates"][emb_name]["video_encoder"])
        act = act.astype(jnp.float32).mean(axis=1)        # [B, h, w, C]
        w = emb[:, : act.shape[-1]]                       # [B, C']
        cam = jnp.einsum("bhwc,bc->bhw", act[..., : w.shape[-1]], w)
        return cam

    starts_all = np.arange(L, dtype=np.int32) * stride
    pad = (-L) % batch_size
    if pad:
        starts_all = np.concatenate(
            [starts_all, np.repeat(starts_all[-1:], pad)])
    cams = []
    for b in range(0, len(starts_all), batch_size):
        sl = slice(b, b + batch_size)
        aud = None
        if model.model_type == 2:
            ids = np.minimum(starts_all[sl] // max(stride, 1), L - 1)
            aud = jnp.asarray(seg_audio[ids])
        cams.append(np.asarray(run(params, jnp.asarray(starts_all[sl]),
                                   aud)))
    return np.concatenate(cams)[:L]


def cam_step_frames(video_u8: np.ndarray, cams: np.ndarray,
                    step_ids: np.ndarray, window: int, stride: int,
                    alpha: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
    """(query_frames, pos_frames): one CAM-overlaid frame per step.

    Per step the reference logs the query segment's CAM frame and its
    positive successor's (validate.py:649-671 imagery + the cam videos at
    :745-778). The overlay lands on each segment's center frame.
    """
    from avtex.obs.visualizations import overlay_cam

    L = len(cams)
    q_frames, p_frames = [], []
    for q_id in np.asarray(step_ids, int):
        center = q_id * stride + window // 2
        q_frames.append(overlay_cam(video_u8[min(center, len(video_u8) - 1)],
                                    cams[q_id], alpha))
        pos = min(q_id + 1, L - 1)
        center_p = pos * stride + window // 2
        p_frames.append(overlay_cam(
            video_u8[min(center_p, len(video_u8) - 1)], cams[pos], alpha))
    return np.asarray(q_frames), np.asarray(p_frames)
