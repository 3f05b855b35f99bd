"""Host-side frame/audio assembly for synthesized textures.

Reproduces the reference's stitching contract (validate.py:580-671):

- first chosen segment contributes its full W frames, every later one its
  last S frames (the slice [q*S+(W-S), q*S+W), validate.py:585-613);
- the plain texture is those frames at source fps;
- the "interp" texture runs at fps*(SF+1)/2: every frame is followed by
  (SF-1)/2 held copies, except at jumps where the held copies of the
  previous frame are replaced by SF-1 interpolated frames (SuperSloMo when
  a model is supplied, C++ crossfade otherwise) and the first new frame
  gets no copies;
- audio: source-audio slices follow the emitted frame ids; driving audio
  replaces the track wholesale (validate.py:640-647,796-807).

Device work (interpolation) is batched per jump; gathering/duplication is
the native C++ stitcher.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from avtex.native import stitch as native_stitch


def walk_frame_ids(indices: Sequence[int], window: int, stride: int
                   ) -> Tuple[np.ndarray, List[int]]:
    """Chosen segment ids -> emitted frame ids + jump positions.

    Returns (frame_ids, jump_at): ``jump_at[k]`` is the index into
    ``frame_ids`` of the first frame emitted by the k-th jump step.
    """
    out: List[int] = []
    jump_at: List[int] = []
    prev = -1
    for q_id in indices:
        q_id = int(q_id)
        if prev == -1:
            ids = range(q_id * stride, q_id * stride + window)
        else:
            ids = range(q_id * stride + window - stride, q_id * stride + window)
            if q_id != prev + 1:
                jump_at.append(len(out))
        out.extend(ids)
        prev = q_id
    return np.asarray(out, dtype=np.int64), jump_at


def expand_subsample(frame_ids: np.ndarray, subsample_rate: int) -> np.ndarray:
    """Emitted (subsampled) ids -> original-video ids
    (reference: validate.py:621-624)."""
    if subsample_rate == 1:
        return frame_ids
    return (frame_ids[:, None] * subsample_rate
            + np.arange(subsample_rate)[None, :]).reshape(-1)


def stitch_texture(video: np.ndarray, indices: Sequence[int], window: int,
                   stride: int, *, sf: int = 5, subsample_rate: int = 1,
                   interpolate: bool = True,
                   interp_fn: Optional[Callable[[np.ndarray, np.ndarray, int],
                                                np.ndarray]] = None,
                   frames_bar: bool = False,
                   source_audio: Optional[np.ndarray] = None,
                   audio_sample_rate: int = 22050,
                   fps: float = 30.0
                   ) -> dict:
    """Assemble output frame arrays (+audio) from a transition walk.

    Args:
      video: original decoded frames uint8 [T, H, W, 3] (pre-subsample).
      indices: chosen segment ids from the synthesis walk.
      interp_fn: (frame0, frame1, n_mid) -> [n_mid, H, W, 3]; defaults to
        the native crossfade. Pass the SuperSloMo wrapper for net interp.

    Returns dict with "frames", "frames_intp" (None unless interpolate),
    "frame_ids", "audio" (None without source_audio), "jump_count".
    """
    frame_ids_sub, jump_at = walk_frame_ids(indices, window, stride)
    frame_ids = expand_subsample(frame_ids_sub, subsample_rate)
    total = len(video)
    frames = native_stitch.stitch_frames(video, frame_ids,
                                         frames_bar=frames_bar,
                                         total_input_frames=total)

    frames_intp = None
    if interpolate:
        if interp_fn is None:
            interp_fn = native_stitch.crossfade
        hold = (sf - 1) // 2
        jumps = set(jump_at)
        seq: List[np.ndarray] = []
        for k, fid in enumerate(frame_ids_sub):
            at_jump = k in jumps and k > 0
            if at_jump:
                # replace held copies of the previous frame with SF-1
                # net/crossfade intermediates (reference: validate.py:587-613).
                # frame0 is the LAST expanded original of the previous id
                # (the reference's prev diff_ids[-1], already expanded at
                # validate.py:621-624); frame1 the first original of the
                # jumped-to id.
                if hold:
                    del seq[-hold:]
                prev_frame = video[frame_ids[k * subsample_rate - 1]]
                next_frame = video[int(fid) * subsample_rate]
                seq.extend(interp_fn(prev_frame, next_frame, sf - 1))
            for s in range(subsample_rate):
                f = frames[k * subsample_rate + s]
                seq.append(f)
                # every emitted original gets `hold` copies except the very
                # first frame after a jump (reference: validate.py:645-647)
                if not (at_jump and s == 0):
                    seq.extend([f] * hold)
        frames_intp = np.stack(seq) if seq else None

    audio = None
    if source_audio is not None:
        # samples per WALKED (subsampled) id — the reference's apf is
        # floor(sr*subsample_rate/fps) indexed by subsampled diff_ids
        # (validate.py:155,640-647); identical to per-original slicing at
        # subsample_rate=1.
        apf = int(audio_sample_rate * subsample_rate / fps)
        chunks = [source_audio[i * apf:(i + 1) * apf] for i in frame_ids_sub]
        audio = np.concatenate(chunks) if chunks else None

    return {
        "frames": frames,
        "frames_intp": frames_intp,
        "frame_ids": frame_ids,
        "audio": audio,
        "jump_count": len(jump_at),
    }
