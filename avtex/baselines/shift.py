"""Random audio-shift baseline.

Circularly shifts a result video's audio track by 4-12 s and remuxes
(reference: baselines/audio_baselines/random_shift.py:13-52, which shelled
out to ffmpeg; here the shift is a numpy roll + avtex mux).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def shift_audio(audio: np.ndarray, sample_rate: int,
                shift_seconds: Optional[float] = None, seed: int = 0
                ) -> Tuple[np.ndarray, float]:
    """Circularly shift a waveform EARLIER by ``shift_seconds`` (random
    integer 4..11 s when None, matching the reference's
    ``np.random.randint(4, 12)``). The reference moves the tail to the
    front: ``new_audio[:-n] = audio[n:]; new_audio[-n:] = audio[:n]``
    (random_shift.py:19-22) — a left roll. Returns (shifted, seconds)."""
    if shift_seconds is None:
        rng = np.random.default_rng(seed)
        shift_seconds = float(rng.integers(4, 12))
    n = int(round(shift_seconds * sample_rate))
    return np.roll(audio, -n, axis=0), shift_seconds
