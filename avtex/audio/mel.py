"""jnp log-mel frontend with VGGish feature semantics.

TPU-first re-expression of the reference's numpy pipeline
(reference: contrastive_video_textures/utils/mel_features.py:21-205 and
utils/vggish_utils.py:27-69): strided framing -> periodic Hann -> |rFFT| ->
mel filterbank matmul -> log(x + offset) -> example framing. Everything from
framing onward is a single jit-able function of a statically-shaped waveform;
the mel filterbank is a trace-time numpy constant so XLA folds it into one
[frames, 257] x [257, 64] MXU matmul.

Resampling to 16 kHz happens on the host (scipy polyphase) — the reference
used resampy's Kaiser-windowed sinc; both are polyphase FIR designs and agree
to audio precision, but not bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import params


def periodic_hann(window_length: int) -> np.ndarray:
    """Hann window of period N (not the symmetric period-(N-1) variant)."""
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(window_length) / window_length))


def _hertz_to_mel(f):
    return params.MEL_HIGH_FREQUENCY_Q * np.log1p(
        np.asarray(f, dtype=np.float64) / params.MEL_BREAK_FREQUENCY_HERTZ)


def mel_weight_matrix(num_mel_bins: int = params.NUM_MEL_BINS,
                      num_spectrogram_bins: int = params.FFT_LENGTH // 2 + 1,
                      sample_rate: float = params.SAMPLE_RATE,
                      lower_edge_hertz: float = params.MEL_MIN_HZ,
                      upper_edge_hertz: float = params.MEL_MAX_HZ) -> np.ndarray:
    """[num_spectrogram_bins, num_mel_bins] triangular mel filterbank.

    Vectorized HTK-style construction: triangles are linear in mel space;
    the DC bin is zeroed (reference: utils/mel_features.py:103-173).
    """
    nyquist = sample_rate / 2.0
    if not (0.0 <= lower_edge_hertz < upper_edge_hertz <= nyquist):
        raise ValueError("bad mel band edges")
    spec_mel = _hertz_to_mel(np.linspace(0.0, nyquist, num_spectrogram_bins))
    edges = np.linspace(_hertz_to_mel(lower_edge_hertz),
                        _hertz_to_mel(upper_edge_hertz), num_mel_bins + 2)
    lower, center, upper = edges[:-2], edges[1:-1], edges[2:]
    # [bins, mel]: rising and falling slopes of each triangle.
    up = (spec_mel[:, None] - lower[None, :]) / (center - lower)[None, :]
    down = (upper[None, :] - spec_mel[:, None]) / (upper - center)[None, :]
    w = np.maximum(0.0, np.minimum(up, down))
    w[0, :] = 0.0  # exclude the DC bin
    return w


def num_mel_frames(num_samples: int) -> int:
    """Complete STFT frames for a waveform of ``num_samples`` (no padding)."""
    if num_samples < params.WINDOW_SAMPLES:
        return 0
    return 1 + (num_samples - params.WINDOW_SAMPLES) // params.HOP_SAMPLES


def num_examples(num_samples: int) -> int:
    """Number of [100, 64] examples for a waveform of ``num_samples``."""
    frames = num_mel_frames(num_samples)
    if frames < params.EXAMPLE_WINDOW_FRAMES:
        return 0
    return 1 + (frames - params.EXAMPLE_WINDOW_FRAMES) // params.EXAMPLE_HOP_FRAMES


def frame_signal(x: jnp.ndarray, window_length: int, hop_length: int) -> jnp.ndarray:
    """[num_frames, window_length] overlapping frames of a 1-D (or N-D) signal.

    jnp gather equivalent of the reference's stride_tricks framing
    (reference: utils/mel_features.py:21-41); incomplete tail frames are
    dropped, matching the no-padding contract.
    """
    n = 1 + (x.shape[0] - window_length) // hop_length
    idx = (jnp.arange(n)[:, None] * hop_length) + jnp.arange(window_length)[None, :]
    return x[idx]


@functools.partial(jax.jit, static_argnames=("sample_rate",))
def log_mel_spectrogram(data: jnp.ndarray,
                        sample_rate: int = params.SAMPLE_RATE) -> jnp.ndarray:
    """[num_frames, 64] log mel spectrogram of a 16 kHz waveform.

    Matches reference utils/mel_features.py:176-205 numerics: periodic Hann,
    512-point rFFT magnitude, mel matmul, log(x + 0.01).
    """
    del sample_rate  # frontend constants assume 16 kHz; kept for API parity
    frames = frame_signal(data.astype(jnp.float32),
                          params.WINDOW_SAMPLES, params.HOP_SAMPLES)
    window = jnp.asarray(periodic_hann(params.WINDOW_SAMPLES), dtype=jnp.float32)
    spec = jnp.abs(jnp.fft.rfft(frames * window, params.FFT_LENGTH))
    mel = jnp.asarray(mel_weight_matrix(), dtype=jnp.float32)
    return jnp.log(spec @ mel + params.LOG_OFFSET)


def resample_to_16k(data: np.ndarray, sample_rate: int) -> np.ndarray:
    """Host-side polyphase resample to the frontend rate (16 kHz)."""
    if sample_rate == params.SAMPLE_RATE:
        return np.asarray(data, dtype=np.float32)
    from scipy.signal import resample_poly  # lazy: host path only
    from math import gcd
    g = gcd(int(params.SAMPLE_RATE), int(sample_rate))
    out = resample_poly(np.asarray(data, dtype=np.float64),
                        params.SAMPLE_RATE // g, sample_rate // g)
    return out.astype(np.float32)


def waveform_to_examples(data: np.ndarray, sample_rate: int) -> jnp.ndarray:
    """Waveform -> [num_examples, 100, 64] log-mel example patches.

    API-parity entry point (reference: utils/vggish_utils.py:27-69): mono-mix,
    resample to 16 kHz on the host, then run the jit'd frontend and frame the
    mel rows into overlapping 1.0 s / 0.1 s-hop examples.
    """
    data = np.asarray(data)
    if data.ndim > 1:
        data = data.mean(axis=1)
    data = resample_to_16k(data, sample_rate)
    log_mel = log_mel_spectrogram(jnp.asarray(data))
    return frame_signal(log_mel,
                        params.EXAMPLE_WINDOW_FRAMES, params.EXAMPLE_HOP_FRAMES)
