from . import params
from .mel import (
    periodic_hann,
    mel_weight_matrix,
    log_mel_spectrogram,
    frame_signal,
    waveform_to_examples,
    num_mel_frames,
    num_examples,
)
