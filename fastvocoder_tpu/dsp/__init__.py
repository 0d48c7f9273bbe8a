from fastvocoder_tpu.dsp.mel import mel_filter_bank
from fastvocoder_tpu.dsp.stft import hann_window, stft_mag, stft_complex, istft
from fastvocoder_tpu.dsp import audio

__all__ = [
    "mel_filter_bank",
    "hann_window",
    "stft_mag",
    "stft_complex",
    "istft",
    "audio",
]
