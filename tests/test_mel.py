"""Mel filterbank + feature-extraction parity.

librosa is not installed; `transformers.audio_utils.mel_filter_bank` with
slaney norm/scale is numerically identical to librosa.filters.mel and serves
as the parity oracle (the reference uses librosa.filters.mel at
data/audio.py:142-144).
"""

import numpy as np
import pytest

from fastvocoder_tpu.dsp.mel import mel_filter_bank
from fastvocoder_tpu.dsp import audio
from fastvocoder_tpu.hparams import HP


def test_mel_filter_bank_matches_librosa_formula():
    transformers_audio = pytest.importorskip("transformers.audio_utils")
    ours = mel_filter_bank(24000, 2048, n_mels=80, fmin=40.0, dtype=np.float64)
    theirs = transformers_audio.mel_filter_bank(
        num_frequency_bins=1025,
        num_mel_filters=80,
        min_frequency=40.0,
        max_frequency=12000.0,
        sampling_rate=24000,
        norm="slaney",
        mel_scale="slaney",
    ).T  # transformers returns (bins, mels)
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


def test_melspectrogram_shape_and_range(rng):
    y = rng.standard_normal((24000,)).astype(np.float32) * 0.1
    mel = audio.melspectrogram(y)
    assert mel.shape[0] == HP.num_mels
    assert mel.shape[1] == 1 + 24000 // HP.hop_size
    assert mel.min() >= 0.0 and mel.max() <= 1.0


def test_np_stft_matches_torch(rng):
    import torch

    y = rng.standard_normal((24000,)).astype(np.float64)
    D = audio._stft(y)  # (bins, frames)
    w = torch.hann_window(HP.win_length, dtype=torch.float64)
    z = torch.stft(
        torch.from_numpy(y), HP.n_fft, HP.hop_length, HP.win_length, w,
        return_complex=True,
    ).numpy()
    np.testing.assert_allclose(np.abs(D), np.abs(z), atol=1e-8)


def test_preemphasis_roundtrip(rng):
    y = rng.standard_normal((1000,))
    np.testing.assert_allclose(
        audio.inv_preemphasis(audio.preemphasis(y)), y, atol=1e-10
    )


def test_inv_mel_spectrogram_runs():
    mel = np.load("/root/reference/resource/test.mel.npy") if _ref() else None
    if mel is None:
        pytest.skip("no test mel")
    hp = HP.replace(griffin_lim_iters=2)
    wav = audio.inv_mel_spectrogram(mel[:, :64], hp)
    assert wav.shape[0] == hp.hop_length * 63
    assert np.isfinite(wav).all()


def _ref():
    import os

    return os.path.exists("/root/reference/resource/test.mel.npy")


def test_resample_quality_vs_analytic():
    """Closes the resample-parity gap (dsp/audio.py replaces librosa.load's
    resampler): against *analytic* ground truth — bandlimited sinusoids whose
    24 kHz samples are known exactly — the kaiser_best-grade polyphase must
    reach librosa-class SNR on both dataset paths (BiaoBei 48 kHz, LJSpeech
    22.05 kHz), and the mel-spectrogram delta must be inaudible."""
    from fastvocoder_tpu.dsp import audio

    def make_sig(sr, dur=2.0, freqs=(220.0, 1760.0, 5500.0, 9800.0)):
        t = np.arange(int(dur * sr)) / sr
        return sum(
            np.sin(2 * np.pi * f * t + i) for i, f in enumerate(freqs)
        ).astype(np.float64)

    truth = make_sig(24000)
    for sr_in, min_snr in ((48000, 140.0), (22050, 70.0)):
        y = audio.resample(make_sig(sr_in), sr_in, 24000)
        n = len(truth)
        a, b = n // 8, n - n // 8  # ignore filter edge transients
        err = y[a:b] - truth[a:b]
        snr = 10 * np.log10(np.sum(truth[a:b] ** 2) / np.sum(err**2))
        assert snr > min_snr, (sr_in, snr)

        mel_ours = audio.melspectrogram(y[a:b].astype(np.float32))
        mel_true = audio.melspectrogram(truth[a:b].astype(np.float32))
        # mel is [0,1]-normalized dB; worst bin sits at the 9.8 kHz tone
        # inside the filter's roll-off band (librosa's kaiser_best rolls off
        # the same 0.9476 band) — 5e-3 ~= 0.5 dB there, interior bins ~0
        assert np.max(np.abs(mel_ours - mel_true)) < 5e-3, sr_in
