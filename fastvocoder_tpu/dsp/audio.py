"""Host-side (numpy) audio DSP with the reference's exact semantics.

Reimplements the feature-extraction pipeline of reference data/audio.py
without librosa/tensorflow: 16-bit peak-normalized encode (audio.py:12-14),
preemphasis (audio.py:29-34), STFT 2048/240/1200 (audio.py:103-127), Slaney
mel 80 bins fmin=40 (audio.py:135-144), dB + [0,1] clip-normalize
(audio.py:147-168), and Griffin-Lim mel inversion (audio.py:74-84,181-191).

The hot-path (in-graph) versions of these live in dsp/stft.py and
dsp/griffin_lim.py; this module is for preprocessing and CLI I/O.
"""

from __future__ import annotations

import numpy as np
import scipy.io.wavfile
import scipy.signal

from fastvocoder_tpu.hparams import HP, Hparams
from fastvocoder_tpu.dsp.mel import mel_filter_bank

_mel_basis_cache: dict = {}
_inv_mel_basis_cache: dict = {}


# ---------------------------------------------------------------------------
# Wav I/O (reference data/audio.py:12-26)
# ---------------------------------------------------------------------------


def encode_16bits(x: np.ndarray, rescale_out: float = 1.0) -> np.ndarray:
    x = x * (32767 / max(0.01, float(np.max(np.abs(x)))) * rescale_out)
    return x.astype(np.int16)


# librosa/resampy "kaiser_best" design constants: 64 zero crossings,
# Kaiser beta 14.77, 0.9476 roll-off.  scipy's default resample_poly window
# (Kaiser beta 5) measures only ~29 dB SNR against analytic ground truth on
# the 22.05 -> 24 kHz path; this filter measures ~75-153 dB
# (tests/test_mel.py::test_resample_quality_vs_analytic).
_KAISER_BEST = dict(zeros=64, beta=14.769656459379492, rolloff=0.9475937167399596)
_resample_filter_cache: dict = {}


def resample(x: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample with a librosa-kaiser_best-class filter."""
    if sr == target_sr:
        return np.asarray(x, dtype=np.float32)
    g = np.gcd(int(sr), int(target_sr))
    up, down = target_sr // g, sr // g
    key = (up, down)
    h = _resample_filter_cache.get(key)
    if h is None:
        kb = _KAISER_BEST
        ntaps = 2 * kb["zeros"] * max(up, down) + 1
        h = scipy.signal.firwin(
            ntaps, kb["rolloff"] / max(up, down), window=("kaiser", kb["beta"])
        )
        _resample_filter_cache[key] = h
    return scipy.signal.resample_poly(x, up, down, window=h).astype(np.float32)


def load_wav(filename: str, sample_rate: int = 24000, encode: bool = True) -> np.ndarray:
    """Load + resample to `sample_rate`, float32 in [-1, 1] (librosa.load parity).

    Uses scipy for decoding and a kaiser_best-grade polyphase resampler
    (librosa is not a dependency; the filter matches resampy's kaiser_best
    design constants, so preprocessed artifacts from original-rate audio
    interchange with reference-preprocessed ones to resampler tolerance).
    """
    sr, data = scipy.io.wavfile.read(filename)
    if data.dtype == np.int16:
        x = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        x = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        x = (data.astype(np.float32) - 128.0) / 128.0
    else:
        x = data.astype(np.float32)
    if x.ndim > 1:
        x = x.mean(axis=1)
    if sr != sample_rate:
        x = resample(x, sr, sample_rate)
    if encode:
        x = encode_16bits(x)
    return x


def save_wav(y: np.ndarray, filename: str, sample_rate: int, rescale_out: float = 1.0):
    y = encode_16bits(np.asarray(y, dtype=np.float32), rescale_out)
    scipy.io.wavfile.write(filename, sample_rate, y.astype(np.int16))


# ---------------------------------------------------------------------------
# Preemphasis (reference data/audio.py:29-34)
# ---------------------------------------------------------------------------


def preemphasis(x: np.ndarray, hp: Hparams = HP) -> np.ndarray:
    return scipy.signal.lfilter([1, -hp.preemphasis], [1], x)


def inv_preemphasis(x: np.ndarray, hp: Hparams = HP) -> np.ndarray:
    return scipy.signal.lfilter([1], [1, -hp.preemphasis], x)


# ---------------------------------------------------------------------------
# STFT (librosa.stft parity: center=True reflect, periodic hann padded to n_fft)
# ---------------------------------------------------------------------------


def _np_padded_window(win_length: int, n_fft: int) -> np.ndarray:
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    left = (n_fft - win_length) // 2
    return np.pad(w, (left, n_fft - win_length - left))


def _stft(y: np.ndarray, hp: Hparams = HP) -> np.ndarray:
    """Complex STFT, shape (1 + n_fft/2, frames) — librosa layout (bins, frames)."""
    n_fft, hop, win = hp.n_fft, hp.hop_length, hp.win_length
    y = np.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
    nf = 1 + (len(y) - n_fft) // hop
    strided = np.lib.stride_tricks.as_strided(
        y, shape=(nf, n_fft), strides=(y.strides[0] * hop, y.strides[0])
    )
    frames = strided * _np_padded_window(win, n_fft)
    return np.fft.rfft(frames, n=n_fft, axis=-1).T


def _istft(z: np.ndarray, hp: Hparams = HP) -> np.ndarray:
    """Inverse of _stft (librosa.istft parity), input (bins, frames)."""
    n_fft, hop, win = hp.n_fft, hp.hop_length, hp.win_length
    frames = np.fft.irfft(z.T, n=n_fft, axis=-1)
    w = _np_padded_window(win, n_fft)
    frames = frames * w
    nf = frames.shape[0]
    total = n_fft + hop * (nf - 1)
    out = np.zeros(total)
    wsq = np.zeros(total)
    for i in range(nf):
        out[i * hop : i * hop + n_fft] += frames[i]
        wsq[i * hop : i * hop + n_fft] += w * w
    out = out / np.maximum(wsq, 1e-10)
    return out[n_fft // 2 : total - n_fft // 2]


# ---------------------------------------------------------------------------
# Conversions (reference data/audio.py:130-168)
# ---------------------------------------------------------------------------


def _build_mel_basis(hp: Hparams = HP) -> np.ndarray:
    key = (hp.sample_rate, hp.n_fft, hp.num_mels, hp.fmin)
    if key not in _mel_basis_cache:
        _mel_basis_cache[key] = mel_filter_bank(
            hp.sample_rate, hp.n_fft, n_mels=hp.num_mels, fmin=hp.fmin, dtype=np.float64
        )
    return _mel_basis_cache[key]


def _linear_to_mel(spectrogram: np.ndarray, hp: Hparams = HP) -> np.ndarray:
    return np.dot(_build_mel_basis(hp), spectrogram)


def _mel_to_linear(mel_spectrogram: np.ndarray, hp: Hparams = HP) -> np.ndarray:
    key = (hp.sample_rate, hp.n_fft, hp.num_mels, hp.fmin)
    if key not in _inv_mel_basis_cache:
        _inv_mel_basis_cache[key] = np.linalg.pinv(_build_mel_basis(hp))
    return np.maximum(1e-10, np.dot(_inv_mel_basis_cache[key], mel_spectrogram))


def _amp_to_db(x: np.ndarray) -> np.ndarray:
    return 20 * np.log10(np.maximum(1e-5, x))


def _db_to_amp(x: np.ndarray) -> np.ndarray:
    return np.power(10.0, x * 0.05)


def _normalize(S: np.ndarray, hp: Hparams = HP) -> np.ndarray:
    return np.clip((S - hp.min_level_db) / -hp.min_level_db, 0, 1)


def _denormalize(S: np.ndarray, hp: Hparams = HP) -> np.ndarray:
    return (np.clip(S, 0, 1) * -hp.min_level_db) + hp.min_level_db


# ---------------------------------------------------------------------------
# Public feature extraction (reference data/audio.py:37-61)
# ---------------------------------------------------------------------------


def spectrogram(y: np.ndarray, hp: Hparams = HP) -> np.ndarray:
    D = _stft(preemphasis(y, hp), hp)
    S = _amp_to_db(np.abs(D)) - hp.ref_level_db
    return _normalize(S, hp)


def melspectrogram(y: np.ndarray, hp: Hparams = HP) -> np.ndarray:
    """wav -> normalized mel, shape (num_mels, frames)."""
    D = _stft(preemphasis(y, hp), hp)
    S = _amp_to_db(_linear_to_mel(np.abs(D), hp)) - hp.ref_level_db
    return _normalize(S, hp)


# ---------------------------------------------------------------------------
# Griffin-Lim inversion (reference data/audio.py:74-84,171-191)
# ---------------------------------------------------------------------------


def _griffin_lim(S: np.ndarray, hp: Hparams = HP, seed: int | None = None) -> np.ndarray:
    rng = np.random.default_rng(seed)
    angles = np.exp(2j * np.pi * rng.random(S.shape))
    S_complex = np.abs(S).astype(np.complex128)
    y = _istft(S_complex * angles, hp)
    for _ in range(hp.griffin_lim_iters):
        angles = np.exp(1j * np.angle(_stft(y, hp)))
        y = _istft(S_complex * angles, hp)
    return y


def inv_spectrogram(spec: np.ndarray, hp: Hparams = HP) -> np.ndarray:
    S = _db_to_amp(_denormalize(spec, hp) + hp.ref_level_db)
    return inv_preemphasis(_griffin_lim(S**hp.power, hp), hp)


def inv_mel_spectrogram(mel_spectrogram: np.ndarray, hp: Hparams = HP) -> np.ndarray:
    """mel (num_mels, frames) -> waveform via Griffin-Lim."""
    if hp.signal_normalization:
        D = _denormalize(mel_spectrogram, hp)
    else:
        D = mel_spectrogram
    S = _mel_to_linear(_db_to_amp(D + hp.ref_level_db), hp)
    return inv_preemphasis(_griffin_lim(S**hp.power, hp), hp)
