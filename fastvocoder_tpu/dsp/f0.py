"""Frame-level f0 (fundamental frequency) estimation — conditioning input
for the NHV vocoder (models/nhv.py).

The reference left NHV unimplemented (reference model/generator/nhv.py is an
empty file, README.md:8 "NHV (TODO)") and has no f0 machinery; this is new
framework surface.  Estimator: normalized autocorrelation via FFT per frame
(YIN-flavored), peak-picked over the plausible lag range, with a voicing
threshold — plain numpy (preprocessing-time, like mel extraction).
"""

from __future__ import annotations

import numpy as np

from fastvocoder_tpu.hparams import HP, Hparams


def extract_f0(
    wav: np.ndarray,
    hp: Hparams = HP,
    fmin: float = 50.0,
    fmax: float = 600.0,
    frame_length: int = 1024,
    voicing_threshold: float = 0.3,
) -> np.ndarray:
    """wav (N,) float -> f0 (T,) Hz, 0 where unvoiced; T = N // hop + 1
    (matches the mel frame count convention of dsp.audio.melspectrogram)."""
    sr = hp.sample_rate
    hop = hp.hop_size
    n = wav.shape[0]
    n_frames = n // hop + 1
    half = frame_length // 2
    padded = np.pad(wav.astype(np.float64), (half, half + frame_length))

    # frames centered at t*hop: (T, frame_length)
    idx = (np.arange(n_frames) * hop)[:, None] + np.arange(frame_length)[None, :]
    frames = padded[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)

    # autocorrelation via FFT (power spectrum -> IFFT)
    nfft = 2 * frame_length
    spec = np.fft.rfft(frames, nfft, axis=1)
    ac = np.fft.irfft(spec * np.conj(spec), nfft, axis=1)[:, :frame_length]
    # normalized: r[tau] / r[0]
    r0 = np.maximum(ac[:, :1], 1e-9)
    nac = ac / r0

    lag_min = max(2, int(sr / fmax))
    lag_max = min(frame_length - 1, int(sr / fmin))
    window = nac[:, lag_min : lag_max + 1]
    best = np.argmax(window, axis=1)
    peak = window[np.arange(n_frames), best]
    lag = (best + lag_min).astype(np.float64)

    # parabolic interpolation around the peak for sub-sample lag precision
    li = (best + lag_min).clip(1, frame_length - 2)
    y0 = nac[np.arange(n_frames), li - 1]
    y1 = nac[np.arange(n_frames), li]
    y2 = nac[np.arange(n_frames), li + 1]
    denom = y0 - 2 * y1 + y2
    with np.errstate(divide="ignore", invalid="ignore"):
        delta = np.where(np.abs(denom) > 1e-12, 0.5 * (y0 - y2) / denom, 0.0)
    lag = li + np.clip(delta, -1, 1)

    f0 = sr / lag
    voiced = (peak > voicing_threshold) & (f0 >= fmin) & (f0 <= fmax)
    return np.where(voiced, f0, 0.0).astype(np.float32)


def f0_to_condition(mel: np.ndarray, f0: np.ndarray) -> np.ndarray:
    """Pack (T, 80) mel + (T,) f0 into the NHV conditioning tensor (T, 81).

    Channel 80 carries f0 in Hz (0 = unvoiced); NHVGenerator splits it back
    out.  Packing keeps the whole training stack (losses, trainer, DP mesh,
    batching) unchanged — NHV trains exactly like the other generators with
    in_channels = 81."""
    t = min(mel.shape[0], f0.shape[0])
    return np.concatenate(
        [mel[:t], f0[:t, None]], axis=1
    ).astype(np.float32)
