"""Jittable Griffin-Lim mel inversion on TPU.

TPU-native counterpart of the reference's numpy Griffin-Lim
(reference data/audio.py:74-84,181-191): the 60-iteration phase-recovery loop
runs as a `lax.fori_loop` over in-graph STFT/iSTFT, so the whole
mel -> linear -> GL -> waveform inversion is one compiled program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fastvocoder_tpu.hparams import HP, Hparams
from fastvocoder_tpu.dsp.mel import mel_filter_bank
from fastvocoder_tpu.dsp.stft import stft_complex, istft


def _mel_inversion_matrices(hp: Hparams):
    basis = mel_filter_bank(hp.sample_rate, hp.n_fft, hp.num_mels, hp.fmin, dtype=np.float64)
    inv = np.linalg.pinv(basis)
    return jnp.asarray(inv, dtype=jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_iters", "n_fft", "hop", "win", "length"))
def griffin_lim(
    mag: jnp.ndarray,
    n_iters: int,
    n_fft: int,
    hop: int,
    win: int,
    length: int,
    rng: jax.Array,
) -> jnp.ndarray:
    """Phase recovery from magnitude (frames, bins) -> waveform (length,)."""
    phase0 = jax.random.uniform(rng, mag.shape, minval=0.0, maxval=2.0 * jnp.pi)
    z = mag * jnp.exp(1j * phase0)
    y = istft(z, n_fft, hop, win, length=length)

    def body(_, y):
        z = stft_complex(y, n_fft, hop, win)
        z = z[..., : mag.shape[-2], :]
        angles = z / jnp.maximum(jnp.abs(z), 1e-8)
        return istft(mag * angles, n_fft, hop, win, length=length)

    return jax.lax.fori_loop(0, n_iters, body, y)


def inv_mel_spectrogram_jax(mel: np.ndarray, hp: Hparams = HP, seed: int = 0) -> np.ndarray:
    """mel (num_mels, frames) -> waveform, matching reference
    data/audio.py:181-191 semantics (denormalize -> db_to_amp -> pinv(mel) ->
    GL on S**power -> inverse preemphasis)."""
    mel = jnp.asarray(mel, dtype=jnp.float32)
    if hp.signal_normalization:
        D = jnp.clip(mel, 0, 1) * -hp.min_level_db + hp.min_level_db
    else:
        D = mel
    amp = jnp.power(10.0, (D + hp.ref_level_db) * 0.05)
    inv_basis = _mel_inversion_matrices(hp)
    S = jnp.maximum(1e-10, inv_basis @ amp)  # (bins, frames)
    S = S**hp.power
    frames = S.shape[1]
    length = hp.hop_length * (frames - 1)
    y = griffin_lim(
        S.T,
        n_iters=hp.griffin_lim_iters,
        n_fft=hp.n_fft,
        hop=hp.hop_length,
        win=hp.win_length,
        length=length,
        rng=jax.random.PRNGKey(seed),
    )
    y = np.asarray(y, dtype=np.float64)
    # inverse preemphasis (IIR) on host
    import scipy.signal

    return scipy.signal.lfilter([1], [1, -hp.preemphasis], y)
