"""Multi-resolution STFT reconstruction loss (pure functions, jit-safe).

Numeric parity with reference model/loss/stft_loss.py:
  * magnitude STFT with sqrt(clamp(power, 1e-7)) (stft_loss.py:37)
  * spectral convergence = ||Y - X||_F / ||Y||_F (stft_loss.py:41-59)
  * log-magnitude L1 (stft_loss.py:62-80)
  * three resolutions fft/hop/win = (2048,240,1200), (1024,120,600),
    (512,50,240), each loss averaged over resolutions (stft_loss.py:121-165)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from fastvocoder_tpu.dsp.stft import stft_mag

# (fft_size, hop_size, win_length) — reference stft_loss.py:123-125
DEFAULT_RESOLUTIONS: Tuple[Tuple[int, int, int], ...] = (
    (2048, 240, 1200),
    (1024, 120, 600),
    (512, 50, 240),
)


def spectral_convergence_loss(x_mag: jnp.ndarray, y_mag: jnp.ndarray) -> jnp.ndarray:
    """Frobenius ||y - x|| / ||y|| over the whole batch (torch.norm 'fro'
    flattens all dims, reference stft_loss.py:59)."""
    return jnp.linalg.norm((y_mag - x_mag).reshape(-1)) / jnp.linalg.norm(
        y_mag.reshape(-1)
    )


def log_stft_magnitude_loss(x_mag: jnp.ndarray, y_mag: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))


def stft_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    fft_size: int,
    hop_size: int,
    win_length: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sc, mag) losses for predicted x vs ground-truth y, both (B, T)."""
    x_mag = stft_mag(x, fft_size, hop_size, win_length)
    y_mag = stft_mag(y, fft_size, hop_size, win_length)
    return spectral_convergence_loss(x_mag, y_mag), log_stft_magnitude_loss(
        x_mag, y_mag
    )


def multi_resolution_stft_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    resolutions: Sequence[Tuple[int, int, int]] = DEFAULT_RESOLUTIONS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    sc_total = 0.0
    mag_total = 0.0
    for fft_size, hop, win in resolutions:
        sc, mag = stft_loss(x, y, fft_size, hop, win)
        sc_total = sc_total + sc
        mag_total = mag_total + mag
    n = float(len(resolutions))
    return sc_total / n, mag_total / n


def _stft_loss_masked(
    x: jnp.ndarray,
    y: jnp.ndarray,
    valid_samples: jnp.ndarray,
    fft_size: int,
    hop_size: int,
    win_length: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sc, mag) over only the STFT frames whose center lies inside
    `valid_samples` — lets a zero-padded utterance be scored at its true
    length under a single static shape (TPU validation path).  Frames are
    center-padded (torch.stft center=True parity), so frame f's center is
    f*hop; `<=` keeps the boundary frame, making the mask an exact no-op
    when valid_samples == T."""
    x_mag = stft_mag(x, fft_size, hop_size, win_length)  # (B, F, bins)
    y_mag = stft_mag(y, fft_size, hop_size, win_length)
    valid_samples = jnp.asarray(valid_samples).reshape(-1, 1, 1)  # scalar or (B,)
    frame_center = jnp.arange(x_mag.shape[1]) * hop_size
    m = (frame_center[None, :, None] <= valid_samples).astype(x_mag.dtype)
    sc = jnp.linalg.norm(((y_mag - x_mag) * m).reshape(-1)) / jnp.maximum(
        jnp.linalg.norm((y_mag * m).reshape(-1)), 1e-12
    )
    mag = jnp.sum(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)) * m) / jnp.maximum(
        jnp.sum(m) * x_mag.shape[-1], 1.0
    )
    return sc, mag


def multi_resolution_stft_loss_masked(
    x: jnp.ndarray,
    y: jnp.ndarray,
    valid_samples: jnp.ndarray,
    resolutions: Sequence[Tuple[int, int, int]] = DEFAULT_RESOLUTIONS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Length-masked MR-STFT: full-utterance validation on padded/bucketed
    inputs (the reference validates unpadded full utterances at batch 1,
    reference bin/train.py:451-471; static TPU shapes require padding, the
    mask removes the padded tail from the loss)."""
    sc_total = 0.0
    mag_total = 0.0
    for fft_size, hop, win in resolutions:
        sc, mag = _stft_loss_masked(x, y, valid_samples, fft_size, hop, win)
        sc_total = sc_total + sc
        mag_total = mag_total + mag
    n = float(len(resolutions))
    return sc_total / n, mag_total / n
