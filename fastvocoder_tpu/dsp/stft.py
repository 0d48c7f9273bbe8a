"""JAX STFT / iSTFT with torch.stft + librosa.stft numeric parity.

Both the reference's loss STFT (torch.stft, reference model/loss/stft_loss.py:30-38)
and its feature-extraction STFT (librosa.stft, reference data/audio.py:103-105)
use the same convention: ``center=True`` with reflect padding of n_fft // 2,
a periodic Hann window zero-padded symmetrically to n_fft, one-sided rFFT,
no normalization.  This module implements that convention once, in JAX, with
static shapes (jit/TPU friendly: the framing is a single gather).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window — matches torch.hann_window(win_length)."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _padded_window(win_length: int, n_fft: int, dtype=jnp.float32) -> jnp.ndarray:
    """Hann window centered inside an n_fft-length frame (torch.stft rule)."""
    w = hann_window(win_length, dtype=dtype)
    if win_length == n_fft:
        return w
    left = (n_fft - win_length) // 2
    return jnp.pad(w, (left, n_fft - win_length - left))


def _frame_indices(num_frames: int, n_fft: int, hop: int) -> np.ndarray:
    starts = np.arange(num_frames, dtype=np.int32)[:, None] * hop
    offs = np.arange(n_fft, dtype=np.int32)[None, :]
    return starts + offs


def num_stft_frames(length: int, n_fft: int, hop: int, center: bool = True) -> int:
    if center:
        length = length + 2 * (n_fft // 2)
    return 1 + (length - n_fft) // hop


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def frame_signal(
    x: jnp.ndarray, num_frames: int, n_fft: int, hop: int
) -> jnp.ndarray:
    """(..., T) -> (..., num_frames, n_fft) overlapping frames.

    Forward is a single static gather.  The custom VJP replaces the
    gather's adjoint — a scatter-add, which XLA:TPU lowers with index sorts
    and which weighs on the MR-STFT loss / MFD discriminator backward —
    with the scatter-free step-chunked overlap-add (`ops/overlap_add.py`).
    Measured on v5e (batch 32 x 33600 samples, 3 loss resolutions):
    MR-STFT loss fwd+bwd 29.9 -> 16.4 ms; full GAN train step 298 -> 273 ms.

    Reverse-mode only: the custom_vjp makes jax.jvp/jacfwd through this op
    (and stft_complex/istft above it) raise.  The op is linear, so if
    forward-mode is ever needed the JVP is frame_signal of the tangent.
    """
    idx = jnp.asarray(_frame_indices(num_frames, n_fft, hop))
    return x[..., idx]


def _frame_signal_fwd(x, num_frames, n_fft, hop):
    return frame_signal(x, num_frames, n_fft, hop), x.shape[-1]


def _frame_signal_bwd(num_frames, n_fft, hop, T, g):
    from fastvocoder_tpu.ops.overlap_add import overlap_and_add

    out = overlap_and_add(g, hop)  # (..., (num_frames - 1) * hop + n_fft)
    covered = out.shape[-1]
    if covered < T:  # trailing samples no frame reads get zero gradient
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, T - covered)])
    elif covered > T:
        # frames overran the signal: the forward gather clamped out-of-range
        # indices to T-1, so every read past the end really read x[T-1] —
        # its adjoint adds the overrun cotangent mass to sample T-1
        overrun = out[..., T:].sum(axis=-1)
        out = out[..., :T].at[..., T - 1].add(overrun)
    return (out,)


frame_signal.defvjp(_frame_signal_fwd, _frame_signal_bwd)


@functools.partial(
    jax.jit, static_argnames=("fft_size", "hop_size", "win_length", "center")
)
def stft_complex(
    x: jnp.ndarray,
    fft_size: int,
    hop_size: int,
    win_length: int,
    center: bool = True,
) -> jnp.ndarray:
    """Complex STFT of (..., T) -> (..., frames, fft_size // 2 + 1)."""
    T = x.shape[-1]
    if center:
        pad = fft_size // 2
        x = jnp.pad(
            x,
            [(0, 0)] * (x.ndim - 1) + [(pad, pad)],
            mode="reflect",
        )
    nf = 1 + (x.shape[-1] - fft_size) // hop_size
    frames = frame_signal(x, nf, fft_size, hop_size)  # one gather, static shapes
    win = _padded_window(win_length, fft_size, dtype=x.dtype)
    frames = frames * win
    return jnp.fft.rfft(frames.astype(jnp.float32), n=fft_size, axis=-1)


def stft_mag(
    x: jnp.ndarray,
    fft_size: int,
    hop_size: int,
    win_length: int,
    eps: float = 1e-7,
    center: bool = True,
) -> jnp.ndarray:
    """Magnitude STFT, sqrt-clamped like the reference loss/discriminator STFT
    (reference model/loss/stft_loss.py:37, model/discriminator/mfd.py:40).

    Returns (..., frames, fft_size // 2 + 1).
    """
    z = stft_complex(x, fft_size, hop_size, win_length, center=center)
    power = jnp.real(z) ** 2 + jnp.imag(z) ** 2
    return jnp.sqrt(jnp.maximum(power, eps))


@functools.partial(
    jax.jit, static_argnames=("fft_size", "hop_size", "win_length", "center", "length")
)
def istft(
    z: jnp.ndarray,
    fft_size: int,
    hop_size: int,
    win_length: int,
    center: bool = True,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT (librosa.istft convention) of (..., frames, bins) -> (..., T).

    Overlap-adds windowed inverse-FFT frames and normalizes by the squared
    window envelope.  Used by Griffin-Lim (reference data/audio.py:108-110).
    """
    nf = z.shape[-2]
    frames = jnp.fft.irfft(z, n=fft_size, axis=-1)
    win = _padded_window(win_length, fft_size, dtype=frames.dtype)
    frames = frames * win

    total = fft_size + hop_size * (nf - 1)
    # scatter-free overlap-add (ops/overlap_add.py)
    from fastvocoder_tpu.ops.overlap_add import overlap_and_add

    out = overlap_and_add(frames, hop_size)
    wsq = overlap_and_add(
        jnp.tile((win * win)[None, :], (nf, 1)), hop_size
    )
    out = out / jnp.maximum(wsq, 1e-10)
    if center:
        out = out[..., fft_size // 2 : total - fft_size // 2]
    if length is not None:
        out = out[..., :length]
    return out
