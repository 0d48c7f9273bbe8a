"""Overlap-add reconstruction, XLA/TPU-friendly (no scatter in the hot path).

TPU-native equivalent of the reference's TF-style subframe
``overlap_and_add`` (reference model/generator/modules.py:34-73), which uses
``index_add_`` (a scatter).  Scatters are slow on TPU; here frames are split
into `frame_step`-sized chunks (zero-padding the frame length up to a
multiple of the step), so chunk c of frame f lands exactly on subframe
f + c — ``ceil(frame_length / frame_step)`` static pad-and-add passes that
XLA fuses into cheap vector adds.

A GCD-subframe decomposition (frame_length / gcd passes) degenerates for
STFT-adjoint shapes (e.g. n_fft=512, hop=50 -> 256 passes; measured it made
the MR-STFT loss backward SLOWER than XLA's scatter).  Step-sized chunks
give 9-11 passes at the loss/discriminator STFT resolutions and 2 for
Basis-MelGAN's 50%-overlap decode.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def overlap_and_add(signal: jnp.ndarray, frame_step: int) -> jnp.ndarray:
    """Reconstruct (..., frames, frame_length) -> (..., output_size) with
    output_size = (frames - 1) * frame_step + frame_length."""
    *outer, frames, frame_length = signal.shape
    if frame_step > frame_length:
        raise ValueError("frame_step must be <= frame_length")

    k = math.ceil(frame_length / frame_step)  # chunks per frame
    pad = k * frame_step - frame_length
    if pad:
        signal = jnp.pad(signal, [(0, 0)] * (len(outer) + 1) + [(0, pad)])
    chunks = signal.reshape(*outer, frames, k, frame_step)

    out_subframes = frames + k - 1
    output_size = (frames - 1) * frame_step + frame_length
    out = jnp.zeros((*outer, out_subframes, frame_step), dtype=signal.dtype)
    for c in range(k):
        # chunk c of frame f covers samples (f + c) * frame_step onward
        out = out + jnp.pad(
            chunks[..., :, c, :],
            [(0, 0)] * len(outer) + [(c, out_subframes - frames - c), (0, 0)],
        )
    return out.reshape(*outer, out_subframes * frame_step)[..., :output_size]
