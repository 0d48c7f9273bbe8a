"""Chunked / streaming synthesis for arbitrary-length mels.

The reference synthesizes full utterances in one conv pass (reference
bin/test.py:111-115), which on TPU means one compiled program per mel
length.  This module runs inference over fixed-size mel chunks with a halo
of context frames on each side: one compiled program serves any length, and
because the generators are fully convolutional, interior outputs are exact
(bit-identical to the full pass) once the halo covers the receptive field —
only the sequence edges see the chunk's own reflect padding.

Halo sizing: every shipped generator's receptive field, measured in *mel
frames*, is small — the stem conv (k=7) plus per-stage dilated stacks whose
dilation grows in upsampled time, shrinking back to a few frames of mel
context.  `DEFAULT_HALO=32` frames (~0.32 s) exceeds all four architectures'
fields; tests/test_streaming.py verifies exactness against the full pass.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

DEFAULT_HALO = 32


class StreamingSynthesizer:
    """Wraps a jitted mel->wav function with fixed-chunk streaming.

    `forward(params, mel (1, T, C)) -> wav (1, T * samples_per_frame)` must
    be length-preserving in frames (true for melgan/hifigan/multiband's
    synthesize; for basis-melgan use the trimmed train-style decode).
    """

    def __init__(
        self,
        forward: Callable,
        params,
        samples_per_frame: int,
        chunk_frames: int = 256,
        halo_frames: int = DEFAULT_HALO,
    ):
        import jax

        self.forward = jax.jit(forward)
        self.params = params
        self.spf = samples_per_frame
        self.chunk = chunk_frames
        self.halo = halo_frames

    def __call__(self, mel: np.ndarray) -> np.ndarray:
        """mel (T, C) -> wav (T * samples_per_frame,). One compiled program
        regardless of T."""
        T = mel.shape[0]
        h, c = self.halo, self.chunk
        out = np.zeros((T * self.spf,), dtype=np.float32)
        start = 0
        while start < T:
            end = min(start + c, T)
            lo = max(0, start - h)
            hi = min(T, end + h)
            piece = mel[lo:hi]
            # pad to the fixed compiled shape (c + 2h frames); numpy reflect
            # allows at most len-1 per application, so iterate for short
            # final pieces (large chunk/halo vs a short utterance)
            want = c + 2 * h
            pad = want - piece.shape[0]
            while pad > 0:
                if piece.shape[0] == 1:
                    piece = np.repeat(piece, want, axis=0)[:want]
                    break
                step = min(pad, piece.shape[0] - 1)
                piece = np.pad(piece, ((0, step), (0, 0)), mode="reflect")
                pad = want - piece.shape[0]
            wav = np.asarray(self.forward(self.params, piece[None]))[0]
            if wav.shape[0] != want * self.spf:
                raise ValueError(
                    f"forward is not frame-length-preserving: {want} frames "
                    f"-> {wav.shape[0]} samples (expected {want * self.spf}). "
                    "basis-melgan's raw decode emits (F+1)*hop samples; wrap "
                    "it with a [:T*spf] trim before streaming."
                )
            # trim halo + tail padding back out
            a = (start - lo) * self.spf
            b = a + (end - start) * self.spf
            out[start * self.spf : end * self.spf] = wav[a:b]
            start = end
        return out
