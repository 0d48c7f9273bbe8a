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

Basis-MelGAN streams natively: its raw decode emits `frames * hop + L/2`
samples (the final overlap-add ramp, reference bin/test.py:85-88 trims it)
— `tail_samples=L//2` absorbs the ramp per chunk, and the published
checkpoint's `pattern` zero-mel bias (reference bin/publish.py:67-75) is
subtracted position-aligned as the stream advances.  Use
`StreamingSynthesizer.for_model(...)` to get the right wiring per family.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

DEFAULT_HALO = 32


def check_pattern_covers(pattern: Optional[np.ndarray], n_samples: int):
    """Published zero-mel bias must cover the utterance.  One place for the
    check — the streamer and the serving layer share the semantics
    (reference bin/test.py:85-88; 300 s publish, bin/publish.py:69)."""
    if pattern is not None and pattern.shape[0] < n_samples:
        raise ValueError(
            f"pattern covers {pattern.shape[0]} samples but the utterance "
            f"needs {n_samples}; publish with a longer zero-mel "
            "(reference supports 300 s, bin/publish.py:69)"
        )


class StreamingSynthesizer:
    """Wraps a jitted mel->wav function with fixed-chunk streaming.

    `forward(params, mel (1, T, C)) -> wav (1, T * samples_per_frame
    + tail_samples)`.  All shipped generators are frame-length-preserving
    (`tail_samples=0`) except Basis-MelGAN's raw decode, whose final
    overlap-add ramp adds `L//2` samples (`tail_samples=L//2`).

    `pattern`, when given, is the model's zero-mel response (the published
    checkpoint's `pattern` key, reference bin/publish.py:71-74) and is
    subtracted from the stream position-aligned — the streaming equivalent
    of the reference's `est - pattern[:len(est)]` (bin/test.py:85-91).
    """

    def __init__(
        self,
        forward: Callable,
        params,
        samples_per_frame: int,
        chunk_frames: int = 256,
        halo_frames: int = DEFAULT_HALO,
        tail_samples: int = 0,
        pattern: Optional[np.ndarray] = None,
    ):
        import jax

        self.forward = jax.jit(forward)
        self.params = params
        self.spf = samples_per_frame
        self.chunk = chunk_frames
        self.halo = halo_frames
        self.tail = tail_samples
        self.pattern = None if pattern is None else np.asarray(pattern)

    @classmethod
    def for_model(
        cls,
        generator,
        params,
        model_name: str,
        hop_size: int = 240,
        pattern: Optional[np.ndarray] = None,
        **kw,
    ) -> "StreamingSynthesizer":
        """Model-aware wiring: picks the forward method, samples/frame, and
        Basis-MelGAN's `tail_samples` trim so every family streams out of
        the box (incl. the flagship basis-melgan, whose raw decode is not
        frame-length-preserving)."""
        if model_name == "basis-melgan":
            fwd = lambda p, m: generator.apply(
                {"params": p}, m, method=generator.inference
            )
            L = generator.cfg.L
            return cls(
                fwd, params, samples_per_frame=hop_size,
                tail_samples=L // 2, pattern=pattern, **kw,
            )
        if model_name == "multiband-hifigan":
            fwd = lambda p, m: generator.apply(
                {"params": p}, m, method=generator.synthesize
            )
        else:  # melgan / hifigan / nhv
            fwd = lambda p, m: generator.apply({"params": p}, m)
        return cls(
            fwd, params, samples_per_frame=hop_size, pattern=pattern, **kw
        )

    def __call__(self, mel: np.ndarray) -> np.ndarray:
        """mel (T, C) -> wav (T * samples_per_frame,). One compiled program
        regardless of T."""
        T = mel.shape[0]
        h, c = self.halo, self.chunk
        check_pattern_covers(self.pattern, T * self.spf)
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
            if wav.shape[0] != want * self.spf + self.tail:
                raise ValueError(
                    f"forward emitted {wav.shape[0]} samples for {want} "
                    f"frames (expected {want * self.spf + self.tail}); pass "
                    "tail_samples=L//2 for basis-melgan's raw decode or use "
                    "StreamingSynthesizer.for_model"
                )
            # trim halo + tail padding back out
            a = (start - lo) * self.spf
            b = a + (end - start) * self.spf
            out[start * self.spf : end * self.spf] = wav[a:b]
            start = end
        if self.pattern is not None:
            out = out - self.pattern[: out.shape[0]]
        return out
