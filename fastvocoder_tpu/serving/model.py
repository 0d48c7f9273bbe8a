"""Checkpoint -> batched serving callable, per model family.

Composes the pieces the drivers already use one-at-a-time into the serving
shape: fused (weight-norm-removed) generator like the reference's published
form (reference bin/synthesize.py:71-72), `models/batched.py` bucketed
batching (optionally mesh-sharded across a slice), and Basis-MelGAN's
published `pattern` bias subtraction (reference bin/test.py:85-91) applied
per utterance after the batch trim.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from fastvocoder_tpu.hparams import HP, Hparams, load_model_config
from fastvocoder_tpu.models.batched import BatchedSynthesizer
from fastvocoder_tpu.models.factory import build_generator
from fastvocoder_tpu.models.streaming import check_pattern_covers
from fastvocoder_tpu.train.checkpoint import fuse_weight_norm, load_checkpoint


class ServingModel:
    """list[mel (T_i, C)] -> list[wav (T_i * hop,)] — load once, serve many.

    Basis-MelGAN: the raw decode's overlap-add tail is trimmed by the
    batcher's `T * hop` cut, and the published `pattern` (zero-mel bias
    waveform) is subtracted when present, matching the test harness
    semantics (reference bin/test.py:85-88).  Other families are served
    as-is (their inference form has no bias precompute).
    """

    def __init__(
        self,
        checkpoint_path: str,
        config_path: str,
        model_name: str,
        hp: Hparams = HP,
        bucket_frames: int = 64,
        max_batch: int = 32,
        mesh=None,
        compute_dtype=None,
        batch_pad: str = "pow2",
    ):
        import jax

        self.hp = hp
        self.model_name = model_name
        self.cfg = load_model_config(model_name, config_path)
        ckpt = load_checkpoint(checkpoint_path, self.cfg, with_discriminator=False)
        if model_name == "nhv":  # native layout, conditioning = mel + f0
            params = ckpt["gen_params"]
            gen = build_generator(self.cfg, compute_dtype=compute_dtype)
        else:
            params = fuse_weight_norm(ckpt["gen_params"])
            gen = build_generator(
                self.cfg, weight_norm=False, compute_dtype=compute_dtype
            )
        self.pattern: Optional[np.ndarray] = (
            np.asarray(ckpt["pattern"]) if ckpt.get("pattern") is not None else None
        )

        if model_name in ("basis-melgan", "nhv"):
            fwd = lambda p, m: gen.apply({"params": p}, m, method=gen.inference)
        elif model_name == "multiband-hifigan":
            fwd = lambda p, m: gen.apply({"params": p}, m, method=gen.synthesize)
        else:
            fwd = lambda p, m: gen.apply({"params": p}, m)

        self.batched = BatchedSynthesizer(
            fwd,
            params,
            samples_per_frame=hp.hop_size,
            bucket_frames=bucket_frames,
            max_batch=max_batch,
            mesh=mesh,
            batch_pad=batch_pad,  # bounded program count for live traffic
        )

    @property
    def input_channels(self) -> int:
        return 81 if self.model_name == "nhv" else self.hp.num_mels

    def warmup(self, max_frames: int) -> int:
        """Pre-compile every (bucket, group-size) program for utterances up
        to `max_frames` mel frames; returns how many were compiled."""
        b = self.batched.bucket_frames
        lengths = list(range(b, max_frames + b, b))
        return self.batched.warmup(lengths, feature_dim=self.input_channels)

    def validate(self, mel: np.ndarray) -> None:
        """Raise ValueError if `mel` cannot be served.  The HTTP frontend
        calls this per request BEFORE coalescing, so one bad request gets
        its own 400 instead of poisoning every Future in its batch."""
        if mel.ndim != 2 or mel.shape[1] != self.input_channels:
            raise ValueError(
                f"expected (T, {self.input_channels}) mel, got {list(mel.shape)}"
            )
        if mel.shape[0] < 1:
            raise ValueError("empty mel (T=0)")
        check_pattern_covers(self.pattern, mel.shape[0] * self.hp.hop_size)

    def __call__(self, mels: Sequence[np.ndarray]) -> List[np.ndarray]:
        wavs = self.batched(mels)
        if self.pattern is not None:
            for i, w in enumerate(wavs):
                n = w.shape[0]
                check_pattern_covers(self.pattern, n)
                wavs[i] = w - self.pattern[:n]
        return wavs
