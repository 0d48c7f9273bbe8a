"""Loss functions: MR-STFT reconstruction + GAN losses.

`reconstruction_loss` is the functional equivalent of the reference's
top-level Loss module (reference model/loss/loss.py:7-42): full-band MR-STFT
(+ optional Basis-MelGAN weight L1), or — when a PQMF is passed — the mean of
the sub-band and full-band MR-STFT losses.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fastvocoder_tpu.losses.gan import (
    adversarial_loss,
    discriminator_loss,
    feature_map_loss,
)
from fastvocoder_tpu.losses.stft_loss import (
    DEFAULT_RESOLUTIONS,
    multi_resolution_stft_loss,
    multi_resolution_stft_loss_masked,
    stft_loss,
)
from fastvocoder_tpu.ops.pqmf import PQMF

__all__ = [
    "DEFAULT_RESOLUTIONS",
    "adversarial_loss",
    "discriminator_loss",
    "feature_map_loss",
    "multi_resolution_stft_loss",
    "multi_resolution_stft_loss_masked",
    "reconstruction_loss",
    "reconstruction_loss_masked",
    "stft_loss",
]


def reconstruction_loss(
    est_source: jnp.ndarray,
    wav: jnp.ndarray,
    est_weight: Optional[jnp.ndarray] = None,
    weight: Optional[jnp.ndarray] = None,
    pqmf: Optional[PQMF] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Returns (stft_loss, weight_loss | None).

    Full-band path (reference loss.py:33-42): est_source/wav are (B, T).
    Multiband path (reference loss.py:16-31): est_source is the sub-band
    signal (B, T', S); the real wav is PQMF-analyzed, the estimate is
    PQMF-synthesized, and MR-STFT is computed in both domains (sub-band
    tensors flattened to (B*S, T')) and averaged.
    """
    wav = jax.lax.stop_gradient(wav)
    if pqmf is not None:
        wav_sub = pqmf.analysis(wav[..., None])  # (B, T', S)
        est_full = pqmf.synthesis(est_source)[..., 0]  # (B, T)
        # (B, T', S) -> (B*S, T') matching the reference's view(-1, T') on
        # a (B, S, T') tensor
        est_sub = jnp.transpose(est_source, (0, 2, 1)).reshape(
            -1, est_source.shape[1]
        )
        wav_sub = jnp.transpose(wav_sub, (0, 2, 1)).reshape(-1, wav_sub.shape[1])
        sc_s, mag_s = multi_resolution_stft_loss(est_sub, wav_sub)
        sc_f, mag_f = multi_resolution_stft_loss(est_full, wav)
        return ((sc_s + mag_s) + (sc_f + mag_f)) / 2.0, None

    sc, mag = multi_resolution_stft_loss(est_source, wav)
    total = sc + mag
    weight_loss = None
    if est_weight is not None and weight is not None:
        # targets may arrive f16 (halved host->device bytes) and est_weight
        # bf16 under mixed precision; promote BOTH so the ~1M-element L1
        # accumulates in f32
        weight_loss = jnp.mean(
            jnp.abs(
                est_weight.astype(jnp.float32) - weight.astype(jnp.float32)
            )
        )
    return total, weight_loss


def reconstruction_loss_masked(
    est_source: jnp.ndarray,
    wav: jnp.ndarray,
    valid_samples: jnp.ndarray,
    pqmf: Optional[PQMF] = None,
) -> jnp.ndarray:
    """Length-masked variant of `reconstruction_loss` for full-utterance
    validation on padded/bucketed inputs (reference bin/train.py:451-471
    validates full utterances; the mask scores only the true length)."""
    wav = jax.lax.stop_gradient(wav)
    if pqmf is not None:
        wav_sub = pqmf.analysis(wav[..., None])
        est_full = pqmf.synthesis(est_source)[..., 0]
        est_sub = jnp.transpose(est_source, (0, 2, 1)).reshape(
            -1, est_source.shape[1]
        )
        wav_sub = jnp.transpose(wav_sub, (0, 2, 1)).reshape(-1, wav_sub.shape[1])
        sub_valid = valid_samples // pqmf.subbands
        sc_s, mag_s = multi_resolution_stft_loss_masked(est_sub, wav_sub, sub_valid)
        sc_f, mag_f = multi_resolution_stft_loss_masked(est_full, wav, valid_samples)
        return ((sc_s + mag_s) + (sc_f + mag_f)) / 2.0

    sc, mag = multi_resolution_stft_loss_masked(est_source, wav, valid_samples)
    return sc + mag
