"""Composite discriminator: MSD + MFD (+ optional MPD).

Parity with reference model/discriminator/discriminator.py:8-19 — the
per-scale output lists of the sub-discriminators are concatenated; each
element is a tuple of per-layer features whose last entry is the score.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fastvocoder_tpu.hparams import DISC, DiscriminatorConfig
from fastvocoder_tpu.models.discriminator.mfd import MultiResolutionSTFTDiscriminator
from fastvocoder_tpu.models.discriminator.mpd import MultiPeriodDiscriminator
from fastvocoder_tpu.models.discriminator.msd import MelGANMultiScaleDiscriminator


class Discriminator(nn.Module):
    use_mpd: bool = False  # reference keeps MPD unwired (discriminator.py:16)
    cfg: DiscriminatorConfig = DISC
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[Tuple[jnp.ndarray, ...], ...]:
        """x (B, T) waveform -> tuple of per-scale feature tuples."""
        if x.ndim == 2:
            x = x[..., None]
        outs = MelGANMultiScaleDiscriminator(
            scales=self.cfg.msd_scales,
            channels=self.cfg.msd_channels,
            max_downsample_channels=self.cfg.msd_max_channels,
            downsample_scales=self.cfg.msd_downsample_scales,
            compute_dtype=self.compute_dtype, name="msd",
        )(x)
        outs = outs + MultiResolutionSTFTDiscriminator(
            fft_sizes=self.cfg.mfd_fft_sizes,
            hop_sizes=self.cfg.mfd_hop_sizes,
            win_lengths=self.cfg.mfd_win_lengths,
            channels=self.cfg.mfd_channels,
            max_downsample_channels=self.cfg.mfd_max_channels,
            downsample_scales=self.cfg.mfd_downsample_scales,
            compute_dtype=self.compute_dtype, name="mfd",
        )(x)
        if self.use_mpd:
            outs = outs + MultiPeriodDiscriminator(
                periods=self.cfg.mpd_periods,
                channels=self.cfg.mpd_channels,
                compute_dtype=self.compute_dtype, name="mpd",
            )(x)
        return outs
