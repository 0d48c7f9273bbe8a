"""Multi-resolution STFT discriminator ("from universal MelGAN"), flax/NTC.

Parity with reference model/discriminator/mfd.py:44-183: 3 STFT
discriminators at FFT sizes [2048, 1024, 512], hops [240, 120, 50], wins
[1200, 600, 240].  Each computes an in-graph magnitude STFT of the waveform
(clamp eps 1e-7, mfd.py:40), then a grouped conv stack over the
(B, frames, freq_bins) "image": conv k=15 from fft//2+1 channels, two
grouped stride-4 downsample convs (k=25), two head convs; all layer outputs
are returned.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fastvocoder_tpu.dsp.stft import stft_mag
from fastvocoder_tpu.models.layers import WNConv1d, leaky_relu
from fastvocoder_tpu.ops.conv import reflect_pad1d


class STFTDiscriminator(nn.Module):
    fft_size: int = 1024
    shift_size: int = 120
    win_length: int = 600
    out_channels: int = 1
    kernel_sizes: Sequence[int] = (5, 3)
    channels: int = 64
    max_downsample_channels: int = 1024
    use_bias: bool = True
    downsample_scales: Sequence[int] = (4, 4)
    negative_slope: float = 0.2
    weight_norm: bool = True
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """x (B, T) waveform -> per-layer feature tuple.

        The conv stack treats frequency bins as channels; NTC layout means
        the magnitude STFT (B, frames, bins) feeds the convs directly — no
        transpose (the reference permutes to NCT, mfd.py:138).
        """
        kw = dict(
            use_bias=self.use_bias,
            weight_norm=self.weight_norm,
            compute_dtype=self.compute_dtype,
        )
        h = stft_mag(x, self.fft_size, self.shift_size, self.win_length)
        k0 = self.kernel_sizes[0] * self.kernel_sizes[1]
        outs: List[jnp.ndarray] = []

        h = reflect_pad1d(h, (k0 - 1) // 2)
        h = WNConv1d(self.channels, k0, name="conv_first", **kw)(h)
        h = leaky_relu(h, self.negative_slope)
        outs.append(h)

        in_chs = self.channels
        for i, ds in enumerate(self.downsample_scales):
            out_chs = min(in_chs * ds, self.max_downsample_channels)
            h = WNConv1d(
                out_chs, ds * 6 + 1, stride=ds, padding=ds * 3,
                groups=in_chs // 4, name=f"conv_down_{i}", **kw,
            )(h)
            h = leaky_relu(h, self.negative_slope)
            outs.append(h)
            in_chs = out_chs

        out_chs = min(in_chs * 2, self.max_downsample_channels)
        h = WNConv1d(
            out_chs, self.kernel_sizes[0],
            padding=(self.kernel_sizes[0] - 1) // 2, name="conv_head", **kw,
        )(h)
        h = leaky_relu(h, self.negative_slope)
        outs.append(h)

        h = WNConv1d(
            self.out_channels, self.kernel_sizes[1],
            padding=(self.kernel_sizes[1] - 1) // 2, name="conv_out", **kw,
        )(h)
        outs.append(h)
        return tuple(outs)


class MultiResolutionSTFTDiscriminator(nn.Module):
    fft_sizes: Sequence[int] = (2048, 1024, 512)
    hop_sizes: Sequence[int] = (240, 120, 50)
    win_lengths: Sequence[int] = (1200, 600, 240)
    channels: int = 64
    max_downsample_channels: int = 1024
    downsample_scales: Sequence[int] = (4, 4)
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[Tuple[jnp.ndarray, ...], ...]:
        """x (B, T, 1) or (B, T) -> tuple over resolutions of feature tuples."""
        if x.ndim == 3:
            x = x[..., 0]
        outs = []
        for i, (fs, ss, wl) in enumerate(
            zip(self.fft_sizes, self.hop_sizes, self.win_lengths)
        ):
            outs.append(
                STFTDiscriminator(
                    fft_size=fs, shift_size=ss, win_length=wl,
                    channels=self.channels,
                    max_downsample_channels=self.max_downsample_channels,
                    downsample_scales=self.downsample_scales,
                    compute_dtype=self.compute_dtype, name=f"disc_{i}",
                )(x)
            )
        return tuple(outs)
