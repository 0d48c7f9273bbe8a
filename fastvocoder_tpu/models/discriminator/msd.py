"""MelGAN multi-scale discriminator (flax, NTC).

Parity with reference model/discriminator/msd.py:13-234: 3 identical
per-scale discriminators separated by AvgPool1d(4,2,1,count_include_pad=False)
downsampling.  Each scale: reflect-pad + conv k=15, four grouped strided
downsample convs (stride 4, k=41, groups=in/4), two head convs; every layer's
activation is returned as the feature list.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fastvocoder_tpu.models.layers import WNConv1d, leaky_relu
from fastvocoder_tpu.ops.conv import avg_pool1d, reflect_pad1d


class MelGANDiscriminator(nn.Module):
    out_channels: int = 1
    kernel_sizes: Sequence[int] = (5, 3)
    channels: int = 16
    max_downsample_channels: int = 1024
    use_bias: bool = True
    downsample_scales: Sequence[int] = (4, 4, 4, 4)
    negative_slope: float = 0.2
    weight_norm: bool = True
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        kw = dict(
            use_bias=self.use_bias,
            weight_norm=self.weight_norm,
            compute_dtype=self.compute_dtype,
        )
        k0 = self.kernel_sizes[0] * self.kernel_sizes[1]
        outs: List[jnp.ndarray] = []

        h = reflect_pad1d(x, (k0 - 1) // 2)
        h = WNConv1d(self.channels, k0, name="conv_first", **kw)(h)
        h = leaky_relu(h, self.negative_slope)
        outs.append(h)

        in_chs = self.channels
        for i, ds in enumerate(self.downsample_scales):
            out_chs = min(in_chs * ds, self.max_downsample_channels)
            h = WNConv1d(
                out_chs, ds * 10 + 1, stride=ds, padding=ds * 5,
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


class MelGANMultiScaleDiscriminator(nn.Module):
    scales: int = 3
    channels: int = 16
    max_downsample_channels: int = 1024
    downsample_scales: Sequence[int] = (4, 4, 4, 4)
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[Tuple[jnp.ndarray, ...], ...]:
        """x (B, T, 1) -> tuple over scales of per-layer feature tuples."""
        outs = []
        for s in range(self.scales):
            outs.append(
                MelGANDiscriminator(
                    channels=self.channels,
                    max_downsample_channels=self.max_downsample_channels,
                    downsample_scales=self.downsample_scales,
                    compute_dtype=self.compute_dtype,
                    name=f"disc_{s}",
                )(x)
            )
            x = avg_pool1d(x, 4, 2, 1, count_include_pad=False)
        return tuple(outs)
