"""HiFiGAN multi-period discriminator (flax).

Parity with the *wired-capable* MultiPeriodDiscriminator of the reference
(model/discriminator/mpd.py:130-163 and the list-of-lists variant at
mpd.py:288-304): periods {2,3,5,7,11}, each a stack of 2-D convs with
kernel (5,1), stride (3,1) over the waveform reshaped to (B, T/P, P).

The reference keeps MPD imported-but-commented-out in the composite
discriminator (model/discriminator/discriminator.py:11,16); here it is an
optional component selectable via ``Discriminator(use_mpd=True)``.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvocoder_tpu.models.layers import LRELU_SLOPE, leaky_relu, torch_conv_kernel_init, _l2norm


class _WNConv2d(nn.Module):
    """2-D conv with weight norm; kernel (Kh, Kw, Cin, Cout), torch-dim-0 WN."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    weight_norm: bool = True
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kh, kw_ = self.kernel_size
        fan_in = cin * kh * kw_
        kernel = self.param(
            "kernel", torch_conv_kernel_init(fan_in), (kh, kw_, cin, self.features)
        )
        if self.weight_norm:
            g = self.param(
                "g",
                lambda rng: jnp.squeeze(_l2norm(kernel, (0, 1, 2)), (0, 1, 2)),
            )
            kernel = kernel * (g / _l2norm(kernel, (0, 1, 2)))
        bias = (
            self.param("bias", torch_conv_kernel_init(fan_in), (self.features,))
            if self.use_bias
            else None
        )
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
            kernel = kernel.astype(self.compute_dtype)
            bias = bias.astype(self.compute_dtype) if bias is not None else None
        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=self.strides,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            out = out + bias
        return out


class PeriodDiscriminator(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3
    # strided-conv widths; the default is the reference's exact stack
    # (reference mpd.py:293-301) — parity and checkpoint interchange
    # depend on it.  Narrow widths exist for tests/dryruns only.
    channels: Sequence[int] = (32, 128, 512, 1024)
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """x (B, T, 1) -> per-layer feature tuple; last entry is the score map."""
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, c)

        outs: List[jnp.ndarray] = []
        pad = (self.kernel_size * 1 - 1) // 2
        for i, ch in enumerate(self.channels):
            x = _WNConv2d(
                ch, (self.kernel_size, 1), strides=(self.stride, 1),
                padding=(pad, 0), compute_dtype=self.compute_dtype,
                name=f"conv_{i}",
            )(x)
            x = leaky_relu(x, LRELU_SLOPE)
            outs.append(x)
        x = _WNConv2d(
            self.channels[-1], (self.kernel_size, 1), strides=(1, 1),
            padding=(pad, 0), compute_dtype=self.compute_dtype,
            name=f"conv_{len(self.channels)}",
        )(x)
        x = leaky_relu(x, LRELU_SLOPE)
        outs.append(x)
        x = _WNConv2d(
            1, (3, 1), strides=(1, 1), padding=(1, 0),
            compute_dtype=self.compute_dtype, name="conv_post",
        )(x)
        outs.append(x)  # conv_post map is also a feature (reference mpd.py:162)
        outs.append(x.reshape(b, -1, 1))  # flattened score, list-of-lists protocol
        return tuple(outs)


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    channels: Sequence[int] = (32, 128, 512, 1024)
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[Tuple[jnp.ndarray, ...], ...]:
        return tuple(
            PeriodDiscriminator(
                period=p, channels=self.channels,
                compute_dtype=self.compute_dtype, name=f"disc_{i}",
            )(x)
            for i, p in enumerate(self.periods)
        )
