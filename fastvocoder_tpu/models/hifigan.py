"""HiFiGAN generator (flax, NTC).

Architecture parity with reference model/generator/hifigan.py:13-129:
conv_pre k=7 -> per upsample stage: LeakyReLU(0.1) + [ConvTranspose1d |
nearest-interp UpsampleLayer] + MRF (mean of num_kernels ResBlocks) ->
LeakyReLU(default 0.01, hifigan.py:104) + conv_post k=7 + tanh.
Channel width halves per stage: upsample_initial_channel // 2**(i+1).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from fastvocoder_tpu.hparams import HiFiGANConfig
from fastvocoder_tpu.models.layers import (
    LRELU_SLOPE,
    ResBlock1,
    ResBlock2,
    UpsampleLayer,
    WNConv1d,
    WNConvTranspose1d,
    leaky_relu,
)


class HiFiGANGenerator(nn.Module):
    cfg: HiFiGANConfig
    weight_norm: bool = True
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """(B, T, 80) -> (B, T * prod(rates)) wav, or (B, T', out_bands) when
        out_bands > 1 (multiband trunk; PQMF synthesis happens outside)."""
        x = self.trunk(mel)
        if self.cfg.out_bands == 1:
            return x[..., 0].astype(jnp.float32)
        return x.astype(jnp.float32)

    def trunk(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        kw = dict(
            use_bias=cfg.bias,
            weight_norm=self.weight_norm,
            compute_dtype=self.compute_dtype,
        )
        num_kernels = len(cfg.resblock_kernel_sizes)
        resblock = ResBlock1 if cfg.resblock_type == "1" else ResBlock2

        x = WNConv1d(
            cfg.upsample_initial_channel, 7, padding=3, name="conv_pre", **kw
        )(mel)

        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x, LRELU_SLOPE)
            if cfg.transposedconv:
                x = WNConvTranspose1d(
                    ch, kernel_size=k, stride=u,
                    padding=u // 2 + u % 2, output_padding=u % 2,
                    name=f"up_{i}", **kw,
                )(x)
            else:
                x = UpsampleLayer(
                    ch, upsample_rate=u, kernel_size=k, stride=1,
                    padding=k // 2, name=f"up_{i}", **kw,
                )(x)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                out = resblock(
                    channels=ch, kernel_size=rk, dilations=rd,
                    use_bias=cfg.bias, weight_norm=self.weight_norm,
                    compute_dtype=self.compute_dtype,
                    name=f"resblock_{i}_{j}",
                )(x)
                acc = out if acc is None else acc + out
            x = acc / num_kernels

        x = leaky_relu(x)  # default slope 0.01 (reference hifigan.py:104)
        x = WNConv1d(cfg.out_bands, 7, padding=3, name="conv_post", **kw)(x)
        return jnp.tanh(x)
