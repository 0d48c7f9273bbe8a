"""MelGAN generator (flax, NTC).

Architecture parity with reference model/generator/melgan.py:17-185:
reflect-pad + conv stem, then per upsample scale a LeakyReLU(0.2) +
ConvTranspose1d(k=2s, stride=s, p=s//2+s%2, op=s%2) + `stacks` ResidualStacks
with dilation k_stack**j, then LastLayer + tanh.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from fastvocoder_tpu.hparams import MelGANConfig
from fastvocoder_tpu.models.layers import (
    LastLayer,
    ResidualStack,
    WNConv1d,
    WNConvTranspose1d,
    apply_residual_stacks,
    leaky_relu,
)
from fastvocoder_tpu.ops.conv import reflect_pad1d


class MelGANGenerator(nn.Module):
    cfg: MelGANConfig
    use_final_nonlinear_activation: bool = True
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """(B, T, in_channels) -> (B, T * prod(upsample_scales)) waveform."""
        cfg = self.cfg
        kw = dict(
            use_bias=cfg.bias,
            weight_norm=cfg.use_weight_norm,
            compute_dtype=self.compute_dtype,
        )
        x = reflect_pad1d(mel, (cfg.kernel_size - 1) // 2)
        x = WNConv1d(cfg.channels[0], cfg.kernel_size, name="conv_pre", **kw)(x)

        for i, scale in enumerate(cfg.upsample_scales):
            x = leaky_relu(x, 0.2)
            x = WNConvTranspose1d(
                cfg.channels[i + 1] if i + 1 < len(cfg.channels) else cfg.channels[-1],
                kernel_size=scale * 2,
                stride=scale,
                padding=scale // 2 + scale % 2,
                output_padding=scale % 2,
                name=f"up_{i}",
                **kw,
            )(x)
            x = apply_residual_stacks(
                x, cfg, self.compute_dtype,
                [
                    ResidualStack(
                        channels=x.shape[-1],
                        kernel_size=cfg.stack_kernel_size,
                        dilation=cfg.stack_kernel_size**j,
                        use_bias=cfg.bias,
                        weight_norm=cfg.use_weight_norm,
                        use_causal_conv=cfg.use_causal_conv,
                        compute_dtype=self.compute_dtype,
                        name=f"stack_{i}_{j}",
                    )
                    for j in range(cfg.stacks)
                ],
            )

        x = LastLayer(
            cfg.out_channels, cfg.kernel_size,
            use_bias=cfg.bias, weight_norm=cfg.use_weight_norm,
            compute_dtype=self.compute_dtype, name="conv_post",
        )(x)
        if self.use_final_nonlinear_activation:
            x = jnp.tanh(x)
        return x[..., 0].astype(jnp.float32)
