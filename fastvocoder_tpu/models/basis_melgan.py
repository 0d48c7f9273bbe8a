"""Basis-MelGAN generator (flax, NTC) — the flagship fast model.

Architecture parity with reference model/generator/basis_melgan.py:19-213:
a small MelGAN-style trunk (16x temporal upsampling) ending in ReLU predicts
non-negative basis weights (B, T*16, 256); a frozen linear basis layer maps
weights to frames of length L=30 which are 50%-overlap-added into the
waveform (240 samples per mel frame = 16 * L/2).

The training ``__call__`` reproduces the reference's in-forward zero-input
bias subtraction (basis_melgan.py:147-162); ``inference`` skips it — bias is
handled downstream via the published 'pattern' (reference bin/publish.py:67-75,
bin/test.py:82-91).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fastvocoder_tpu.hparams import BasisMelGANConfig
from fastvocoder_tpu.models.layers import (
    BasisSignalLayer,
    ResidualStack,
    UpsampleLayer,
    WNConv1d,
    WNConvTranspose1d,
    leaky_relu,
)
from fastvocoder_tpu.ops.conv import reflect_pad1d


class BasisMelGANGenerator(nn.Module):
    cfg: BasisMelGANConfig
    basis_init: Optional[np.ndarray] = None  # (L, out_channels)
    use_final_nonlinear_activation: bool = True
    compute_dtype: Any = None

    def setup(self):
        cfg = self.cfg
        kw = dict(
            use_bias=cfg.bias,
            weight_norm=cfg.use_weight_norm,
            compute_dtype=self.compute_dtype,
        )
        self.conv_pre = WNConv1d(cfg.channels[0], cfg.kernel_size, name="conv_pre", **kw)
        ups = []
        stacks = []
        for i, scale in enumerate(cfg.upsample_scales):
            if cfg.transposedconv:
                ups.append(
                    WNConvTranspose1d(
                        cfg.channels[i + 1], kernel_size=scale * 2, stride=scale,
                        padding=scale // 2 + scale % 2, output_padding=scale % 2,
                        name=f"up_{i}", **kw,
                    )
                )
            else:
                ups.append(
                    UpsampleLayer(
                        cfg.channels[i + 1], upsample_rate=scale,
                        kernel_size=scale * 2 + 1, stride=1, padding=scale,
                        name=f"up_{i}", **kw,
                    )
                )
            stacks.append(
                tuple(
                    ResidualStack(
                        channels=cfg.channels[i + 1],
                        kernel_size=cfg.stack_kernel_size,
                        dilation=cfg.stack_kernel_size**j,
                        use_bias=cfg.bias,
                        weight_norm=cfg.use_weight_norm,
                        use_causal_conv=cfg.use_causal_conv,
                        compute_dtype=self.compute_dtype,
                        name=f"stack_{i}_{j}",
                    )
                    for j in range(cfg.stacks)
                )
            )
        self.ups = tuple(ups)
        self.stacks = tuple(stacks)
        self.basis_signal = BasisSignalLayer(
            L=cfg.L,
            basis_init=self.basis_init,
            in_features=cfg.out_channels,
            name="basis_signal",
        )

    def trunk(self, mel: jnp.ndarray) -> jnp.ndarray:
        """(B, T, in) -> weights (B, T * prod(scales), out_channels)."""
        cfg = self.cfg
        x = reflect_pad1d(mel, (cfg.kernel_size - 1) // 2)
        x = self.conv_pre(x)
        from fastvocoder_tpu.models.layers import apply_residual_stacks

        for up, stack_group in zip(self.ups, self.stacks):
            x = leaky_relu(x, 0.2)
            x = up(x)
            x = apply_residual_stacks(
                x, cfg, self.compute_dtype, list(stack_group)
            )
        if self.use_final_nonlinear_activation:
            x = jnp.maximum(x, 0.0)  # ReLU -> non-negative weights
        return x

    def __call__(self, mel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Training forward with zero-input bias removal
        (reference basis_melgan.py:140-162).

        Returns (est_source (B, T*hop), weight (B, T*16, C)).
        """
        half_l = self.cfg.L // 2

        zero_weight = self.trunk(jnp.zeros_like(mel))
        zero_source = self.basis_signal(zero_weight)[:, : zero_weight.shape[1] * half_l]

        weight = self.trunk(mel)
        est_source = self.basis_signal(weight)[:, : weight.shape[1] * half_l]

        return (est_source - zero_source).astype(jnp.float32), (
            weight - zero_weight
        ).astype(jnp.float32)

    def inference(self, mel: jnp.ndarray) -> jnp.ndarray:
        """(B, T, in) -> (B, (T*16 - 1) * L/2 + L) raw waveform (no bias
        removal, no trim — reference basis_melgan.py:196-208)."""
        weight = self.trunk(mel)
        return self.basis_signal(weight).astype(jnp.float32)

    def decode(self, weight: jnp.ndarray) -> jnp.ndarray:
        """Decode precomputed weights (reference basis_melgan.py:210-212)."""
        return self.basis_signal(weight).astype(jnp.float32)
