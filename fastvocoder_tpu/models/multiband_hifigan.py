"""MultiBand-HiFiGAN generator (flax, NTC).

Same trunk as HiFiGAN but 2 upsample stages and a 4-sub-band conv_post
(reference model/generator/multiband_hifigan.py:14-137).  ``__call__``
returns the sub-band signal (B, T//4, 4) — training computes the loss in
both sub-band and full-band domains (reference model/loss/loss.py:16-31) —
while ``synthesize`` applies PQMF synthesis for full-band inference
(reference multiband_hifigan.py:118-137).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from fastvocoder_tpu.hparams import HiFiGANConfig
from fastvocoder_tpu.models.hifigan import HiFiGANGenerator
from fastvocoder_tpu.ops.pqmf import PQMF


class MultiBandHiFiGANGenerator(nn.Module):
    cfg: HiFiGANConfig  # with out_bands=4
    weight_norm: bool = True
    compute_dtype: Any = None

    def setup(self):
        self.trunk = HiFiGANGenerator(
            self.cfg, weight_norm=self.weight_norm,
            compute_dtype=self.compute_dtype, name="trunk"
        )
        self._pqmf = PQMF(subbands=self.cfg.out_bands)

    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """(B, T, 80) -> sub-band signal (B, T * prod(rates), 4)."""
        return self.trunk(mel)

    def synthesize(self, mel: jnp.ndarray) -> jnp.ndarray:
        """(B, T, 80) -> full-band wav (B, T * prod(rates) * 4)."""
        sub = self.trunk(mel)
        return self._pqmf.synthesis(sub)[..., 0]
