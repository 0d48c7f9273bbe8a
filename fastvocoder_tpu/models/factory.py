"""Single model factory (replaces the switch duplicated across 4 reference
drivers: bin/train.py:269-313, bin/synthesize.py:25-68, bin/test.py:29-72,
bin/publish.py:22-65)."""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from fastvocoder_tpu.hparams import DISC, DiscriminatorConfig, ModelConfig
from fastvocoder_tpu.models.basis_melgan import BasisMelGANGenerator
from fastvocoder_tpu.models.discriminator.composite import Discriminator
from fastvocoder_tpu.models.hifigan import HiFiGANGenerator
from fastvocoder_tpu.models.melgan import MelGANGenerator
from fastvocoder_tpu.models.multiband_hifigan import MultiBandHiFiGANGenerator


def build_generator(
    cfg: ModelConfig,
    basis_signal_weight: Optional[np.ndarray] = None,
    weight_norm: Optional[bool] = None,
    compute_dtype: Any = None,
):
    """Construct the generator module for `cfg.model_name`.

    `weight_norm=False` builds the fused module (the reference's
    post-`remove_weight_norm()` form) — pair with
    `train.checkpoint.fuse_weight_norm` on the params.
    """
    name = cfg.model_name
    arch = cfg.arch
    if weight_norm is not None and hasattr(arch, "use_weight_norm"):
        import dataclasses

        arch = dataclasses.replace(arch, use_weight_norm=weight_norm)
    wn = True if weight_norm is None else weight_norm

    if name == "melgan":
        return MelGANGenerator(cfg=arch, compute_dtype=compute_dtype)
    if name == "hifigan":
        return HiFiGANGenerator(cfg=arch, weight_norm=wn, compute_dtype=compute_dtype)
    if name == "multiband-hifigan":
        return MultiBandHiFiGANGenerator(cfg=arch, weight_norm=wn, compute_dtype=compute_dtype)
    if name == "basis-melgan":
        return BasisMelGANGenerator(
            cfg=arch, basis_init=basis_signal_weight, compute_dtype=compute_dtype
        )
    if name == "nhv":
        from fastvocoder_tpu.models.nhv import NHVGenerator

        return NHVGenerator(cfg=arch, compute_dtype=compute_dtype)
    raise ValueError(f"no model find! ({name})")


def build_discriminator(
    use_mpd: bool = False,
    disc_cfg: DiscriminatorConfig = DISC,
    compute_dtype: Any = None,
) -> Discriminator:
    return Discriminator(
        use_mpd=use_mpd or disc_cfg.use_mpd, cfg=disc_cfg,
        compute_dtype=compute_dtype,
    )
