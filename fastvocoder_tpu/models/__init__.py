from fastvocoder_tpu.models.melgan import MelGANGenerator
from fastvocoder_tpu.models.hifigan import HiFiGANGenerator
from fastvocoder_tpu.models.multiband_hifigan import MultiBandHiFiGANGenerator
from fastvocoder_tpu.models.basis_melgan import BasisMelGANGenerator
from fastvocoder_tpu.models.factory import build_generator, build_discriminator

__all__ = [
    "MelGANGenerator",
    "HiFiGANGenerator",
    "MultiBandHiFiGANGenerator",
    "BasisMelGANGenerator",
    "build_generator",
    "build_discriminator",
]
