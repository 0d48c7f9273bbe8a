from fastvocoder_tpu.models.discriminator.msd import MelGANMultiScaleDiscriminator
from fastvocoder_tpu.models.discriminator.mfd import MultiResolutionSTFTDiscriminator
from fastvocoder_tpu.models.discriminator.mpd import MultiPeriodDiscriminator
from fastvocoder_tpu.models.discriminator.composite import Discriminator

__all__ = [
    "MelGANMultiScaleDiscriminator",
    "MultiResolutionSTFTDiscriminator",
    "MultiPeriodDiscriminator",
    "Discriminator",
]
