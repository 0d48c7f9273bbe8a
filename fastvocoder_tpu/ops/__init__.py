from fastvocoder_tpu.ops.conv import (
    conv1d,
    conv_transpose1d,
    reflect_pad1d,
    avg_pool1d,
)
from fastvocoder_tpu.ops.overlap_add import overlap_and_add
from fastvocoder_tpu.ops.pqmf import PQMF, design_prototype_filter

__all__ = [
    "conv1d",
    "conv_transpose1d",
    "reflect_pad1d",
    "avg_pool1d",
    "overlap_and_add",
    "PQMF",
    "design_prototype_filter",
]
