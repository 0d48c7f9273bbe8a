"""1-D convolution primitives in NTC layout with exact torch padding parity.

All model compute in this framework is (batch, time, channel) — the layout
XLA tiles best onto the TPU MXU — unlike the reference's torch NCT layout.
Kernels are stored (K, Cin, Cout) ("WIO").

`conv_transpose1d` reproduces torch.nn.ConvTranspose1d's
padding/output_padding arithmetic exactly (the reference upsamplers depend on
it: reference model/generator/melgan.py:77-86, hifigan.py:39-44) by lowering
to `lax.conv_general_dilated` with lhs_dilation — the canonical XLA form of a
transposed conv.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NWC", "WIO", "NWC")


def conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: Union[int, Tuple[int, int]] = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """torch.nn.functional.conv1d parity. x (B,T,Cin), kernel (K,Cin//g,Cout)."""
    if isinstance(padding, int):
        padding = (padding, padding)
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias
    return out


def conv_transpose1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
) -> jnp.ndarray:
    """torch.nn.functional.conv_transpose1d parity.

    x (B,T,Cin); kernel (K,Cin,Cout) stored in torch orientation (i.e. the
    torch weight (Cin,Cout,K) transposed to (K,Cin,Cout), *not* flipped).
    T_out = (T-1)*stride - 2*padding + K + output_padding.
    """
    K = kernel.shape[0]
    kernel = jnp.flip(kernel, axis=0)
    pad_l = K - 1 - padding
    pad_r = K - 1 - padding + output_padding
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(pad_l, pad_r)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
    )
    if bias is not None:
        out = out + bias
    return out


def reflect_pad1d(x: jnp.ndarray, pad: Union[int, Tuple[int, int]]) -> jnp.ndarray:
    """torch.nn.ReflectionPad1d on the time axis of (B,T,C)."""
    if isinstance(pad, int):
        pad = (pad, pad)
    return jnp.pad(x, [(0, 0), pad, (0, 0)], mode="reflect")


def constant_pad1d(x: jnp.ndarray, pad: Union[int, Tuple[int, int]], value: float = 0.0) -> jnp.ndarray:
    if isinstance(pad, int):
        pad = (pad, pad)
    return jnp.pad(x, [(0, 0), pad, (0, 0)], mode="constant", constant_values=value)


def avg_pool1d(
    x: jnp.ndarray,
    kernel_size: int,
    stride: int,
    padding: int = 0,
    count_include_pad: bool = False,
) -> jnp.ndarray:
    """torch.nn.AvgPool1d parity on (B,T,C), incl. count_include_pad=False
    (used by the MSD inter-scale pooling, reference model/discriminator/msd.py:124-131)."""
    sums = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, kernel_size, 1),
        window_strides=(1, stride, 1),
        padding=[(0, 0), (padding, padding), (0, 0)],
    )
    if count_include_pad:
        return sums / kernel_size
    ones = jnp.ones((1, x.shape[1], 1), dtype=x.dtype)
    counts = lax.reduce_window(
        ones,
        0.0,
        lax.add,
        window_dimensions=(1, kernel_size, 1),
        window_strides=(1, stride, 1),
        padding=[(0, 0), (padding, padding), (0, 0)],
    )
    return sums / counts
