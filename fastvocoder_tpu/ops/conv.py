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

from typing import Tuple, Union

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


def upconv_polyphase(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int,
    pad_l: int,
    t_out: int,
    precision=None,
) -> jnp.ndarray:
    """Transposed conv as ONE dense conv + depth-to-space (polyphase form).

    Computes y[n] = sum_k x_zerostuffed_padded[n + k] * kernel[k] for
    n in [0, t_out) — i.e. the lhs-dilated conv with left pad `pad_l` and
    `kernel` already in correlation orientation (K, Cin, Cout) — without
    materializing the zero-stuffed input.  The s-phase decomposition turns
    the strided upsample into a stride-1 conv with s*Cout output channels
    over the *low-rate* input: no multiplies against stuffed zeros (an s-fold
    FLOP saving) and an MXU-friendly channel dimension.  Requires
    t_out <= T * stride.
    """
    import numpy as np

    K, Cin, Cout = kernel.shape
    s = stride
    B, T = x.shape[0], x.shape[1]
    assert t_out <= T * s, (t_out, T, s)

    # phase r of the output reads original taps k ≡ (pad_l - r) mod s; give
    # every phase a common tap axis j' with a per-phase shift baked in
    r = np.arange(s)
    k_r = (pad_l - r) % s
    o_r = (pad_l - r) // s  # floor; input offset of phase r's first tap
    o_max = int(o_r.max())
    J = int((o_max - o_r + np.ceil((K - k_r) / s)).max())
    jj = np.arange(J)[:, None]
    kk = (jj - (o_max - o_r)[None, :]) * s + k_r[None, :]  # (J, s)
    valid = (kk >= 0) & (kk < K)
    kk = np.clip(kk, 0, K - 1)

    w2 = kernel[kk] * jnp.asarray(valid, kernel.dtype)[..., None, None]
    w2 = jnp.transpose(w2, (0, 2, 1, 3)).reshape(J, Cin, s * Cout)

    y = lax.conv_general_dilated(
        x,
        w2,
        window_strides=(1,),
        padding=[(o_max, J - 1 - o_max)],
        dimension_numbers=_DN,
        precision=precision,
    )  # (B, T, s*Cout); channel index = phase * Cout + cout
    y = y.reshape(B, T, s, Cout).reshape(B, T * s, Cout)
    return y[:, :t_out]


def conv1d_phase_packed(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    padding: int = 0,
    dilation: int = 1,
    phases: int = 8,
) -> jnp.ndarray:
    """Stride-1 conv with `phases` consecutive outputs packed into channels.

    Mathematically identical to `conv1d(x, kernel, stride=1, padding,
    dilation)` (same taps per output sample; only the float summation
    grouping differs).  Why: XLA lowers an NWC conv as an implicit GEMM with
    N = Cout MXU lanes — at the small widths of the late vocoder stages
    (Cout = 16/32) that fills 12.5–25% of the 128-lane MXU.  Packing
    s = phases output samples into the channel dim raises N to s*Cout at a
    FLOP multiplier of ((K-1)*dilation + s)/K (the packed weight is
    block-Toeplitz with zeros), a net win whenever s*K >> (K-1)*dilation + s.

    x (B, T, Cin); kernel (K, Cin, Cout).  Output (B, T_out, Cout) with
    T_out = T + 2*padding - (K-1)*dilation, exactly as conv1d.
    """
    import numpy as np

    K, Cin, Cout = kernel.shape
    B, T = x.shape[0], x.shape[1]
    s = phases
    t_out = T + 2 * padding - (K - 1) * dilation
    assert t_out > 0, (T, padding, K, dilation)
    Q = -(-t_out // s)  # windows of the packed stride-s conv

    # packed weight W2[j, ci, r*Cout + co] = kernel[k, ci, co] at j = r + k*d
    span = (K - 1) * dilation + s
    j = np.arange(span)[:, None]
    r = np.arange(s)[None, :]
    diff = j - r
    valid = (diff % dilation == 0) & (diff >= 0) & (diff < K * dilation)
    kk = np.clip(diff // dilation, 0, K - 1)  # (span, s)
    w2 = kernel[kk] * jnp.asarray(valid, kernel.dtype)[..., None, None]
    w2 = jnp.transpose(w2, (0, 2, 1, 3)).reshape(span, Cin, s * Cout)

    # right-pad so the last (possibly partial) phase group has a full window;
    # the extra zero rows only feed outputs >= t_out, which are trimmed
    extra = Q * s + (K - 1) * dilation - (T + 2 * padding)
    y = lax.conv_general_dilated(
        x,
        w2,
        window_strides=(s,),
        padding=[(padding, padding + extra)],
        dimension_numbers=_DN,
    )  # (B, Q, s*Cout); channel index = phase * Cout + cout
    y = y.reshape(B, Q, s, Cout).reshape(B, Q * s, Cout)[:, :t_out]
    if bias is not None:
        y = y + bias
    return y


def packed_conv_phases(
    stride: int,
    groups: int,
    kernel_size: int,
    dilation: int,
    cout: int,
    t: int,
) -> int:
    """Phase count for routing a conv through `conv1d_phase_packed`
    (0 = keep the plain lowering).

    Default OFF: measured whole-model on v5e (hifigan-light, batch 32x585
    frames) packing is 1.8x SLOWER (249 ms vs 139 ms) despite isolated convs
    being flat-to-1.4x-faster — the inter-conv (B,Q,s*C)->(B,T,C) reshapes
    break XLA's elementwise/residual fusion and add full-tensor passes, and
    the late stages are bandwidth-bound (~287 GB/s effective floor), not
    MXU-lane-bound as the packing model assumed.  Set
    FASTVOCODER_PACKED_CONV=1 to route by shape (for experiments).
    """
    import os

    mode = os.environ.get("FASTVOCODER_PACKED_CONV", "0")
    if mode != "1" or stride != 1 or groups != 1 or cout >= 128 or t < 4096:
        return 0
    s = 128 // cout
    # modeled net win = lane-utilization gain (s) over the packed FLOP
    # multiplier — increasing in s, so only the max lane-filling s is tried
    net = s * kernel_size / ((kernel_size - 1) * dilation + s)
    return s if s > 1 and net >= 1.5 else 0


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

    Small-channel up-convs (e.g. PQMF synthesis, 4 -> 1) lower to the
    polyphase dense-conv form (`upconv_polyphase`): ~10x faster on TPU, where
    the lhs-dilated form multiplies against the stuffed zeros on the VPU.
    Wide-channel generator stages keep XLA's lhs-dilated lowering — measured
    on v5e it fuses better with the surrounding elementwise ops (HiFiGAN
    light: 8.7 ms/utt lhs-dilated vs 14.1 ms polyphase), while per-stage
    times are within ~20% either way.
    """
    K, cin, cout = kernel.shape
    kernel = jnp.flip(kernel, axis=0)
    pad_l = K - 1 - padding
    pad_r = K - 1 - padding + output_padding
    t_out = (x.shape[1] - 1) * stride - 2 * padding + K + output_padding
    use_polyphase = stride >= 4 or cin * cout <= 256
    if stride > 1 and 0 < t_out <= x.shape[1] * stride and use_polyphase:
        out = upconv_polyphase(x, kernel, stride, pad_l, t_out)
    else:
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
