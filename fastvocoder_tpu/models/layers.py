"""Shared flax building blocks in NTC layout.

TPU-native re-design of the reference's torch modules
(reference model/generator/modules.py):

  * Weight normalization is an explicit ``g * v / ||v||`` reparameterization
    inside the conv modules (torch wraps modules with hooks,
    melgan.py:149-156).  ``weight_norm=False`` builds the "fused" module the
    reference gets from ``remove_weight_norm()``; the parameter conversion is
    `fastvocoder_tpu.train.checkpoint.fuse_weight_norm`.
  * All convs run in (B, T, C); kernels are (K, Cin, Cout) so the channel
    contraction lands on the MXU lanes.
  * An optional ``compute_dtype`` casts activations+kernels (bf16 inference).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fastvocoder_tpu.ops.fused_resstack import stack_margin
from fastvocoder_tpu.ops.conv import (
    conv1d,
    conv1d_phase_packed,
    conv_transpose1d,
    constant_pad1d,
    packed_conv_phases,
    reflect_pad1d,
)

LRELU_SLOPE = 0.1  # hifigan family (reference modules.py:9)


def leaky_relu(x, negative_slope=0.01):
    return jnp.where(x >= 0, x, x * negative_slope)


def torch_conv_kernel_init(fan_in: int) -> Callable:
    """torch.nn.Conv1d default init: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _l2norm(v: jnp.ndarray, axes: Tuple[int, ...]) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))


def _apply_conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    compute_dtype: Any = None,
) -> jnp.ndarray:
    """Shared conv application: compute-dtype cast + lowering policy."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
        bias = bias.astype(compute_dtype) if bias is not None else None
    phases = packed_conv_phases(
        stride, groups, kernel.shape[0], dilation, kernel.shape[-1], x.shape[1]
    )
    if phases:
        return conv1d_phase_packed(
            x, kernel, bias, padding=padding, dilation=dilation, phases=phases
        )
    return conv1d(
        x, kernel, bias,
        stride=stride, padding=padding, dilation=dilation, groups=groups,
    )


class WNConv1d(nn.Module):
    """Conv1d with optional weight-norm reparameterization.

    Params: 'kernel' (K, Cin//groups, Cout) [+ 'g' (Cout,)] [+ 'bias' (Cout,)].
    Weight-norm normalizes over (K, Cin) per output channel — torch
    weight_norm dim=0 on a (Cout, Cin, K) weight.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: int = 0  # symmetric zero padding (torch conv `padding=`)
    use_bias: bool = True
    weight_norm: bool = True
    compute_dtype: Any = None

    @nn.compact
    def weights(self, cin: int):
        """Create params and return the effective (kernel, bias) —
        weight-norm applied.  Used by `__call__` and by fused stage kernels
        that consume raw weights (`ops/fused_mrf.py`)."""
        fan_in = (cin // self.groups) * self.kernel_size
        kshape = (self.kernel_size, cin // self.groups, self.features)
        kernel = self.param("kernel", torch_conv_kernel_init(fan_in), kshape)
        if self.weight_norm:
            g = self.param(
                "g", lambda rng: jnp.squeeze(_l2norm(kernel, (0, 1)), (0, 1))
            )
            kernel = kernel * (g / _l2norm(kernel, (0, 1)))
        bias = (
            self.param("bias", torch_conv_kernel_init(fan_in), (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel, bias = self.weights(x.shape[-1])
        return _apply_conv1d(
            x, kernel, bias,
            stride=self.stride, padding=self.padding, dilation=self.dilation,
            groups=self.groups, compute_dtype=self.compute_dtype,
        )


class WNConvTranspose1d(nn.Module):
    """ConvTranspose1d with torch padding semantics + optional weight norm.

    Params: 'kernel' (K, Cin, Cout) in torch orientation (unflipped) [+ 'g'
    (Cin,)].  torch weight_norm dim=0 on a (Cin, Cout, K) transposed-conv
    weight normalizes per *input* channel, i.e. over axes (K, Cout).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    weight_norm: bool = True
    compute_dtype: Any = None

    @nn.compact
    def weights(self, cin: int):
        """Create params and return the effective (kernel, bias) — weight
        norm applied; kernel (K, Cin, Cout) torch orientation.  Used by
        `__call__` and by the fused tail kernel (`ops/fused_tail.py`)."""
        fan_in = self.features * self.kernel_size  # torch fan_in for transpose
        kshape = (self.kernel_size, cin, self.features)
        kernel = self.param("kernel", torch_conv_kernel_init(fan_in), kshape)
        if self.weight_norm:
            # named 'gt' (not 'g') so converters can tell transpose-conv
            # weight norm (per input channel) from conv weight norm apart
            g = self.param(
                "gt", lambda rng: jnp.squeeze(_l2norm(kernel, (0, 2)), (0, 2))
            )
            kernel = kernel * (g[None, :, None] / _l2norm(kernel, (0, 2)))
        bias = (
            self.param("bias", torch_conv_kernel_init(fan_in), (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel, bias = self.weights(x.shape[-1])
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
            kernel = kernel.astype(self.compute_dtype)
            bias = bias.astype(self.compute_dtype) if bias is not None else None
        return conv_transpose1d(
            x,
            kernel,
            bias,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )


class CausalWNConv1d(nn.Module):
    """Causal conv: pad (k-1)*d on both sides, then keep the first T outputs
    (reference modules.py:273-294).  Inside MelGAN's causal ResidualStack the
    pad module is the stack's default ReflectionPad1d (modules.py:331,364),
    so `pad_mode="reflect"` is the default here."""

    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True
    weight_norm: bool = True
    pad_mode: str = "reflect"  # "reflect" | "constant"
    pad_value: float = 0.0
    compute_dtype: Any = None

    @nn.compact
    def weights(self, cin: int):
        return WNConv1d(
            self.features,
            self.kernel_size,
            dilation=self.dilation,
            use_bias=self.use_bias,
            weight_norm=self.weight_norm,
            compute_dtype=self.compute_dtype,
            name="conv",
        ).weights(cin)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel, bias = self.weights(x.shape[-1])
        pad = (self.kernel_size - 1) * self.dilation
        if self.pad_mode == "reflect":
            x = reflect_pad1d(x, (pad, pad))
        else:
            x = constant_pad1d(x, (pad, pad), self.pad_value)
        y = _apply_conv1d(
            x, kernel, bias, dilation=self.dilation,
            compute_dtype=self.compute_dtype,
        )
        return y[:, : x.shape[1] - 2 * pad, :]


class ResidualStack(nn.Module):
    """MelGAN residual stack (reference modules.py:320-382):
    leaky(0.2) -> reflect-pad -> dilated conv -> leaky(0.2) -> 1x1 conv,
    plus a 1x1 skip conv."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1
    use_bias: bool = True
    weight_norm: bool = True
    use_causal_conv: bool = False
    negative_slope: float = 0.2
    compute_dtype: Any = None

    @nn.compact
    def weights(self, cin: int):
        """Create this stack's params; return (k_d, b_d, k_1x1, b_1x1,
        k_skip, b_skip) effective weights — the form
        `ops/fused_resstack.py::fused_residual_stacks` consumes."""
        kw = dict(
            use_bias=self.use_bias,
            weight_norm=self.weight_norm,
            compute_dtype=self.compute_dtype,
        )
        if not self.use_causal_conv:
            kd, bd = WNConv1d(
                self.channels, self.kernel_size, dilation=self.dilation,
                name="conv_dilated", **kw,
            ).weights(cin)
        else:
            kd, bd = CausalWNConv1d(
                self.channels, self.kernel_size, dilation=self.dilation,
                use_bias=self.use_bias, weight_norm=self.weight_norm,
                compute_dtype=self.compute_dtype, name="conv_dilated",
            ).weights(cin)
        k1, b1 = WNConv1d(self.channels, 1, name="conv_1x1", **kw).weights(
            self.channels
        )
        ks, bs = WNConv1d(self.channels, 1, name="skip", **kw).weights(cin)
        return kd, bd, k1, b1, ks, bs

    def __call__(self, c: jnp.ndarray) -> jnp.ndarray:
        kd, bd, k1, b1, ks, bs = self.weights(c.shape[-1])
        dt = self.compute_dtype
        pad = (self.kernel_size - 1) * self.dilation
        h = leaky_relu(c, self.negative_slope)
        if not self.use_causal_conv:
            # stack_margin, not pad // 2: identical for odd kernels (the only
            # supported case, reference modules.py:352) but kept as the one
            # expression the fused-path gate and edge stitching also use
            h = reflect_pad1d(h, stack_margin(self.kernel_size, self.dilation))
            h = _apply_conv1d(h, kd, bd, dilation=self.dilation, compute_dtype=dt)
        else:
            # causal: reflect-pad (k-1)*d both sides, keep the first T
            # (reference modules.py:273-294,360-367)
            T = h.shape[1]
            h = reflect_pad1d(h, (pad, pad))
            h = _apply_conv1d(h, kd, bd, dilation=self.dilation, compute_dtype=dt)
            h = h[:, :T, :]
        h = leaky_relu(h, self.negative_slope)
        h = _apply_conv1d(h, k1, b1, compute_dtype=dt)
        skip = _apply_conv1d(c, ks, bs, compute_dtype=dt)
        return h + skip


def apply_residual_stacks(x, cfg, compute_dtype, stack_modules):
    """Run a stage's sequential ResidualStacks — fused into one Pallas
    program (`ops/fused_resstack.py`) for the inference graph at
    MXU-lane-filling widths, else via the standard modules."""
    from fastvocoder_tpu.ops.fused_resstack import (
        fused_residual_stacks,
        fused_stacks_mode,
        fused_train_mode,
        stack_margin,
        use_fused_stacks,
    )

    C = x.shape[-1]
    M = sum(stack_margin(m.kernel_size, m.dilation) for m in stack_modules)
    if use_fused_stacks(
        cfg.use_weight_norm, cfg.use_causal_conv, C, x.shape[1], M, x.shape[0]
    ):
        zero = jnp.zeros((C,), x.dtype)
        tuples = []
        for m in stack_modules:
            kd, bd, k1, b1, ks, bs = m.weights(C)
            tuples.append((
                kd, bd if bd is not None else zero, m.dilation,
                k1, b1 if b1 is not None else zero,
                ks, bs if bs is not None else zero,
            ))
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        mode = (
            fused_train_mode() if cfg.use_weight_norm else fused_stacks_mode()
        )
        # train path: the backward kernel holds weights + dW accumulators
        # (2x weight bytes — 7.9 MB at C=256) plus the f32 recompute of
        # the tile's intermediates; Qt=1024 overflows the 16 MB scoped
        # VMEM at reference geometry (measured OOM, 17.8 MB at C=256).
        # Scale the tile down with the row width: 512 rows at W<=128,
        # 256 at W=256.
        tile_q = (65536 // max(C, 128)) if cfg.use_weight_norm else 1024
        return fused_residual_stacks(
            x, tuples, tile_q=tile_q, interpret=mode == "interpret"
        )
    for m in stack_modules:
        x = m(x)
    return x


class ResBlock1(nn.Module):
    """HiFiGAN type-1 MRF block (reference modules.py:190-230)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    use_bias: bool = True
    weight_norm: bool = True
    compute_dtype: Any = None

    @nn.compact
    def weights(self, cin: int):
        """Create this block's params; return [(k1, b1, dilation, k2, b2)]
        effective weights per (dilated conv, dilation-1 conv) pair — the
        form `ops/fused_mrf.py::fused_mrf_stage` consumes."""
        kw = dict(
            use_bias=self.use_bias,
            weight_norm=self.weight_norm,
            compute_dtype=self.compute_dtype,
        )
        out = []
        for i, d in enumerate(self.dilations):
            k1, b1 = WNConv1d(
                self.channels, self.kernel_size, dilation=d,
                padding=(self.kernel_size * d - d) // 2, name=f"conv1_{i}", **kw,
            ).weights(cin)
            k2, b2 = WNConv1d(
                self.channels, self.kernel_size, dilation=1,
                padding=(self.kernel_size - 1) // 2, name=f"conv2_{i}", **kw,
            ).weights(self.channels)
            out.append((k1, b1, d, k2, b2))
        return out

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for k1, b1, d, k2, b2 in self.weights(x.shape[-1]):
            h = leaky_relu(x, LRELU_SLOPE)
            h = _apply_conv1d(
                h, k1, b1, padding=(self.kernel_size * d - d) // 2,
                dilation=d, compute_dtype=self.compute_dtype,
            )
            h = leaky_relu(h, LRELU_SLOPE)
            h = _apply_conv1d(
                h, k2, b2, padding=(self.kernel_size - 1) // 2,
                dilation=1, compute_dtype=self.compute_dtype,
            )
            x = x + h
        return x


class ResBlock2(nn.Module):
    """HiFiGAN type-2 MRF block (reference modules.py:233-252)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3)
    use_bias: bool = True
    weight_norm: bool = True
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            h = leaky_relu(x, LRELU_SLOPE)
            h = WNConv1d(
                self.channels, self.kernel_size, dilation=d,
                padding=(self.kernel_size * d - d) // 2,
                use_bias=self.use_bias, weight_norm=self.weight_norm,
                compute_dtype=self.compute_dtype, name=f"conv_{i}",
            )(h)
            x = x + h
        return x


class UpsampleLayer(nn.Module):
    """Nearest-neighbor temporal upsample + conv — the anti-checkerboard
    alternative to transposed conv (reference modules.py:135-177)."""

    features: int
    upsample_rate: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = True
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.repeat(x, self.upsample_rate, axis=1)
        return WNConv1d(
            self.features, self.kernel_size, stride=self.stride,
            padding=self.padding, use_bias=self.use_bias,
            weight_norm=self.weight_norm, compute_dtype=self.compute_dtype,
            name="conv",
        )(x)


class LastLayer(nn.Module):
    """activation -> reflect pad -> conv (reference modules.py:76-89)."""

    features: int
    kernel_size: int
    use_bias: bool = True
    weight_norm: bool = True
    negative_slope: float = 0.2
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = leaky_relu(x, self.negative_slope)
        x = reflect_pad1d(x, (self.kernel_size - 1) // 2)
        return WNConv1d(
            self.features, self.kernel_size, use_bias=self.use_bias,
            weight_norm=self.weight_norm, compute_dtype=self.compute_dtype,
            name="conv",
        )(x)


class LastLinear(nn.Module):
    """leaky(0.2) -> BN -> 1x1 -> leaky(0.2) -> BN -> 1x1
    (reference modules.py:116-132; unused by the shipped configs)."""

    hidden_channel: int
    out_channel: int
    use_bias: bool = True
    weight_norm: bool = True
    train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = leaky_relu(x, 0.2)
        x = nn.BatchNorm(use_running_average=not self.train, name="bn_1")(x)
        x = WNConv1d(self.hidden_channel, 1, use_bias=self.use_bias,
                     weight_norm=self.weight_norm, name="linear_1")(x)
        x = leaky_relu(x, 0.2)
        x = nn.BatchNorm(use_running_average=not self.train, name="bn_2")(x)
        x = WNConv1d(self.out_channel, 1, use_bias=self.use_bias,
                     weight_norm=self.weight_norm, name="linear_2")(x)
        return x


class BasisSignalLayer(nn.Module):
    """Frozen learned-basis decode: weights (B, F, C) @ basis (L, C)^T ->
    frames (B, F, L) -> 50%-overlap-add (reference modules.py:255-267).

    The basis matrix is a parameter (so it travels in checkpoints like the
    reference's ``basis_signal.layer.weight``) but is excluded from the
    generator optimizer (reference bin/train.py:329-331 freezes it).
    """

    L: int
    basis_init: Optional[np.ndarray] = None  # (L, C)
    in_features: int = 256

    @nn.compact
    def __call__(self, weight: jnp.ndarray) -> jnp.ndarray:
        if self.basis_init is not None:
            init = lambda rng: jnp.asarray(self.basis_init, dtype=jnp.float32)
        else:
            init = lambda rng: jnp.zeros((self.L, self.in_features), jnp.float32)
        basis = self.param("basis", init)
        # fused shift-matmul decode: no frames tensor, no overlap-add pass
        # (ops/basis_decode.py; == einsum + overlap_and_add numerically)
        from fastvocoder_tpu.ops.basis_decode import basis_decode

        return basis_decode(weight, basis)
