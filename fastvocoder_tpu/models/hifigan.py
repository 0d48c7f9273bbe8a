"""HiFiGAN generator (flax, NTC).

Architecture parity with reference model/generator/hifigan.py:13-129:
conv_pre k=7 -> per upsample stage: LeakyReLU(0.1) + [ConvTranspose1d |
nearest-interp UpsampleLayer] + MRF (mean of num_kernels ResBlocks) ->
LeakyReLU(default 0.01, hifigan.py:104) + conv_post k=7 + tanh.
Channel width halves per stage: upsample_initial_channel // 2**(i+1).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvocoder_tpu.hparams import HiFiGANConfig
from fastvocoder_tpu.models.layers import (
    LRELU_SLOPE,
    ResBlock1,
    ResBlock2,
    UpsampleLayer,
    WNConv1d,
    WNConvTranspose1d,
    leaky_relu,
)


from fastvocoder_tpu.ops.fused_resstack import _warn_fallback


def _fused_mrf_mode() -> str:
    """FASTVOCODER_FUSED_MRF: "auto" (default; Pallas kernel on TPU),
    "1" (force compiled kernel), "interpret" (force interpreter — CPU
    tests), "0" (off)."""
    return os.environ.get("FASTVOCODER_FUSED_MRF", "auto")


def _use_fused_mrf(cfg: HiFiGANConfig, weight_norm: bool, ch: int, T, batch=2) -> bool:
    """Fuse an MRF stage (ops/fused_mrf.py) when it is the inference-form
    graph (weight_norm=False — Pallas has no autodiff; training keeps the
    standard path), the stage is narrow enough to block into 128 lanes, and
    the backend can run the kernel.

    Auto-mode width policy (all measured on v5e, device-timed):
      * batch >= 2 (serving): C in {16, 32, 64, 128} + tail — C=256 is a
        whole-model loss at batch 32 (tools/sweep_fused_widths.py).
      * batch == 1 (sequential RTF): EVERY width + tail — at queue depth 1
        dispatch and HBM round-trips dominate, so whole-network fusion wins
        2.3-2.5x whole-model (tools/diag_hifigan_large.py, round 3); the
        older partial-fusion batch-1 regression (hifigan-large 10.0 -> 11.7
        ms/utt) only occurs when SOME stages stay un-fused."""
    if weight_norm:
        # training form: routes through the same kernel via the interior
        # op's custom-VJP backward (ops/fused_mrf.py::_mrf_interior) when
        # FASTVOCODER_FUSED_TRAIN asks for it; effective weight-norm
        # kernels are differentiable XLA outside the Pallas call
        from fastvocoder_tpu.ops.fused_resstack import fused_train_on

        if not fused_train_on():
            return False
        # C>=32 backward runs one parallel branch per Pallas call (the
        # weights + their f32 dW would otherwise exceed the
        # _BWD_WEIGHT_BUDGET against the 16 MB scoped VMEM limit); only
        # C=16 runs the whole-stage backward — see
        # ops/fused_mrf.py::_mrf_interior_bwd
        if cfg.resblock_type != "1" or ch not in (16, 32, 64, 128):
            return False
        if not isinstance(T, int):
            return False
        if ch < 128 and T % (128 // ch) != 0:
            # an otherwise-eligible training stage quietly losing the fused
            # step (the measured 1.42x) is the same silent perf cliff as in
            # inference — say so once
            _warn_fallback(
                f"fused MRF training stage skipped: C={ch} needs "
                f"T % {128 // ch} == 0 (got T={T}); pick a fixed_length "
                "whose wav crop keeps the stage aligned to recover the "
                "fused train step"
            )
            return False
        return True
    mode = _fused_mrf_mode()
    if mode == "0" or cfg.resblock_type != "1":
        return False
    if ch not in (16, 32, 64, 128, 256) or not isinstance(T, int):
        return False
    if ch == 256 and mode == "auto" and batch != 1:
        # measured on v5e (tools/sweep_fused_widths.py, batch 32 x 585
        # frames): the per-branch C=256 form LOSES ~5.6 ms whole-model on
        # hifigan-large (220.0 vs 214.5 ms un-fused) — 3 reads of x per
        # stage erase the fusion margin at 2-register row width.  C=128 is
        # neutral on time but ~35x closer to CPU-f32 than XLA's reduced-
        # precision conv lowering, so it stays.  Force with
        # FASTVOCODER_FUSED_MRF=1 to run C=256 fused anyway.
        #
        # batch==1 is the opposite regime (round 3 A/B, device-timed RTF
        # protocol, tools/diag_hifigan_large.py): fusing EVERY width + the
        # tail is hifigan-large 0.001816 -> 0.000788 (2.3x) and
        # hifigan-light 0.001065 -> 0.000429 (2.5x) — at queue depth 1 the
        # per-op dispatch + HBM round-trips dominate, so whole-network
        # fusion wins everywhere, C=256 included.
        return False
    if mode == "auto" and jax.default_backend() != "tpu":
        return False
    if ch < 128 and T % (128 // ch) != 0:
        # every other gate passed: the stage would have run fused but for
        # the sequence alignment — the silent perf cliff VERDICT flagged
        _warn_fallback(
            f"fused MRF stage skipped: C={ch} needs T % {128 // ch} == 0 "
            f"(got T={T}); bucket mel lengths (e.g. Synthesizer's "
            "64-frame buckets) to keep the fast path"
        )
        return False
    return True


def _fused_tail_mode() -> str:
    """FASTVOCODER_FUSED_TAIL: "auto" (default; Pallas on TPU), "1",
    "interpret" (CPU tests), "0" (off)."""
    return os.environ.get("FASTVOCODER_FUSED_TAIL", "auto")


def _use_fused_tail(cfg: HiFiGANConfig, weight_norm: bool, ch_in: int, u: int, T_in) -> bool:
    """Fold the final stage — leaky + ConvTranspose upsample + MRF +
    output head — into one Pallas program (ops/fused_tail.py).  Needs the
    row-aligned blocked layouts: s_out == u * s_in, i.e. the standard
    channel-halving stage with u == 2 (hifigan light and large)."""
    mode = _fused_tail_mode()
    if mode == "0" or weight_norm or cfg.resblock_type != "1":
        return False
    if not cfg.transposedconv or u != 2 or ch_in not in (32, 64):
        return False
    if not isinstance(T_in, int) or T_in % (128 // ch_in) != 0:
        return False
    if mode == "auto":
        return jax.default_backend() == "tpu"
    return True


class HiFiGANGenerator(nn.Module):
    cfg: HiFiGANConfig
    weight_norm: bool = True
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """(B, T, 80) -> (B, T * prod(rates)) wav, or (B, T', out_bands) when
        out_bands > 1 (multiband trunk; PQMF synthesis happens outside)."""
        x = self.trunk(mel)
        if self.cfg.out_bands == 1:
            return x[..., 0].astype(jnp.float32)
        return x.astype(jnp.float32)

    def trunk(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        kw = dict(
            use_bias=cfg.bias,
            weight_norm=self.weight_norm,
            compute_dtype=self.compute_dtype,
        )
        num_kernels = len(cfg.resblock_kernel_sizes)
        resblock = ResBlock1 if cfg.resblock_type == "1" else ResBlock2

        x = WNConv1d(
            cfg.upsample_initial_channel, 7, padding=3, name="conv_pre", **kw
        )(mel)

        n_up = len(cfg.upsample_rates)
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            if i == n_up - 1 and _use_fused_tail(
                cfg, self.weight_norm, x.shape[-1], u, x.shape[1]
            ):
                # whole final stage + output head in one Pallas program;
                # the longest tensor in the net never touches HBM
                from fastvocoder_tpu.ops.fused_tail import fused_hifigan_tail

                up_k, up_b = WNConvTranspose1d(
                    ch, kernel_size=k, stride=u,
                    padding=u // 2 + u % 2, output_padding=u % 2,
                    name=f"up_{i}", **kw,
                ).weights(x.shape[-1])
                rbs = [
                    ResBlock1(
                        channels=ch, kernel_size=rk, dilations=rd,
                        use_bias=cfg.bias, weight_norm=self.weight_norm,
                        compute_dtype=self.compute_dtype,
                        name=f"resblock_{i}_{j}",
                    ).weights(ch)
                    for j, (rk, rd) in enumerate(
                        zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
                    )
                ]
                if not cfg.bias:
                    zero = jnp.zeros((ch,), x.dtype)
                    rbs = [
                        [(k1, b1 if b1 is not None else zero, d,
                          k2, b2 if b2 is not None else zero)
                         for k1, b1, d, k2, b2 in pairs]
                        for pairs in rbs
                    ]
                post_k, post_b = WNConv1d(
                    cfg.out_bands, 7, padding=3, name="conv_post", **kw
                ).weights(ch)
                if self.compute_dtype is not None:
                    x = x.astype(self.compute_dtype)
                return fused_hifigan_tail(
                    x, up_k, up_b, u, u // 2 + u % 2, rbs, post_k, post_b,
                    interpret=_fused_tail_mode() == "interpret",
                )
            x = leaky_relu(x, LRELU_SLOPE)
            if cfg.transposedconv:
                x = WNConvTranspose1d(
                    ch, kernel_size=k, stride=u,
                    padding=u // 2 + u % 2, output_padding=u % 2,
                    name=f"up_{i}", **kw,
                )(x)
            else:
                x = UpsampleLayer(
                    ch, upsample_rate=u, kernel_size=k, stride=1,
                    padding=k // 2, name=f"up_{i}", **kw,
                )(x)
            if _use_fused_mrf(cfg, self.weight_norm, ch, x.shape[1], x.shape[0]):
                from fastvocoder_tpu.ops.fused_mrf import fused_mrf_stage

                rbs = [
                    ResBlock1(
                        channels=ch, kernel_size=rk, dilations=rd,
                        use_bias=cfg.bias, weight_norm=self.weight_norm,
                        compute_dtype=self.compute_dtype,
                        name=f"resblock_{i}_{j}",
                    ).weights(ch)
                    for j, (rk, rd) in enumerate(
                        zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
                    )
                ]
                if not cfg.bias:
                    zero = jnp.zeros((ch,), x.dtype)
                    rbs = [
                        [(k1, b1 if b1 is not None else zero, d,
                          k2, b2 if b2 is not None else zero)
                         for k1, b1, d, k2, b2 in pairs]
                        for pairs in rbs
                    ]
                if self.compute_dtype is not None:
                    x = x.astype(self.compute_dtype)
                if self.weight_norm:
                    from fastvocoder_tpu.ops.fused_resstack import (
                        fused_train_mode,
                    )

                    interp = fused_train_mode() == "interpret"
                    # the backward kernel holds weights + dW accumulators
                    # (2x weight bytes: 8.7 MB at C=16, 12.1 MB at C=32)
                    # plus an f32 recompute of ~18 tile-sized intermediates
                    # — Qt=512 measured 17.6 MB (over the 16 MB scoped
                    # VMEM); 256 rows fit both widths
                    tile_q = 256
                else:
                    interp = _fused_mrf_mode() == "interpret"
                    tile_q = 0  # auto (inference-tuned)
                x = fused_mrf_stage(x, rbs, tile_q=tile_q, interpret=interp)
            else:
                acc = None
                for j, (rk, rd) in enumerate(
                    zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
                ):
                    out = resblock(
                        channels=ch, kernel_size=rk, dilations=rd,
                        use_bias=cfg.bias, weight_norm=self.weight_norm,
                        compute_dtype=self.compute_dtype,
                        name=f"resblock_{i}_{j}",
                    )(x)
                    acc = out if acc is None else acc + out
                x = acc / num_kernels

        x = leaky_relu(x)  # default slope 0.01 (reference hifigan.py:104)
        x = WNConv1d(cfg.out_bands, 7, padding=3, name="conv_post", **kw)(x)
        return jnp.tanh(x)
