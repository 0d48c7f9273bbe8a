"""NHV — Neural Homomorphic Vocoder (flax, NTC).

The reference ships NHV as an EMPTY file (reference model/generator/nhv.py,
README.md:8 "NHV (TODO)"); this is a working implementation of the
architecture from Liu, Chen & Yu, "Neural Homomorphic Vocoder"
(Interspeech 2020), designed TPU-first:

  * source-filter model: a harmonic impulse train built from frame-level f0
    (cumulative-phase wrap detection over the upsampled f0 contour) plus a
    Gaussian noise source;
  * a CNN filter estimator predicts per-frame COMPLEX CEPSTRA for two
    linear time-varying (LTV) filters (harmonic + noise); the cepstra are
    exponentiated in the frequency domain (homomorphic: H = exp(DFT(c))),
    giving minimum-phase-free mixed-phase control of both magnitude and
    group delay;
  * LTV filtering runs as framed rFFT multiply + overlap-add (the
    scatter-free GCD-subframe OLA from ops/overlap_add.py) — no explicit
    convolutions at sample rate;
  * a final trainable FIR (delta-initialized) shapes the summed output.

Conditioning is a single (B, T, 81) tensor: 80 mel channels + f0 in Hz on
channel 80 (`dsp.f0.f0_to_condition`).  Packing f0 as a channel keeps the
entire training stack — MR-STFT + adversarial losses, the jitted GAN steps,
the DP mesh, batching — identical to the other generators.

Training: same recipe as the rest of the framework (MR-STFT reconstruction
+ MSD/MFD adversarial losses); the paper trains with multi-resolution STFT
loss + an adversarial loss, which this reproduces.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fastvocoder_tpu.hparams import NHVConfig
from fastvocoder_tpu.models.layers import WNConv1d, leaky_relu
from fastvocoder_tpu.ops.overlap_add import overlap_and_add


def impulse_train(f0: jnp.ndarray, hop: int, sample_rate: int) -> jnp.ndarray:
    """f0 (B, T) Hz (0 = unvoiced) -> impulse train (B, T * hop).

    The frame-level contour is linearly interpolated to sample rate, phase
    is accumulated, and an impulse fires on every 2*pi wrap.  Positions are
    a function of the (input) f0 only, so non-differentiability is harmless.
    """
    B, T = f0.shape
    n = T * hop
    # linear interpolation of the frame contour to sample rate
    pos = jnp.arange(n) / hop  # frame coordinate of each sample
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 1)
    i1 = jnp.clip(i0 + 1, 0, T - 1)
    frac = pos - i0
    f0_up = f0[:, i0] * (1.0 - frac) + f0[:, i1] * frac  # (B, n)

    phase = jnp.cumsum(f0_up / sample_rate, axis=1)
    wraps = jnp.floor(phase)
    fired = jnp.concatenate(
        [wraps[:, :1] > 0, wraps[:, 1:] > wraps[:, :-1]], axis=1
    )
    # voiced gating comes free: unvoiced spans advance no phase
    return fired.astype(jnp.float32)


class FilterEstimator(nn.Module):
    """Mel (B, T, n_mels) -> complex cepstra (B, T, 2 * ccep_size):
    [:ccep_size] harmonic filter, [ccep_size:] noise filter."""

    channels: int = 256
    n_layers: int = 3
    kernel_size: int = 3
    ccep_size: int = 222
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        h = mel
        for i in range(self.n_layers):
            h = WNConv1d(
                self.channels, self.kernel_size,
                padding=(self.kernel_size - 1) // 2,
                compute_dtype=self.compute_dtype, name=f"conv_{i}",
            )(h)
            h = leaky_relu(h, 0.2)
        out = WNConv1d(
            2 * self.ccep_size, 1, compute_dtype=self.compute_dtype,
            name="conv_out",
        )(h)
        # small output scale at init keeps exp(DFT(c)) near unity gain
        return 0.1 * out.astype(jnp.float32)


class NHVGenerator(nn.Module):
    """cond (B, T, 81) = [mel (80) | f0 Hz (1)] -> wav (B, T * hop)."""

    cfg: NHVConfig
    compute_dtype: Any = None

    def _ltv_filter(
        self, source: jnp.ndarray, ccep: jnp.ndarray
    ) -> jnp.ndarray:
        """LTV filtering of a sample-rate source by per-frame complex
        cepstra: frame -> window -> rFFT -> * exp(rFFT(ccep)) -> irFFT ->
        overlap-add.  source (B, n), ccep (B, T, Q) -> (B, n)."""
        cfg = self.cfg
        hop, win, nfft = cfg.hop_size, cfg.win_length, cfg.fft_size
        B, n = source.shape
        T = ccep.shape[1]

        pad = win // 2
        src = jnp.pad(source, ((0, 0), (pad, pad + win)))
        idx = (jnp.arange(T) * hop)[:, None] + jnp.arange(win)[None, :]
        frames = src[:, idx]  # (B, T, win)
        window = jnp.hanning(win).astype(frames.dtype)
        spec = jnp.fft.rfft(frames * window, nfft, axis=-1)  # (B, T, nfft/2+1)

        # homomorphic filter response: H = exp(DFT(ccep)) on the rfft grid;
        # the log-magnitude (real part) is clamped so a bad training step
        # cannot overflow exp (|H| <= e^8 ~ 54 dB of gain)
        logH = jnp.fft.rfft(ccep, nfft, axis=-1)
        logH = jax.lax.complex(jnp.clip(logH.real, -30.0, 8.0), logH.imag)
        H = jnp.exp(logH)
        y = jnp.fft.irfft(spec * H, nfft, axis=-1)  # (B, T, nfft)
        out = overlap_and_add(y, hop)  # (B, (T-1)*hop + nfft)
        return out[:, pad : pad + n]

    @nn.compact
    def __call__(self, cond: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        if cond.shape[-1] != cfg.in_channels + 1:
            raise ValueError(
                f"NHV conditioning must be (B, T, {cfg.in_channels + 1}) = "
                f"mel + f0 channel (dsp.f0.f0_to_condition); got "
                f"{cond.shape} — a plain mel would silently read band "
                f"{cfg.in_channels - 1} as f0"
            )
        mel, f0 = cond[..., : cfg.in_channels], cond[..., cfg.in_channels]
        B, T = f0.shape

        ccep = FilterEstimator(
            channels=cfg.channels, n_layers=cfg.n_layers,
            kernel_size=cfg.kernel_size, ccep_size=cfg.ccep_size,
            compute_dtype=self.compute_dtype, name="filter_estimator",
        )(mel)
        ccep_h, ccep_n = ccep[..., : cfg.ccep_size], ccep[..., cfg.ccep_size :]

        harm_src = impulse_train(f0, cfg.hop_size, cfg.sample_rate)
        if self.has_rng("noise"):
            key = self.make_rng("noise")
        else:  # deterministic inference
            key = jax.random.PRNGKey(0)
        noise_src = 0.3 * jax.random.normal(
            key, harm_src.shape, jnp.float32
        )

        wav = self._ltv_filter(harm_src, ccep_h) + self._ltv_filter(
            noise_src, ccep_n
        )

        # final trainable FIR, delta-initialized (identity at init)
        k = cfg.fir_taps
        delta = np.zeros((k, 1, 1), np.float32)
        delta[k // 2, 0, 0] = 1.0
        fir = self.param("fir", lambda rng: jnp.asarray(delta))
        out = jax.lax.conv_general_dilated(
            wav[..., None], fir, (1,), [(k // 2, (k - 1) // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )[..., 0]
        return out

    def inference(self, cond: jnp.ndarray) -> jnp.ndarray:
        return self(cond)
