"""4-band pseudo-QMF analysis/synthesis filterbank (JAX, NTC layout).

Same filter design as the reference (Kaiser-windowed sinc prototype,
taps=62, cutoff_ratio=0.142, beta=9.0 — reference model/generator/pqmf.py:15-48;
cosine-modulated banks pqmf.py:77-96) but the strided up/down sampling is
folded directly into the convolutions instead of the reference's separate
identity "updown_filter" convs (pqmf.py:99-135):

  * analysis  = one strided conv (stride = subbands)
  * synthesis = one lhs-dilated conv (XLA's native transposed-conv form)

Both are single `conv_general_dilated` calls that XLA maps onto the MXU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from scipy.signal.windows import kaiser


def design_prototype_filter(taps: int = 62, cutoff_ratio: float = 0.142, beta: float = 9.0) -> np.ndarray:
    """Kaiser-windowed sinc lowpass prototype, (taps + 1,)."""
    assert taps % 2 == 0, "The number of taps must be even."
    assert 0.0 < cutoff_ratio < 1.0

    omega_c = np.pi * cutoff_ratio
    n = np.arange(taps + 1) - 0.5 * taps
    with np.errstate(invalid="ignore"):
        h_i = np.sin(omega_c * n) / (np.pi * n)
    h_i[taps // 2] = cutoff_ratio  # sinc limit at n = 0

    return h_i * kaiser(taps + 1, beta)


class PQMF:
    """Stateless filterbank; filters are constants baked into the jaxpr."""

    def __init__(self, subbands: int = 4, taps: int = 62, cutoff_ratio: float = 0.142, beta: float = 9.0):
        h_proto = design_prototype_filter(taps, cutoff_ratio, beta)
        n = np.arange(taps + 1)
        h_analysis = np.zeros((subbands, taps + 1))
        h_synthesis = np.zeros((subbands, taps + 1))
        for k in range(subbands):
            mod = (2 * k + 1) * (np.pi / (2 * subbands)) * (n - taps / 2)
            h_analysis[k] = 2 * h_proto * np.cos(mod + (-1) ** k * np.pi / 4)
            h_synthesis[k] = 2 * h_proto * np.cos(mod - (-1) ** k * np.pi / 4)

        # NTC kernels: (K, Cin, Cout)
        self.analysis_kernel = jnp.asarray(
            h_analysis.T[:, None, :], dtype=jnp.float32
        )  # (taps+1, 1, subbands)
        self.synthesis_kernel = jnp.asarray(
            h_synthesis.T[:, :, None] * subbands, dtype=jnp.float32
        )  # (taps+1, subbands, 1); x subbands power compensation (reference pqmf.py:131-134)
        self.subbands = subbands
        self.taps = taps

    def analysis(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, 1) -> (B, T // subbands, subbands).

        Equivalent to the reference's pad + full-rate filter conv + stride-S
        identity conv (pqmf.py:108-119), fused into one strided conv.
        """
        return lax.conv_general_dilated(
            x,
            self.analysis_kernel.astype(x.dtype),
            window_strides=(self.subbands,),
            padding=[(self.taps // 2, self.taps // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            # full f32 multiplies: the filterbank is tiny but reconstruction
            # quality is bounded by it (bf16 MXU passes cost ~28 dB SNR here)
            precision=lax.Precision.HIGHEST,
        )

    def synthesis(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T // subbands, subbands) -> (B, T, 1).

        Equivalent to the reference's zero-stuffing conv_transpose followed by
        the synthesis filter conv (pqmf.py:121-135), lowered to the polyphase
        dense-conv form (ops/conv.py:upconv_polyphase): one stride-1 conv over
        the sub-band rate + depth-to-space — no multiplies against stuffed
        zeros (~4x fewer FLOPs than the lhs-dilated form, measured ~18ms ->
        <2ms per 585-frame utterance on TPU).
        """
        from fastvocoder_tpu.ops.conv import upconv_polyphase

        s = self.subbands
        p = self.taps // 2
        return upconv_polyphase(
            x,
            self.synthesis_kernel.astype(x.dtype),
            stride=s,
            pad_l=p,
            t_out=x.shape[1] * s,
            precision=lax.Precision.HIGHEST,
        )
