"""Fused HiFiGAN tail: upsample + final MRF stage + output head, one kernel.

The last HiFiGAN stage is the longest tensor in the network (T = 240
samples/frame at the final width C = 16/32) and, after `ops/fused_mrf.py`
fused the MRF itself, the remaining HBM round-trips of the tail are the
upsample materialization and the output head (leaky -> conv_post k=7 ->
tanh, reference model/generator/hifigan.py:97-106).  This kernel computes

    leaky(0.1) -> ConvTranspose1d(stride u) -> MRF -> leaky(0.01)
      -> conv_post -> tanh

from VMEM per tile: the (B, T, C) final-stage tensor is NEVER materialized
in HBM — the kernel reads the pre-upsample (B, T/u, 2C) tensor once and
writes the (B, T, out_bands) waveform once.

Row alignment makes this possible: in the blocked layout the pre-upsample
tensor (C_in = 2C, s_in = 128 / C_in rows) and the post-upsample tensor
(C, s = 128 / C) have the SAME number of rows whenever s == u * s_in —
true for the final u=2 stage of both hifigan-light (32 -> 16) and
hifigan-large (64 -> 32).  The transposed conv then becomes a short dense
conv over input rows with a block-Toeplitz weight (`blocked_upconv_weight`),
exactly like the dilated convs in `ops/fused_mrf.py`.

Edge semantics: the transposed conv and every conv in the chain zero-pad at
the sequence edges (torch semantics); halo rows outside [0, Q) are masked
to zero after each conv + bias, which reproduces that exactly.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastvocoder_tpu.ops.fused_mrf import (
    _leaky,
    blocked_conv_weight,
    conv_margins,
)


def blocked_upconv_weight(
    kernel: jnp.ndarray, stride: int, padding: int, s_in: int, s_out: int
) -> Tuple[jnp.ndarray, int, int]:
    """(K, Cin, Cout) transposed-conv kernel -> block-Toeplitz weight.

    Requires s_out == stride * s_in (row-aligned layouts).  Returns
    (W (Wj, s_in*Cin, s_out*Cout), off, right): out_row[q] =
    sum_j in_row[q + j - off] @ W[j], torch conv_transpose semantics
    (out[t] = sum_k in[(t + padding - k)/stride] @ kernel[k]).
    """
    K, Cin, Cout = kernel.shape
    assert s_out == stride * s_in, (s_out, stride, s_in)

    entries = []  # (j_blk, rin, rout, k)
    for rout in range(s_out):
        for k in range(K):
            num = rout + padding - k
            if num % stride:
                continue
            jpos = num // stride  # input-sample offset from q * s_in
            j_blk = jpos // s_in  # floor division (handles negatives)
            rin = jpos - j_blk * s_in
            entries.append((j_blk, rin, rout, k))
    jmin = min(e[0] for e in entries)
    jmax = max(e[0] for e in entries)
    Wj = jmax - jmin + 1

    w = np.zeros((Wj, s_in, s_out, K), np.float32)  # selector per tap
    for j_blk, rin, rout, k in entries:
        w[j_blk - jmin, rin, rout, k] = 1.0
    # W[j, rin*Cin + ci, rout*Cout + co] = sum_k sel * kernel[k, ci, co]
    wb = jnp.einsum("jiok,kcd->jicod", jnp.asarray(w), kernel)
    return wb.reshape(Wj, s_in * Cin, s_out * Cout), -jmin, jmax


def _tail_kernel(
    upsample_meta,  # (Wj, off_up, right_up)
    mrf_meta,       # per-resblock [(off1, right1, off2, right2), ...]
    post_meta,      # (Wp, off_p, right_p)
    Qt: int,
    H: int,
    Q_real: int,
    dtype,
    out_w: int,
    left_ref,
    center_ref,
    right_ref,
    *refs,
):
    """Pallas body: the whole tail from one (Qt + 2H)-row input tile."""
    from jax.experimental import pallas as pl

    n_mrf = sum(2 * len(pairs) for pairs in mrf_meta)
    wup, bup = refs[0], refs[1]
    w_refs = refs[2 : 2 + 2 * n_mrf]
    wpost, bpost = refs[2 + 2 * n_mrf], refs[3 + 2 * n_mrf]
    out_ref = refs[4 + 2 * n_mrf]

    qi = pl.program_id(1)

    def mask_rows(t, a_cum):
        row = jax.lax.broadcasted_iota(jnp.int32, (t.shape[0], 1), 0)
        g = qi * Qt - H + a_cum + row
        return jnp.where((g >= 0) & (g < Q_real), t, jnp.zeros_like(t))

    x = jnp.concatenate([left_ref[0], center_ref[0], right_ref[0]], axis=0)
    x = mask_rows(x, 0)
    x = _leaky(x, 0.1)  # pre-upsample activation (reference hifigan.py:35)

    # --- upsample: valid block conv with the transposed-conv weight ---
    Wj, off_up, _ = upsample_meta
    Lo = x.shape[0] - Wj + 1
    acc = None
    for j in range(Wj):
        part = jnp.dot(x[j : j + Lo], wup[j], preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    h = (acc + bup[:]).astype(dtype)
    a_cum = off_up
    h = mask_rows(h, a_cum)

    # --- MRF (same scheme as ops/fused_mrf.py::_mrf_kernel) ---
    # resblocks consume different total margins (k=3/7/11); crop each
    # output to the common aligned window [max_a, E - max_b)
    a_sums = [sum(o1 + o2 for o1, _, o2, _ in pairs) for pairs in mrf_meta]
    b_sums = [sum(r1 + r2 for _, r1, _, r2 in pairs) for pairs in mrf_meta]
    max_a, max_b = max(a_sums), max(b_sums)
    Lc = h.shape[0] - max_a - max_b
    macc = None
    ref_i = 0
    x0 = h
    for pairs, a_sum in zip(mrf_meta, a_sums):
        hh = x0
        a_r = 0
        for off1, right1, off2, right2 in pairs:
            w1, b1 = w_refs[ref_i], w_refs[ref_i + 1]
            w2, b2 = w_refs[ref_i + 2], w_refs[ref_i + 3]
            ref_i += 4
            t = _leaky(hh)
            Lt = t.shape[0] - w1.shape[0] + 1
            a1 = None
            for j in range(w1.shape[0]):
                p = jnp.dot(t[j : j + Lt], w1[j], preferred_element_type=jnp.float32)
                a1 = p if a1 is None else a1 + p
            t = (a1 + b1[:]).astype(dtype)
            t = mask_rows(t, a_cum + a_r + off1)
            t = _leaky(t)
            Lt2 = t.shape[0] - w2.shape[0] + 1
            a2 = None
            for j in range(w2.shape[0]):
                p = jnp.dot(t[j : j + Lt2], w2[j], preferred_element_type=jnp.float32)
                a2 = p if a2 is None else a2 + p
            t = (a2 + b2[:]).astype(dtype)
            t = mask_rows(t, a_cum + a_r + off1 + off2)
            a, bb = off1 + off2, right1 + right2
            hh = hh[a : hh.shape[0] - bb] + t
            a_r += a
        part = hh[max_a - a_sum : max_a - a_sum + Lc]
        macc = part if macc is None else macc + part
    h = (macc / len(mrf_meta)).astype(dtype)
    a_cum = a_cum + max_a

    # --- output head ---
    h = _leaky(h, 0.01)
    Wp, off_p, _ = post_meta
    Lo = h.shape[0] - Wp + 1
    acc = None
    for j in range(Wp):
        part = jnp.dot(h[j : j + Lo], wpost[j], preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    y = jnp.tanh(acc + bpost[:]).astype(dtype)
    a_cum = a_cum + off_p

    out_ref[0] = y[H - a_cum : H - a_cum + Qt]


def fused_hifigan_tail(
    x: jnp.ndarray,
    up_kernel: jnp.ndarray,
    up_bias: Optional[jnp.ndarray],
    stride: int,
    padding: int,
    resblocks: Sequence[Sequence[Tuple]],
    post_kernel: jnp.ndarray,
    post_bias: Optional[jnp.ndarray],
    tile_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (B, T_in, C_in) pre-upsample stage input -> (B, T_in*stride*?, out)
    waveform-rate output of leaky -> upsample -> MRF -> leaky -> conv_post
    -> tanh.  Requires (128 // C_out) == stride * (128 // C_in).

    resblocks: as `ops/fused_mrf.py::fused_mrf_stage` (effective kernels at
    C_out).  post_kernel (Kp, C_out, out_bands)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T_in, C_in = x.shape
    K, _, C_out = up_kernel.shape
    s_in = 128 // C_in
    s = 128 // C_out
    assert s == stride * s_in and s_in * C_in == 128, (C_in, C_out, stride)
    assert T_in % s_in == 0, (T_in, s_in)
    Q = T_in // s_in
    dtype = x.dtype
    out_bands = post_kernel.shape[-1]
    out_w = s * out_bands

    wup, off_up, right_up = blocked_upconv_weight(
        up_kernel.astype(dtype), stride, padding, s_in, s
    )
    if up_bias is None:
        up_bias = jnp.zeros((C_out,), dtype)
    flat = [wup, jnp.tile(up_bias.astype(dtype), s)[None, :]]

    mrf_meta = []
    for pairs in resblocks:
        pair_meta = []
        for k1, b1, d, k2, b2 in pairs:
            off1, right1 = conv_margins(k1.shape[0], d, s)
            off2, right2 = conv_margins(k2.shape[0], 1, s)
            pair_meta.append((off1, right1, off2, right2))
            flat += [
                blocked_conv_weight(k1.astype(dtype), d, s),
                jnp.tile(b1.astype(dtype), s)[None, :],
                blocked_conv_weight(k2.astype(dtype), 1, s),
                jnp.tile(b2.astype(dtype), s)[None, :],
            ]
        mrf_meta.append(pair_meta)

    # conv_post as a blocked conv (C_out -> out_bands; blocked_conv_weight
    # handles rectangular kernels)
    Kp = post_kernel.shape[0]
    off_p, right_p = conv_margins(Kp, 1, s)
    wpost = blocked_conv_weight(post_kernel.astype(dtype), 1, s)
    if post_bias is None:
        post_bias = jnp.zeros((out_bands,), dtype)
    flat += [wpost, jnp.tile(post_bias.astype(dtype), s)[None, :]]

    a_tot = off_up + max(
        sum(o1 + o2 for o1, _, o2, _ in pm) for pm in mrf_meta
    ) + off_p
    b_tot = right_up + max(
        sum(r1 + r2 for _, r1, _, r2 in pm) for pm in mrf_meta
    ) + right_p
    H = -(-max(a_tot, b_tot) // 8) * 8
    Qt = max(H, (min(tile_q, max(8, -(-Q // 8) * 8)) // H) * H)
    nQ = -(-Q // Qt)
    Qpad = nQ * Qt
    nH = Qpad // H

    xb = x.reshape(B, Q, 128)
    if Qpad != Q:
        xb = jnp.pad(xb, ((0, 0), (0, Qpad - Q), (0, 0)))

    kernel = functools.partial(
        _tail_kernel,
        (wup.shape[0], off_up, right_up),
        mrf_meta,
        (wpost.shape[0], off_p, right_p),
        Qt, H, Q, dtype, out_w,
    )
    w_specs = [
        pl.BlockSpec(
            w.shape, lambda b, q, n=w.ndim: (0,) * n, memory_space=pltpu.VMEM
        )
        for w in flat
    ]
    r = Qt // H
    x_specs = [
        pl.BlockSpec(
            (1, H, 128),
            lambda b, q: (b, jnp.maximum(q * r - 1, 0), 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, Qt, 128), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, H, 128),
            lambda b, q: (b, jnp.minimum(q * r + r, nH - 1), 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(B, nQ),
        in_specs=x_specs + w_specs,
        out_specs=pl.BlockSpec(
            (1, Qt, out_w), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Qpad, out_w), dtype),
        interpret=interpret,
    )(xb, xb, xb, *flat)
    # (B, Q, s * out_bands) rows -> (B, T_out, out_bands)
    out = out[:, :Q].reshape(B, Q * s, out_bands)
    return out
