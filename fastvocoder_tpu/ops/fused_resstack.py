"""Fused MelGAN/Basis-MelGAN residual-stack chain — one Pallas program per
upsample stage.

A MelGAN-family stage runs `stacks` sequential ResidualStacks (reference
model/generator/melgan.py:89-102, modules.py:320-382), each =
leaky(0.2) -> reflect-pad -> dilated conv k3 -> leaky(0.2) -> 1x1 conv,
plus a 1x1 skip — ~6 full-tensor HBM passes per stack on long waveform-rate
tensors.  At the trunk widths (C = 128/256) the channels already fill the
MXU lanes, so unlike the HiFiGAN MRF kernel (`ops/fused_mrf.py`) no blocked
layout is needed: the whole 3-stack chain runs from VMEM in the sample
domain, each conv tap a (tile, C) @ (C, C) dot, one read + one write of the
stage tensor.

Reflect padding does NOT commute through a fused chain (each stack mirrors
its OWN input at the sequence edges), so exactness comes from edge
stitching instead of in-kernel mirrors: the kernel computes the pure
valid-convolution interior (rows [M, T-M), M = sum of per-stack margins),
and the M-row sequence edges are computed by the standard functional chain
on 4M-sample slices — cheap, and bit-matching the module path.  The
concatenation is exact (tests/test_fused_resstack.py).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from fastvocoder_tpu.ops.conv import conv1d, reflect_pad1d

_HALO_ROWS = 32  # one halo block; must be >= 2*M and a multiple of 8


_fallback_warned = set()


def _warn_fallback(msg: str):
    """One warning per distinct reason (trace time only, not per step)."""
    if msg not in _fallback_warned:
        _fallback_warned.add(msg)
        import logging

        logging.getLogger(__name__).warning(msg)


def fused_stacks_mode() -> str:
    """FASTVOCODER_FUSED_STACKS: "auto" (default; Pallas kernel on TPU),
    "1" (force compiled), "interpret" (CPU tests), "0" (off)."""
    import os

    return os.environ.get("FASTVOCODER_FUSED_STACKS", "auto")


def fused_train_mode() -> str:
    """FASTVOCODER_FUSED_TRAIN: route the TRAINING graph (weight_norm form)
    through the fused chain — its interior op carries a hand-written
    backward kernel (custom_vjp below).  "auto" (default: on when the
    backend is a real TPU — measured 1.42x faster hifigan-light GAN steps,
    1.15x melgan, docs/PERF.md), "1" (force on), "interpret" (CPU tests),
    "0" (off)."""
    import os

    return os.environ.get("FASTVOCODER_FUSED_TRAIN", "auto")


def fused_train_on() -> bool:
    """Whether the training graph should route through the fused kernels."""
    m = fused_train_mode()
    if m == "auto":
        return jax.default_backend() == "tpu"
    return m in ("1", "interpret")


def use_fused_stacks(
    weight_norm: bool, use_causal: bool, C: int, T, M: int, batch=1
) -> bool:
    """Gate: non-causal reflect semantics, MXU-lane-filling widths, and
    room for the edge slices.  The weight_norm (training) form routes to
    the same kernel only under FASTVOCODER_FUSED_TRAIN — the interior op
    has a custom-VJP backward kernel, and effective g*v/|v| kernels are
    differentiable XLA code outside the Pallas call.

    Batch-1 only under "auto": measured on v5e (basis-melgan light,
    585-frame utterances) the kernel wins single-utterance latency 1.21x
    (2.04 -> 1.69 ms/utt) but loses batched throughput ~10% at batch 32
    (15.4 -> 16.8 ms) — at C=256 the XLA convs are already MXU-bound and
    better pipelined; the same latency/throughput crossover as
    `ops/basis_decode.py`.  Narrow stages (C = 32/64) run in the blocked
    (B, Q, s*C=128) layout like ops/fused_mrf.py."""
    if weight_norm:
        if not fused_train_on() or use_causal:
            return False
        if C not in (32, 64, 128, 256):
            return False
        if not isinstance(T, int) or T < 16 * max(M, 1) or 2 * M > _HALO_ROWS:
            return False
        if C < 128 and T % (128 // C) != 0:
            # otherwise-eligible training chain losing the fused step is a
            # silent perf cliff — say so once
            _warn_fallback(
                f"fused residual-stack training chain skipped: C={C} needs "
                f"T % {128 // C} == 0 (got T={T}); pick a fixed_length "
                "whose crops keep the chain aligned to recover the fused "
                "train step"
            )
            return False
        return True
    mode = fused_stacks_mode()
    if mode == "0" or weight_norm or use_causal or C not in (32, 64, 128, 256):
        return False
    if not isinstance(T, int) or T < 16 * max(M, 1) or 2 * M > _HALO_ROWS:
        return False
    if mode == "auto" and (batch != 1 or jax.default_backend() != "tpu"):
        return False
    if C < 128 and T % (128 // C) != 0:
        # every other gate passed: the chain would have run fused but for
        # the sequence alignment
        _warn_fallback(
            f"fused residual-stack chain skipped: C={C} needs "
            f"T % {128 // C} == 0 (got T={T}); bucket mel lengths to keep "
            "the fast path"
        )
        return False
    return True


def _leaky(x, slope=0.2):
    # f32 compare: Mosaic rejects bf16 comparisons on v5e
    x32 = x.astype(jnp.float32)
    return jnp.where(x32 >= 0, x32, x32 * slope).astype(x.dtype)


def stack_margin(kernel_size: int, dilation: int) -> int:
    return (kernel_size - 1) // 2 * dilation


def _std_chain(x: jnp.ndarray, stacks) -> jnp.ndarray:
    """The reference-semantics functional chain (reflect pads per stack) —
    used for the sequence-edge slices."""
    h = x
    for kd, bd, d, k1, b1, ks, bs in stacks:
        t = _leaky(h)
        t = reflect_pad1d(t, stack_margin(kd.shape[0], d))
        t = conv1d(t, kd, bd, dilation=d)
        t = _leaky(t)
        t = conv1d(t, k1, b1)
        h = t + conv1d(h, ks, bs)
    return h


def _chain_kernel(stacks_meta, Qt: int, dtype, center_ref, halo_ref, *refs):
    """Valid-convolution chain over one VMEM tile (no padding semantics at
    all — edges are handled by the XLA-side stitching).

    stacks_meta rows are (left, right) margins per dilated conv IN ROWS of
    the tile — samples for the plain layout, blocks for the blocked one;
    the dilated weight ref carries the per-tap stride in its leading dim
    (K taps spaced d rows apart in the plain layout; Wq consecutive rows
    blocked)."""
    n = len(stacks_meta)
    w_refs = refs[: 6 * n]
    out_ref = refs[6 * n]

    h = jnp.concatenate([center_ref[0], halo_ref[0]], axis=0)  # (Qt+32, C)
    ref_i = 0
    for left, right, tap_stride in stacks_meta:
        kd, bd = w_refs[ref_i], w_refs[ref_i + 1]
        k1, b1 = w_refs[ref_i + 2], w_refs[ref_i + 3]
        ks, bs = w_refs[ref_i + 4], w_refs[ref_i + 5]
        ref_i += 6
        t = _leaky(h)
        Lo = t.shape[0] - left - right
        acc = None
        for j in range(kd.shape[0]):
            part = jnp.dot(
                t[j * tap_stride : j * tap_stride + Lo], kd[j],
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        t = (acc + bd[:]).astype(dtype)
        t = _leaky(t)
        t = (
            jnp.dot(t, k1[0], preferred_element_type=jnp.float32) + b1[:]
        ).astype(dtype)
        sk = (
            jnp.dot(
                h[left : left + Lo], ks[0], preferred_element_type=jnp.float32
            )
            + bs[:]
        ).astype(dtype)
        h = t + sk
    out_ref[0] = h[:Qt]


# ---------------------------------------------------------------------------
# Interior op with a hand-written backward kernel (custom_vjp)
# ---------------------------------------------------------------------------


def _run_interior_fwd(xp, flat, meta, Qt, interpret):
    """The forward Pallas call (valid chain over tiles).  xp rows must be
    nQ * Qt + _HALO_ROWS; returns the (B, nQ*Qt, W) out buffer."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, R, W = xp.shape
    nQ = (R - _HALO_ROWS) // Qt
    dtype = xp.dtype
    kernel = functools.partial(_chain_kernel, meta, Qt, dtype)
    w_specs = [
        pl.BlockSpec(
            w.shape, lambda b, q, n=w.ndim: (0,) * n, memory_space=pltpu.VMEM
        )
        for w in flat
    ]
    r = Qt // _HALO_ROWS
    return pl.pallas_call(
        kernel,
        grid=(B, nQ),
        in_specs=[
            pl.BlockSpec(
                (1, Qt, W), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, _HALO_ROWS, W),
                lambda b, q: (b, q * r + r, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + w_specs,
        out_specs=pl.BlockSpec(
            (1, Qt, W), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, nQ * Qt, W), dtype),
        interpret=interpret,
    )(xp, xp, *flat)


def _chain_bwd_kernel(
    stacks_meta, Qt: int, g_ref, center_ref, halo_ref, *refs
):
    """Backward of the valid chain over one tile, all in f32 from VMEM.

    Recomputes the forward intermediates from the x tile (center + the
    following _HALO_ROWS, exactly the forward's inputs), then runs the
    adjoint chain from the tile's own g rows.  dx rows [0, Qt) are complete
    for this tile; rows [Qt, Qt+_HALO_ROWS) are the RIGHT CARRY — they
    belong to the next tile's center and are summed in XLA afterwards
    (out rows only ever reach x rows to their right in this convention).
    dW is accumulated across the sequential TPU grid (init on the first
    iteration)."""
    from jax.experimental import pallas as pl

    n = len(stacks_meta)
    w_refs = refs[: 6 * n]
    dx_ref = refs[6 * n]
    carry_ref = refs[6 * n + 1]
    dw_refs = refs[6 * n + 2 :]

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    x = jnp.concatenate([center_ref[0], halo_ref[0]], axis=0).astype(
        jnp.float32
    )  # (E, W)

    # forward recompute, keeping per-stack inputs and pre-activation t2
    hs, t2s = [], []
    h = x
    for (left, right, ts_), i in zip(stacks_meta, range(n)):
        kd = w_refs[6 * i][...].astype(jnp.float32)
        bd = w_refs[6 * i + 1][...].astype(jnp.float32)
        k1 = w_refs[6 * i + 2][...].astype(jnp.float32)
        b1 = w_refs[6 * i + 3][...].astype(jnp.float32)
        ks = w_refs[6 * i + 4][...].astype(jnp.float32)
        bs = w_refs[6 * i + 5][...].astype(jnp.float32)
        hs.append(h)
        t1 = _leaky(h)
        Lo = h.shape[0] - left - right
        acc = None
        for j in range(kd.shape[0]):
            part = jnp.dot(
                t1[j * ts_ : j * ts_ + Lo], kd[j],
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        t2 = acc + bd
        t2s.append(t2)
        h = (
            jnp.dot(_leaky(t2), k1[0], preferred_element_type=jnp.float32)
            + b1
            + jnp.dot(h[left : left + Lo], ks[0], preferred_element_type=jnp.float32)
            + bs
        )

    def lmask(v, slope=0.2):
        return jnp.where(v >= 0, 1.0, slope)

    # adjoint chain; dh starts as g on the tile's out rows, zero beyond
    g = g_ref[0].astype(jnp.float32)  # (Qt, W)
    dh = jnp.pad(g, ((0, h.shape[0] - Qt), (0, 0)))
    dws = []
    for i in reversed(range(n)):
        left, right, ts_ = stacks_meta[i]
        kd = w_refs[6 * i][...].astype(jnp.float32)
        k1 = w_refs[6 * i + 2][...].astype(jnp.float32)
        ks = w_refs[6 * i + 4][...].astype(jnp.float32)
        h_in = hs[i]
        t2 = t2s[i]
        Lh = h_in.shape[0]
        Lo = Lh - left - right
        d_out = dh  # (Lo, W)
        t1 = _leaky(h_in)
        t3 = _leaky(t2)

        dk1 = jnp.dot(t3.T, d_out, preferred_element_type=jnp.float32)[None]
        db1 = jnp.sum(d_out, axis=0)[None]
        dt2 = jnp.dot(
            d_out, k1[0].T, preferred_element_type=jnp.float32
        ) * lmask(t2)
        dkd = jnp.stack([
            jnp.dot(
                t1[j * ts_ : j * ts_ + Lo].T, dt2,
                preferred_element_type=jnp.float32,
            )
            for j in range(kd.shape[0])
        ])
        dbd = jnp.sum(dt2, axis=0)[None]
        dks = jnp.dot(
            h_in[left : left + Lo].T, d_out, preferred_element_type=jnp.float32
        )[None]
        dbs = jnp.sum(d_out, axis=0)[None]

        dt1 = None
        for j in range(kd.shape[0]):
            part = jnp.pad(
                jnp.dot(dt2, kd[j].T, preferred_element_type=jnp.float32),
                ((j * ts_, Lh - j * ts_ - Lo), (0, 0)),
            )
            dt1 = part if dt1 is None else dt1 + part
        dh = dt1 * lmask(h_in) + jnp.pad(
            jnp.dot(d_out, ks[0].T, preferred_element_type=jnp.float32),
            ((left, right), (0, 0)),
        )
        dws = [dkd, dbd, dk1, db1, dks, dbs] + dws

    dx_ref[0] = dh[:Qt].astype(dx_ref.dtype)
    carry_ref[0] = dh[Qt:].astype(carry_ref.dtype)

    @pl.when(first)
    def _init():
        for ref, val in zip(dw_refs, dws):
            ref[...] = val.astype(ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _accum():
        for ref, val in zip(dw_refs, dws):
            ref[...] += val.astype(ref.dtype)


def _run_interior_bwd(xp, flat, g_buf, meta, Qt, interpret):
    """Backward Pallas call: returns (dxp, dflat) for the interior op."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, R, W = xp.shape
    nQ = (R - _HALO_ROWS) // Qt
    r = Qt // _HALO_ROWS
    kernel = functools.partial(_chain_bwd_kernel, meta, Qt)
    w_specs = [
        pl.BlockSpec(
            w.shape, lambda b, q, n=w.ndim: (0,) * n, memory_space=pltpu.VMEM
        )
        for w in flat
    ]
    dw_specs = [
        pl.BlockSpec(
            w.shape, lambda b, q, n=w.ndim: (0,) * n, memory_space=pltpu.VMEM
        )
        for w in flat
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(B, nQ),
        in_specs=[
            pl.BlockSpec(  # cotangent, this tile's out rows
                (1, Qt, W), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(  # x center
                (1, Qt, W), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(  # x right halo
                (1, _HALO_ROWS, W),
                lambda b, q: (b, q * r + r, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + w_specs,
        out_specs=[
            pl.BlockSpec(
                (1, Qt, W), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, _HALO_ROWS, W),
                lambda b, q: (b, q, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + dw_specs,
        out_shape=[
            jax.ShapeDtypeStruct((B, nQ * Qt, W), jnp.float32),
            jax.ShapeDtypeStruct((B, nQ * _HALO_ROWS, W), jnp.float32),
        ]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat],
        interpret=interpret,
    )(g_buf, xp, xp, *flat)

    main, carry = outs[0], outs[1]
    dflat = tuple(
        d.astype(w.dtype) for d, w in zip(outs[2:], flat)
    )
    # fold the right carries into the next tile's center rows; the last
    # tile's carry covers xp's trailing _HALO_ROWS rows
    main = main.reshape(B, nQ, Qt, W)
    carry = carry.reshape(B, nQ, _HALO_ROWS, W)
    main = main.at[:, 1:, :_HALO_ROWS].add(carry[:, :-1])
    dxp = jnp.concatenate(
        [main.reshape(B, nQ * Qt, W), carry[:, -1]], axis=1
    ).astype(xp.dtype)
    return dxp, dflat


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _chain_interior(xp, flat, meta, Qt, interpret):
    """Differentiable fused interior: valid-convolution residual-stack
    chain over row tiles.  meta/Qt/interpret are static; flat is the tuple
    of (possibly blocked) effective conv weights."""
    return _run_interior_fwd(xp, flat, meta, Qt, interpret)


def _chain_interior_fwd(xp, flat, meta, Qt, interpret):
    return _run_interior_fwd(xp, flat, meta, Qt, interpret), (xp, flat)


def _chain_interior_bwd(meta, Qt, interpret, res, g):
    xp, flat = res
    dxp, dflat = _run_interior_bwd(xp, flat, g, meta, Qt, interpret)
    return dxp, dflat


_chain_interior.defvjp(_chain_interior_fwd, _chain_interior_bwd)


def fused_residual_stacks(
    x: jnp.ndarray,
    stacks: Sequence[Tuple[jnp.ndarray, jnp.ndarray, int, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    tile_q: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply a sequential ResidualStack chain to x (B, T, C).

    stacks: per stack (k_dilated (K,C,C), b_d (C,), dilation, k_1x1 (1,C,C),
    b_1 (C,), k_skip (1,C,C), b_s (C,)) — effective (weight-norm applied)
    kernels.  Exact module-path semantics (reflect pads per stack) via
    interior kernel + standard-chain edges.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, C = x.shape
    dtype = x.dtype

    stacks = [
        tuple(w.astype(dtype) if hasattr(w, "astype") else w for w in s)
        for s in stacks
    ]

    # row space: samples for lane-filling widths; for narrow stages view
    # (B, Q, s*C=128) blocks and turn the convs into block-Toeplitz dense
    # convs (same trick as ops/fused_mrf.py — exact taps, reordered sums)
    meta = []
    flat = []
    if C >= 128:
        s = 1
        xr = x
        for kd, bd, d, k1, b1, ks, bs in stacks:
            m = stack_margin(kd.shape[0], d)
            meta.append((m, m, d))
            flat += [kd, bd[None, :], k1, b1[None, :], ks, bs[None, :]]
    else:
        from fastvocoder_tpu.ops.fused_mrf import (
            blocked_conv_weight,
            conv_margins,
        )

        s = 128 // C
        assert s * C == 128 and T % s == 0, (C, T)
        xr = x.reshape(B, T // s, 128)
        for kd, bd, d, k1, b1, ks, bs in stacks:
            off, right_m = conv_margins(kd.shape[0], d, s)
            meta.append((off, right_m, 1))
            flat += [
                blocked_conv_weight(kd, d, s), jnp.tile(bd, s)[None, :],
                blocked_conv_weight(k1, 1, s), jnp.tile(b1, s)[None, :],
                blocked_conv_weight(ks, 1, s), jnp.tile(bs, s)[None, :],
            ]

    a_tot = sum(m[0] for m in meta)
    b_tot = sum(m[1] for m in meta)
    left_n = a_tot * s  # samples the interior misses on each side
    right_n = b_tot * s
    M = sum(stack_margin(kd.shape[0], d) for kd, _, d, *_ in stacks)
    # edge slice length: rows [0, left_n) are exact as long as they sit
    # more than the receptive+reflect reach (2M) from the slice's far edge
    L0 = max(left_n, right_n) + 3 * M
    assert a_tot + b_tot <= _HALO_ROWS and T >= L0, (M, T)

    # sequence edges: the standard chain (reflect pads per stack) on slices
    left = _std_chain(x[:, :L0], stacks)[:, :left_n]
    right = _std_chain(x[:, -L0:], stacks)[:, -right_n:]

    # interior: valid chain, tiled over rows
    Ti = xr.shape[1] - a_tot - b_tot
    Qt = min(tile_q, -(-Ti // 8) * 8)
    Qt = max(_HALO_ROWS, (Qt // _HALO_ROWS) * _HALO_ROWS)
    nQ = -(-Ti // Qt)
    pad_rows = nQ * Qt + _HALO_ROWS - xr.shape[1]
    xp = jnp.pad(xr, ((0, 0), (0, max(0, pad_rows)), (0, 0)))

    out = _chain_interior(xp, tuple(flat), tuple(meta), Qt, interpret)
    interior = out[:, :Ti].reshape(B, Ti * s, C)

    return jnp.concatenate([left, interior, right], axis=1)
