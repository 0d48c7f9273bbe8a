"""Fused HiFiGAN MRF stage — one Pallas kernel for all resblocks of a stage.

The reference computes the MRF as `sum_j ResBlock_j(x) / num_kernels` with
each ResBlock1 running 6 separate dilated convs (reference
model/generator/hifigan.py:97-103, modules.py:190-230).  At the late
generator stages the tensors are long and narrow (C = 16/32 at T up to
240 samples/frame), where every conv is an HBM round-trip: measured on
v5e, one stage-4 conv costs ~3.9 ms — the same as a bare elementwise pass
over the tensor (~287 GB/s effective bandwidth floor) — so an 18-conv MRF
stage pays ~18 full-tensor passes for ~0.3 TFLOP of math.

This kernel restructures the stage TPU-first:

  * **Blocked layout.**  (B, T, C) is viewed as (B, Q, s*C) with s = 128/C,
    a free row-major reshape.  Channels then fill the 128 MXU lanes exactly,
    and a dilated sample-domain conv becomes a short dense conv over blocks
    with block-Toeplitz weights (`blocked_conv_weight`): W3[j] is (s*C, s*C)
    and y_q = sum_j x_{q+j-off} @ W3[j].  Same taps per output sample —
    exact math, only the summation grouping changes.
  * **One pass over HBM.**  The kernel tiles Q; each tile arrives in VMEM
    as three pipelined BlockSpecs over the same input (center + H-row
    left/right halo blocks, ~1.05x traffic), and the ENTIRE MRF — every
    leaky relu, all 18 block-convs, the residual adds, and the
    1/num_kernels mean — is computed from VMEM, writing each output tile
    once.  18 full-tensor HBM round-trips become 1.
  * **MXU-shaped compute.**  Every tap is a (tile, 128) @ (128, 128) matmul
    accumulated in f32 (`preferred_element_type`).

The blocked weights multiply FLOPs by Wq*s/K per conv (the Toeplitz zeros),
but the stage moves from the bandwidth floor to MXU-bound: measured
whole-model on hifigan-light (batch 32 x 585 frames, v5e) the fused stages
cut synthesis from 139 ms to the number recorded in docs/ARCHITECTURE.md.

Zero 'same' padding semantics match the reference resblocks exactly: the
halo blocks beyond the sequence edges are zeros, which is precisely the
sample-domain zero padding of every conv in the chain.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1  # reference modules.py:9


def _leaky(x, slope=LRELU_SLOPE):
    # compare in f32: Mosaic rejects bf16 comparisons on v5e ("Target does
    # not support this comparison"); the cast is free on the VPU
    x32 = x.astype(jnp.float32)
    return jnp.where(x32 >= 0, x32, x32 * slope).astype(x.dtype)


def conv_margins(kernel_size: int, dilation: int, s: int) -> Tuple[int, int]:
    """(left, right) halo in blocks consumed by a same-padded conv."""
    p = (kernel_size - 1) * dilation // 2
    off = -(-p // s)  # ceil(p / s)
    right = (s - 1 + (kernel_size - 1) * dilation - p) // s
    return off, right


def blocked_conv_weight(kernel: jnp.ndarray, dilation: int, s: int) -> jnp.ndarray:
    """(K, C, C) sample-domain conv kernel -> (Wq, s*C, s*C) blocked weight.

    y[q*s + rout, co] = sum_{k, ci} x[q*s + rout + k*d - p, ci] * kernel[k, ci, co]
    becomes y_blocked[q] = sum_j x_blocked[q + j - off] @ W3[j].
    """
    K, Cin, Cout = kernel.shape
    # Cin == Cout for resblock convs; the construction below also handles
    # rectangular kernels (fused_tail's conv_post: C -> out_bands)
    p = (K - 1) * dilation // 2
    off, right = conv_margins(K, dilation, s)
    Wq = off + right + 1

    jq = np.arange(Wq)[:, None, None] - off
    rin = np.arange(s)[None, :, None]
    rout = np.arange(s)[None, None, :]
    tap = jq * s + rin - rout + p  # = k * dilation for a real tap
    valid = (tap % dilation == 0) & (tap >= 0) & (tap < K * dilation)
    kk = np.clip(tap // dilation, 0, K - 1)  # (Wq, s, s)

    w3 = kernel[kk] * jnp.asarray(valid, kernel.dtype)[..., None, None]
    # (Wq, rin, rout, Cin, Cout) -> (Wq, rin, Cin, rout, Cout)
    w3 = jnp.transpose(w3, (0, 1, 3, 2, 4))
    return w3.reshape(Wq, s * Cin, s * Cout)


def _blocked_conv_value(t: jnp.ndarray, w3_ref, dj: int = 1) -> jnp.ndarray:
    """Valid blocked conv of a VMEM value t (L, 128) with w3 (Wq, 128, 128).

    `dj` is the static row stride between taps: 1 for the dense
    block-Toeplitz form (s > 1), or the sample-domain dilation at s == 1,
    where every intermediate tap matrix is structurally zero and w3 stores
    only the K real taps (the original (K, C, C) kernel verbatim)."""
    Wq = w3_ref.shape[0]
    L = t.shape[0]
    Lout = L - (Wq - 1) * dj
    acc = None
    for j in range(Wq):
        part = jnp.dot(
            t[j * dj : j * dj + Lout], w3_ref[j],
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    return acc


def _mrf_kernel(
    meta,
    Qt: int,
    H: int,
    Q_real: int,
    dtype,
    left_ref,
    center_ref,
    right_ref,
    *refs,
):
    """Pallas kernel body.  The tile is assembled in VMEM from three
    pipelined BlockSpecs over the SAME blocked input: the (1, Qt, 128)
    center block plus (1, H, 128) left/right halo blocks — ~1.05x HBM
    traffic vs ~3x for materialized overlap windows (manual HBM DMA, the
    zero-copy alternative, hard-faults this TPU runtime).  At the sequence
    ends the halo block indices are clamped; their rows map outside
    [0, Q_real) and are zeroed by the input mask below, so the clamped
    content never matters.  refs = 2 per conv (w3, bias) ..., out_ref.
    `meta` is the static per-resblock list of
    [(off1, right1, dj1, off2, right2, dj2), ...] margins + tap strides."""
    from jax.experimental import pallas as pl

    n_convs = sum(2 * len(pairs) for pairs in meta)
    w_refs = refs[: 2 * n_convs]
    out_ref = refs[2 * n_convs]

    qi = pl.program_id(1)

    def mask_outside_sequence(t, a_cum):
        # Every conv in the reference chain zero-pads ITS OWN input at the
        # sequence edges; a fused chain must therefore zero the halo rows
        # that fall outside [0, Q_real) after each conv+bias (a conv of
        # zero rows is zero, but "+ bias" is not).
        row = jax.lax.broadcasted_iota(jnp.int32, (t.shape[0], 1), 0)
        g = qi * Qt - H + a_cum + row  # global block index of each row
        return jnp.where((g >= 0) & (g < Q_real), t, jnp.zeros_like(t))

    x0 = jnp.concatenate([left_ref[0], center_ref[0], right_ref[0]], axis=0)
    x0 = mask_outside_sequence(x0, 0)  # (Qt + 2H, 128)
    acc = None
    ref_i = 0
    for pairs in meta:  # one resblock
        h = x0
        a_r = 0
        for off1, right1, dj1, off2, right2, dj2 in pairs:
            w1, b1 = w_refs[ref_i], w_refs[ref_i + 1]
            w2, b2 = w_refs[ref_i + 2], w_refs[ref_i + 3]
            ref_i += 4
            t = _leaky(h)
            t = (_blocked_conv_value(t, w1, dj1) + b1[:]).astype(dtype)
            t = mask_outside_sequence(t, a_r + off1)
            t = _leaky(t)
            t = (_blocked_conv_value(t, w2, dj2) + b2[:]).astype(dtype)
            t = mask_outside_sequence(t, a_r + off1 + off2)
            a, bb = off1 + off2, right1 + right2
            h = h[a : h.shape[0] - bb] + t
            a_r += a
        part = h[H - a_r : H - a_r + Qt]
        acc = part if acc is None else acc + part
    out_ref[0] = (acc / len(meta)).astype(dtype)


# ---------------------------------------------------------------------------
# Interior op with a hand-written backward kernel (custom_vjp) — lets the
# TRAINING graph route through the fused stage (see ops/fused_resstack.py's
# twin for the chain variant; same recompute-in-backward + carry design,
# except the MRF out rows are CENTER-aligned so cotangents spread to BOTH
# sides and the backward emits left AND right carry buffers).
# ---------------------------------------------------------------------------


def _run_mrf_fwd(xb, flat, meta, Qt, H, Q_real, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Qpad, W = xb.shape
    nQ = Qpad // Qt
    nH = Qpad // H
    dtype = xb.dtype
    kernel = functools.partial(_mrf_kernel, meta, Qt, H, Q_real, dtype)
    w_specs = [
        pl.BlockSpec(
            w.shape, lambda b, q, n=w.ndim: (0,) * n, memory_space=pltpu.VMEM
        )
        for w in flat
    ]
    r = Qt // H
    x_specs = [
        pl.BlockSpec(
            (1, H, W),
            lambda b, q: (b, jnp.maximum(q * r - 1, 0), 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, Qt, W), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, H, W),
            lambda b, q: (b, jnp.minimum(q * r + r, nH - 1), 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    return pl.pallas_call(
        kernel,
        grid=(B, nQ),
        in_specs=x_specs + w_specs,
        out_specs=pl.BlockSpec(
            (1, Qt, W), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Qpad, W), dtype),
        interpret=interpret,
    )(xb, xb, xb, *flat)


def _mrf_bwd_kernel(
    meta, Qt: int, H: int, Q_real: int, g_div: int, g_ref, left_ref,
    center_ref, right_ref, *refs
):
    """Backward of the fused MRF stage over one tile, f32 from VMEM.

    The MRF branches are parallel (mean of resblocks), so each branch is
    recomputed and adjointed independently from the tile's x rows; dW is
    accumulated across the sequential grid, dx splits into main + left +
    right carries folded in XLA.  `meta` may be a SUBSET of the stage's
    branches (the per-branch VMEM split for wide stages); `g_div` is
    always the full stage's branch count (the d(mean) scale)."""
    from jax.experimental import pallas as pl

    n_convs = sum(2 * len(pairs) for pairs in meta)
    w_refs = refs[: 2 * n_convs]
    dx_ref = refs[2 * n_convs]
    lcarry_ref = refs[2 * n_convs + 1]
    rcarry_ref = refs[2 * n_convs + 2]
    dw_refs = refs[2 * n_convs + 3 :]

    qi = pl.program_id(1)
    first = (pl.program_id(0) == 0) & (qi == 0)

    def row_valid(nrows, a_cum):
        row = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0)
        g = qi * Qt - H + a_cum + row
        return ((g >= 0) & (g < Q_real)).astype(jnp.float32)

    def lmask(v, slope=LRELU_SLOPE):
        return jnp.where(v >= 0, 1.0, slope)

    x0 = jnp.concatenate(
        [left_ref[0], center_ref[0], right_ref[0]], axis=0
    ).astype(jnp.float32)
    x0 = x0 * row_valid(x0.shape[0], 0)

    g = g_ref[0].astype(jnp.float32) / g_div  # d(mean) per branch

    dx_acc = None
    dws = [None] * (2 * n_convs)
    ref_i = 0
    for pairs in meta:  # one resblock branch
        base_i = ref_i
        # --- forward recompute of this branch, storing intermediates ---
        hhs, tAs = [], []
        hh = x0
        a_r = 0
        for off1, right1, dj1, off2, right2, dj2 in pairs:
            w1 = w_refs[ref_i][...].astype(jnp.float32)
            b1 = w_refs[ref_i + 1][...].astype(jnp.float32)
            w2 = w_refs[ref_i + 2][...].astype(jnp.float32)
            b2 = w_refs[ref_i + 3][...].astype(jnp.float32)
            ref_i += 4
            hhs.append(hh)
            t1 = jnp.where(hh >= 0, hh, hh * LRELU_SLOPE)
            Lo1 = t1.shape[0] - (w1.shape[0] - 1) * dj1
            acc = None
            for j in range(w1.shape[0]):
                p = jnp.dot(
                    t1[j * dj1 : j * dj1 + Lo1], w1[j],
                    preferred_element_type=jnp.float32,
                )
                acc = p if acc is None else acc + p
            tA = (acc + b1) * row_valid(Lo1, a_r + off1)
            tAs.append(tA)
            t3 = jnp.where(tA >= 0, tA, tA * LRELU_SLOPE)
            Lo2 = t3.shape[0] - (w2.shape[0] - 1) * dj2
            acc = None
            for j in range(w2.shape[0]):
                p = jnp.dot(
                    t3[j * dj2 : j * dj2 + Lo2], w2[j],
                    preferred_element_type=jnp.float32,
                )
                acc = p if acc is None else acc + p
            tB = (acc + b2) * row_valid(Lo2, a_r + off1 + off2)
            a, bb = off1 + off2, right1 + right2
            hh = hh[a : hh.shape[0] - bb] + tB
            a_r += a

        # --- adjoint of this branch ---
        # out = hh[H - a_r : H - a_r + Qt]; place g there
        d = jnp.pad(
            g, ((H - a_r, hh.shape[0] - (H - a_r) - Qt), (0, 0))
        )
        wi = base_i + 4 * (len(pairs) - 1)
        for pi in reversed(range(len(pairs))):
            off1, right1, dj1, off2, right2, dj2 = pairs[pi]
            w1 = w_refs[wi][...].astype(jnp.float32)
            w2 = w_refs[wi + 2][...].astype(jnp.float32)
            hh_in = hhs[pi]
            tA = tAs[pi]
            a, bb = off1 + off2, right1 + right2
            a_here = sum(p[0] + p[3] for p in pairs[:pi])
            Lh = hh_in.shape[0]
            Lo1 = Lh - (w1.shape[0] - 1) * dj1
            Lo2 = d.shape[0]

            d_tB = d * row_valid(Lo2, a_here + off1 + off2)
            t3 = jnp.where(tA >= 0, tA, tA * LRELU_SLOPE)
            # dW2 / db2 / d_t3
            dw2 = jnp.stack([
                jnp.dot(
                    t3[j * dj2 : j * dj2 + Lo2].T, d_tB,
                    preferred_element_type=jnp.float32,
                )
                for j in range(w2.shape[0])
            ])
            db2 = jnp.sum(d_tB, axis=0)[None]
            d_t3 = None
            for j in range(w2.shape[0]):
                p = jnp.pad(
                    jnp.dot(d_tB, w2[j].T, preferred_element_type=jnp.float32),
                    ((j * dj2, Lo1 - j * dj2 - Lo2), (0, 0)),
                )
                d_t3 = p if d_t3 is None else d_t3 + p
            d_tA = d_t3 * lmask(tA) * row_valid(Lo1, a_here + off1)
            t1 = jnp.where(hh_in >= 0, hh_in, hh_in * LRELU_SLOPE)
            dw1 = jnp.stack([
                jnp.dot(
                    t1[j * dj1 : j * dj1 + Lo1].T, d_tA,
                    preferred_element_type=jnp.float32,
                )
                for j in range(w1.shape[0])
            ])
            db1 = jnp.sum(d_tA, axis=0)[None]
            d_t1 = None
            for j in range(w1.shape[0]):
                p = jnp.pad(
                    jnp.dot(d_tA, w1[j].T, preferred_element_type=jnp.float32),
                    ((j * dj1, Lh - j * dj1 - Lo1), (0, 0)),
                )
                d_t1 = p if d_t1 is None else d_t1 + p
            d = d_t1 * lmask(hh_in) + jnp.pad(d, ((a, bb), (0, 0)))

            for k, val in ((0, dw1), (1, db1), (2, dw2), (3, db2)):
                idx = wi + k
                dws[idx] = val if dws[idx] is None else dws[idx] + val
            wi -= 4

        dx_acc = d if dx_acc is None else dx_acc + d

    dx_acc = dx_acc * row_valid(dx_acc.shape[0], 0)
    lcarry_ref[0] = dx_acc[:H].astype(lcarry_ref.dtype)
    dx_ref[0] = dx_acc[H : H + Qt].astype(dx_ref.dtype)
    rcarry_ref[0] = dx_acc[H + Qt :].astype(rcarry_ref.dtype)

    @pl.when(first)
    def _init():
        for ref, val in zip(dw_refs, dws):
            ref[...] = val.astype(ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _accum():
        for ref, val in zip(dw_refs, dws):
            ref[...] += val.astype(ref.dtype)


def _run_mrf_bwd(xb, flat, g_buf, meta, Qt, H, Q_real, interpret, g_div=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Qpad, W = xb.shape
    nQ = Qpad // Qt
    nH = Qpad // H
    r = Qt // H
    kernel = functools.partial(
        _mrf_bwd_kernel, meta, Qt, H, Q_real, g_div or len(meta)
    )
    w_specs = [
        pl.BlockSpec(
            w.shape, lambda b, q, n=w.ndim: (0,) * n, memory_space=pltpu.VMEM
        )
        for w in flat
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(B, nQ),
        in_specs=[
            pl.BlockSpec(
                (1, Qt, W), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, H, W),
                lambda b, q: (b, jnp.maximum(q * r - 1, 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Qt, W), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, H, W),
                lambda b, q: (b, jnp.minimum(q * r + r, nH - 1), 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + w_specs,
        out_specs=[
            pl.BlockSpec(
                (1, Qt, W), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, H, W), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, H, W), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM
            ),
        ]
        + [
            pl.BlockSpec(
                w.shape, lambda b, q, n=w.ndim: (0,) * n,
                memory_space=pltpu.VMEM,
            )
            for w in flat
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Qpad, W), jnp.float32),
            jax.ShapeDtypeStruct((B, nQ * H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, nQ * H, W), jnp.float32),
        ]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat],
        interpret=interpret,
    )(g_buf, xb, xb, xb, *flat)

    main, lc, rc = outs[0], outs[1], outs[2]
    dflat = tuple(d.astype(w.dtype) for d, w in zip(outs[3:], flat))
    main = main.reshape(B, nQ, Qt, W)
    lc = lc.reshape(B, nQ, H, W)
    rc = rc.reshape(B, nQ, H, W)
    # tile q's right carry lands on tile q+1's head; its left carry on tile
    # q-1's tail.  Tile 0's left and the last tile's right carries target
    # rows outside [0, Q_real) and are zero by the in-kernel row mask.
    main = main.at[:, 1:, :H].add(rc[:, :-1])
    main = main.at[:, :-1, Qt - H :].add(lc[:, 1:])
    return main.reshape(B, nQ * Qt, W).astype(xb.dtype), dflat


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _mrf_interior(xb, flat, meta, Qt, H, Q_real, interpret):
    return _run_mrf_fwd(xb, flat, meta, Qt, H, Q_real, interpret)


def _mrf_interior_fwd(xb, flat, meta, Qt, H, Q_real, interpret):
    return _run_mrf_fwd(xb, flat, meta, Qt, H, Q_real, interpret), (xb, flat)


# Combined VMEM budget for weight refs + f32 dW output refs in one backward
# call.  C=16 fits whole (2x wbytes = 8.7 MB); C=32's 12.1 MB of W + dW
# plus the pipelined tile buffers measures 16.07 MB on v5e — 68 KB OVER the
# 16 MB scoped limit (compile failure), so it splits per branch like
# C=64/128 (each branch is independent given x and the cotangent, so the
# split is exact; dx sums across calls in XLA, ~2 extra reads of x per
# stage ≈ 0.5 ms at the 287 GB/s floor).
_BWD_WEIGHT_BUDGET = 11 * 2**20

# Forward weight-ref budget per Pallas call: C<=128 stages (<= ~9.4 MB of
# effective kernels, measured working with 512-row tiles on v5e) run whole;
# wider stages split per branch (see fused_mrf_stage).
_FWD_WEIGHT_BUDGET = 12 * 2**20


def _mrf_interior_bwd(meta, Qt, H, Q_real, interpret, res, g):
    xb, flat = res
    wbytes = sum(int(np.prod(w.shape)) for w in flat) * 4  # f32 W
    # s == 1 stages (any dj > 1: sparse-tap weights) always split per
    # branch.  For the shipped k=(3,7,11) x d=(1,3,5) config at C=128 the
    # sparse-tap weights are ~8.3 MB (126 taps x 128x128x4B), so 2*wbytes
    # (~16.5 MB) already fails the budget check and this clause is
    # future-proofing for narrower sparse configs whose weights WOULD fit:
    # their lane-full f32 recompute intermediates still don't — measured on
    # v5e, the whole-stage C=128 backward exceeds the 16 MB scoped-VMEM
    # limit by ~68 KB and fails to compile (interpreter-mode tests can't
    # see VMEM limits).
    sparse_taps = any(p[2] > 1 for pairs in meta for p in pairs)
    if 2 * wbytes <= _BWD_WEIGHT_BUDGET and not (
        sparse_taps and len(meta) > 1
    ):
        return _run_mrf_bwd(xb, flat, g, meta, Qt, H, Q_real, interpret)
    dx = None
    dflat = []
    i = 0
    for pairs in meta:
        n = 4 * len(pairs)
        d, dsub = _run_mrf_bwd(
            xb, tuple(flat[i : i + n]), g, (pairs,), Qt, H, Q_real,
            interpret, g_div=len(meta),
        )
        i += n
        dx = d if dx is None else dx + d
        dflat.extend(dsub)
    return dx, tuple(dflat)


_mrf_interior.defvjp(_mrf_interior_fwd, _mrf_interior_bwd)


def fused_mrf_stage(
    x: jnp.ndarray,
    resblocks: Sequence[Sequence[Tuple[jnp.ndarray, jnp.ndarray, int, jnp.ndarray, jnp.ndarray]]],
    tile_q: int = 0,  # 0 = pick by width (measured best on v5e; 2048 OOMs VMEM)
    interpret: bool = False,
) -> jnp.ndarray:
    """Run a whole HiFiGAN MRF stage as one fused Pallas program.

    x: (B, T, C) stage input (post-upsample), C in {16, 32, 64} (s*C ==
       128, T % s == 0) or a multiple of 128 (s == 1).  At s == 1 the
       rows are already lane-full and the dilated convs keep their
       original K taps with a static row stride of `dilation` — the dense
       block-Toeplitz form would carry (K-1)*(d-1) all-zero tap matrices
       (~15 MB of structural zeros for the k={3,7,11} MRF at C=128).
       Stages whose weights exceed the VMEM budget (C=256) run one
       parallel branch per Pallas call with the mean folded in XLA.
    resblocks: per resblock, a list of (kernel1, bias1, dilation, kernel2,
       bias2) for each (dilated conv, dilation-1 conv) pair — the effective
       (weight-norm applied) kernels in (K, C, C) layout, biases (C,).
    Returns sum_r ResBlock1_r(x) / len(resblocks), exactly as the standard
    module path (float reassociation aside).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, C = x.shape
    if C >= 128:
        # lane-full (or multi-register) rows: s = 1, Mosaic tiles the
        # >128-wide registers; dilated convs use sparse taps (dj = d)
        assert C % 128 == 0, C
        s = 1
    else:
        s = 128 // C
        assert s * C == 128 and T % s == 0, (C, T)
    Q = T // s
    dtype = x.dtype
    if tile_q <= 0:
        # C=64's block-Toeplitz weights alone are ~9 MB f32 (Wq up to 27 at
        # k=11 d=5 with s=2); halve the tile so tiles + weights fit VMEM.
        # C=256 rows are 2x wider, halve again.
        tile_q = 1024 if C <= 32 else (512 if C <= 128 else 256)

    meta = []
    flat_weights = []
    H = 0
    for pairs in resblocks:
        pair_meta = []
        a_r = b_r = 0
        for k1, b1, d, k2, b2 in pairs:
            K1 = k1.shape[0]
            K2 = k2.shape[0]
            off1, right1 = conv_margins(K1, d, s)
            off2, right2 = conv_margins(K2, 1, s)
            # s == 1: skip the structurally-zero taps — the weight ref is
            # the original (K, 128, 128) kernel, taps stride by `d` rows
            dj1 = d if s == 1 else 1
            pair_meta.append((off1, right1, dj1, off2, right2, 1))
            flat_weights += [
                k1.astype(dtype) if dj1 > 1
                else blocked_conv_weight(k1.astype(dtype), d, s),
                jnp.tile(b1.astype(dtype), s)[None, :],
                blocked_conv_weight(k2.astype(dtype), 1, s),
                jnp.tile(b2.astype(dtype), s)[None, :],
            ]
            a_r += off1 + off2
            b_r += right1 + right2
        meta.append(pair_meta)
        H = max(H, a_r, b_r)

    # halo rounded to a sublane-friendly multiple of 8; the tile size must
    # be a multiple of H so the halo blocks land on an H-aligned grid
    H = -(-H // 8) * 8
    Qt = max(H, (min(tile_q, max(8, -(-Q // 8) * 8)) // H) * H)
    nQ = -(-Q // Qt)
    Qpad = nQ * Qt
    nH = Qpad // H  # halo-block grid size

    xb = x.reshape(B, Q, s * C)
    if Qpad != Q:
        xb = jnp.pad(xb, ((0, 0), (0, Qpad - Q), (0, 0)))

    del nH  # computed inside the interior op
    meta_t = tuple(tuple(pm) for pm in meta)
    wbytes = sum(int(np.prod(w.shape)) * w.dtype.itemsize for w in flat_weights)
    if wbytes > _FWD_WEIGHT_BUDGET and len(meta_t) > 1:
        # C=256's per-stage weights (~31 MB f32) cannot all sit in VMEM:
        # run one parallel branch per Pallas call (exact — the branches
        # only meet at the mean) and fold the mean in XLA.  ~3 reads of x
        # instead of 1, still ~6x less traffic than the un-fused 18 convs.
        out = None
        i = 0
        for pairs in meta_t:
            n = 4 * len(pairs)
            o = _mrf_interior(
                xb, tuple(flat_weights[i : i + n]), (pairs,), Qt, H, Q,
                interpret,
            )
            i += n
            out = o if out is None else out + o
        out = out / len(meta_t)
    else:
        out = _mrf_interior(
            xb, tuple(flat_weights), meta_t, Qt, H, Q, interpret
        )
    return out[:, :Q].reshape(B, Q * s, C)
