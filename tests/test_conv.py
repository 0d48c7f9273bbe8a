"""Conv primitive parity vs torch.nn.functional (padding arithmetic is the
hard part of checkpoint interchange — SURVEY.md §7 'Hard parts' #1)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from fastvocoder_tpu.ops.conv import (
    avg_pool1d,
    conv1d,
    conv_transpose1d,
    reflect_pad1d,
)


def to_ntc(x_nct):
    return np.transpose(x_nct, (0, 2, 1))


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,dil,groups",
    [
        (8, 16, 7, 1, 3, 1, 1),
        (8, 16, 3, 1, 3, 3, 1),
        (16, 32, 41, 4, 20, 1, 4),
        (8, 8, 1, 1, 0, 1, 1),
    ],
)
def test_conv1d_matches_torch(rng, cin, cout, k, stride, pad, dil, groups):
    x = rng.standard_normal((2, cin, 95)).astype(np.float32)
    w = rng.standard_normal((cout, cin // groups, k)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)
    ref = F.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad, dilation=dil, groups=groups,
    ).numpy()
    ours = conv1d(
        jnp.asarray(to_ntc(x)),
        jnp.asarray(np.transpose(w, (2, 1, 0))),
        jnp.asarray(b),
        stride=stride, padding=pad, dilation=dil, groups=groups,
    )
    np.testing.assert_allclose(np.asarray(ours), to_ntc(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "cin,cout,scale",
    [(8, 16, 10), (8, 16, 6), (16, 8, 2), (8, 8, 5), (8, 8, 3), (8, 8, 4)],
)
def test_conv_transpose1d_matches_torch_melgan_arith(rng, cin, cout, scale):
    # the reference's upsampler arithmetic: k=2s, p=s//2+s%2, op=s%2
    # (reference model/generator/melgan.py:77-86)
    k, p, op = 2 * scale, scale // 2 + scale % 2, scale % 2
    x = rng.standard_normal((2, cin, 17)).astype(np.float32)
    w = rng.standard_normal((cin, cout, k)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)
    ref = F.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=scale, padding=p, output_padding=op,
    ).numpy()
    ours = conv_transpose1d(
        jnp.asarray(to_ntc(x)),
        jnp.asarray(np.transpose(w, (2, 0, 1))),
        jnp.asarray(b),
        stride=scale, padding=p, output_padding=op,
    )
    assert ours.shape[1] == 17 * scale
    np.testing.assert_allclose(np.asarray(ours), to_ntc(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("u,k", [(8, 16), (5, 10), (3, 6), (2, 4), (10, 16), (6, 16)])
def test_conv_transpose1d_hifigan_arith(rng, u, k):
    # hifigan: kernel k, stride u, padding u//2+u%2, output_padding u%2
    # (reference model/generator/hifigan.py:39-44)
    p, op = u // 2 + u % 2, u % 2
    x = rng.standard_normal((1, 8, 23)).astype(np.float32)
    w = rng.standard_normal((8, 4, k)).astype(np.float32)
    ref = F.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), stride=u, padding=p, output_padding=op
    ).numpy()
    ours = conv_transpose1d(
        jnp.asarray(to_ntc(x)), jnp.asarray(np.transpose(w, (2, 0, 1))),
        stride=u, padding=p, output_padding=op,
    )
    np.testing.assert_allclose(np.asarray(ours), to_ntc(ref), rtol=1e-4, atol=1e-4)


def test_reflect_pad(rng):
    x = rng.standard_normal((1, 4, 10)).astype(np.float32)
    ref = F.pad(torch.from_numpy(x), (3, 3), mode="reflect").numpy()
    ours = reflect_pad1d(jnp.asarray(to_ntc(x)), 3)
    np.testing.assert_allclose(np.asarray(ours), to_ntc(ref), atol=1e-6)


def test_avg_pool_count_exclude_pad(rng):
    x = rng.standard_normal((2, 3, 33)).astype(np.float32)
    ref = torch.nn.AvgPool1d(4, stride=2, padding=1, count_include_pad=False)(
        torch.from_numpy(x)
    ).numpy()
    ours = avg_pool1d(jnp.asarray(to_ntc(x)), 4, 2, 1, count_include_pad=False)
    np.testing.assert_allclose(np.asarray(ours), to_ntc(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", range(4))
def test_conv_transpose1d_random_arith_sweep(rng, seed):
    """Randomized (k, s, p, op) sweep vs torch — exercises both lowerings of
    conv_transpose1d (polyphase for stride>=4 / tiny channels, lhs-dilated
    otherwise) including edge cases: p=0 (negative per-phase input offsets),
    k < s (gap phases with zero taps), and output_padding up to s-1."""
    r = np.random.default_rng(seed)
    for _ in range(8):
        s = int(r.integers(2, 12))
        k = int(r.integers(1, 2 * s + 4))
        p = int(r.integers(0, max(1, k)))
        op = int(r.integers(0, s))
        T = int(r.integers(5, 20))
        if (T - 1) * s - 2 * p + k + op <= 0:
            continue
        cin, cout = int(r.integers(1, 9)), int(r.integers(1, 9))
        x = r.standard_normal((1, cin, T)).astype(np.float32)
        w = r.standard_normal((cin, cout, k)).astype(np.float32)
        ref = F.conv_transpose1d(
            torch.from_numpy(x), torch.from_numpy(w),
            stride=s, padding=p, output_padding=op,
        ).numpy()
        ours = conv_transpose1d(
            jnp.asarray(to_ntc(x)), jnp.asarray(np.transpose(w, (2, 0, 1))),
            stride=s, padding=p, output_padding=op,
        )
        np.testing.assert_allclose(
            np.asarray(ours), to_ntc(ref), rtol=1e-4, atol=1e-4,
            err_msg=f"k={k} s={s} p={p} op={op} T={T} cin={cin} cout={cout}",
        )


def test_upconv_polyphase_equals_lhs_dilated(rng):
    """The polyphase lowering is numerically the lhs-dilated conv for the
    shapes it accepts (t_out <= T*s)."""
    from jax import lax

    from fastvocoder_tpu.ops.conv import upconv_polyphase

    r = np.random.default_rng(7)
    for _ in range(8):
        s = int(r.integers(2, 10))
        k = int(r.integers(1, 3 * s))
        pad_l = int(r.integers(0, k + s))
        T = int(r.integers(4, 16))
        cin, cout = int(r.integers(1, 6)), int(r.integers(1, 6))
        # pick a t_out the polyphase form can produce
        t_max = T * s
        t_out = int(r.integers(max(1, t_max - s), t_max + 1))
        x = jnp.asarray(r.standard_normal((2, T, cin)).astype(np.float32))
        w = jnp.asarray(r.standard_normal((k, cin, cout)).astype(np.float32))
        got = upconv_polyphase(x, w, s, pad_l, t_out)
        # reference: dilated conv with enough right pad, sliced to t_out
        full = lax.conv_general_dilated(
            x, w, (1,), [(pad_l, k + s)], lhs_dilation=(s,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )[:, :t_out]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(full), rtol=1e-5, atol=1e-5,
            err_msg=f"k={k} s={s} pad_l={pad_l} T={T} t_out={t_out}",
        )


def test_conv1d_phase_packed_equals_plain(rng):
    """Phase-packed stride-1 conv computes the exact same taps per output
    sample as the plain lowering (float reassociation only)."""
    from fastvocoder_tpu.ops.conv import conv1d, conv1d_phase_packed

    r = np.random.default_rng(11)
    cases = [
        (3, 1, 16, 16, 96, 8),    # lane-filling s*Cout = 128
        (3, 5, 16, 16, 100, 8),   # dilated
        (11, 1, 32, 32, 77, 4),   # T not a multiple of s
        (7, 3, 32, 16, 256, 8),   # Cin != Cout
        (5, 1, 8, 24, 50, 5),     # s*Cout not 128-aligned
        (1, 1, 16, 16, 64, 8),    # pointwise
    ]
    for K, d, cin, cout, T, s in cases:
        x = jnp.asarray(r.standard_normal((2, T, cin)).astype(np.float32))
        w = jnp.asarray(r.standard_normal((K, cin, cout)).astype(np.float32))
        b = jnp.asarray(r.standard_normal((cout,)).astype(np.float32))
        for p in {(K - 1) * d // 2, 0} if (K - 1) * d // 2 < T else {0}:
            if T + 2 * p - (K - 1) * d <= 0:
                continue
            ref = conv1d(x, w, b, padding=p, dilation=d)
            got = conv1d_phase_packed(x, w, b, padding=p, dilation=d, phases=s)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5,
                err_msg=f"K={K} d={d} cin={cin} cout={cout} T={T} s={s} p={p}",
            )


def test_packed_conv_policy_default_off():
    """Whole-model measurement showed packing loses to XLA's fusion (see
    packed_conv_phases docstring); the default policy must not route."""
    from fastvocoder_tpu.ops.conv import packed_conv_phases

    assert packed_conv_phases(1, 1, 11, 1, 16, 140448) == 0
