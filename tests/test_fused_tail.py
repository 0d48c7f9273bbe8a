"""Fused HiFiGAN tail kernel (ops/fused_tail.py) — parity vs the sequential
op path (leaky -> ConvTranspose1d -> MRF mean -> leaky -> conv_post ->
tanh), Pallas interpreter mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastvocoder_tpu.ops.conv import conv1d, conv_transpose1d
from fastvocoder_tpu.ops.fused_tail import (
    blocked_upconv_weight,
    fused_hifigan_tail,
)


def _ref_tail(x, up_k, up_b, stride, padding, resblocks, post_k, post_b):
    h = jnp.where(x >= 0, x, 0.1 * x)
    h = conv_transpose1d(h, up_k, up_b, stride=stride, padding=padding)
    acc = None
    for pairs in resblocks:
        hh = h
        for k1, b1, d, k2, b2 in pairs:
            t = jnp.where(hh >= 0, hh, 0.1 * hh)
            t = conv1d(t, k1, b1, padding=(k1.shape[0] - 1) * d // 2, dilation=d)
            t = jnp.where(t >= 0, t, 0.1 * t)
            t = conv1d(t, k2, b2, padding=(k2.shape[0] - 1) // 2)
            hh = hh + t
        acc = hh if acc is None else acc + hh
    h = acc / len(resblocks)
    h = jnp.where(h >= 0, h, 0.01 * h)
    h = conv1d(h, post_k, post_b, padding=(post_k.shape[0] - 1) // 2)
    return jnp.tanh(h)


def test_blocked_upconv_weight_matches_conv_transpose(rng):
    r = np.random.default_rng(5)
    for Cin, Cout, stride, K in [(32, 16, 2, 4), (64, 32, 2, 4)]:
        s_in, s = 128 // Cin, 128 // Cout
        T = 24 * s_in
        pad = stride // 2 + stride % 2
        x = jnp.asarray(r.standard_normal((1, T, Cin)).astype(np.float32))
        w = jnp.asarray(0.2 * r.standard_normal((K, Cin, Cout)).astype(np.float32))
        ref = conv_transpose1d(x, w, None, stride=stride, padding=pad)

        wb, off, right = blocked_upconv_weight(w, stride, pad, s_in, s)
        Q = T // s_in
        xb = jnp.pad(
            x.reshape(1, Q, s_in * Cin), ((0, 0), (off, right), (0, 0))
        )
        out = sum(
            jnp.einsum("bqc,cd->bqd", xb[:, j : j + Q], wb[j])
            for j in range(wb.shape[0])
        )
        np.testing.assert_allclose(
            np.asarray(out.reshape(1, Q * s, Cout)), np.asarray(ref),
            atol=2e-5, rtol=1e-4, err_msg=f"{Cin}->{Cout}",
        )


@pytest.mark.parametrize("Cin,Cout", [(32, 16), (64, 32)])
def test_fused_tail_matches_sequential(Cin, Cout, rng):
    r = np.random.default_rng(Cin)
    stride, K_up = 2, 4
    pad = stride // 2 + stride % 2
    s_in = 128 // Cin
    T = 40 * s_in  # crosses a tile boundary at tile_q=16
    x = jnp.asarray(0.3 * r.standard_normal((2, T, Cin)).astype(np.float32))

    up_k = jnp.asarray(0.08 * r.standard_normal((K_up, Cin, Cout)).astype(np.float32))
    up_b = jnp.asarray(0.1 * r.standard_normal((Cout,)).astype(np.float32))
    resblocks = []
    for rk in (3, 7, 11):
        pairs = []
        for d in (1, 3, 5):
            pairs.append((
                jnp.asarray(0.08 * r.standard_normal((rk, Cout, Cout)).astype(np.float32)),
                jnp.asarray(0.05 * r.standard_normal((Cout,)).astype(np.float32)),
                d,
                jnp.asarray(0.08 * r.standard_normal((rk, Cout, Cout)).astype(np.float32)),
                jnp.asarray(0.05 * r.standard_normal((Cout,)).astype(np.float32)),
            ))
        resblocks.append(pairs)
    post_k = jnp.asarray(0.08 * r.standard_normal((7, Cout, 1)).astype(np.float32))
    post_b = jnp.asarray(np.zeros((1,), np.float32))

    ref = _ref_tail(x, up_k, up_b, stride, pad, resblocks, post_k, post_b)
    got = fused_hifigan_tail(
        x, up_k, up_b, stride, pad, resblocks, post_k, post_b,
        tile_q=16, interpret=True,
    )
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4
    )


def test_hifigan_generator_fused_tail_parity(monkeypatch):
    """End-to-end hifigan-light: the fused-tail graph (final upsample + MRF
    + output head in one program) == the standard graph."""
    import os

    from fastvocoder_tpu.hparams import load_model_config
    from fastvocoder_tpu.models.factory import build_generator

    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_model_config(
        "hifigan", os.path.join(root, "conf", "hifigan", "light.yaml")
    )
    gen = build_generator(cfg, weight_norm=False)
    r = np.random.default_rng(0)
    mel = np.clip(
        0.5 + 0.25 * r.standard_normal((1, 16, 80)), 0, 1
    ).astype(np.float32)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), mel[:, :4])["params"]

    monkeypatch.setenv("FASTVOCODER_FUSED_MRF", "0")
    monkeypatch.setenv("FASTVOCODER_FUSED_TAIL", "0")
    ref = np.asarray(gen.apply({"params": params}, mel))
    monkeypatch.setenv("FASTVOCODER_FUSED_TAIL", "interpret")
    got = np.asarray(gen.apply({"params": params}, mel))
    np.testing.assert_allclose(got, ref, atol=5e-4)
    assert np.sqrt(((got - ref) ** 2).mean()) < 5e-5
