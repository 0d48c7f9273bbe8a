"""Streaming synthesis == full-pass synthesis (interior exactness)."""

import jax
import numpy as np
import pytest

from fastvocoder_tpu.hparams import MelGANConfig, ModelConfig
from fastvocoder_tpu.models.factory import build_generator
from fastvocoder_tpu.models.streaming import StreamingSynthesizer


def test_streaming_matches_full_pass(rng):
    cfg = ModelConfig(
        model_name="melgan",
        arch=MelGANConfig(channels=(8, 8, 8, 8, 8)),
    )
    gen = build_generator(cfg)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), np.zeros((1, 8, 80), np.float32))[
        "params"
    ]
    fwd = lambda p, m: gen.apply({"params": p}, m)

    T = 150  # not a multiple of the chunk -> exercises the tail path
    mel = rng.standard_normal((T, 80)).astype(np.float32)
    full = np.asarray(jax.jit(fwd)(params, mel[None]))[0]

    s = StreamingSynthesizer(
        fwd, params, samples_per_frame=240, chunk_frames=64, halo_frames=16
    )
    streamed = s(mel)

    assert streamed.shape == full.shape
    # interior samples are exact; only the outermost halo region can differ
    # through the sequence-edge reflect padding of the first/last chunk
    edge = 16 * 240
    np.testing.assert_allclose(
        streamed[edge:-edge], full[edge:-edge], atol=1e-5, rtol=1e-5
    )
    # and the edges are still close (same reflect-pad semantics)
    np.testing.assert_allclose(streamed, full, atol=5e-2)


def test_streaming_single_chunk_short_input(rng):
    cfg = ModelConfig(
        model_name="melgan",
        arch=MelGANConfig(channels=(8, 8, 8, 8, 8)),
    )
    gen = build_generator(cfg)
    params = jax.jit(gen.init)(jax.random.PRNGKey(1), np.zeros((1, 8, 80), np.float32))[
        "params"
    ]
    fwd = lambda p, m: gen.apply({"params": p}, m)
    s = StreamingSynthesizer(
        fwd, params, samples_per_frame=240, chunk_frames=64, halo_frames=8
    )
    mel = rng.standard_normal((20, 80)).astype(np.float32)
    out = s(mel)
    assert out.shape == (20 * 240,)
    assert np.isfinite(out).all()


def test_streaming_very_short_input_large_chunk(rng):
    """Pad larger than the piece: exercises the iterative reflect padding
    (numpy reflect caps each application at len-1)."""
    cfg = ModelConfig(
        model_name="melgan",
        arch=MelGANConfig(channels=(8, 8, 8, 8, 8)),
    )
    gen = build_generator(cfg)
    params = jax.jit(gen.init)(jax.random.PRNGKey(2), np.zeros((1, 8, 80), np.float32))[
        "params"
    ]
    fwd = lambda p, m: gen.apply({"params": p}, m)
    s = StreamingSynthesizer(
        fwd, params, samples_per_frame=240, chunk_frames=256, halo_frames=32
    )
    for T in (1, 3, 7):
        mel = rng.standard_normal((T, 80)).astype(np.float32)
        out = s(mel)
        assert out.shape == (T * 240,)
        assert np.isfinite(out).all()


def test_streaming_rejects_non_length_preserving(rng):
    """A forward whose output length doesn't match the declared contract
    (spf * frames + tail_samples) must fail loudly, not mis-stitch."""
    fwd = lambda p, m: np.zeros((1, (m.shape[1] + 1) * 240), np.float32)
    s = StreamingSynthesizer(
        fwd, None, samples_per_frame=240, chunk_frames=32, halo_frames=4
    )
    mel = rng.standard_normal((16, 80)).astype(np.float32)
    with pytest.raises(ValueError, match="forward emitted"):
        s(mel)


def test_streaming_basis_melgan_native(rng):
    """The flagship model streams out of the box via for_model: the raw
    decode's L/2 overlap-add tail is absorbed per chunk and the published
    `pattern` zero-mel bias is subtracted position-aligned (reference trim
    + pattern semantics, bin/test.py:85-88)."""
    from fastvocoder_tpu.hparams import BasisMelGANConfig

    cfg = ModelConfig(
        model_name="basis-melgan",
        arch=BasisMelGANConfig(out_channels=16, channels=(16, 16, 16)),
    )
    gen = build_generator(
        cfg, basis_signal_weight=rng.standard_normal((30, 16)).astype(np.float32)
    )
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(2), np.zeros((1, 8, 80), np.float32)
    )["params"]

    T, spf = 150, 240
    mel = rng.standard_normal((T, 80)).astype(np.float32)
    raw = lambda m: np.asarray(
        jax.jit(
            lambda p, x: gen.apply({"params": p}, x, method=gen.inference)
        )(params, m[None])
    )[0]
    # published-pattern protocol: raw inference on a long zero mel
    pattern = raw(np.zeros((256, 80), np.float32))
    full = raw(mel)[: T * spf] - pattern[: T * spf]

    s = StreamingSynthesizer.for_model(
        gen, params, "basis-melgan", chunk_frames=64, halo_frames=16,
        pattern=pattern,
    )
    streamed = s(mel)

    assert streamed.shape == full.shape
    edge = 16 * spf
    np.testing.assert_allclose(
        streamed[edge:-edge], full[edge:-edge], atol=1e-5, rtol=1e-5
    )

    # pattern shorter than the utterance -> explicit error, not silent drift
    s_short = StreamingSynthesizer.for_model(
        gen, params, "basis-melgan", chunk_frames=64, halo_frames=16,
        pattern=pattern[: 100 * spf],
    )
    with pytest.raises(ValueError, match="pattern covers"):
        s_short(mel)
