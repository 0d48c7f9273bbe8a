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
    """basis-melgan's raw decode emits (F+1)*hop samples; the streamer must
    fail loudly, not mis-stitch."""
    fwd = lambda p, m: np.zeros((1, (m.shape[1] + 1) * 240), np.float32)
    s = StreamingSynthesizer(
        fwd, None, samples_per_frame=240, chunk_frames=32, halo_frames=4
    )
    mel = rng.standard_normal((16, 80)).astype(np.float32)
    with pytest.raises(ValueError, match="frame-length-preserving"):
        s(mel)
