"""Batched bucketed synthesis == per-utterance synthesis."""

import jax
import numpy as np

from fastvocoder_tpu.hparams import MelGANConfig, ModelConfig
from fastvocoder_tpu.models.batched import BatchedSynthesizer, bucket_length
from fastvocoder_tpu.models.factory import build_generator


def test_bucket_length():
    assert bucket_length(1, 64) == 64
    assert bucket_length(64, 64) == 64
    assert bucket_length(65, 64) == 128


def test_batched_matches_single(rng):
    cfg = ModelConfig(
        model_name="melgan", arch=MelGANConfig(channels=(8, 8, 8, 8, 8))
    )
    gen = build_generator(cfg)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), np.zeros((1, 8, 80), np.float32))[
        "params"
    ]
    fwd = lambda p, m: gen.apply({"params": p}, m)

    lengths = [10, 25, 25, 40, 70]
    mels = [rng.standard_normal((T, 80)).astype(np.float32) for T in lengths]

    bs = BatchedSynthesizer(fwd, params, samples_per_frame=240,
                            bucket_frames=32, max_batch=2)
    outs = bs(mels)

    single = jax.jit(fwd)
    for mel, got in zip(mels, outs):
        assert got.shape == (mel.shape[0] * 240,)
        Tb = bucket_length(mel.shape[0], 32)
        padded = np.pad(mel, ((0, Tb - mel.shape[0]), (0, 0)))
        want = np.asarray(single(params, padded[None]))[0, : mel.shape[0] * 240]
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_batched_on_mesh_matches_single(rng):
    """Mesh-sharded serving == single-device serving, on the virtual
    8-device CPU mesh (batch pads to a mesh multiple when needed)."""
    from fastvocoder_tpu.parallel.mesh import make_mesh

    cfg = ModelConfig(
        model_name="melgan", arch=MelGANConfig(channels=(8, 8, 8, 8, 8))
    )
    gen = build_generator(cfg)
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(0), np.zeros((1, 8, 80), np.float32)
    )["params"]
    fwd = lambda p, m: gen.apply({"params": p}, m)

    lengths = [10, 25, 25, 40, 70, 12, 30]  # 3 utts in one bucket: pads 3->8
    mels = [rng.standard_normal((T, 80)).astype(np.float32) for T in lengths]

    mesh = make_mesh(jax.devices()[:8])
    sharded = BatchedSynthesizer(
        fwd, params, samples_per_frame=240, bucket_frames=32, max_batch=8,
        mesh=mesh,
    )(mels)
    plain = BatchedSynthesizer(
        fwd, params, samples_per_frame=240, bucket_frames=32, max_batch=8
    )(mels)
    for a, b in zip(sharded, plain):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
