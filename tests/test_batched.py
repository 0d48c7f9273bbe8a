"""Batched bucketed synthesis == per-utterance synthesis."""

import jax
import numpy as np
import pytest

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


def test_batch_pad_pow2_matches_exact(rng):
    """pow2 group padding returns identical wavs while dispatching padded
    row counts (bounded program variety for live serving)."""
    cfg = ModelConfig(
        model_name="melgan", arch=MelGANConfig(channels=(8, 8, 8, 8, 8))
    )
    gen = build_generator(cfg)
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(0), np.zeros((1, 8, 80), np.float32)
    )["params"]

    seen_rows = []

    def fwd(p, m):
        seen_rows.append(m.shape[0])
        return gen.apply({"params": p}, m)

    mels = [
        rng.standard_normal((T, 80)).astype(np.float32)
        for T in (10, 12, 11, 40, 41)  # bucket 32: group of 3; bucket 64: 2
    ]
    exact = BatchedSynthesizer(
        fwd, params, samples_per_frame=240, bucket_frames=32, max_batch=8
    )(mels)
    rows_exact, seen_rows[:] = list(seen_rows), []

    # a distinct closure: jit's trace cache keys on the underlying function,
    # so reusing `fwd` would hide re-dispatches of already-traced shapes
    def fwd2(p, m):
        seen_rows.append(m.shape[0])
        return gen.apply({"params": p}, m)

    padded = BatchedSynthesizer(
        fwd2, params, samples_per_frame=240, bucket_frames=32, max_batch=8,
        batch_pad="pow2",
    )(mels)
    rows_pow2 = list(seen_rows)

    assert rows_exact == [3, 2] and rows_pow2 == [4, 2]
    for e, p2 in zip(exact, padded):
        np.testing.assert_allclose(e, p2, atol=1e-6)


@pytest.mark.slow
def test_mesh_sharded_serving_composes_with_fused_kernels(monkeypatch, rng):
    """BatchedSynthesizer(mesh=...) with the fused MRF/tail Pallas kernels
    engaged must equal the single-device path — the batch dim is the
    leading pallas grid dim, so XLA partitions the fused programs across
    the mesh without replication tricks.

    Slow tier: composition coverage — mesh serving alone
    (test_batched_on_mesh_matches_single) and the fused kernels alone
    (test_fused_mrf.py) both stay default (VERDICT r03 item 6)."""
    from fastvocoder_tpu.hparams import HiFiGANConfig, ModelConfig
    from fastvocoder_tpu.parallel.mesh import make_mesh

    monkeypatch.setenv("FASTVOCODER_FUSED_MRF", "interpret")
    monkeypatch.setenv("FASTVOCODER_FUSED_TAIL", "interpret")
    cfg = ModelConfig(
        model_name="hifigan",
        arch=HiFiGANConfig(upsample_initial_channel=64),
    )
    gen = build_generator(cfg, weight_norm=False)
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(0), np.zeros((1, 4, 80), np.float32)
    )["params"]
    mels = [
        np.clip(0.5 + 0.25 * rng.standard_normal((8, 80)), 0, 1).astype(
            np.float32
        )
        for _ in range(8)
    ]
    fwd = lambda p, m: gen.apply({"params": p}, m)
    kw = dict(samples_per_frame=240, bucket_frames=8, max_batch=8)
    got = BatchedSynthesizer(
        fwd, params, mesh=make_mesh(jax.devices()), **kw
    )(mels)
    want = BatchedSynthesizer(fwd, params, **kw)(mels)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-5)


def test_warmup_precompiles_all_serving_programs(rng):
    """After warmup, serving any mix under the warmed max length dispatches
    only shapes the warmup already ran."""
    cfg = ModelConfig(
        model_name="melgan", arch=MelGANConfig(channels=(8, 8, 8, 8, 8))
    )
    gen = build_generator(cfg)
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(0), np.zeros((1, 8, 80), np.float32)
    )["params"]

    shapes = set()

    def fwd(p, m):
        shapes.add(m.shape[:2])
        return gen.apply({"params": p}, m)

    bs = BatchedSynthesizer(
        fwd, params, samples_per_frame=240, bucket_frames=32, max_batch=4,
        batch_pad="pow2",
    )
    n = bs.warmup([32, 64], feature_dim=80)
    assert n == 6  # 2 buckets x sizes {1, 2, 4}
    warmed = set(shapes)

    mels = [
        rng.standard_normal((T, 80)).astype(np.float32)
        for T in (5, 20, 31, 33, 50, 64, 10)
    ]
    outs = bs(mels)
    assert shapes == warmed, f"unwarmed shapes dispatched: {shapes - warmed}"
    for m, o in zip(mels, outs):
        assert o.shape == (m.shape[0] * 240,)

    # exact mode dispatches every raw group size — warmup must cover them
    # all, not just max_batch
    shapes.clear()
    bs_exact = BatchedSynthesizer(
        fwd, params, samples_per_frame=240, bucket_frames=32, max_batch=4,
        batch_pad="exact",
    )
    n = bs_exact.warmup([32, 64], feature_dim=80)
    assert n == 8  # 2 buckets x sizes {1, 2, 3, 4}
    warmed = set(shapes)
    outs = bs_exact(mels)  # group sizes 4 and 3 across the two buckets
    assert shapes == warmed, f"unwarmed shapes dispatched: {shapes - warmed}"
    for m, o in zip(mels, outs):
        assert o.shape == (m.shape[0] * 240,)
