"""Checked-in golden-file tests — run WITHOUT the reference mounted.

The live suite proves parity against the torch reference when it is mounted
(tests/test_models.py, tests/test_mel.py); these goldens pin that verified
behavior into the repo so regressions are caught anywhere.  Regenerate with
tools/make_goldens.py (only after re-verifying live parity).
"""

import os

import numpy as np
import pytest

from fastvocoder_tpu.hparams import load_model_config
from fastvocoder_tpu.models.factory import build_generator

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")
CONF = os.path.join(os.path.dirname(__file__), "..", "conf")


def test_mel_golden():
    """melspectrogram of a fixed synthetic wav (librosa-parity DSP path)."""
    from fastvocoder_tpu.dsp import audio

    g = np.load(os.path.join(GOLDENS, "mel_golden.npz"))
    mel = audio.melspectrogram(g["wav"])
    np.testing.assert_allclose(mel, g["mel"], atol=1e-5)


@pytest.mark.parametrize(
    "model_name,conf",
    [
        ("melgan", "melgan/original.yaml"),
        ("hifigan", "hifigan/light.yaml"),
        ("multiband-hifigan", "multiband-hifigan/light.yaml"),
        ("basis-melgan", "basis-melgan/light.yaml"),
    ],
)
def test_generator_golden(model_name, conf):
    """Fixed-seed generator forward reproduces the checked-in waveform."""
    import jax

    g = np.load(os.path.join(GOLDENS, "generator_goldens.npz"))
    mel = g["mel"]
    cfg = load_model_config(model_name, os.path.join(CONF, conf))
    kw = {}
    if model_name == "basis-melgan":
        kw["basis_signal_weight"] = g["basis"]
    gen = build_generator(cfg, **kw)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)["params"]
    y = gen.apply({"params": params}, mel)
    if model_name == "basis-melgan":
        y = y[0]
    np.testing.assert_allclose(
        np.asarray(y), g[model_name.replace("-", "_")], atol=2e-5, rtol=1e-4
    )


def test_synthesize_golden():
    """Self-contained end-to-end gate (no /root/reference needed): real
    speech wav -> our mel extraction -> reference-layout checkpoint
    round-trip -> Synthesizer (weight-norm fuse + 64-frame bucketing +
    zero-mel bias removal) reproduces the checked-in waveform."""
    import tempfile

    import jax

    from fastvocoder_tpu.bin.synthesize import Synthesizer
    from fastvocoder_tpu.dsp import audio
    from fastvocoder_tpu.train.checkpoint import save_checkpoint

    g = np.load(os.path.join(GOLDENS, "synthesize_golden.npz"))
    mel = audio.melspectrogram(g["wav"]).astype(np.float32)
    np.testing.assert_allclose(mel, g["mel"], atol=1e-5)

    conf = os.path.join(CONF, "hifigan", "light.yaml")
    cfg = load_model_config("hifigan", conf)
    gen = build_generator(cfg)
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(0), np.zeros((1, 8, 80), np.float32)
    )["params"]
    with tempfile.TemporaryDirectory() as d:
        ckpt = os.path.join(d, "ckpt.pth.tar")
        save_checkpoint(ckpt, cfg, params)
        syn = Synthesizer(ckpt, conf, "hifigan", bucket_frames=64)
        est, _, bias = syn.synthesize(mel.T)
    assert est.shape == (mel.shape[1] * 240,)
    np.testing.assert_allclose(est, g["est"], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(bias, g["bias"], atol=2e-5, rtol=1e-4)
