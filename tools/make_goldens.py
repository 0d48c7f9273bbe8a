"""Regenerate tests/goldens/*.npz from the current (parity-verified) code.

The live parity suite verifies behavior against the mounted torch reference;
these goldens pin the same behavior so the suite still guards regressions
when /root/reference is not mounted.  Regenerate only after re-verifying
parity (`pytest tests/test_models.py tests/test_mel.py`).

Usage: python tools/make_goldens.py
"""

import os
import sys

# goldens are asserted by the CPU test suite; generate on the same backend
# (TPU conv precision differs at the ~1e-3 level)
os.environ["JAX_PLATFORMS"] = "cpu"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

GOLDENS = os.path.join(ROOT, "tests", "goldens")


def synth_wav(seconds: float = 0.6, sr: int = 24000) -> np.ndarray:
    """Deterministic chirp + tone mixture in [-0.9, 0.9]."""
    t = np.arange(int(seconds * sr)) / sr
    w = (
        0.5 * np.sin(2 * np.pi * (220 + 400 * t) * t)
        + 0.3 * np.sin(2 * np.pi * 1760 * t)
        + 0.1 * np.sin(2 * np.pi * 55 * t)
    )
    return (0.9 * w / np.abs(w).max()).astype(np.float32)


def make_mel_golden():
    from fastvocoder_tpu.dsp import audio

    wav = synth_wav()
    mel = audio.melspectrogram(wav)  # (80, T)
    np.savez_compressed(
        os.path.join(GOLDENS, "mel_golden.npz"), wav=wav, mel=mel.astype(np.float32)
    )
    print("mel_golden.npz:", mel.shape)


def make_generator_goldens():
    import jax

    from fastvocoder_tpu.hparams import load_model_config
    from fastvocoder_tpu.models.factory import build_generator

    cases = [
        ("melgan", "melgan/original.yaml"),
        ("hifigan", "hifigan/light.yaml"),
        ("multiband-hifigan", "multiband-hifigan/light.yaml"),
        ("basis-melgan", "basis-melgan/light.yaml"),
    ]
    rng = np.random.default_rng(42)
    mel = rng.standard_normal((1, 8, 80)).astype(np.float32)
    out = {"mel": mel}
    for name, conf in cases:
        cfg = load_model_config(name, os.path.join(ROOT, "conf", conf))
        kw = {}
        if name == "basis-melgan":
            kw["basis_signal_weight"] = (
                0.02 * rng.standard_normal((cfg.arch.L, cfg.arch.out_channels))
            ).astype(np.float32)
            out["basis"] = kw["basis_signal_weight"]
        gen = build_generator(cfg, **kw)
        params = gen.init(jax.random.PRNGKey(0), mel)["params"]
        y = gen.apply({"params": params}, mel)
        if name == "basis-melgan":
            y = y[0]
        out[name.replace("-", "_")] = np.asarray(y, np.float32)
        print(name, np.asarray(y).shape)
    np.savez_compressed(os.path.join(GOLDENS, "generator_goldens.npz"), **out)


def make_synthesize_golden():
    """End-to-end driver golden on real speech: wav -> mel (our DSP) ->
    reference-layout checkpoint round-trip -> Synthesizer (weight-norm fuse,
    64-frame bucketing, zero-mel bias removal).  The source wav is stored in
    the npz so the quality gate runs without /root/reference mounted."""
    import tempfile

    import jax

    from fastvocoder_tpu.bin.synthesize import Synthesizer
    from fastvocoder_tpu.dsp import audio
    from fastvocoder_tpu.hparams import load_model_config
    from fastvocoder_tpu.models.factory import build_generator
    from fastvocoder_tpu.train.checkpoint import save_checkpoint

    src = "/root/reference/resource/demo/ljspeech/0.wav"
    wav = audio.load_wav(src, encode=False)[: 36 * 2400]  # 3.6 s @ 24 kHz
    mel = audio.melspectrogram(wav).astype(np.float32)  # (80, T)

    conf = os.path.join(ROOT, "conf", "hifigan", "light.yaml")
    cfg = load_model_config("hifigan", conf)
    gen = build_generator(cfg)
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(0), np.zeros((1, 8, 80), np.float32)
    )["params"]
    with tempfile.TemporaryDirectory() as d:
        ckpt = os.path.join(d, "ckpt.pth.tar")
        save_checkpoint(ckpt, cfg, params)
        syn = Synthesizer(ckpt, conf, "hifigan", bucket_frames=64)
        est, est_remove, bias = syn.synthesize(mel.T)
    np.savez_compressed(
        os.path.join(GOLDENS, "synthesize_golden.npz"),
        wav=wav.astype(np.float32), mel=mel,
        est=est.astype(np.float32), bias=bias.astype(np.float32),
    )
    print("synthesize_golden.npz:", mel.shape, est.shape)


if __name__ == "__main__":
    os.makedirs(GOLDENS, exist_ok=True)
    make_mel_golden()
    make_generator_goldens()
    make_synthesize_golden()
