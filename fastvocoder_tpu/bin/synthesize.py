"""Synthesis driver (reference bin/synthesize.py:17-104).

`Synthesizer` loads a checkpoint into the *fused* (weight-norm-removed)
generator — the jit equivalent of the reference's `model.eval();
model.remove_weight_norm()` (bin/synthesize.py:71-72) — and synthesizes with
zero-mel bias removal (bin/synthesize.py:74-80).

Length handling on TPU: compiled functions are cached per padded mel-length
bucket (`bucket_frames` granularity, 0 = exact length).  Bucketed runs pad
the mel with zeros and trim the waveform to `T * hop`; outputs within the
generator's receptive field of the pad boundary can differ from an
exact-shape run by edge effects only.
"""

from __future__ import annotations

import argparse
import functools
from typing import Tuple

import numpy as np

from fastvocoder_tpu.dsp import audio
from fastvocoder_tpu.hparams import HP, Hparams, load_model_config
from fastvocoder_tpu.models.factory import build_generator
from fastvocoder_tpu.train.checkpoint import fuse_weight_norm, load_checkpoint


class Synthesizer:
    def __init__(
        self,
        checkpoint_path: str,
        config_path: str,
        model_name: str,
        hp: Hparams = HP,
        bucket_frames: int = 0,
        compute_dtype=None,
    ) -> None:
        import jax

        self.hp = hp
        self.cfg = load_model_config(model_name, config_path)
        self.model_name = model_name
        self.bucket_frames = bucket_frames
        self.L = getattr(self.cfg.arch, "L", None)

        if model_name == "nhv":
            # native checkpoint layout, no fused (remove_weight_norm) form;
            # conditioning must be mel + f0 (dsp.f0.f0_to_condition)
            self.generator = build_generator(self.cfg, compute_dtype=compute_dtype)
        else:
            self.generator = build_generator(
                self.cfg, weight_norm=False, compute_dtype=compute_dtype
            )
        self._jax = jax
        self.load_params(checkpoint_path)

    def load_params(self, checkpoint_path: str) -> None:
        """Swap in another checkpoint of the same config without dropping
        the compiled-inference cache (checkpoints of one run share shapes,
        so a checkpoint sweep pays jit once per mel-length bucket, not once
        per checkpoint x bucket)."""
        ckpt = load_checkpoint(checkpoint_path, self.cfg, with_discriminator=False)
        if self.model_name == "nhv":
            self.params = ckpt["gen_params"]
        else:
            self.params = fuse_weight_norm(ckpt["gen_params"])
        self.pattern = ckpt.get("pattern")

    # ---- compiled inference, cached per mel length ----

    @functools.lru_cache(maxsize=32)
    def _compiled(self, T: int):
        jax = self._jax
        gen = self.generator

        if self.model_name in ("basis-melgan", "nhv"):
            fn = lambda p, m: gen.apply({"params": p}, m, method=gen.inference)
        elif self.model_name == "multiband-hifigan":
            fn = lambda p, m: gen.apply({"params": p}, m, method=gen.synthesize)
        else:
            fn = lambda p, m: gen.apply({"params": p}, m)
        return jax.jit(fn)

    def _pad_frames(self, T: int) -> int:
        if self.bucket_frames <= 0:
            return T
        b = self.bucket_frames
        return ((T + b - 1) // b) * b

    def _run_device(self, mel: np.ndarray):
        """mel (T, 80) -> device waveform array (no host fetch)."""
        T = mel.shape[0]
        Tp = self._pad_frames(T)
        if Tp != T:
            mel = np.pad(mel, ((0, Tp - T), (0, 0)))
        return self._compiled(Tp)(self.params, mel[None])

    def _run(self, mel: np.ndarray) -> np.ndarray:
        """mel (T, 80) -> raw inference waveform (1-D, untrimmed)."""
        T = mel.shape[0]
        Tp = self._pad_frames(T)
        wav = np.asarray(self._run_device(mel))[0]
        if Tp != T:
            if self.model_name == "basis-melgan":
                keep = (T * self._weight_steps() - 1) * (self.L // 2) + self.L
            else:
                keep = T * self.hp.hop_size
            wav = wav[:keep]
        return wav

    def _weight_steps(self) -> int:
        steps = 1
        for s in self.cfg.arch.upsample_scales:
            steps *= s
        return steps

    # ---- public surface (reference bin/synthesize.py:74-80) ----

    def synthesize(
        self, mel: np.ndarray, f0: np.ndarray = None
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """mel (T, 80) -> (est, est - bias, bias); bias from a zero mel.

        NHV conditioning is (T, 81) = mel + f0 (dsp.f0.f0_to_condition);
        pass `f0` (T,) alongside an 80-channel mel, or the packed 81-channel
        tensor directly.  The zero-conditioning bias pattern then carries
        f0 = 0 everywhere (all-unvoiced): the noise-source-only output, the
        NHV analogue of the other models' zero-mel bias."""
        mel = np.asarray(mel, dtype=np.float32)
        if self.model_name == "nhv" and mel.shape[1] == self.cfg.arch.in_channels:
            if f0 is None:
                raise ValueError(
                    "nhv conditioning must be mel + f0: pass f0=(T,) with "
                    "the 80-ch mel, or a packed (T, 81) tensor "
                    "(dsp.f0.f0_to_condition)"
                )
            from fastvocoder_tpu.dsp.f0 import f0_to_condition

            mel = f0_to_condition(mel, np.asarray(f0, np.float32))
        bias = self._run(np.zeros_like(mel))
        est = self._run(mel)
        return est, est - bias, bias

    def test_rtf(self, mel: np.ndarray):
        """RTF-protocol inference: keep the waveform on device (the timed
        loop blocks once at the end, like the reference's no-grad pass)."""
        return self._run_device(np.asarray(mel, dtype=np.float32))


def run_synthesizer(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_path", type=str)
    parser.add_argument("--mel_path", type=str)
    parser.add_argument("--wav_path", type=str)
    parser.add_argument("--model_name", type=str,
                        help="melgan, hifigan, multiband-hifigan, basis-melgan")
    parser.add_argument("--config", type=str, help="path to model configuration file")
    parser.add_argument("--f0_path", type=str, default="",
                        help="nhv only: f0 track (T,) .npy; defaults to the "
                             "preprocess --extract_f0 sibling of --mel_path "
                             "(<name>.f0.npy next to <name>.mel.npy)")
    args = parser.parse_args(argv)

    hp = HP
    synthesizer = Synthesizer(args.checkpoint_path, args.config, args.model_name, hp)
    mel = np.load(args.mel_path)
    f0 = None
    if args.model_name == "nhv":
        f0_path = args.f0_path or args.mel_path.replace(".mel.npy", ".f0.npy")
        if f0_path == args.mel_path:
            raise SystemExit(
                "nhv needs an f0 track: --mel_path does not follow the "
                "'<name>.mel.npy' convention, so the default f0 sibling "
                "path cannot be derived — pass --f0_path explicitly"
            )
        f0 = np.load(f0_path).astype(np.float32)
    gl_wav = audio.inv_mel_spectrogram(mel, hp)  # Griffin-Lim reference output
    est, est_remove, bias = synthesizer.synthesize(mel.T, f0=f0)
    audio.save_wav(est, args.wav_path, hp.sample_rate, rescale_out=hp.rescale_out)
    audio.save_wav(est_remove, args.wav_path[:-3] + "remove.wav", hp.sample_rate,
                   rescale_out=hp.rescale_out)
    audio.save_wav(bias, args.wav_path[:-3] + "bias.wav", hp.sample_rate,
                   rescale_out=hp.rescale_out)
    audio.save_wav(gl_wav, args.wav_path[:-3] + "gl.wav", hp.sample_rate,
                   rescale_out=hp.rescale_out)


if __name__ == "__main__":
    run_synthesizer()
