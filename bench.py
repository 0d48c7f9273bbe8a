"""Headline benchmark: Basis-MelGAN synthesis RTF on one chip.

Replicates the reference's RTF protocol (reference bin/test.py:123-132:
10 repeated no-grad inference passes over a directory of mels,
rtf = elapsed / (10 * total_audio_seconds)) against the reference's published
Basis-MelGAN number (RTF 0.0498 on M1 CPU, reference README.md:27).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = baseline_rtf / our_rtf (speedup factor; > 1 means faster than
the reference).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_RTF = 0.0498  # reference README.md:27 (Basis-MelGAN, M1 CPU)
REPEATS = 10
SAMPLE_RATE = 24000
HOP = 240


def main():
    import jax

    import fastvocoder_tpu

    fastvocoder_tpu.enable_compilation_cache()

    from fastvocoder_tpu.hparams import load_model_config
    from fastvocoder_tpu.models.factory import build_generator

    root = os.path.dirname(os.path.abspath(__file__))
    cfg = load_model_config(
        "basis-melgan", os.path.join(root, "conf", "basis-melgan", "light.yaml")
    )
    rng = np.random.default_rng(0)
    basis = (0.02 * rng.standard_normal((cfg.arch.L, cfg.arch.out_channels))).astype(
        np.float32
    )
    # fused (weight-norm removed) inference graph, like the reference's
    # published checkpoints (bin/synthesize.py:72)
    gen = build_generator(cfg, basis_signal_weight=basis, weight_norm=False)

    # the reference protocol runs a directory of real mels; we use the
    # reference's fixed test mel length (585 frames, resource/test.mel.npy)
    # replicated to a realistic eval set of 32 utterances
    T = 585
    n_utts = 32
    mels = (0.5 * rng.standard_normal((n_utts, T, 80))).astype(np.float32)
    duration = n_utts * T * HOP / SAMPLE_RATE  # total audio seconds

    params = gen.init(jax.random.PRNGKey(0), mels[:1, :8])["params"]

    import jax.numpy as jnp

    # Each call returns a scalar checksum of its waveform; the final float()
    # fetch forces every queued inference to really complete.  (On remote
    # device links `block_until_ready` can return before execution, which
    # would under-measure.)
    @jax.jit
    def synth(params, mel):
        return jnp.sum(gen.apply({"params": params}, mel, method=gen.inference))

    add = jax.jit(lambda a, b: a + b)

    # sequential per-utterance synthesis (the reference iterates mels one by
    # one, bin/test.py:126-129)
    acc = synth(params, mels[:1])
    float(add(acc, acc))  # compile both programs + settle

    start = time.perf_counter()
    acc = jnp.float32(0)
    for _ in range(REPEATS):
        for i in range(n_utts):
            acc = add(acc, synth(params, mels[i : i + 1]))
    float(acc)  # one host fetch; the dependency chain forces all work
    cost = time.perf_counter() - start
    rtf = cost / (REPEATS * duration)

    print(
        json.dumps(
            {
                "metric": "basis_melgan_rtf",
                "value": round(rtf, 6),
                "unit": "rtf",
                "vs_baseline": round(BASELINE_RTF / rtf, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
