"""Track held-out quality across a training run's checkpoints.

VERDICT r2 weak-point: a GAN run's valid_stft_loss alone is ambiguous —
the adversarial phase legitimately trades raw spectral distance for
realism, so a plateauing STFT curve says nothing about whether quality
improved.  This tool records the complementary metrics: for every
checkpoint_<step>.pth.tar under a run dir it runs the evaluation driver's
metrics (MR-STFT, MCD dB, waveform L1 — bin/evaluation.py) on the held-out
eval split and writes one CSV row per checkpoint, giving
quality-over-training curves that cover the adversarial phase.

Usage:
  python tools/eval_checkpoints.py --checkpoint_root checkpoint \
      --model_name hifigan --config conf/hifigan/light.yaml \
      --csv_out docs/quality_hifigan_light_30k.csv
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def find_checkpoints(root: str) -> list:
    """[(step, path)] for every checkpoint under root, sorted by step; on
    duplicate steps (resumed segments re-saving) the newest file wins."""
    by_step = {}
    for r, _, files in os.walk(root):
        for f in files:
            if f.startswith("checkpoint_") and f.endswith(".pth.tar"):
                try:
                    step = int(f[len("checkpoint_"):-len(".pth.tar")])
                except ValueError:
                    continue
                p = os.path.join(r, f)
                if step not in by_step or (
                    os.path.getmtime(p) > os.path.getmtime(by_step[step])
                ):
                    by_step[step] = p
    return sorted(by_step.items())


def main(argv=None):
    import fastvocoder_tpu

    fastvocoder_tpu.enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_root", type=str, default="checkpoint")
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--audio_index_path", type=str,
                   default=os.path.join("dataset", "audio", "eval"))
    p.add_argument("--mel_index_path", type=str,
                   default=os.path.join("dataset", "mel", "eval"))
    p.add_argument("--num_items", type=int, default=6)
    p.add_argument("--csv_out", type=str, required=True)
    p.add_argument("--min_step", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="run on host CPU (shell-level JAX_PLATFORMS=cpu is "
                        "ineffective under the axon sitecustomize; this flag "
                        "forces the platform in-process so checkpoint evals "
                        "never contend with a live training run on the chip)")
    args = p.parse_args(argv)
    if args.cpu:
        fastvocoder_tpu.force_platform("cpu")

    from fastvocoder_tpu.bin.evaluation import evaluate, load_data
    from fastvocoder_tpu.bin.synthesize import Synthesizer
    from fastvocoder_tpu.data.dataset import parse_path_file
    from fastvocoder_tpu.hparams import HP

    ckpts = [c for c in find_checkpoints(args.checkpoint_root)
             if c[0] >= args.min_step]
    if not ckpts:
        raise FileNotFoundError(f"no checkpoints under {args.checkpoint_root}")
    n = min(args.num_items, len(parse_path_file(args.audio_index_path)))
    is_nhv = args.model_name == "nhv"
    loaded = load_data(
        args.audio_index_path, args.mel_index_path, list(range(n)),
        with_f0=is_nhv,
    )
    audio_list, mel_list = loaded[0], loaded[1]
    f0_list = loaded[2] if is_nhv else None

    rows = []
    synth = None
    for step, path in ckpts:
        if synth is None:
            synth = Synthesizer(path, args.config, args.model_name, HP,
                                bucket_frames=64)
        else:
            # same config -> same shapes: swap params, keep compiled programs
            synth.load_params(path)
        results = evaluate(synth, audio_list, mel_list, f0_list=f0_list)
        row = {
            k: float(np.mean([r[k] for r in results]))
            for k in ("mr_stft", "mcd_db", "wav_l1")
        }
        rows.append((step, row))
        print(f"step {step}: " + " ".join(f"{k}={v:.4f}"
                                          for k, v in row.items()))

    os.makedirs(os.path.dirname(args.csv_out) or ".", exist_ok=True)
    with open(args.csv_out, "w") as f:
        f.write("step,mr_stft,mcd_db,wav_l1\n")
        for step, row in rows:
            f.write(f"{step},{row['mr_stft']:.6f},{row['mcd_db']:.6f},"
                    f"{row['wav_l1']:.6f}\n")
    print(f"wrote {args.csv_out} ({len(rows)} checkpoints, "
          f"{n} eval items each)")


if __name__ == "__main__":
    main()
