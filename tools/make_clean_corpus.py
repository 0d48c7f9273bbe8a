"""Build the round-4 CLEAN-SPLIT training corpus (no demo contamination).

The round-3 corpus mixed the 5 reference demo wavs into training, which
contaminated the quality-vs-reference-demo comparisons (the demo wavs are
synthesized renditions of LJSpeech clip 0, and the comparison re-scores
that same audio).  This tool builds the corpus the clean protocol needs:

  * TRAIN: LJSpeech clips 1-6 (/root/reference/resource/demo/ljspeech/),
    3-way speed-perturbed (0.9/1.0/1.1 via tools/make_demo_dataset.py
    --speeds), segmented to ~1.9 s utterances.  Neither clip 0 nor any
    reference demo wav enters training at any speed.
  * VALID: a few held-out 1.0-speed segments of clips 1-6 — used only for
    the trainer's valid_stft_loss monitoring (same-recording caveat applies
    and is documented in docs/TRAINING.md).
  * EVAL: ALL segments of clip 0 at 1.0 speed — a truly unseen utterance.
    It is the utterance every reference demo wav renders
    (/root/reference/resource/demo/README.md:5-35, filenames `0.*.wav`),
    so per-checkpoint quality on it and the demo comparisons share one
    uncontaminated protocol.

Outputs the reference pipeline layout (index txt files of absolute .npy
paths) so `train.sh` / `evaluation.sh` run on it unchanged:

  dataset/clean_processed/      wav.npy + mel.npy + f0.npy artifacts
  dataset/clean_audio/{train,valid,eval}
  dataset/clean_mel/{train,valid,eval}
"""

from __future__ import annotations

import argparse
import os
import random
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastvocoder_tpu.data.preprocess import preprocess, write_file  # noqa: E402
from tools import make_demo_dataset  # noqa: E402

LJ_DIR = "/root/reference/resource/demo/ljspeech"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--lj_dir", default=LJ_DIR)
    p.add_argument("--root", default="dataset")
    p.add_argument("--speeds", type=float, nargs="+", default=[0.9, 1.0, 1.1])
    p.add_argument("--gains", type=float, nargs="+", default=[1.0],
                   help="peak-level augmentation crossed with --speeds "
                        "(train pool only; the clip-0 eval pool stays "
                        "unaugmented)")
    p.add_argument("--segment_frames", type=int, default=192)
    p.add_argument("--n_valid", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    src_dir = os.path.join(args.root, "clean_src")
    proc_dir = os.path.join(args.root, "clean_processed")
    audio_idx_dir = os.path.join(args.root, "clean_audio")
    mel_idx_dir = os.path.join(args.root, "clean_mel")

    # 1. segment: clips 1-6 speed-perturbed (train/valid pool), clip 0 at
    #    1.0 speed only (eval pool)
    train_index = os.path.join(src_dir, "index_train_pool.txt")
    eval_index = os.path.join(src_dir, "index_eval_pool.txt")
    make_demo_dataset.main([
        "--sources", *[os.path.join(args.lj_dir, f"{i}.wav") for i in range(1, 7)],
        "--out_dir", src_dir, "--index_file", train_index,
        "--segment_frames", str(args.segment_frames),
        "--speeds", *[str(s) for s in args.speeds],
        "--gains", *[str(g) for g in args.gains],
    ])
    make_demo_dataset.main([
        "--sources", os.path.join(args.lj_dir, "0.wav"),
        "--out_dir", src_dir, "--index_file", eval_index,
        "--segment_frames", str(args.segment_frames),
    ])

    # 2. preprocess everything through the standard pipeline (with f0 for NHV)
    def read_index(path):
        with open(path) as f:
            return [ln.strip() for ln in f if ln.strip()]

    merged = os.path.join(src_dir, "index_all.txt")
    pool_train, pool_eval = read_index(train_index), read_index(eval_index)
    with open(merged, "w") as f:
        f.write("\n".join(pool_train + pool_eval) + "\n")
    audio_index, mel_index = preprocess(merged, proc_dir, extract_f0=True)
    by_name = {os.path.basename(a): i for i, a in enumerate(audio_index)}

    def indices_for(wav_paths):
        return [by_name[os.path.basename(w) + ".npy"] for w in wav_paths
                if os.path.basename(w) + ".npy" in by_name]

    # 3. splits: valid = n_valid seeded 1.0-speed segments from the train
    #    pool; train = the rest of the pool; eval = all clip-0 segments
    pool_train_ids = indices_for(pool_train)
    unperturbed = [
        i for i in pool_train_ids
        if "_sp" not in audio_index[i]
        and not re.search(r"_g\d", audio_index[i])
    ]
    rng = random.Random(args.seed)
    valid_ids = sorted(rng.sample(unperturbed, args.n_valid))
    train_ids = [i for i in pool_train_ids if i not in set(valid_ids)]
    rng.shuffle(train_ids)
    eval_ids = indices_for(pool_eval)

    os.makedirs(audio_idx_dir, exist_ok=True)
    os.makedirs(mel_idx_dir, exist_ok=True)
    for name, ids in [("train", train_ids), ("valid", valid_ids),
                      ("eval", eval_ids)]:
        write_file(audio_index, mel_index, ids, name, audio_idx_dir,
                   mel_idx_dir)
        print(f"{name}: {len(ids)} utterances")
    print(f"clean corpus ready under {args.root}/clean_*")


if __name__ == "__main__":
    main()
