"""Preprocess driver (reference bin/preprocess.py:84-107): extract features
for a wav index file, then write shuffled train/valid/eval splits."""

from __future__ import annotations

import argparse
import os

from fastvocoder_tpu.data.preprocess import preprocess, write_splits
from fastvocoder_tpu.hparams import HP


def run_preprocess(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", type=str,
                        default=os.path.join("dataset", "ljspeech.txt"))
    parser.add_argument("--save_path", type=str,
                        default=os.path.join("dataset", "processed"))
    parser.add_argument("--audio_index_path", type=str,
                        default=os.path.join("dataset", "audio"))
    parser.add_argument("--mel_index_path", type=str,
                        default=os.path.join("dataset", "mel"))
    parser.add_argument("--no_multiprocess", action="store_true")
    parser.add_argument("--extract_f0", action="store_true",
                        help="also write <name>.f0.npy (NHV conditioning)")
    parser.add_argument("--train_size", type=int, default=HP.train_size)
    parser.add_argument("--valid_size", type=int, default=HP.valid_size)
    parser.add_argument("--eval_size", type=int, default=HP.eval_size)
    args = parser.parse_args(argv)

    hp = HP.replace(
        train_size=args.train_size,
        valid_size=args.valid_size,
        eval_size=args.eval_size,
    )
    audio_index, mel_index = preprocess(
        args.data_path, args.save_path, hp,
        multiprocess=not args.no_multiprocess, extract_f0=args.extract_f0,
    )
    write_splits(audio_index, mel_index, args.audio_index_path, args.mel_index_path, hp)


if __name__ == "__main__":
    run_preprocess()
