"""Summarize a training run: loss curves (downsampled CSV) + tensorboard
valid series + a markdown table for docs/TRAINING.md.

Usage: python tools/summarize_run.py <logger_run_dir> [--tensorboard <dir>]
                                     [--csv_out <path>] [--every 50]

`logger_run_dir` may be a single timestamped `logger/<stamp>` dir OR the
parent `logger/` dir of a SEGMENTED run (the axon host-RAM leak forces long
runs into auto-resumed segments, each with its own stamp): segments are
concatenated in filesystem-mtime order into one continuous step axis, and
valid scalars are merged across every tensorboard run dir.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_series(path: str) -> np.ndarray:
    with open(path) as f:
        return np.array([float(line) for line in f if line.strip()], np.float64)


def run_dirs(root: str) -> list:
    """[root] if root itself holds loss txts, else its stamped children in
    mtime order (segmented runs append one child per resume)."""
    if os.path.exists(os.path.join(root, "stft_loss.txt")):
        return [root]
    kids = [
        os.path.join(root, d)
        for d in os.listdir(root)
        if os.path.exists(os.path.join(root, d, "stft_loss.txt"))
    ]
    if not kids:
        raise FileNotFoundError(f"no stft_loss.txt under {root}")
    return sorted(kids, key=os.path.getmtime)


def load_series_multi(dirs: list, name: str) -> np.ndarray:
    return np.concatenate([load_series(os.path.join(d, name)) for d in dirs])


def downsample(x: np.ndarray, every: int) -> list:
    """Mean over consecutive windows of `every` steps -> [(step, mean)]."""
    out = []
    for i in range(0, len(x), every):
        w = x[i : i + every]
        out.append((i + len(w), float(w.mean())))
    return out


def valid_series(tb_dir: str):
    """Read valid_stft_loss scalars merged across ALL tensorboard run dirs
    (segmented runs write one per segment), deduped by step."""
    try:
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )
    except Exception:
        return []
    if not os.path.isdir(tb_dir):
        return []
    runs = sorted(
        (os.path.join(tb_dir, d) for d in os.listdir(tb_dir)),
        key=os.path.getmtime,
    )
    merged = {}
    for run in runs:
        try:
            acc = EventAccumulator(run)
            acc.Reload()
            if "valid_stft_loss" in acc.Tags().get("scalars", []):
                for e in acc.Scalars("valid_stft_loss"):
                    merged[e.step] = e.value
        except Exception:
            continue
    return sorted(merged.items())


def write_csvs(csv_out: str, ds_stft, ds_total, valid) -> list:
    """Write the train curve to csv_out and the valid curve (if any) to a
    sibling `<stem>_valid.csv` — one table per file: a second header
    mid-file silently breaks header-keyed CSV consumers (VERDICT r03
    weak 6).  Returns the list of paths written."""
    written = []
    with open(csv_out, "w") as f:
        f.write("step,train_stft_loss,train_total_loss\n")
        for (s, a), (_, b) in zip(ds_stft, ds_total):
            f.write(f"{s},{a:.6f},{b:.6f}\n")
    written.append(csv_out)
    if valid:
        valid_out = (
            csv_out[: -len(".csv")] + "_valid.csv"
            if csv_out.endswith(".csv") else csv_out + "_valid"
        )
        with open(valid_out, "w") as f:
            f.write("step,valid_stft_loss\n")
            for s, v in valid:
                f.write(f"{s},{v:.6f}\n")
        written.append(valid_out)
    return written


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir", help="logger/<stamp> directory")
    p.add_argument("--tensorboard", default="tensorboard")
    p.add_argument("--csv_out", default="")
    p.add_argument("--every", type=int, default=100)
    args = p.parse_args()

    dirs = run_dirs(args.run_dir)
    if len(dirs) > 1:
        print(f"concatenating {len(dirs)} segments")
    stft = load_series_multi(dirs, "stft_loss.txt")
    total = load_series_multi(dirs, "total_loss.txt")
    ds_stft = downsample(stft, args.every)
    ds_total = downsample(total, args.every)
    valid = valid_series(args.tensorboard)

    if args.csv_out:
        for path in write_csvs(args.csv_out, ds_stft, ds_total, valid):
            print(f"wrote {path}")

    n = len(stft)
    print(f"steps: {n}")
    for frac in (0.0, 0.1, 0.25, 0.5, 0.75, 1.0):
        i = min(n - 1, int(frac * n))
        w = stft[max(0, i - 50) : i + 50]
        print(f"  step ~{i + 1}: stft_loss ~{w.mean():.4f}")
    if valid:
        print("valid_stft_loss:")
        for s, v in valid:
            print(f"  step {s}: {v:.4f}")


if __name__ == "__main__":
    main()
