"""Average the model weights of several training checkpoints.

    python tools/average_checkpoints.py out.pth.tar ckpt_a.pth.tar ckpt_b.pth.tar ...
    python tools/average_checkpoints.py out.pth.tar --last 5 <run-checkpoint-dir>

Checkpoint averaging (Vaswani et al. 2017 appendix; standard in ESPnet-style
vocoder recipes) smooths the parameter noise of late-training GAN steps at
zero inference cost.  Entries are averaged as stored — for weight-normed
checkpoints that is the (weight_v, weight_g) parameterization, matching the
usual state-dict-level averaging practice.

The output keeps the LAST checkpoint's non-model entries (step, pattern, …)
and drops optimizer state (an average of Adam moments is meaningless);
it loads anywhere a training checkpoint does (synthesize/publish/evaluation,
or --checkpoint_path to fine-tune from it with fresh optimizers).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _step_of(path: str) -> int:
    m = re.search(r"checkpoint_(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else -1


def expand_inputs(inputs, last: int):
    """Files stay files; a directory expands to its `last` newest
    checkpoint_<step>.pth.tar files (by step)."""
    files = []
    for p in inputs:
        if os.path.isdir(p):
            cand = sorted(
                (
                    os.path.join(p, f)
                    for f in os.listdir(p)
                    if re.fullmatch(r"checkpoint_\d+\.pth\.tar", f)
                ),
                key=_step_of,
            )
            if not cand:
                raise FileNotFoundError(f"no checkpoint_*.pth.tar in {p}")
            files.extend(cand[-last:] if last > 0 else cand)
        else:
            files.append(p)
    return files


def average_checkpoints(paths, out_path: str) -> dict:
    import torch

    if len(paths) < 2:
        raise ValueError(f"need >= 2 checkpoints to average, got {paths}")
    acc = None
    last = None
    for p in paths:
        ckpt = torch.load(p, map_location="cpu", weights_only=False)
        model = ckpt["model"]
        if acc is None:
            acc = {k: np.asarray(v, np.float64).copy() for k, v in model.items()}
        else:
            if set(model) != set(acc):
                raise ValueError(
                    f"{p} has different model keys than {paths[0]}"
                )
            for k, v in model.items():
                acc[k] += np.asarray(v, np.float64)
        last = ckpt
    n = len(paths)
    out = dict(last)
    out["model"] = {
        k: torch.from_numpy((v / n).astype(np.float32)) for k, v in acc.items()
    }
    for k in ("optimizer", "discriminator", "discriminator_optimizer"):
        out.pop(k, None)
    torch.save(out, out_path)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("output")
    p.add_argument("inputs", nargs="+", help="checkpoint files and/or run dirs")
    p.add_argument(
        "--last", type=int, default=5,
        help="per input DIRECTORY: average its newest N checkpoints",
    )
    args = p.parse_args(argv)
    paths = expand_inputs(args.inputs, args.last)
    average_checkpoints(paths, args.output)
    print(f"averaged {len(paths)} checkpoints -> {args.output}")
    for q in paths:
        print(f"  {q}")


if __name__ == "__main__":
    main()
