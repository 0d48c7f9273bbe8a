"""Convert checkpoints between the torch reference format and this framework.

Both directions are the same file format (torch.save with the reference's
dict layout, train/checkpoint.py), so this tool mostly exists to (a) validate
a reference checkpoint against a config, (b) fuse weight norm for deployment,
and (c) strip optimizer state.

Usage:
  python tools/convert_checkpoint.py --model_name hifigan \
      --config conf/hifigan/light.yaml \
      --input  reference_checkpoint.pth.tar \
      --output converted.pth.tar [--fuse-weight-norm] [--strip-optimizer]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--fuse-weight-norm", action="store_true",
                   help="bake weight norm into plain kernels (deployment form; "
                        "the result is NOT loadable by the weight-normed "
                        "reference module)")
    p.add_argument("--strip-optimizer", action="store_true")
    args = p.parse_args()

    from fastvocoder_tpu.hparams import load_model_config
    from fastvocoder_tpu.train.checkpoint import (
        fuse_weight_norm,
        load_checkpoint,
        save_checkpoint,
    )

    cfg = load_model_config(args.model_name, args.config)
    ckpt = load_checkpoint(args.input, cfg)
    gen_params = ckpt["gen_params"]
    n = sum(np.asarray(x).size for x in _leaves(gen_params))
    print(f"loaded {args.input}: {n:,} generator parameters, "
          f"step {ckpt.get('step', 0)}")

    if args.fuse_weight_norm:
        gen_params = fuse_weight_norm(gen_params)
        print("fused weight norm")

    save_checkpoint(
        args.output,
        cfg,
        gen_params,
        disc_params=None if args.strip_optimizer else ckpt.get("disc_params"),
        gen_opt_state=None if args.strip_optimizer else ckpt.get("optimizer"),
        disc_opt_state=None
        if args.strip_optimizer
        else ckpt.get("discriminator_optimizer"),
        step=ckpt.get("step", 0),
    )
    print(f"wrote {args.output}")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
