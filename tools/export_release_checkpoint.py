"""Durable (git-committable) release checkpoints.

Round-4's host reboot wiped the gitignored `runs/` and cost every trained
checkpoint (VERDICT r04 item 6); in this environment only COMMITTED files
survive a reset.  Full training checkpoints are ~0.5 GB (both optimizer
states + discriminator), but the published artifact — generator weights
(+ the Basis-MelGAN bias `pattern`, reference bin/publish.py:67-75) — is
what the demo comparisons and the RTF harness actually need.  This tool
round-trips it through a compressed float16 npz small enough to commit:

  export:   training checkpoint -> docs/checkpoints/<name>.npz
            (f16 weights + f16 pattern, deflate-compressed, with
             model_name/config/step metadata)
  restore:  docs/checkpoints/<name>.npz -> published {'model','pattern'}
            .pth.tar (f32), loadable by bin.synthesize/bin.test/
            tools/compare_to_reference_demo.py unchanged

f16 quantization of weights perturbs synthesized waveforms by less than
the bf16 serving path the quality gates already bound
(tests/test_quality_gate.py); every demo-comparison JSON regenerated from
a restored artifact is self-consistent with the committed weights.

Usage:
  python tools/export_release_checkpoint.py export \
      --checkpoint runs/<run>/checkpoint/.../checkpoint_16000.pth.tar \
      --model_name basis-melgan --config conf/basis-melgan/light.yaml \
      --out docs/checkpoints/basis_melgan_clean2.npz
  python tools/export_release_checkpoint.py restore \
      --npz docs/checkpoints/basis_melgan_clean2.npz \
      --out /tmp/basis_published.pth.tar
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def export(args):
    from fastvocoder_tpu.bin.publish import PATTERN_FRAMES
    from fastvocoder_tpu.hparams import load_model_config
    from fastvocoder_tpu.models.factory import build_generator
    from fastvocoder_tpu.train.checkpoint import load_checkpoint

    cfg = load_model_config(args.model_name, args.config)
    ckpt = load_checkpoint(args.checkpoint, cfg, with_discriminator=False)
    gen_params = ckpt["gen_params"]

    pattern = np.zeros((0,), np.float32)
    if args.model_name == "basis-melgan":
        import jax

        gen = build_generator(cfg)
        zero_mel = np.zeros(
            (1, args.pattern_frames, cfg.arch.in_channels), np.float32
        )
        pattern = np.asarray(
            jax.device_get(
                gen.apply({"params": gen_params}, zero_mel, method=gen.inference)
            )
        )[0]

    flat = _flatten(gen_params)
    arrays = {f"param:{k}": v.astype(np.float16) for k, v in flat.items()}
    arrays["pattern"] = pattern.astype(np.float16)
    meta = {
        "model_name": args.model_name,
        "config": args.config,
        "step": int(ckpt.get("step", 0)),
        "source": args.checkpoint,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(args.out, meta=json.dumps(meta), **arrays)
    print(
        f"exported step-{meta['step']} {args.model_name} "
        f"-> {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB)"
    )


def restore(args):
    from fastvocoder_tpu.hparams import load_model_config
    from fastvocoder_tpu.train.checkpoint import save_published

    z = np.load(args.npz)
    meta = json.loads(str(z["meta"]))
    cfg = load_model_config(meta["model_name"], args.config or meta["config"])
    flat = {
        k[len("param:"):]: z[k].astype(np.float32)
        for k in z.files if k.startswith("param:")
    }
    pattern = z["pattern"].astype(np.float32)
    save_published(args.out, cfg, _unflatten(flat), pattern)
    print(
        f"restored step-{meta['step']} {meta['model_name']} -> {args.out}"
    )
    return meta


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true",
                   help="run on host CPU (shell-level JAX_PLATFORMS=cpu is "
                        "ineffective under the axon sitecustomize)")
    sub = p.add_subparsers(dest="cmd", required=True)
    e = sub.add_parser("export")
    e.add_argument("--checkpoint", required=True)
    e.add_argument("--model_name", required=True)
    e.add_argument("--config", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--pattern_frames", type=int, default=3000,
                   help="bias-pattern length in mel frames (30 s default; "
                        "the reference precomputes 300 s, bin/publish.py:69 "
                        "— a committed artifact favors 10x smaller, and "
                        "bin.test recomputes the bias for longer inputs)")
    r = sub.add_parser("restore")
    r.add_argument("--npz", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--config", default="",
                   help="override the config path recorded at export")
    args = p.parse_args(argv)
    if args.cpu:
        import fastvocoder_tpu
        fastvocoder_tpu.force_platform("cpu")
    if args.cmd == "export":
        export(args)
    else:
        restore(args)


if __name__ == "__main__":
    main()
