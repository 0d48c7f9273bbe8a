"""Measure GAN train-step time at reference batch geometry (batch 32 x
140-frame crops) — the docs/PERF.md "Training throughput" protocol.

Usage:
  python tools/bench_train_step.py --model melgan --config conf/melgan/original.yaml
  FASTVOCODER_FUSED_TRAIN=1 python tools/bench_train_step.py ...   # A/B

Forces scalar fetches per timed window (block_until_ready alone
under-reports over the remote device link at shallow queue depths).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="melgan")
    p.add_argument("--config", default="conf/melgan/original.yaml")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--fixed_length", type=int, default=140)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--phase", default="gan", choices=["gan", "pre_adv"])
    p.add_argument("--mixprecision", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import fastvocoder_tpu
    from fastvocoder_tpu.hparams import HP, load_model_config
    from fastvocoder_tpu.train.trainer import make_trainer

    fastvocoder_tpu.enable_compilation_cache()

    hp = HP.replace(fixed_length=args.fixed_length, batch_size=args.batch)
    cfg = load_model_config(args.model, args.config)
    kw = {}
    if args.model == "basis-melgan":
        kw["basis_signal_weight"] = (
            0.02
            * np.random.default_rng(0).standard_normal(
                (cfg.arch.L, cfg.arch.out_channels)
            )
        ).astype(np.float32)
    trainer = make_trainer(
        cfg, hp=hp,
        compute_dtype=jnp.bfloat16 if args.mixprecision else None, **kw,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((args.batch, args.fixed_length, 80)).astype(
        np.float32
    )
    t = np.arange(args.fixed_length * hp.hop_size) / hp.sample_rate
    wav = np.stack(
        [
            0.3 * np.sin(2 * np.pi * (100 + 10 * i) * t)
            for i in range(args.batch)
        ]
    ).astype(np.float32)

    step_fn = jax.jit(
        trainer.gan_step if args.phase == "gan" else trainer.pre_adv_step,
        donate_argnums=(0,),
    )

    state, metrics = step_fn(state, mel, wav)  # compile
    float(metrics["total_loss"])

    audio_s = args.batch * args.fixed_length * hp.hop_size / hp.sample_rate
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step_fn(state, mel, wav)
        float(metrics["total_loss"])  # force the whole window
        dt = (time.perf_counter() - start) / args.steps
        best = min(best, dt)
    mode = os.environ.get("FASTVOCODER_FUSED_TRAIN", "0")
    print(
        f"{args.model} {args.phase} fused_train={mode} "
        f"mix={args.mixprecision}: {best * 1000:.1f} ms/step "
        f"({audio_s / best:.0f}x realtime)"
    )


if __name__ == "__main__":
    main()
