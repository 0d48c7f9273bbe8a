"""Capture a jax.profiler trace of the GAN train step (TensorBoard/Perfetto).

Complements tools/profile_synthesis.py for the training graph: compiles the
full GAN step (or the pre-adversarial step) at reference batch geometry and
traces a few steps, so the per-op cost of the generator, the composite
discriminator (MSD grouped convs + MFD STFT stacks), and the losses are one
command away:

    python tools/profile_train_step.py --model hifigan \\
        --config conf/hifigan/light.yaml --logdir /tmp/fv_train_trace

View with `tensorboard --logdir <logdir>` (profile plugin) or upload the
.trace.json.gz to https://ui.perfetto.dev.
"""

from __future__ import annotations

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="hifigan")
    p.add_argument("--config", default=os.path.join(ROOT, "conf/hifigan/light.yaml"))
    p.add_argument("--logdir", default="/tmp/fastvocoder_train_trace")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--fixed_length", type=int, default=140)
    p.add_argument("--steps", type=int, default=3, help="traced steps")
    p.add_argument("--phase", default="gan", choices=["gan", "pre_adv"])
    p.add_argument("--mixprecision", type=int, default=0)
    args = p.parse_args(argv)

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
    mel = rng.standard_normal((args.batch, args.fixed_length, 80)).astype(np.float32)
    t = np.arange(args.fixed_length * hp.hop_size) / hp.sample_rate
    wav = np.stack(
        [0.3 * np.sin(2 * np.pi * (100 + 10 * i) * t) for i in range(args.batch)]
    ).astype(np.float32)

    step_fn = jax.jit(
        trainer.gan_step if args.phase == "gan" else trainer.pre_adv_step
    )
    state, metrics = step_fn(state, mel, wav)  # compile outside the trace
    float(metrics["total_loss"])

    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            state, metrics = step_fn(state, mel, wav)
        float(metrics["total_loss"])  # force completion inside the trace
    print(f"trace written to {args.logdir}")


if __name__ == "__main__":
    main()
