"""Capture a jax.profiler trace of model synthesis (TensorBoard/Perfetto).

The reference's only profiling is wall-clock timers (SURVEY.md §5); this
drives the framework's `runtime.trace` capture on a real model so kernel-
level timelines are one command away:

    python tools/profile_synthesis.py --model_name basis-melgan \\
        --config conf/basis-melgan/light.yaml --logdir /tmp/fv_trace

View with `tensorboard --logdir <logdir>` (profile plugin) or upload the
.trace.json.gz to https://ui.perfetto.dev.
"""

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", type=str, default="basis-melgan")
    parser.add_argument("--config", type=str,
                        default=os.path.join(ROOT, "conf/basis-melgan/light.yaml"))
    parser.add_argument("--logdir", type=str, default="/tmp/fastvocoder_trace")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--frames", type=int, default=585)
    parser.add_argument("--passes", type=int, default=5)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import fastvocoder_tpu

    fastvocoder_tpu.enable_compilation_cache()

    from fastvocoder_tpu.hparams import load_model_config
    from fastvocoder_tpu.models.factory import build_generator
    from fastvocoder_tpu.runtime import annotate, trace

    cfg = load_model_config(args.model_name, args.config)
    rng = np.random.default_rng(0)
    kw = {}
    if args.model_name == "basis-melgan":
        kw["basis_signal_weight"] = (
            0.02 * rng.standard_normal((cfg.arch.L, cfg.arch.out_channels))
        ).astype(np.float32)
    gen = build_generator(cfg, weight_norm=False, **kw)

    ch = getattr(cfg.arch, "in_channels", 80) + (1 if args.model_name == "nhv" else 0)
    mel = rng.standard_normal((args.batch, args.frames, ch)).astype(np.float32)
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(0), np.zeros((1, 8, ch), np.float32)
    )["params"]
    method = getattr(gen, "inference", None) if args.model_name in (
        "basis-melgan", "nhv") else (
        getattr(gen, "synthesize", None) if args.model_name == "multiband-hifigan"
        else None)
    fwd = jax.jit(
        lambda p, m: jnp.sum(
            gen.apply({"params": p}, m, **({"method": method} if method else {}))
        )
    )

    fwd(params, mel).block_until_ready()  # compile outside the trace
    with trace(args.logdir):
        for i in range(args.passes):
            with annotate(f"synthesis_pass_{i}"):
                fwd(params, mel).block_until_ready()

    files = []
    for root, _, names in os.walk(args.logdir):
        files += [os.path.join(root, n) for n in names]
    print(f"trace captured: {len(files)} files under {args.logdir}")
    return args.logdir


if __name__ == "__main__":
    main()
