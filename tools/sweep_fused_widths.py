"""Sweep fused-MRF width subsets + fused-tail on whole-model batched serving.

Isolates each fused stage's contribution (the bench.py protocol: forced
completion, best-of-N windows) to find which widths win on the current chip.

  python tools/sweep_fused_widths.py --model hifigan --config conf/hifigan/light.yaml
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
    p.add_argument("--model", default="hifigan")
    p.add_argument("--config", default="conf/hifigan/light.yaml")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=585)
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import fastvocoder_tpu
    from fastvocoder_tpu.hparams import HP, load_model_config
    from fastvocoder_tpu.models.factory import build_generator
    from fastvocoder_tpu.models import hifigan as hifigan_mod

    fastvocoder_tpu.enable_compilation_cache()

    cfg = load_model_config(args.model, args.config)
    dt = jnp.bfloat16 if args.dtype == "bf16" else None
    gen = build_generator(cfg, weight_norm=False, compute_dtype=dt)

    rng = np.random.default_rng(0)
    mel = np.clip(
        0.5 + 0.25 * rng.standard_normal((args.batch, args.frames, 80)), 0, 1
    ).astype(np.float32)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), mel[:1, :8])["params"]
    audio_s = args.batch * args.frames * HP.hop_size / HP.sample_rate

    orig_gate = hifigan_mod._use_fused_mrf

    def gate_widths(widths):
        def g(cfg_, wn, ch, T, batch=2):
            if ch not in widths:
                return False
            return orig_gate(cfg_, wn, ch, T, batch)
        return g

    # Two staged copies of the batch, alternated by the loop counter, so the
    # whole repeat loop is ONE compiled program (link noise excluded) and the
    # forward cannot be hoisted as loop-invariant.
    mel2 = jax.device_put(np.stack([mel, mel + 1e-6]))

    def run(label, widths, tail, force=False):
        # force=True pins FASTVOCODER_FUSED_MRF=1 so per-width rows really
        # isolate that width's fused kernel: in "auto" the gate itself
        # excludes C=256 at batch >= 2 (whole-model loss at batch 32),
        # which would silently benchmark the un-fused path under a fused
        # label (ADVICE r02).  Combined rows run in "auto" = what users get
        # (this sweep's mel2 batch is 2; batch-1 auto fuses every width).
        hifigan_mod._use_fused_mrf = gate_widths(widths)
        os.environ["FASTVOCODER_FUSED_MRF"] = "1" if force else "auto"
        os.environ["FASTVOCODER_FUSED_TAIL"] = "auto" if tail else "0"

        def protocol(p, ms):
            def body(i, acc):
                m = jax.lax.dynamic_index_in_dim(ms, i % 2, 0, keepdims=False)
                o = gen.apply({"params": p}, m)
                return acc + jnp.sum(o.astype(jnp.float32))

            return jax.lax.fori_loop(0, args.repeats, body, jnp.float32(0))

        prog = jax.jit(protocol)
        float(prog(params, mel2))  # compile + settle
        best = float("inf")
        for _ in range(args.windows):
            t0 = time.perf_counter()
            float(prog(params, mel2))
            best = min(best, (time.perf_counter() - t0) / args.repeats)
        print(
            f"{label:28s}: {best * 1000:7.2f} ms/batch "
            f"({audio_s / best:6.0f}x realtime)", flush=True,
        )
        return best

    run("none (XLA)", set(), False)
    run("tail only", set(), True)
    for w in (16, 32, 64, 128, 256):
        run(f"C={w} only (forced)", {w}, False, force=True)
    run("C<=64 (no tail)", {16, 32, 64}, False)
    run("C<=64 + tail (round-4)", {16, 32, 64}, True)
    # auto mode gates C=256 off (and C>=32 at batch 1) — this row IS the
    # shipped default, not "everything fused"
    run("default (C<=128 + tail)", {16, 32, 64, 128, 256}, True)
    run("force-256 + tail", {16, 32, 64, 128, 256}, True, force=True)
    hifigan_mod._use_fused_mrf = orig_gate
    os.environ.pop("FASTVOCODER_FUSED_MRF", None)


if __name__ == "__main__":
    main()
