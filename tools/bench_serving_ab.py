"""A/B the batched-serving cost of one fused-MRF stage width.

Measures whole-model batched synthesis (the bench.py protocol: batch of
utterances, forced-completion fetch, best-of-N windows) with the fused MRF
path fully on vs with one channel width forced back to the standard XLA
conv path — isolating that stage's contribution without a rebuild.

Usage:
  python tools/bench_serving_ab.py --model hifigan --config conf/hifigan/light.yaml --exclude_ch 128
  python tools/bench_serving_ab.py ... --batch 1        # batch-1 latency A/B
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
    p.add_argument("--exclude_ch", type=int, default=128)
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
    kw = {}
    gen = build_generator(cfg, weight_norm=False, compute_dtype=dt, **kw)

    rng = np.random.default_rng(0)
    mel = np.clip(
        0.5 + 0.25 * rng.standard_normal((args.batch, args.frames, 80)), 0, 1
    ).astype(np.float32)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), mel[:1, :8])["params"]
    audio_s = args.batch * args.frames * HP.hop_size / HP.sample_rate

    orig_gate = hifigan_mod._use_fused_mrf

    def run(label, gate):
        hifigan_mod._use_fused_mrf = gate
        fwd = jax.jit(lambda p, m: gen.apply({"params": p}, m))
        out = fwd(params, mel)
        float(jnp.sum(out.astype(jnp.float32)))  # force compile + completion
        best = float("inf")
        for _ in range(args.windows):
            t0 = time.perf_counter()
            acc = None
            for _ in range(args.repeats):
                o = fwd(params, mel)
                r = jnp.sum(o.astype(jnp.float32))
                acc = r if acc is None else acc + r
            float(acc)
            best = min(best, (time.perf_counter() - t0) / args.repeats)
        print(
            f"{label}: {best * 1000:.2f} ms/batch "
            f"({audio_s / best:.0f}x realtime)"
        )
        return best

    def gate_without(cfg_, wn, ch, T, batch=2):
        if ch == args.exclude_ch:
            return False
        return orig_gate(cfg_, wn, ch, T, batch)

    a = run("fused all", orig_gate)
    b = run(f"fused minus C={args.exclude_ch}", gate_without)
    hifigan_mod._use_fused_mrf = orig_gate
    print(f"stage win: {b / a:.3f}x  ({(b - a) * 1000:.2f} ms)")


if __name__ == "__main__":
    main()
