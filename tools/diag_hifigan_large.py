"""Diagnose the hifigan-large sequential-RTF drift (VERDICT r02 weak-1).

BENCH_r01 measured 0.001433, BENCH_r02 0.001819 (+27%) with no
`rtf_on_device` row to say whether the chip or the remote dispatch link
moved.  This tool isolates it: for each fused-kernel gate setting it runs
the reference RTF protocol (bench.py) BOTH host-timed (includes per-call
dispatch over the axon tunnel) and on-device (the whole 10-pass protocol
as one compiled program — pure chip latency), so

  * host-timed changed, on-device stable  -> tunnel/dispatch noise,
  * both changed with the gate setting    -> a round-2 gate change moved
    the sequential path (e.g. C>=32 MRF fusion is batch>=2-gated).

Usage: python tools/diag_hifigan_large.py   (run with the chip idle)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import bench


def main():
    mels = bench.load_mels()
    combos = [
        ("auto", "auto"),  # shipped default
        ("0", "auto"),     # no MRF fusion
        ("auto", "0"),     # no fused tail
        ("0", "0"),        # pure XLA
        ("1", "auto"),     # MRF fusion forced for every width incl. batch-1
    ]
    print(f"{'MRF':>5} {'tail':>5} {'rtf_host':>10} {'rtf_device':>11}")
    for mrf, tail in combos:
        os.environ["FASTVOCODER_FUSED_MRF"] = mrf
        os.environ["FASTVOCODER_FUSED_TAIL"] = tail
        fwd, params, prep = bench.build("hifigan", "conf/hifigan/large.yaml")
        rtf = bench.bench_rtf(fwd, params, prep(mels))
        rtf_dev = bench.bench_rtf_on_device(fwd, params, prep(mels))
        print(f"{mrf:>5} {tail:>5} {rtf:>10.6f} {rtf_dev:>11.6f}", flush=True)
    os.environ.pop("FASTVOCODER_FUSED_MRF", None)
    os.environ.pop("FASTVOCODER_FUSED_TAIL", None)


if __name__ == "__main__":
    main()
