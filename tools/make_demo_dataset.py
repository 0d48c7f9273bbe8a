"""Build a small real-speech training dataset from checked-in demo audio.

Cuts a list of source wavs (any sample rate; resampled to 24 kHz through
`dsp.audio.load_wav`, the same path every preprocessed artifact takes) into
fixed-length segments and writes them as wav files plus an index txt usable
by `preprocess.sh` / `bin.preprocess` (one absolute path per line — the
contract of the reference's dataset/*.py index generators).

Used by docs/TRAINING.md's convergence run: ~80 s of real speech
(LJSpeech demo clips at 22.05 kHz + 24 kHz reference demo outputs) becomes
~40 utterances of ~1.9 s each, enough to fill the reference batch geometry
(32 x 140-frame crops) with distinct utterances.
"""

from __future__ import annotations

import argparse
import glob
import os

from fastvocoder_tpu.dsp.audio import load_wav, save_wav


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sources", nargs="+", required=True,
                   help="source wav files or globs")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--index_file", type=str, required=True)
    p.add_argument("--segment_frames", type=int, default=192,
                   help="segment length in 240-sample mel frames")
    p.add_argument("--min_frames", type=int, default=150,
                   help="drop tail segments shorter than this")
    p.add_argument("--sample_rate", type=int, default=24000)
    p.add_argument("--hop", type=int, default=240)
    p.add_argument("--speeds", type=float, nargs="+", default=[1.0],
                   help="kaldi-style speed perturbation factors: each source "
                        "is additionally decoded as if played at f x speed "
                        "(load at sample_rate*f, treat as sample_rate), "
                        "multiplying the corpus duration by sum(1/f)")
    p.add_argument("--gains", type=float, nargs="+", default=[1.0],
                   help="peak-level augmentation factors crossed with "
                        "--speeds: segments are written peak-normalized to "
                        "each gain (save_wav rescale_out), which shifts the "
                        "normalized mel by 20*log10(g)/min_level_db and "
                        "scales the target waveform — preprocessing loads "
                        "unencoded so the level survives to the artifacts")
    args = p.parse_args(argv)

    files = []
    for s in args.sources:
        hits = sorted(glob.glob(s))
        if not hits:
            raise FileNotFoundError(s)
        files += hits

    os.makedirs(args.out_dir, exist_ok=True)
    seg_len = args.segment_frames * args.hop
    min_len = args.min_frames * args.hop
    paths = []
    for f in files:
        for speed in args.speeds:
            # speed perturbation by resampling: decoding at sr*f and playing
            # back at sr makes the clip 1/f as long with pitch scaled by f
            wav = load_wav(f, sample_rate=int(round(args.sample_rate * speed)),
                           encode=False)
            base = os.path.splitext(os.path.basename(f))[0].replace(".", "_")
            if speed != 1.0:
                base += f"_sp{int(round(speed * 100)):03d}"
            for gain in args.gains:
                stem = base
                if gain != 1.0:
                    stem += f"_g{int(round(gain * 100)):03d}"
                for k, start in enumerate(range(0, len(wav), seg_len)):
                    seg = wav[start:start + seg_len]
                    if len(seg) < min_len:
                        break
                    out = os.path.join(args.out_dir, f"{stem}_seg{k}.wav")
                    save_wav(seg, out, args.sample_rate, rescale_out=gain)
                    paths.append(os.path.abspath(out))

    with open(args.index_file, "w", encoding="utf-8") as f:
        f.write("\n".join(paths) + "\n")
    print(f"wrote {len(paths)} segments from {len(files)} sources "
          f"-> {args.index_file}")


if __name__ == "__main__":
    main()
