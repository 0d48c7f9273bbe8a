"""`fastvocoder <mode> [args...]` — subcommand console entry point.

The shell scripts keep the reference's MODE-env dispatch
(bin/launcher.py); this is the installable equivalent:

    fastvocoder train --model_name hifigan --config conf/hifigan/light.yaml ...
    fastvocoder synthesize --checkpoint_path ckpt.pth.tar ...
"""

from __future__ import annotations

import sys

MODES = (
    "train", "preprocess", "synthesize", "publish", "test", "evaluation",
    "serve",
)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(f"usage: fastvocoder <{'|'.join(MODES)}> [args...]")
        return 0
    mode, rest = argv[0], argv[1:]
    if mode not in MODES:
        raise SystemExit(f"unknown mode {mode!r}; want one of {MODES}")

    import fastvocoder_tpu

    fastvocoder_tpu.enable_compilation_cache()
    from fastvocoder_tpu import bin as drivers

    fn = {
        "train": drivers.run_train,
        "preprocess": drivers.run_preprocess,
        "synthesize": drivers.run_synthesizer,
        "publish": drivers.run_publisher,
        "test": drivers.run_test,
        "evaluation": drivers.run_evaluation,
        "serve": drivers.run_serve,
    }[mode]
    fn(rest)
    return 0


if __name__ == "__main__":
    sys.exit(main())
