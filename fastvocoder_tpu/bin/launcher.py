"""Mode launcher: dispatches on the MODE env var
(reference bin/launcher.py:9-19; the shell scripts export MODE)."""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

if __name__ == "__main__":
    import fastvocoder_tpu

    fastvocoder_tpu.enable_compilation_cache()
    from fastvocoder_tpu.bin import (
        run_evaluation,
        run_preprocess,
        run_publisher,
        run_serve,
        run_synthesizer,
        run_test,
        run_train,
    )

    MODE = os.getenv("MODE")
    if MODE == "train":
        run_train()
    elif MODE == "preprocess":
        run_preprocess()
    elif MODE == "synthesize":
        run_synthesizer()
    elif MODE == "publish":
        run_publisher()
    elif MODE == "test":
        run_test()
    elif MODE == "evaluation":
        # working replacement for the reference's broken bin/evaluation.py
        run_evaluation()
    elif MODE == "serve":
        run_serve()
    else:
        raise SystemExit(
            f"unknown MODE={MODE!r}; want "
            "train|preprocess|synthesize|publish|test|evaluation|serve"
        )
